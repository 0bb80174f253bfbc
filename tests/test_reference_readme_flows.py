"""The reference README's documented usage flows, run verbatim-shaped
against the drop-in ``hyperdb`` compat package.

Each test mirrors one code block from /root/reference/README.md (the
migration surface a reference user actually copied into their app):
basic ingest/save/load/query (README.md:61-82), select_keys
(README.md:195-207), key filter (:220-232), sentence filter incl. the
Warning/Info stdout lines (:300-312), metadata filter (:345-356),
skip_doc over string docs (:415-430), and combined filters (:437-452).
The reference's own pytest suites already pass against the compat package
(benchmarks/run_reference_suite.py, 107/107); these pin the README paths
that the suites do not cover end to end.
"""

import json
import os

import numpy as np
import pytest

from hyperdb import HyperDB

DEMO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "demo", "creatures.jsonl")


def _demo_documents():
    documents = []
    with open(DEMO, "r") as f:
        for line in f:
            documents.append(json.loads(line))
    return documents


@pytest.fixture(scope="module")
def documents():
    return _demo_documents()


def test_basic_ingest_save_load_query(documents, tmp_path):
    """README 'Usage': construct from a jsonl list of dicts, save to a
    .pickle.gz, load it back, query text — results are (doc, score, idx)
    3-tuples consumable by the README's own print_pokemon_info helper."""
    db = HyperDB(documents)
    path = str(tmp_path / "creatures_hyperdb.pickle.gz")
    db.save(path)
    db.load(path)
    results = db.query("Likes to sleep.", top_k=3)
    assert len(results) == 3
    for res in results:
        assert isinstance(res, tuple) and len(res) == 3
        document, similarity, index = res
        assert isinstance(document, dict) and "name" in document
        assert isinstance(similarity, float)
        assert 0 <= index < len(documents)


def test_select_keys_partial_embedding(documents, tmp_path):
    """README 'Partial document embedding': select_keys='name' embeds only
    that key; stored documents are the projected dicts."""
    db = HyperDB(documents, select_keys="name")
    path = str(tmp_path / "sel_hyperdb.pickle.gz")
    db.save(path)
    db.load(path)
    results = db.query(documents[0]["name"], top_k=3)
    assert len(results) == 3
    assert set(results[0][0].keys()) == {"name"}


def test_key_filter_query(documents, tmp_path):
    """README 'Partial document querying through key-based selection':
    filters=[('key', 'info.description')] focuses scoring on that key."""
    db = HyperDB(documents)
    path = str(tmp_path / "key_hyperdb.pickle.gz")
    db.save(path)
    db.load(path)
    results = db.query(
        documents[0]["name"], top_k=3, filters=[("key", "info.description")]
    )
    assert len(results) == 3
    for document, similarity, index in results:
        assert "info" in document


def test_sentence_filter_single_survivor_messages(capsys):
    """README 'sentence-based selection': filtering down to ONE document
    prints the documented Warning + Info lines and returns that document."""
    docs = [
        {"name": "A", "info": {"description": "Zanzibar's favorite thing."}},
        {"name": "B", "info": {"description": "A plain description."}},
        {"name": "C", "info": {"description": "Another plain description."}},
    ]
    db = HyperDB(docs)
    capsys.readouterr()
    results = db.query(
        "thing", top_k=3, filters=[("sentence", "Zanzibar's")]
    )
    out = capsys.readouterr().out
    assert (
        "Warning: top_k (3) is greater than the number of filtered "
        "documents (1). Setting top_k to 1." in out
    )
    assert "Info: Only one document left." in out
    assert len(results) == 1
    assert results[0][0]["name"] == "A"


def test_metadata_filter_query(documents, tmp_path):
    """README 'metadata parameter': metadata_keys at construction, filter
    narrows to exact matches before ranking."""
    db = HyperDB(documents, metadata_keys=["info.weakness"])
    path = str(tmp_path / "meta_hyperdb.pickle.gz")
    db.save(path)
    db.load(path)
    weakness = documents[0]["info"]["weakness"]
    expect = sum(1 for d in documents if d["info"]["weakness"] == weakness)
    results = db.query(
        "creature", top_k=3, filters=[("metadata", {"info.weakness": weakness})]
    )
    assert len(results) == min(3, expect)
    for document, similarity, index in results:
        assert document["info"]["weakness"] == weakness


def test_skip_doc_on_string_documents():
    """README 'skip_doc parameter': db.add over plain strings, positive
    skips the first k docs, negative excludes the last k."""
    db = HyperDB()
    db.add(["Document 1", "Document 2", "Document 3", "Document 4",
            "Document 5"])

    result_1 = db.query("Some query text", top_k=2,
                        filters=[("skip_doc", 2)])
    survivors_1 = {r[0] for r in result_1}  # string docs stay raw strings
    assert len(result_1) == 2
    assert survivors_1 <= {"Document 3", "Document 4", "Document 5"}

    result_2 = db.query("Some query text", top_k=2,
                        filters=[("skip_doc", -2)])
    survivors_2 = {r[0] for r in result_2}
    assert len(result_2) == 2
    assert survivors_2 <= {"Document 1", "Document 2", "Document 3"}

    result_3 = db.query("Some query text", top_k=2)
    assert len(result_3) == 2


def test_combined_filters(documents, tmp_path, capsys):
    """README 'Combining Multiple Filters': metadata + sentence + key in
    one query, applied in order before ranking."""
    db = HyperDB(documents, metadata_keys=["info.weakness"])
    path = str(tmp_path / "combo_hyperdb.pickle.gz")
    db.save(path)
    db.load(path)
    weakness = documents[0]["info"]["weakness"]
    # a word present in every demo description, so the sentence filter
    # keeps the metadata survivors intact
    results = db.query("creature", top_k=3, filters=[
        ("metadata", {"info.weakness": weakness}),
        ("sentence", "creature"),
        ("key", "info.description"),
    ])
    assert 1 <= len(results) <= 3
    for document, similarity, index in results:
        assert document["info"]["weakness"] == weakness
        assert "creature" in document["info"]["description"].lower()


def test_single_survivor_info_chunk_vs_key_filter(capsys):
    """Reference's 'Only one document left.' fires on len(scores)==1:
    score rows are CHUNK rows on the plain path (multi-chunk survivor is
    silent) but one averaged vector per doc on the key-filter path
    (filter_by_key dedups by doc), so the same surviving multi-chunk doc
    prints Info when a key filter is active (review r3 follow-up)."""
    long_text = " ".join(f"word{i}" for i in range(1200)) + " zanzibar"
    docs = [
        {"name": "A", "info": {"description": long_text}},
        {"name": "B", "info": {"description": "plain text here"}},
    ]
    db = HyperDB(docs)
    assert len(db.source_indices) > len(db.documents)  # doc A chunked

    capsys.readouterr()
    db.query("zanzibar", top_k=1, filters=[("sentence", "zanzibar")])
    assert "Info: Only one document left." not in capsys.readouterr().out

    res = db.query("zanzibar", top_k=1, filters=[
        ("sentence", "zanzibar"), ("key", "info.description")
    ])
    assert "Info: Only one document left." in capsys.readouterr().out
    assert res[0][0]["name"] == "A"
