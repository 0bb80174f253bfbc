"""API-parity coverage of the exposed list-based helpers.

The reference exposes every internal helper via `import *`
(SURVEY.md §1 L7); these tests pin the list-based public surface that the
mask-based engine does not exercise."""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB


@pytest.fixture
def db():
    docs = [
        {"name": "Abra", "hp": 160, "info": {"type": "psychic",
         "description": "Sleeps 18 hours a day."}},
        {"name": "Arcanine", "hp": 290, "info": {"type": "fire",
         "description": "A legendary creature with a grand mane."}},
        {"name": "Arbok", "hp": 230, "info": {"type": "poison",
         "description": "Ferocious warning markings on its belly."}},
    ]
    vectors = np.stack([np.full(8, k, dtype=np.float32) for k in (1, 2, 3)])
    return HyperDB(documents=docs, vectors=vectors, metadata_keys=["info.type"])


def test_apply_skip_doc_helper(db):
    vec, docs, kept = db.apply_skip_doc(db.vectors, db.documents, 1)
    assert kept == [1, 2]
    assert [d["name"] for d in docs] == ["Arcanine", "Arbok"]
    with pytest.raises(Exception):
        db.apply_skip_doc(db.vectors, db.documents, 3)


def test_filter_by_sentence_helper(db):
    vecs, docs = db.filter_by_sentence(db.vectors, db.documents, "grand mane")
    assert [d["name"] for d in docs] == ["Arcanine"]
    # all filters must match (conjunction)
    vecs, docs = db.filter_by_sentence(
        db.vectors, db.documents, ["grand mane", "legendary"]
    )
    assert len(docs) == 1
    vecs, docs = db.filter_by_sentence(
        db.vectors, db.documents, ["grand mane", "psychic"]
    )
    assert docs == []


def test_filter_by_key_helper(db):
    vecs, docs = db.filter_by_key(db.vectors, db.documents, "name")
    assert len(docs) == 3
    shapes = {np.asarray(v).shape for v in vecs}
    assert len(shapes) == 1  # consistent per-doc key-embedding shape
    with pytest.raises(ValueError):
        db.filter_by_key(db.vectors, db.documents, "bogus_key")


def test_filter_by_metadata_helper(db):
    vecs, docs = db._filter_by_metadata({"info.type": "fire"}, db.vectors, db.documents)
    assert [d["name"] for d in docs] == ["Arcanine"]
    assert vecs.shape[0] == 1


def test_apply_filters_helper(db):
    vecs, docs = db._apply_filters(
        [("metadata", {"info.type": "psychic"}), ("sentence", ["sleeps"])]
    )
    assert [d["name"] for d in docs] == ["Abra"]


def test_apply_filters_invalid_name(db):
    with pytest.raises(ValueError):
        db._apply_filters([("nope", 1)])


def test_handle_timestamps_helper(db):
    db.metadata_keys.append("hp")
    rec = db._handle_timestamps(1.0, "hp", db.documents)
    assert rec.shape == (3,)
    assert rec[1] == pytest.approx(1.0)  # max hp -> exp(0)
    assert db._handle_timestamps(0, "hp", db.documents) is None
    with pytest.raises(ValueError):
        db._handle_timestamps(1.0, "not_declared", db.documents)


def test_generate_query_vector_helper(db):
    vec = db.generate_query_vector("some text")
    assert np.asarray(vec).size >= db.dim


def test_validate_and_convert_documents_iterable(db):
    out = db.validate_and_convert_documents(iter(["a", {"b": 1}]))
    assert out == [{"document": "a"}, {"b": 1}]
    with pytest.raises(ValueError):
        db.validate_and_convert_documents(42)


def test_word_frequencies_string_documents(tmp_path):
    db = HyperDB()
    db.add(["plain string document", "another string"])
    path = tmp_path / "freq.txt"
    db.compute_and_save_word_frequencies(path)
    content = path.read_text()
    assert "string: 2" in content


def test_set_ann_metric_rebuilds(db):
    assert db.vectors_normalized is True  # cosine default
    db.set_ann_metric("euclidean")
    assert db.ann_metric == "euclidean"
    assert db.vectors_normalized is False
    # queries still work and cosine metric now brute-forces with INFO
    res = db.query(np.full(8, 1.0), metric="euclidean_metric")
    assert len(res) == 3


def test_dict_with_metadata_filter(db):
    out = db.dict(metadata={"info.type": "fire"})
    assert len(out) == 1 and out[0]["name"] == "Arcanine"
    out = db.dict(vectors=True, metadata=("info.type", "fire"))
    assert "vector" in out[0]
    # stored documents must not be mutated by dict(vectors=True)
    assert "vector" not in db.documents[1]


def test_size_with_chunks_metadata(db):
    assert db.size(metadata={"info.type": "fire"}) == 1
    assert db.size(metadata={"info.type": "fire"}, with_chunks=True) == 1
    with pytest.raises(ValueError):
        db.size(metadata="notadict")
