"""Integration tests of the HyperDB facade.

Scenario-for-scenario port of the reference suite
(/root/reference/tests/test_hyperdb.py) — those tests are the behavioral
spec (SURVEY.md §4). Differences from the reference suite are deliberate:

- fully hermetic: chunking tests use the default hermetic tokenizer/embedder
  (one word == one token), never a downloaded model;
- ANN-path results are exact-scored 3-tuples everywhere the reference
  documents 3-tuples (SURVEY.md Q3 consciously fixed), so unpacking uses
  ``doc, *rest``;
- the precomputed-vectors constructor also indexes metadata (conscious fix),
  so metadata-filter assertions are exercised for real instead of vacuously.
"""

import copy
import os
import time

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.utils.lru import LRUCache

# Five sample creatures with the same structure/values the reference fixtures
# rely on (hp ordering drives the recency tests).
SAMPLE_DOCS = [
    {
        "name": "Abra", "shortname": "abra", "hp": 160,
        "info": {
            "id": 63, "type": "psychic", "weakness": "dark",
            "description": (
                "Sleeps 18 hours a day. If it senses danger, it will teleport "
                "itself to safety even as it sleeps."
            ),
        },
        "images": {"photo": "images/abra.jpg", "typeIcon": "icons/psychic.jpg",
                   "weaknessIcon": "icons/dark.jpg"},
        "moves": [
            {"name": "Double Team", "type": "normal"},
            {"name": "Energy Ball", "dp": 90, "type": "grass"},
            {"name": "Psychic", "dp": 90, "type": "psychic"},
            {"name": "Thief", "dp": 60, "type": "dark"},
        ],
    },
    {
        "name": "Aerodactyl", "shortname": "aerodactyl", "hp": 270,
        "info": {
            "id": 142, "type": "flying", "weakness": "water",
            "description": (
                "This vicious creature is said to have flown in ancient skies "
                "while shrieking high-pitched cries."
            ),
        },
        "images": {"photo": "images/aerodactyl.jpg", "typeIcon": "icons/flying.jpg",
                   "weaknessIcon": "icons/water.jpg"},
        "moves": [
            {"name": "Bite", "dp": 60, "type": "dark"},
            {"name": "Double Team", "type": "normal"},
            {"name": "Ice Fang", "dp": 65, "type": "ice"},
            {"name": "Wing Attack", "dp": 60, "type": "flying"},
        ],
    },
    {
        "name": "Alakazam", "shortname": "alakazam", "hp": 220,
        "info": {
            "id": 65, "type": "psychic", "weakness": "dark",
            "description": (
                "Its brain can outperform a supercomputer. Its intelligence "
                "quotient is said to be 5,000."
            ),
        },
        "images": {"photo": "images/alakazam.jpg", "typeIcon": "icons/psychic.jpg",
                   "weaknessIcon": "icons/dark.jpg"},
        "moves": [
            {"name": "Focus Blast", "dp": 120, "type": "fighting"},
            {"name": "Kinesis", "type": "psychic"},
            {"name": "Psychic", "dp": 90, "type": "psychic"},
            {"name": "Shadow Ball", "dp": 80, "type": "ghost"},
        ],
    },
    {
        "name": "Arbok", "shortname": "arbok", "hp": 230,
        "info": {
            "id": 24, "type": "poison", "weakness": "psychic",
            "description": (
                "It is rumored that the ferocious warning markings on its "
                "belly differ from area to area."
            ),
        },
        "images": {"photo": "images/arbok.jpg", "typeIcon": "icons/poison.jpg",
                   "weaknessIcon": "icons/psychic.jpg"},
        "moves": [
            {"name": "Acid", "dp": 40, "type": "poison"},
            {"name": "Bite", "dp": 60, "type": "dark"},
            {"name": "Screech", "type": "normal"},
            {"name": "Thunder Fang", "dp": 65, "type": "electric"},
        ],
    },
    {
        "name": "Arcanine", "shortname": "arcanine", "hp": 290,
        "info": {
            "id": 59, "type": "fire", "weakness": "water",
            "description": (
                "This legendary creature is considered magnificent. Many "
                "people are enchanted by its grand mane."
            ),
        },
        "images": {"photo": "images/arcanine.jpg", "typeIcon": "icons/fire.jpg",
                   "weaknessIcon": "icons/water.jpg"},
        "moves": [
            {"name": "Bite", "dp": 60, "type": "dark"},
            {"name": "Double Team", "type": "normal"},
            {"name": "Extreme Speed", "dp": 80, "type": "normal"},
            {"name": "Fire Fang", "dp": 65, "type": "fire"},
        ],
    },
]

SAMPLE_VECTORS = np.array([np.full(384, k) for k in (1, 2, 3, 4, 5)])


@pytest.fixture(scope="function")
def setup_db():
    db = HyperDB(
        documents=copy.deepcopy(SAMPLE_DOCS),
        vectors=copy.deepcopy(SAMPLE_VECTORS),
        metadata_keys=["info.type"],
    )
    db._build_ann_index()
    return db


# ---------------------------------------------------------------- init/config


def test_vector_shape(setup_db):
    qv = setup_db._generate_and_validate_query_vector("Abra")
    assert qv.ndim == 1
    assert qv.shape[0] == setup_db.vectors.shape[1]


@pytest.mark.parametrize(
    "fp_precision, expected_dtype",
    [("float16", np.float16), ("float32", np.float32), ("float64", np.float64)],
)
def test_floating_point_precision(fp_precision, expected_dtype):
    db = HyperDB(fp_precision=fp_precision)
    assert db.fp_precision == expected_dtype
    if db.vectors is not None:
        assert db.vectors.dtype == expected_dtype


def test_invalid_fp_precision():
    with pytest.raises(ValueError):
        HyperDB(fp_precision="float8")


def test_invalid_ann_metric():
    with pytest.raises(ValueError):
        HyperDB(ann_metric="bogus")


@pytest.fixture(scope="function")
def setup_db_with_select_keys():
    db = HyperDB(
        documents=copy.deepcopy(SAMPLE_DOCS),
        vectors=copy.deepcopy(SAMPLE_VECTORS),
        select_keys=["name", "info.type"],
    )
    db._build_ann_index()
    return db


def test_select_keys_query_string(setup_db_with_select_keys):
    db = setup_db_with_select_keys
    results = db.query("Abra psychic", top_k=1)
    assert len(results) == 1
    assert all(doc["info.type"] == "psychic" for doc, *_ in results[:1]) or all(
        "info.type" in doc for doc, *_ in results
    )


def test_select_keys_add(setup_db_with_select_keys):
    db = setup_db_with_select_keys
    db.add([copy.deepcopy(SAMPLE_DOCS[0])])
    assert len(db.documents) == len(SAMPLE_DOCS) + 1
    assert db.documents[-1] == {"name": "Abra", "info.type": "psychic"}


@pytest.mark.parametrize(
    "metadata_keys,expected",
    [
        (["info.type", "info.weakness"], True),
        (["info.id", "info.description"], True),
        (["images.photo", "images.typeIcon", "images.weaknessIcon"], True),
        (["moves"], True),
        (["moves[0].name", "moves[0].type"], True),
        (["moves[0].dp"], True),
        (["nonexistent.key"], False),
        ([], True),
    ],
)
def test_metadata_keys(metadata_keys, expected):
    try:
        HyperDB(documents=copy.deepcopy(SAMPLE_DOCS), metadata_keys=metadata_keys)
        assert expected is True
    except ValueError:
        assert expected is False


# ---------------------------------------------------------------- timestamps


def test_add_timestamp():
    db = HyperDB(add_timestamp=True)
    db.add({"name": "Pikachu", "info": {"type": "electric"}})
    assert "timestamp" in db._metadata_index[len(db.documents) - 1]


def test_add_document_with_timestamp():
    db = HyperDB(add_timestamp=True)
    db.add({"name": "Mewtwo", "info": {"type": "psychic"}})
    ts = db._metadata_index[len(db.documents) - 1]["timestamp"]
    assert abs(ts - time.time()) < 5


# ---------------------------------------------------------------- add/remove


def test_add_single_document(setup_db):
    setup_db.add({"name": "Charizard", "hp": 300, "info": {"type": "fire"}})
    assert len(setup_db.documents) == 6


def test_add_multiple_documents(setup_db):
    setup_db.add(
        [
            {"name": "Blastoise", "hp": 268, "info": {"type": "water"}},
            {"name": "Venusaur", "hp": 160, "info": {"type": "grass"}},
        ]
    )
    assert len(setup_db.documents) == 7


def test_remove_single_document(setup_db):
    setup_db.remove_document(0)
    assert len(setup_db.documents) == 4


def test_remove_multiple_documents(setup_db):
    setup_db.remove_document([0, 1])
    assert len(setup_db.documents) == 3


# ------------------------------------------------------- chunk bookkeeping


def test_add_chunked_document():
    db = HyperDB()
    db.add({"text": "word " * 700})
    assert len(db.documents) == 1
    assert len(db.vectors) == 2
    assert db.split_info[0] == 2
    assert [i for i, s in enumerate(db.source_indices) if s == 0] == [0, 1]


def test_add_multiple_documents_with_chunking():
    db = HyperDB()
    db.add(
        [
            {"text": "word " * 600},
            {"text": "word " * 700},
            {"text": "word " * 400},
        ]
    )
    assert len(db.documents) == 3
    assert len(db.vectors) == 5
    assert db.split_info == {0: 2, 1: 2, 2: 1}
    for idx, expected in zip(range(3), [2, 2, 1]):
        assert sum(1 for s in db.source_indices if s == idx) == expected


def test_remove_chunked_document():
    db = HyperDB(metadata_keys="info.type")
    db.add({"text": "word " * 600, "info": {"type": "test"}})
    idx = len(db.documents) - 1
    assert idx in db._metadata_index
    db.remove_document(idx)
    assert not db.documents
    assert db.vectors.size == 0
    assert len(db._metadata_index) == 0
    assert idx not in db.split_info
    assert not any(s == idx for s in db.source_indices)


def test_remove_large_document():
    db = HyperDB()
    db.add({"text": "word " * 600})
    db.remove_document(0)
    assert not db.documents
    assert db.vectors.size == 0
    assert not db.split_info
    assert not db.source_indices


def test_remove_large_document_among_multiple():
    db = HyperDB(metadata_keys="info.type")
    db.add(
        [
            {"text": "word " * 400, "info": {"type": "regular1"}},
            {"text": "word " * 700, "info": {"type": "large"}},
            {"text": "word " * 400, "info": {"type": "regular2"}},
        ]
    )
    db.remove_document(1)
    assert len(db.documents) == 2
    assert len(db.vectors) == 2
    assert db._metadata_index == {
        0: {"info.type": "regular1"},
        1: {"info.type": "regular2"},
    }
    assert db.split_info == {0: 1, 1: 1}
    assert db.source_indices == [0, 1]


def test_remove_large_document_among_multiple_bis():
    db = HyperDB()
    db.add(
        [
            {"text": "word " * 400},
            {"text": "word " * 700},
            {"text": "word " * 400},
            {"text": "word " * 700},
        ]
    )
    db.remove_document(1)
    assert len(db.documents) == 3
    assert len(db.vectors) == 4
    assert db.split_info == {0: 1, 1: 1, 2: 2}
    assert db.source_indices == [0, 1, 2, 2]


def test_add_chunked_document_with_save_and_load(tmp_path):
    db = HyperDB(metadata_keys="info.type")
    db.add({"text": "word " * 600, "info": {"type": "large"}})
    path = str(tmp_path / "db_save.pkl")
    db.save(path, format="pickle")

    new_db = HyperDB(metadata_keys="info.type")
    new_db.load(path, format="pickle")
    idx = len(new_db.documents) - 1
    assert new_db.split_info[idx] == 2
    assert idx in new_db._metadata_index
    assert sum(1 for s in new_db.source_indices if s == idx) == 2


def test_remove_chunked_document_with_save_and_load(setup_db, tmp_path):
    setup_db.add({"text": "word " * 600, "info": {"type": "large"}})
    idx = len(setup_db.documents) - 1
    assert idx in setup_db._metadata_index
    setup_db.remove_document(idx)

    path = str(tmp_path / "db_save.pkl")
    setup_db.save(path, format="pickle")
    new_db = HyperDB(metadata_keys="info.type")
    new_db.load(path, format="pickle")
    assert idx not in new_db.split_info
    assert idx not in new_db._metadata_index
    assert not any(s == idx for s in new_db.source_indices)


# ---------------------------------------------------------------- uniformity


@pytest.mark.parametrize(
    "test_input,raises",
    [
        ([np.random.rand(128) for _ in range(10)], False),
        ([[1, 2, 3], [4, 5, 6, 7]], True),
        (np.array([1, 2, 3, 4, 5, 6, 7, 8, 9]).reshape(3, 3, 1), True),
    ],
)
def test_vector_uniformity(test_input, raises):
    db = HyperDB()
    if raises:
        with pytest.raises(ValueError):
            db.validate_vector_uniformity(test_input)
    else:
        db.validate_vector_uniformity(test_input)


# ---------------------------------------------------------------- size/dict


def test_size(setup_db):
    initial = len(SAMPLE_DOCS)
    assert setup_db.size() == initial
    setup_db.add({"name": "Pikachu", "info": {"type": "electric"}})
    assert setup_db.size() == initial + 1
    setup_db.remove_document(0)
    assert setup_db.size() == initial
    assert setup_db.size(with_chunks=True) == initial
    assert HyperDB().size() == 0


def test_size_with_metadata(setup_db):
    assert setup_db.size(metadata={"info.type": "psychic"}) == 2


def test_dict_without_vectors(setup_db):
    assert len(setup_db.dict(vectors=False)) == 5


def test_dict_with_vectors(setup_db):
    out = setup_db.dict(vectors=True)
    assert len(out) == 5
    assert all("vector" in entry for entry in out)


# ---------------------------------------------------------------- querying


def test_query_empty_db():
    with pytest.raises(Exception):
        HyperDB().query("Abra")


@pytest.mark.parametrize(
    "query_input", ["Abra", np.random.rand(384), list(np.random.rand(384))]
)
def test_query_input_types(setup_db, query_input):
    assert len(setup_db.query(query_input)) > 0


def test_query_invalid_input_type(setup_db):
    with pytest.raises(Exception):
        setup_db.query({"not": "valid"})


def test_query_wrong_dim(setup_db):
    with pytest.raises(ValueError):
        setup_db.query(np.random.rand(7))


@pytest.mark.parametrize("top_k, expected", [(3, 3), (10, 5), (1, 1)])
def test_query_top_k(setup_db, top_k, expected):
    assert len(setup_db.query("Abra", top_k=top_k)) == expected


@pytest.mark.parametrize(
    "return_similarities, result_type", [(True, tuple), (False, dict)]
)
def test_query_return_similarities(setup_db, return_similarities, result_type):
    results = setup_db.query("Abra", return_similarities=return_similarities)
    assert all(isinstance(r, result_type) for r in results)


def test_query_with_filters(setup_db):
    filters = [("key", "name"), ("metadata", {"info.type": "psychic"})]
    results = setup_db.query("Abra", filters=filters)
    assert len(results) > 0
    assert all(doc["info"]["type"] == "psychic" for doc, *_ in results)


@pytest.fixture
def setup_db_with_metadata():
    db = HyperDB(
        documents=copy.deepcopy(SAMPLE_DOCS),
        vectors=copy.deepcopy(SAMPLE_VECTORS),
        metadata_keys=["info.type", "info.weakness", "moves[0].name", "info.id"],
    )
    db._build_ann_index()
    return db


@pytest.mark.parametrize(
    "filters,expected",
    [
        (
            [("metadata", {"info.type": "psychic"})],
            lambda r: len(r) == 2
            and all(d["info"]["type"] == "psychic" for d, *_ in r),
        ),
        (
            [("metadata", {"info.type": "psychic", "info.weakness": "dark"})],
            lambda r: len(r) == 2
            and all(
                d["info"]["type"] == "psychic" and d["info"]["weakness"] == "dark"
                for d, *_ in r
            ),
        ),
        ([("key", "name")], lambda r: all("name" in d for d, *_ in r)),
        (
            [("key", ["name", "info.description"])],
            lambda r: all("name" in d and d["info"]["description"] for d, *_ in r),
        ),
        (
            [("sentence", ["Sleeps 18 hours a day"])],
            lambda r: len(r) == 1
            and all("Sleeps 18 hours a day" in d["info"]["description"] for d, *_ in r),
        ),
        (
            [("sentence", ["Sleeps 18 hours a day", "teleport itself to safety"])],
            lambda r: len(r) == 1,
        ),
        (
            [
                ("metadata", {"info.type": "psychic"}),
                ("key", "moves"),
                ("sentence", ["Sleeps 18 hours a day"]),
            ],
            lambda r: len(r) == 1 and r[0][0]["name"] == "Abra",
        ),
        (
            [
                ("key", ["name", "info.description"]),
                ("metadata", {"info.type": "psychic", "info.weakness": "dark"}),
            ],
            lambda r: len(r) == 2,
        ),
        (
            [
                ("key", ["moves[0].name", "moves[0].type"]),
                ("metadata", {"info.type": "psychic"}),
            ],
            lambda r: len(r) == 2,
        ),
        (
            [
                ("key", ["moves[1].name", "moves[1].type", "moves[1].dp"]),
                ("metadata", {"info.type": "psychic", "info.id": 63}),
            ],
            lambda r: len(r) == 1 and r[0][0]["name"] == "Abra",
        ),
        ([("skip_doc", 2)], lambda r: len(r) == len(SAMPLE_DOCS) - 2),
        ([("skip_doc", -2)], lambda r: len(r) == len(SAMPLE_DOCS) - 2),
        (
            [("skip_doc", 2), ("metadata", {"info.type": "psychic"})],
            lambda r: all(d["info"]["type"] == "psychic" for d, *_ in r)
            and len(r) <= len(SAMPLE_DOCS) - 2,
        ),
        (
            [
                ("skip_doc", 1),
                ("key", ["name", "info.description"]),
                ("metadata", {"info.type": "psychic", "info.weakness": "dark"}),
            ],
            lambda r: all(
                "name" in d
                and d["info"]["type"] == "psychic"
                and d["info"]["weakness"] == "dark"
                for d, *_ in r
            )
            and len(r) <= len(SAMPLE_DOCS) - 1,
        ),
    ],
)
def test_query_multiple_filters(setup_db_with_metadata, filters, expected):
    results = setup_db_with_metadata.query("Query Text", filters=filters)
    assert expected(results), f"filters: {filters} -> {results}"


def test_query_invalid_filters(setup_db):
    with pytest.raises(Exception):
        setup_db.query(
            "Abra",
            filters=[("key", "invalid_key"), ("metadata", {"info.bad": "x"})],
        )


def test_query_invalid_filter_name(setup_db):
    with pytest.raises(ValueError):
        setup_db.query("Abra", filters=[("bogus", 1)])


def test_query_invalid_metric(setup_db):
    with pytest.raises(ValueError):
        setup_db.query("Abra", metric="invalid_metric")


@pytest.mark.parametrize("recency_bias, expected_first", [(1, "Arcanine"), (-1, "Abra")])
def test_query_with_recency_bias(setup_db, recency_bias, expected_first):
    setup_db.metadata_keys.append("hp")
    results = setup_db.query("Abra", recency_bias=recency_bias, timestamp_key="hp")
    assert results[0][0]["name"] == expected_first


def test_query_negative_recency_bias(setup_db):
    for i, doc in enumerate(setup_db.documents):
        doc["timestamp"] = i
    setup_db.metadata_keys.append("timestamp")
    results = setup_db.query("Abra", recency_bias=-1, timestamp_key="timestamp")
    assert results[0][0]["name"] == "Abra"


def test_query_default_timestamp_key(setup_db):
    for i, doc in enumerate(setup_db.documents):
        doc["timestamp"] = i
    setup_db.metadata_keys.append("timestamp")
    results = setup_db.query("Abra", recency_bias=1, timestamp_key=None)
    assert results[0][0]["name"] == "Arcanine"


def test_query_no_default_timestamp_key(setup_db):
    with pytest.raises(ValueError):
        setup_db.query("Abra", recency_bias=1)


def test_query_with_ann_prefilter(setup_db):
    assert len(setup_db.query("Abra", metric="cosine_similarity")) > 0
    assert len(setup_db.query("Abra", metric="pearson_correlation")) > 0


def test_query_missing_timestamp_key(setup_db):
    with pytest.raises(ValueError):
        setup_db.query("Abra", recency_bias=1, timestamp_key="missing_timestamp")


def test_query_fallback_to_bruteforce(setup_db, capsys):
    setup_db.query("Abra", metric="pearson_correlation")
    captured = capsys.readouterr()
    assert "Bruteforce method used instead" in captured.out


def test_query_empty_after_filters(setup_db):
    results = setup_db.query(
        "Abra", filters=[("metadata", {"info.type": "non_existent_type"})]
    )
    assert len(results) == 0


def test_index_mapping_for_chunked_document():
    db = HyperDB()
    db.add({"text": "word " * 100})
    db.add({"text": "word " * 505 + " uniqueword " + "word " * 100})
    db.add({"text": "word " * 200})

    results = db._execute_query(
        "uniqueword",
        top_k=1,
        filters=[("sentence", "uniqueword")],
        return_similarities=True,
    )
    assert results, "Query did not return any results"
    _, _, returned_index = results[0]
    assert db.source_indices[returned_index] == 1


def test_warmup_precompiles(setup_db):
    setup_db.warmup(top_ks=(3,), batch_sizes=(1, 2))
    # warmup must not pollute the user-visible query cache counters
    setup_db.clear_cache()
    results = setup_db.query("Abra", top_k=3)
    assert len(results) == 3


def test_ann_recency_path_returns_2_tuples(setup_db):
    """Q4 shape parity: the ANN+recency path returns (doc, combined_score)
    2-tuples; every other similarity-returning path yields 3-tuples."""
    setup_db.metadata_keys.append("hp")
    results = setup_db.query("Abra", recency_bias=1, timestamp_key="hp")
    assert all(isinstance(r, tuple) and len(r) == 2 for r in results)
    # brute-force path (pearson has no ANN mapping) -> 3-tuples
    setup_db.clear_cache()
    results = setup_db.query(
        "Abra", recency_bias=1, timestamp_key="hp", metric="pearson_correlation"
    )
    assert all(len(r) == 3 for r in results)


def test_query_batch(setup_db):
    queries = np.random.rand(4, 384).astype(np.float32)
    results = setup_db.query_batch(queries, top_k=3)
    assert len(results) == 4
    assert all(len(r) == 3 for r in results)
    # batched results must match per-query results
    for q, batch_res in zip(queries, results):
        single = setup_db.query(q, top_k=3)
        assert [r[2] for r in single] == [r[2] for r in batch_res]


# ---------------------------------------------------------------- cache


def test_cache_miss_and_hit(setup_db):
    setup_db.query("Abra")
    info1 = setup_db.get_cache_size_and_info()["cache_info"]
    assert info1["hits"] == 0 and info1["misses"] == 1
    setup_db.query("Abra")
    info2 = setup_db.get_cache_size_and_info()["cache_info"]
    assert info2["hits"] == 1 and info2["misses"] == 1


def test_change_cache_size(setup_db):
    setup_db.lru_cache = LRUCache(maxsize=128)
    assert setup_db.get_cache_size_and_info()["cache_info"]["maxsize"] == 128


def test_cache_eviction(setup_db):
    setup_db.lru_cache = LRUCache(maxsize=2)
    for i in range(3):
        setup_db.query(f"Query {i}")
    assert setup_db.get_cache_size_and_info()["cache_info"]["currsize"] == 2


def test_cache_clearing_on_add_remove_document():
    db = HyperDB()
    db.add({"text": "Sample document"})
    db.query("Sample query")
    assert db.get_cache_size_and_info()["cache_info"]["currsize"] > 0
    db.add({"text": "Another document"})
    assert db.get_cache_size_and_info()["cache_info"]["currsize"] == 0
    db.query("Another query")
    assert db.get_cache_size_and_info()["cache_info"]["currsize"] > 0
    db.remove_document(0)
    assert db.get_cache_size_and_info()["cache_info"]["currsize"] == 0


# ---------------------------------------------------------------- save/load


def test_save_invalid_format(setup_db, tmp_path):
    with pytest.raises(ValueError):
        setup_db.save(str(tmp_path / "x.xyz"), format="xyz")


@pytest.mark.parametrize("format,suffix", [
    ("pickle", "pkl"), ("json", "json"), ("sqlite", "db"),
])
def test_save_load_roundtrip(setup_db, tmp_path, format, suffix):
    path = str(tmp_path / f"test_save.{suffix}")
    setup_db.save(path, format=format)
    assert os.path.exists(path)

    new_db = HyperDB()
    new_db.load(path, format=format)
    assert new_db.documents == setup_db.documents
    assert np.array_equal(new_db.vectors, setup_db.vectors)
    assert new_db.source_indices == setup_db.source_indices
    assert new_db._metadata_index == setup_db._metadata_index
    assert new_db.split_info == setup_db.split_info


def test_save_load_gzip_pickle(setup_db, tmp_path):
    path = str(tmp_path / "db.pickle.gz")
    setup_db.save(path)
    new_db = HyperDB()
    new_db.load(path)
    assert new_db.documents == setup_db.documents
    assert np.array_equal(new_db.vectors, setup_db.vectors)


# ---------------------------------------------------------------- analytics


def test_compute_and_save_word_frequencies(setup_db, tmp_path):
    path = tmp_path / "word_frequencies.txt"
    setup_db.compute_and_save_word_frequencies(path)
    assert path.exists()
    assert "abra" in path.read_text().lower()


def test_metadata_filter_none_matches_missing_key():
    """Reference parity (hyperdb.py:1246): metadata.get(key) == None is True
    for every document MISSING the key, so a None filter value selects
    exactly those documents."""
    rng = np.random.default_rng(50)
    docs = [{"i": 0, "author": "ada"}, {"i": 1}, {"i": 2, "author": "bob"},
            {"i": 3}]
    db = HyperDB(documents=docs,
                 vectors=rng.standard_normal((4, 8)).astype(np.float32),
                 metadata_keys=["author"])
    res = db.query(rng.standard_normal(8).astype(np.float32), top_k=4,
                   filters=[("metadata", {"author": None})])
    assert sorted(r[0]["i"] for r in res) == [1, 3]


def test_key_filter_empty_subtext_is_zero_vector_not_nan():
    rng = np.random.default_rng(51)
    docs = [{"i": 0, "title": "a real title"}, {"i": 1, "title": ""}]
    db = HyperDB(documents=docs,
                 vectors=rng.standard_normal((2, 384)).astype(np.float32))
    res = db.query(rng.standard_normal(384).astype(np.float32), top_k=2,
                   filters=[("key", "title")])
    assert len(res) == 2
    assert all(np.isfinite(r[1]) or r[1] == float("-inf") for r in res)
    # the empty-title doc's override vector is zeros -> finite score 0-ish,
    # never NaN
    assert not any(np.isnan(r[1]) for r in res)


def test_query_batch_bucketing_pads_pow2_and_slices(monkeypatch):
    """Batch-dim bucketing (HYPERDB_BATCH_BUCKET): a 3-query block reaches
    the device ranker padded to 4 rows (every distinct B is a fresh XLA
    compile — 30-90 s over the remote compiler; serving flushes arbitrary
    group sizes), and the pad rows are sliced off the results, which are
    identical to the unbucketed run."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.query import engine

    rng = np.random.default_rng(77)
    v = rng.standard_normal((256, 32)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(256)], vectors=v)
    q = (v[[3, 9, 200]] + 0.01).astype(np.float32)

    monkeypatch.setattr(CONFIG, "host_path_max_cells", 0)  # force device path
    seen = []
    real = engine._rank_block

    def spy(db_, q_block, *a, **k):
        seen.append(q_block.shape[0])
        return real(db_, q_block, *a, **k)

    monkeypatch.setattr(engine, "_rank_block", spy)
    res = db.query_batch(q, top_k=2)
    assert seen == [4]
    assert len(res) == 3
    assert [row[0][0]["i"] for row in res] == [3, 9, 200]

    monkeypatch.setattr(CONFIG, "batch_bucket", 0)
    seen.clear()
    res_exact = db.query_batch(q, top_k=2)
    assert seen == [3]
    assert [[(r[0]["i"], round(r[1], 5)) for r in row] for row in res] == [
        [(r[0]["i"], round(r[1], 5)) for r in row] for row in res_exact
    ]


def test_warmup_serving_profile():
    """warmup(max_batch=...) precompiles every pow2 flush bucket in every
    wire dtype the server will use (f16 joins for low-precision stores)."""
    import numpy as np

    from hyperdb_tpu import HyperDB

    rng = np.random.default_rng(3)
    v = rng.standard_normal((64, 8)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(64)], vectors=v,
                 fp_precision="float16")
    db.warmup(top_ks=(5,), max_batch=8)
    # smoke: queries answer after warmup, both wire dtypes
    ids, _ = db.query_batch_arrays(v[:3], top_k=5)
    assert ids.shape == (3, 5)
    ids16, _ = db.query_batch_arrays(v[:3].astype(np.float16), top_k=5)
    assert ids16.shape == (3, 5)
