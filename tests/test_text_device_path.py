"""Device-resident text query path (serving hot path).

The host text path pays two tunnel round trips per flush: the encoder's
embedding readback, then the query block's re-upload. The device path
(query.engine.generate_query_vectors_batch_device) chains the encoder
output into the scan as a device argument — these tests pin its contracts
hermetically on CPU:

- encode_device == encode values, with the pow2-padded batch contract;
- the engine helper gates correctly (custom/hash embedders, chunked long
  texts -> None; default chunk-then-encode pipeline -> device block);
- query results through the device block + n_valid match the host path;
- the _DynamicBatcher all-text flush actually takes the device path.
"""

import threading

import numpy as np
import pytest

import jax

from hyperdb_tpu import HyperDB
from hyperdb_tpu.core import chunker
from hyperdb_tpu.models.embedder import make_embedding_function
from hyperdb_tpu.models.minilm import EncoderConfig, MiniLMEmbedder
from hyperdb_tpu.query import engine

# tiny-but-valid config: the hashing tokenizer emits ids across the full
# BERT vocab range, so vocab_size must stay at the default (out-of-range
# embedding gathers are undefined under XLA)
CFG = EncoderConfig(hidden=64, layers=1, heads=2, intermediate=128)

CORPUS = [
    "alpha beta gamma",
    "delta epsilon zeta",
    "eta theta iota",
    "kappa lambda mu",
    "nu xi omicron",
    "pi rho sigma",
]


@pytest.fixture(scope="module")
def enc():
    return MiniLMEmbedder(config=CFG)


@pytest.fixture(scope="module")
def db(enc):
    ef = make_embedding_function(enc, chunker.default_tokenizer())
    return HyperDB(documents=list(CORPUS), embedding_function=ef)


def test_encode_device_matches_encode(enc):
    texts = ["alpha beta", "gamma", "delta epsilon zeta", "", "eta theta"]
    host = enc.encode(texts)
    dev = enc.encode_device(texts)
    assert isinstance(dev, jax.Array)
    # pow2-padded batch contract: 5 texts -> 8 rows, extras are finite pad
    assert dev.shape == (8, enc.dim)
    got = np.asarray(dev)
    assert np.isfinite(got).all()
    # same bf16 forward, f32 cast on device vs host: tiny rounding slack
    np.testing.assert_allclose(got[:5], host, rtol=2e-2, atol=2e-2)


def test_encode_device_multipart(enc):
    """Blocks past _MAX_BATCH dispatch fixed-size slices and concatenate."""
    texts = [f"word{i} alpha" for i in range(5)]
    host = enc.encode(texts)
    orig = enc._MAX_BATCH
    enc._MAX_BATCH = 2  # instance attr shadows the class attr
    try:
        dev = enc.encode_device(texts)
    finally:
        enc._MAX_BATCH = orig
    assert dev.shape == (8, enc.dim)
    np.testing.assert_allclose(np.asarray(dev)[:5], host, rtol=2e-2, atol=2e-2)


def test_helper_returns_none_for_custom_and_hash(db):
    # hash default embedder (conftest pins HYPERDB_DEFAULT_EMBEDDER=hash)
    v = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    plain = HyperDB(documents=[{"i": i} for i in range(4)], vectors=v)
    assert engine.generate_query_vectors_batch_device(plain, ["a", "b"]) is None

    # custom embedding function without pipeline attrs
    def custom(texts):
        return (np.zeros((len(texts), 8), dtype=np.float32),
                list(range(len(texts))), {})

    custom_db = HyperDB(documents=[{"i": 0}], vectors=v[:1],
                        embedding_function=custom)
    assert (
        engine.generate_query_vectors_batch_device(custom_db, ["a"]) is None
    )

    # long texts that chunk (>510 word tokens) stay on the host path
    long_text = " ".join(f"w{i}" for i in range(600))
    assert (
        engine.generate_query_vectors_batch_device(db, [long_text]) is None
    )


def test_device_block_query_matches_host_path(db):
    queries = list(CORPUS[:3])
    dev = engine.generate_query_vectors_batch_device(db, queries)
    assert isinstance(dev, jax.Array)
    assert dev.shape == (4, 64)  # pow2 pad

    host_block = engine.generate_query_vectors_batch(db, queries)
    ids_h, scores_h = db.query_batch_arrays(host_block, top_k=3)
    ids_d, scores_d = db.query_batch_arrays(dev, top_k=3, n_valid=len(queries))
    assert ids_d.shape == (3, 3)
    # each query text IS a corpus document: top-1 must be itself either way
    np.testing.assert_array_equal(ids_d[:, 0], np.arange(3))
    np.testing.assert_array_equal(ids_h, ids_d)
    np.testing.assert_allclose(scores_h, scores_d, rtol=2e-2, atol=2e-2)

    # tuple-level twin honors n_valid too
    rows = db.query_batch(dev, top_k=2, n_valid=len(queries))
    assert len(rows) == 3
    assert rows[0][0][2] == 0 and rows[1][0][2] == 1


def test_n_valid_slices_host_blocks(db):
    v = np.random.default_rng(1).standard_normal((8, 64)).astype(np.float32)
    full_ids, full_scores = db.query_batch_arrays(v, top_k=2)
    part_ids, part_scores = db.query_batch_arrays(v, top_k=2, n_valid=5)
    np.testing.assert_array_equal(part_ids, full_ids[:5])
    np.testing.assert_array_equal(part_scores, full_scores[:5])


def test_default_embedding_function_takes_device_path(enc):
    """The default chunk-then-encode pipeline (db.get_embedding bound
    method, what serving deployments actually run) gates into the device
    path via db._embedder(), not just make_embedding_function attrs."""
    fresh = HyperDB()
    fresh._embedder_obj = enc  # what default_embedder() would return
    fresh.add(list(CORPUS[:4]))
    assert fresh.embedding_function == fresh.get_embedding
    dev = engine.generate_query_vectors_batch_device(fresh, list(CORPUS[:2]))
    assert isinstance(dev, jax.Array) and dev.shape == (2, 64)
    ids, _ = fresh.query_batch_arrays(dev, top_k=1, n_valid=2)
    np.testing.assert_array_equal(ids[:, 0], [0, 1])


def test_warmup_text_covers_both_embedder_kinds(db):
    """text_max_batch warms the encoder device programs (MiniLM db) and the
    host fallback (hash db) without error; queries still work after."""
    db.warmup(top_ks=(2,), batch_sizes=(1,), text_max_batch=2,
              text_seq_tokens=(4,))
    v = np.random.default_rng(2).standard_normal((4, 8)).astype(np.float32)
    plain = HyperDB(documents=[{"i": i} for i in range(4)], vectors=v)
    plain.warmup(top_ks=(2,), batch_sizes=(1,), text_max_batch=2,
                 text_seq_tokens=(4,))
    assert len(db.query(CORPUS[0], top_k=1)) == 1


def test_batcher_all_text_flush_takes_device_path(db, monkeypatch):
    from hyperdb_tpu.server import _DynamicBatcher

    calls = {"device": 0, "host": 0}
    real_dev = engine.generate_query_vectors_batch_device
    real_host = engine.generate_query_vectors_batch

    def spy_dev(d, texts):
        calls["device"] += 1
        return real_dev(d, texts)

    def spy_host(d, texts):
        calls["host"] += 1
        return real_host(d, texts)

    monkeypatch.setattr(engine, "generate_query_vectors_batch_device", spy_dev)
    monkeypatch.setattr(engine, "generate_query_vectors_batch", spy_host)

    batcher = _DynamicBatcher(db, threading.Lock(), max_batch=3, window_ms=50)
    try:
        results = [None] * 3
        threads = []
        for i in range(3):
            def run(i=i):
                results[i] = batcher.submit(
                    None, 2, "cosine_similarity", None, 0.0, None,
                    text=CORPUS[i],
                )
            t = threading.Thread(target=run)
            t.start()
            threads.append(t)
        for t in threads:
            t.join(timeout=30)
        assert calls["device"] >= 1 and calls["host"] == 0
        for i, rows in enumerate(results):
            assert rows is not None and len(rows) == 2
            assert rows[0][2] == i  # top-1 is the query's own document
    finally:
        batcher.close()
