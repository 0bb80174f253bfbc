"""IVF index: recall against the exact oracle, persistence, DB integration."""

import numpy as np
import pytest

import jax.numpy as jnp

import hyperdb_tpu.core.db as dbmod
from hyperdb_tpu import HyperDB
from hyperdb_tpu.index.ivf import IVFIndex
from hyperdb_tpu.ops.ranking import rank_top_k


def _clustered_corpus(n=8000, d=32, n_clusters=50, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 3
    assign = rng.integers(0, n_clusters, size=n)
    return (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)


def test_ivf_build_invariants():
    v = _clustered_corpus()
    index = IVFIndex.build(v, metric="cosine", nlist=64)
    assert index.nlist == 64
    assert sorted(index.row_order.tolist()) == list(range(len(v)))
    assert index.offsets[0] == 0 and index.offsets[-1] == len(v)


def test_ivf_recall_at_10():
    v = _clustered_corpus()
    index = IVFIndex.build(v, metric="cosine", nlist=64)
    rng = np.random.default_rng(1)
    queries = v[rng.choice(len(v), 20)] + 0.1 * rng.standard_normal((20, v.shape[1])).astype(np.float32)

    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    recalls = []
    for q in queries:
        budget = len(v) // 5  # probe ~20%
        cand = index.probe(q, budget)
        oracle_vals, oracle_idx = rank_top_k(
            jnp.asarray(q[None, :]), jnp.asarray(v), k=10, metric="cosine_similarity"
        )
        oracle = set(np.asarray(oracle_idx)[0].tolist())
        recalls.append(len(oracle & set(cand.tolist())) / 10)
    assert np.mean(recalls) >= 0.9, f"mean recall@10 {np.mean(recalls)}"


def test_ivf_probe_budget():
    v = _clustered_corpus(n=2000)
    index = IVFIndex.build(v, metric="euclidean", nlist=32)
    cand = index.probe(v[0], budget=100)
    assert cand.size >= 100  # at least the budget (whole clusters)
    assert cand.size < 2000  # but not everything


def test_ivf_state_roundtrip():
    v = _clustered_corpus(n=1000)
    index = IVFIndex.build(v, metric="cosine", nlist=16)
    state = index.state()
    restored = IVFIndex.from_state(state)
    np.testing.assert_array_equal(restored.row_order, index.row_order)
    np.testing.assert_array_equal(restored.offsets, index.offsets)
    q = v[3]
    np.testing.assert_array_equal(
        np.sort(restored.probe(q, 50)), np.sort(index.probe(q, 50))
    )


def test_db_with_ivf_matches_bruteforce(monkeypatch):
    """Force the IVF path in the DB and check the ANN-path results agree with
    brute force for an easy query (probe budget covers the true cluster)."""
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    v = _clustered_corpus(n=1000, d=16, n_clusters=10)
    docs = [{"i": int(i)} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v)
    assert db.ann_index is not None and db.ann_index.is_ann

    q = v[123]
    ann_results = db.query(q, top_k=5)
    assert ann_results[0][0]["i"] == 123  # exact row must rank first

    # pearson has no ANN mapping -> brute force; both paths must return 5
    bf_results = db.query(q, top_k=5, metric="pearson_correlation")
    assert len(bf_results) == 5 and len(ann_results) == 5


def test_ivf_incremental_add(monkeypatch):
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    v = _clustered_corpus(n=1000, d=16, n_clusters=10)
    docs = [{"i": int(i)} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v)
    built_index = db.ann_index
    assert built_index.num_rows == 1000

    rng = np.random.default_rng(9)
    extra = rng.standard_normal((50, 16)).astype(np.float32) + 40.0  # far cluster
    db.add([{"i": 1000 + j} for j in range(50)], vectors=extra)
    # incremental: same index object, more rows
    assert db.ann_index is built_index
    assert db.ann_index.num_rows == 1050
    # the new far-away doc must be findable through the ANN path
    res = db.query(extra[0], top_k=1)
    assert res[0][0]["i"] == 1000

    # removal forces a rebuild
    db.remove_document(0)
    assert db.ann_index is not built_index


def test_db_ivf_with_filters(monkeypatch):
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    v = _clustered_corpus(n=1000, d=16, n_clusters=10)
    docs = [{"i": int(i), "parity": "even" if i % 2 == 0 else "odd"} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["parity"])
    results = db.query(v[10], top_k=5, filters=[("metadata", {"parity": "even"})])
    assert all(doc["parity"] == "even" for doc, *_ in results)
    assert results[0][0]["i"] == 10
