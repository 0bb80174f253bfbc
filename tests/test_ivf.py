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


@pytest.mark.parametrize(
    "ann_metric,metric",
    [
        ("dot", "dot_product"),
        ("euclidean", "euclidean_metric"),
        ("hamming", "hamming_distance"),
    ],
)
def test_db_ivf_non_cosine_metrics(monkeypatch, ann_metric, metric):
    """The IVF gather fast path must score with the QUERY metric (regression:
    rank_gathered once dropped the metric argument and raised TypeError for
    every non-prenormalized metric on the ANN path)."""
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    v = np.abs(_clustered_corpus(n=1000, d=16, n_clusters=10))
    docs = [{"i": int(i)} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v, ann_metric=ann_metric)
    assert db.ann_index is not None and db.ann_index.is_ann

    results = db.query(v[42], top_k=5, metric=metric)
    assert len(results) == 5
    if metric == "euclidean_metric":  # self-distance 0 -> similarity 1 is max
        assert results[0][0]["i"] == 42
    # scores must be the metric's exact similarities, not another metric's
    from hyperdb_tpu.ops.metrics import scores as metric_scores

    expect = np.asarray(
        metric_scores(
            jnp.asarray(v[42][None, :]), jnp.asarray(v), metric
        )
    )[0]
    for doc, score, doc_id in results:
        np.testing.assert_allclose(score, expect[doc_id], rtol=1e-4)


def test_query_batch_ivf_non_cosine(monkeypatch):
    """Batched IVF path with a dot index (same regression, batched shape)."""
    from hyperdb_tpu.config import CONFIG

    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    monkeypatch.setattr(CONFIG, "batch_ivf_min_rows", 500)
    v = _clustered_corpus(n=1500, d=16, n_clusters=10)
    docs = [{"i": int(i)} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v, ann_metric="dot")
    res = db.query_batch(
        v[:4].astype(np.float32), top_k=5, metric="dot_product", ann_percent=20
    )
    assert all(len(row) == 5 for row in res)
    # returned scores must be exact dot products of the query with the rows
    for b, row in enumerate(res):
        expect = v @ v[b]
        for doc, score, doc_id in row:
            np.testing.assert_allclose(score, expect[doc_id], rtol=1e-4)


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


def test_probe_batch_matches_per_query_probe():
    """The batched probe's per-query valid set equals single-query probe()."""
    v = _clustered_corpus(n=3000, d=16, n_clusters=20)
    index = IVFIndex.build(v, metric="cosine", nlist=32)
    rng = np.random.default_rng(7)
    q_block = v[rng.choice(len(v), 8)].astype(np.float32)
    budget = 200
    cand_ids, valid = index.probe_batch(q_block, budget)
    assert valid.shape == (8, cand_ids.size)
    for b in range(8):
        single = set(index.probe(q_block[b], budget).tolist())
        batched = set(cand_ids[valid[b]].tolist())
        assert batched == single


def test_query_batch_ivf_matches_bruteforce(monkeypatch):
    from hyperdb_tpu.config import CONFIG

    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    monkeypatch.setattr(CONFIG, "batch_ivf_min_rows", 500)
    v = _clustered_corpus(n=2000, d=16, n_clusters=10)
    docs = [{"i": int(i)} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v)
    assert db.ann_index is not None

    rng = np.random.default_rng(3)
    q_block = (v[rng.choice(len(v), 6)] + 0.01).astype(np.float32)
    ivf_res = db.query_batch(q_block, top_k=5, ann_percent=30)

    monkeypatch.setattr(CONFIG, "batch_ivf_min_rows", 10**9)  # force brute force
    bf_res = db.query_batch(q_block, top_k=5)
    recalls = []
    for ivf_row, bf_row in zip(ivf_res, bf_res):
        ivf_ids = {r[2] for r in ivf_row}
        bf_by_id = {r[2]: r[1] for r in bf_row}
        recalls.append(len(ivf_ids & set(bf_by_id)) / 5)
        # candidates are re-scored EXACTLY: shared ids must agree on score
        for doc, score, doc_id in ivf_row:
            if doc_id in bf_by_id:
                np.testing.assert_allclose(score, bf_by_id[doc_id], rtol=1e-5)
    assert np.mean(recalls) >= 0.9, f"mean recall@5 {np.mean(recalls)}"


def test_query_batch_ivf_filter_fallback(monkeypatch):
    """A metadata filter that shrinks a query's candidate set below top_k must
    fall back to the exact scan for that query (batched Q13 analogue)."""
    from hyperdb_tpu.config import CONFIG

    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    monkeypatch.setattr(CONFIG, "batch_ivf_min_rows", 500)
    v = _clustered_corpus(n=2000, d=16, n_clusters=10)
    docs = [
        {"i": int(i), "rare": "yes" if i % 400 == 0 else "no"}
        for i in range(len(v))
    ]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["rare"])
    res = db.query_batch(
        v[:4].astype(np.float32), top_k=3, filters=[("metadata", {"rare": "yes"})]
    )
    for row in res:
        assert len(row) == 3
        assert all(doc["rare"] == "yes" for doc, *_ in row)
        assert all(np.isfinite(score) for _, score, _ in row)


def test_query_batch_ivf_recency(monkeypatch):
    from hyperdb_tpu.config import CONFIG

    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 500)
    monkeypatch.setattr(CONFIG, "batch_ivf_min_rows", 500)
    v = _clustered_corpus(n=1500, d=16, n_clusters=10)
    docs = [{"i": int(i), "ts": float(i)} for i in range(len(v))]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["ts"])
    res = db.query_batch(
        v[:2].astype(np.float32), top_k=5, recency_bias=5.0, timestamp_key="ts"
    )
    # heavy recency bias must drag the newest doc (largest ts) into the top-k
    top_ids = {r[2] for row in res for r in row}
    assert (len(v) - 1) in top_ids


def test_build_with_device_rows_matches_host_build_recall():
    """The device-resident build path (store view reuse — no corpus
    re-upload) must produce an index of the same quality as the host build;
    with identical seed/sample the centroids come from the same row ids."""
    import jax.numpy as jnp

    from hyperdb_tpu.index.ivf import IVFIndex

    rng = np.random.default_rng(5)
    n, d = 4096, 32
    centers = rng.standard_normal((32, d)).astype(np.float32) * 3
    v = (centers[rng.integers(0, 32, size=n)]
         + rng.standard_normal((n, d)).astype(np.float32))

    host_ix = IVFIndex.build(v, metric="cosine", nlist=64)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    dev_rows = jnp.asarray((v / norms).astype(np.float16))  # store-view dtype
    dev_ix = IVFIndex.build(v, metric="cosine", nlist=64, device_rows=dev_rows)

    q = centers[3] + rng.standard_normal(d).astype(np.float32)
    budget = 400
    got_h = set(host_ix.probe(q, budget).tolist())
    got_d = set(dev_ix.probe(q, budget).tolist())
    qn = q / np.linalg.norm(q)
    oracle = set(np.argsort(-((v / norms) @ qn))[:10].tolist())
    assert len(got_h & oracle) / 10 >= 0.9
    assert len(got_d & oracle) / 10 >= 0.9
    assert dev_ix.num_rows == n and dev_ix.normalized


def test_ivf_is_opt_in_by_default():
    """The exact scan is the default at every corpus size: on TPU the IVF
    probe + scattered gather loses to the contiguous full scan in every
    measured regime (results.jsonl single_query_ivf_vs_exact: 164 ms vs
    59 ms per query at 1M rows; ivf_crossover: 30-480x batched). The env
    knob re-enables the build (config.py:ivf_threshold)."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.index.flat import FlatIndex

    assert CONFIG.ivf_threshold == 1 << 62
    rng = np.random.default_rng(0)
    db = HyperDB(
        documents=[{"i": int(i)} for i in range(70_000)],
        vectors=rng.standard_normal((70_000, 8)).astype(np.float32),
    )
    assert isinstance(db.ann_index, FlatIndex)
    assert not getattr(db.ann_index, "is_ann", False)
