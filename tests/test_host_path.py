"""Host fast-path vs device-path result equality.

The engine ranks tiny corpora on the host (ops/host_ranking) to dodge the
per-call device round trip; these tests pin that the host path is
result-identical to the device path across metrics, chunking, filters,
recency, key-filter overrides, and batches. The rest of the suite runs with
the host path disabled (tests/conftest.py) so device kernels keep coverage.
"""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.config import CONFIG
from hyperdb_tpu.ops.metrics import METRICS


def _both_paths(monkeypatch, db, *args, **kwargs):
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 0)
    db.clear_cache()
    device = db.query(*args, **kwargs)
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 1 << 30)
    db.clear_cache()
    host = db.query(*args, **kwargs)
    return host, device


def _assert_same(host, device, tol=1e-4):
    assert len(host) == len(device)
    h_scores = [r[1] for r in host]
    d_scores = [r[1] for r in device]
    np.testing.assert_allclose(h_scores, d_scores, rtol=tol, atol=tol)
    # ids must agree except across exact score ties (recency+ANN queries
    # return (doc, score) 2-tuples — Q4 — so compare docs there)
    for h, d in zip(host, device):
        h_id = h[2] if len(h) > 2 else id(h[0])
        d_id = d[2] if len(d) > 2 else id(d[0])
        if h_id != d_id:
            assert abs(h[1] - d[1]) <= tol


@pytest.mark.parametrize("metric", METRICS)
def test_host_matches_device_all_metrics(monkeypatch, metric):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((300, 24)).astype(np.float32)
    docs = [{"i": int(i)} for i in range(300)]
    db = HyperDB(documents=docs, vectors=v)
    host, device = _both_paths(monkeypatch, db, v[17], top_k=7, metric=metric)
    _assert_same(host, device)


def test_host_matches_device_chunked(monkeypatch):
    rng = np.random.default_rng(1)
    db = HyperDB()
    for i in range(50):
        c = int(rng.integers(1, 4))
        db.add_document(
            {"i": int(i)}, vectors=rng.standard_normal((c, 16)).astype(np.float32)
        )
    db.commit_pending()
    db._build_ann_index()
    q = rng.standard_normal(16).astype(np.float32)
    host, device = _both_paths(monkeypatch, db, q, top_k=9)
    _assert_same(host, device)


def test_host_matches_device_filters_and_recency(monkeypatch):
    rng = np.random.default_rng(2)
    v = rng.standard_normal((200, 16)).astype(np.float32)
    docs = [
        {"i": int(i), "grp": "a" if i % 3 == 0 else "b", "ts": float(i)}
        for i in range(200)
    ]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["grp", "ts"])
    host, device = _both_paths(
        monkeypatch, db, v[5], top_k=5,
        filters=[("metadata", {"grp": "a"}), ("skip_doc", 3)],
        recency_bias=0.5, timestamp_key="ts",
    )
    _assert_same(host, device)
    assert all(doc["grp"] == "a" for doc, *_ in host)


def test_host_matches_device_key_filter(monkeypatch):
    docs = [
        {"name": f"critter {i}", "info": {"desc": f"likes thing {i % 5}"}}
        for i in range(40)
    ]
    db = HyperDB(documents=docs)
    host, device = _both_paths(
        monkeypatch, db, "likes thing 3", top_k=4,
        filters=[("key", ["info.desc"])],
    )
    _assert_same(host, device)


def test_host_matches_device_batched(monkeypatch):
    rng = np.random.default_rng(3)
    v = rng.standard_normal((400, 16)).astype(np.float32)
    docs = [{"i": int(i)} for i in range(400)]
    db = HyperDB(documents=docs, vectors=v)
    q_block = v[:6] + 0.01

    monkeypatch.setattr(CONFIG, "host_path_max_cells", 0)
    device = db.query_batch(q_block, top_k=5)
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 1 << 30)
    host = db.query_batch(q_block, top_k=5)
    for h_row, d_row in zip(host, device):
        _assert_same(h_row, d_row)


def test_host_path_engages_by_cells(monkeypatch):
    """Below the cell cap the engine never touches the device view."""
    rng = np.random.default_rng(4)
    v = rng.standard_normal((100, 8)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(100)], vectors=v)
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 10_000)
    res = db.query(v[3], top_k=3)
    assert res[0][0]["i"] == 3
    assert db._store._device is None  # device view never built

    # a batch that overflows the cap routes to the device
    db.query_batch(v[:20], top_k=3)  # 100 rows * 20 queries > 10_000 cells... not
    # 2000 cells <= 10000: still host
    assert db._store._device is None
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 50)
    db.clear_cache()
    db.query(v[3], top_k=3)
    assert db._store._device is not None  # now the device path ran


def test_host_top_k_boundary_tie_order_matches_lax():
    """argpartition's arbitrary boundary subset must be repaired: lax.top_k
    keeps the LOWEST indices among scores tied at the k-th value."""
    import jax.numpy as jnp
    import jax

    from hyperdb_tpu.ops.host_ranking import host_top_k

    rng = np.random.default_rng(0)
    for trial in range(5):
        s = rng.integers(0, 5, size=(3, 151)).astype(np.float32)
        k = 10
        hv, hi = host_top_k(s, k)
        lv, li = jax.lax.top_k(jnp.asarray(s), k)
        np.testing.assert_array_equal(hi, np.asarray(li))
        np.testing.assert_allclose(hv, np.asarray(lv))


def test_f64_host_path_keeps_master_precision(monkeypatch):
    """f64 corpora rank on the host at FULL f64 precision (ADVICE r2): the
    NumPy reference scores f64 masters in f64, and a f32 downcast loses
    low-order score bits. Compare against an independent f64 computation."""
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 1 << 30)
    rng = np.random.default_rng(7)
    base = rng.standard_normal(32).astype(np.float64)
    # corpus rows whose scores differ only below f32 resolution: a f32
    # master downcast would collapse them to identical scores
    v = np.stack([base, base * (1.0 + 1e-12) + 1e-13, -base])
    docs = [{"i": i} for i in range(3)]
    db = HyperDB(documents=docs, vectors=v, fp_precision="float64")
    hv = db._store.host_view()
    assert hv["rows"].dtype == np.float64
    assert hv["rows_norm"].dtype == np.float64

    res = db.query(base, top_k=3, metric="dot_product")
    scores = np.array([r[1] for r in res])
    # queries are canonicalized to f32 at the engine boundary (cache keys,
    # device-path parity) — the contract here is that the CORPUS keeps its
    # f64 bits: scores must match a f64 reference computed with the same
    # f32-rounded query, bit-tight, and preserve the sub-f32 row ordering.
    q32 = base.astype(np.float32).astype(np.float64)
    expected = np.sort(v @ q32)[::-1]
    np.testing.assert_allclose(scores, expected, rtol=1e-12)
    assert [r[2] for r in res] == [1, 0, 2]  # row 1 wins only in f64
