"""Pearson big-batch fast path: the centered unit-norm device plane
(store.pearson_view) makes pearson a dot_product, so large unchunked scans
ride the grouped / Pallas kernels instead of materializing (B, N) scores
(query/engine.py pearson branch). These tests pin:

- engine results identical to the materialized pearson_scores fallback
  (indices exact, scores to fp tolerance), single and batched, with
  metadata filters and recency;
- the reference's constant-vector contract (ranking_algorithm.py:107-111):
  constant corpus rows / constant queries become NaN operands that every
  ranking kernel scrubs to -inf — never ranked;
- plane lifecycle: lazily built, cached on the device view, rebuilt after
  mutation; bf16 for f16 masters (Mosaic low-precision contract);
- the Pallas gmax route tolerates NaN plane rows (interpret mode).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hyperdb_tpu import HyperDB
from hyperdb_tpu.config import CONFIG


def _np_pearson(q, v):
    q = q.astype(np.float64)
    v = v.astype(np.float64)
    qc = q - q.mean()
    vc = v - v.mean(axis=1, keepdims=True)
    den = np.linalg.norm(qc) * np.linalg.norm(vc, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = (vc @ qc) / den
    r[den == 0] = np.nan
    return r


def _make_db(rng, n=3000, d=16, dtype=np.float32, constant_row=7):
    v = rng.standard_normal((n, d)).astype(dtype)
    if constant_row is not None:
        v[constant_row] = 3.25  # constant row: pearson NaN (never ranked)
    docs = [
        {"i": int(i), "grp": ["a", "b", "c"][i % 3], "ts": float(i % 50)}
        for i in range(n)
    ]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["grp", "ts"])
    return db, v


class TestPearsonGroupedPath:
    def test_engine_matches_fallback_and_builds_plane(self, monkeypatch):
        rng = np.random.default_rng(21)
        db, v = _make_db(rng)
        q = rng.standard_normal(16).astype(np.float32)
        baseline = db.query(q, top_k=8, metric="pearson_correlation")

        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        db.clear_cache()
        grouped = db.query(q, top_k=8, metric="pearson_correlation")
        assert [r[2] for r in grouped] == [r[2] for r in baseline]
        for (_, gs, _), (_, bs, _) in zip(grouped, baseline):
            assert abs(gs - bs) < 1e-5
        # the route actually fired: the plane is cached on the device view
        dv = db._store.device_view(db.source_indices)
        assert "rows_pearson" in dv
        # and the constant row never surfaces
        assert 7 not in [r[2] for r in grouped]
        # scores are true pearson values
        oracle = _np_pearson(q, v)
        for _, gs, di in grouped:
            assert abs(gs - oracle[di]) < 1e-4

    def test_batched_filter_and_recency_match_fallback(self, monkeypatch):
        rng = np.random.default_rng(22)
        db, _ = _make_db(rng)
        qs = rng.standard_normal((4, 16)).astype(np.float32)

        def run():
            db.clear_cache()
            flt = db.query_batch(
                qs, top_k=6, metric="pearson_correlation",
                filters=[("metadata", {"grp": "b"})],
            )
            rec = db.query_batch(
                qs, top_k=6, metric="pearson_correlation",
                recency_bias=0.5, timestamp_key="ts",
            )
            return flt, rec

        base_flt, base_rec = run()
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        g_flt, g_rec = run()
        for base, got in ((base_flt, g_flt), (base_rec, g_rec)):
            for b_row, g_row in zip(base, got):
                assert [r[-1] for r in g_row] == [r[-1] for r in b_row]
                for br, gr in zip(b_row, g_row):
                    assert abs(br[1] - gr[1]) < 1e-5
        for row in g_flt:  # filter respected on the fast path
            assert all(r[0]["grp"] == "b" for r in row)

    def test_constant_query_never_ranks_finite(self, monkeypatch):
        rng = np.random.default_rng(23)
        db, _ = _make_db(rng)
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        res = db.query(
            np.full(16, 2.0, dtype=np.float32), top_k=5,
            metric="pearson_correlation",
        )
        # reference: constant query -> every score NaN -> -inf; the engine
        # still returns top_k rows (arbitrary ids) carrying -inf
        assert len(res) == 5
        assert all(r[1] == -np.inf for r in res)

    def test_f16_master_gets_bf16_plane(self, monkeypatch):
        rng = np.random.default_rng(24)
        v = rng.standard_normal((2048, 16)).astype(np.float16)
        docs = [{"i": int(i)} for i in range(2048)]
        db = HyperDB(documents=docs, vectors=v, fp_precision="float16")
        q = rng.standard_normal(16).astype(np.float32)
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        res = db.query(q, top_k=5, metric="pearson_correlation")
        dv = db._store.device_view(db.source_indices)
        assert dv["rows_pearson"].dtype == jnp.bfloat16
        # bf16 plane still tracks the f64 oracle to low precision
        oracle = _np_pearson(q, v.astype(np.float32))
        for _, s, di in res:
            assert abs(s - oracle[di]) < 2e-2

    def test_mutation_rebuilds_plane(self, monkeypatch):
        rng = np.random.default_rng(25)
        db, _ = _make_db(rng, n=2048)
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        q = rng.standard_normal(16).astype(np.float32)
        db.query(q, top_k=3, metric="pearson_correlation")  # plane cached
        new_v = q / np.linalg.norm(q)  # best pearson match by construction
        db.add_document({"i": 2048, "grp": "a", "ts": 0.0}, vectors=new_v)
        db.commit_pending()
        db.clear_cache()
        res = db.query(q, top_k=3, metric="pearson_correlation")
        assert res[0][2] == 2048

    def test_int8_store_rides_float_pearson_plane(self, monkeypatch):
        """device_precision='int8' keeps the full-precision host master, so
        pearson builds its plane from it and rides the grouped dot route
        (int8 fast paths cover only dot/cosine; pearson must not regress
        to the materialized fallback silently — or worse, crash)."""
        rng = np.random.default_rng(27)
        v = rng.standard_normal((2048, 16)).astype(np.float32)
        db = HyperDB(
            documents=[{"i": int(i)} for i in range(2048)], vectors=v,
            device_precision="int8",
        )
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        q = rng.standard_normal(16).astype(np.float32)
        res = db.query(q, top_k=5, metric="pearson_correlation")
        oracle = _np_pearson(q, v)
        want = np.argsort(-oracle)[:5].tolist()
        assert [r[2] for r in res] == want
        dv = db._store.device_view(db.source_indices)
        assert "rows_pearson" in dv

    def test_multi_metric_warmup_prebuilds_planes(self, monkeypatch):
        """warmup(metric=tuple) must build each metric's device plane off
        the serving path (pearson's centered plane, hamming's binarized
        plane are full-corpus uploads on first use otherwise)."""
        rng = np.random.default_rng(28)
        v = rng.standard_normal((2048, 16)).astype(np.float32)
        db = HyperDB(
            documents=[{"i": int(i)} for i in range(2048)], vectors=v
        )
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 1024)
        db.warmup(
            top_ks=(5,), batch_sizes=(4,),
            metric=("pearson_correlation", "hamming_distance"),
        )
        dv = db._store.device_view(db.source_indices)
        assert "rows_pearson" in dv
        assert "rows_bin" in dv

    def test_device_query_transform_nan_contract(self):
        from hyperdb_tpu.query.engine import _pearson_rows_dev

        rng = np.random.default_rng(26)
        q = rng.standard_normal((3, 16)).astype(np.float32)
        q[1] = 7.0  # constant row
        t = np.asarray(_pearson_rows_dev(jnp.asarray(q), np.dtype(np.float32)))
        assert np.isnan(t[1]).all()
        for i in (0, 2):
            qc = q[i] - q[i].mean()
            np.testing.assert_allclose(
                t[i], qc / np.linalg.norm(qc), rtol=1e-5, atol=1e-6
            )


def test_pallas_gmax_scrubs_nan_plane_rows():
    """The Pallas stage-1 route must honor the NaN->-inf contract the
    pearson plane relies on (constant corpus rows are NaN rows)."""
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas

    rng = np.random.default_rng(27)
    v = rng.standard_normal((1024, 128)).astype(np.float32)
    v[33] = np.nan
    v[900] = np.nan
    q = rng.standard_normal((8, 128)).astype(np.float32)
    vals, idx = rank_top_k_grouped_pallas(
        jnp.asarray(q), jnp.asarray(v), k=8, interpret=True
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert np.isfinite(vals).all()
    assert 33 not in idx and 900 not in idx
    # and the non-NaN rows rank exactly like the XLA oracle
    s = q.astype(np.float64) @ v.astype(np.float64).T
    s = np.where(np.isnan(s), -np.inf, s)
    oi = np.argsort(-s, axis=1, kind="stable")[:, :8]
    np.testing.assert_array_equal(idx, oi)
