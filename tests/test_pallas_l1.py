"""Pallas manhattan (L1) stage-1 kernel: exactness vs the XLA formulation.

Runs in interpret mode (hermetic on the CPU test mesh); the real Mosaic
lowering, the on-chip A/B, and the routing threshold are exercised by
benchmarks/probe_l1.py and benchmarks/tpu_gate.py (``manhattan_pallas_*``).
"""

import numpy as np

import jax.numpy as jnp

from hyperdb_tpu.ops.pallas_gmax import make_extra
from hyperdb_tpu.ops.pallas_l1 import (
    GROUP,
    L1_GROUP_MARGIN,
    gmax_l1,
    rank_top_k_manhattan_pallas,
    supported,
)


def _ref_gmax_l1(q: np.ndarray, v: np.ndarray, extra: np.ndarray) -> np.ndarray:
    s = -np.abs(v[None, :, :].astype(np.float64)
                - q[:, None, :].astype(np.float64)).sum(-1)
    s = s.astype(np.float32) + extra[None, :]
    b, n = s.shape
    return s.reshape(b, n // GROUP, GROUP).max(axis=-1)


def _oracle_top_k(q, v, k, mask=None, recency=None):
    dist = np.abs(
        v[None, :, :].astype(np.float32) - q[:, None, :].astype(np.float32)
    ).sum(-1)
    s = 1.0 / (1.0 + dist)
    s = np.where(np.isnan(s), -np.inf, s)
    if recency is not None:
        s = s + recency[None, :]
    if mask is not None:
        s = np.where(mask[None, :], s, -np.inf)
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_gmax_l1_matches_reference():
    rng = np.random.default_rng(0)
    b, n, d = 8, 4096, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.9
    extra = make_extra(n, jnp.asarray(mask))
    got = np.asarray(
        gmax_l1(jnp.asarray(q), jnp.asarray(v), extra, interpret=True)
    )
    want = _ref_gmax_l1(q, v, np.asarray(extra))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_gmax_l1_multi_block_and_query_tiles(monkeypatch):
    """n spanning several corpus blocks; b above the query tile, so the
    inner grid dimension revisits each block. The tile width is patched
    down so interpret mode (one python step per query per cell) stays
    fast while still exercising the 2-D grid."""
    import hyperdb_tpu.ops.pallas_l1 as pl1

    monkeypatch.setattr(pl1, "_QBLK_MAX", 16)
    rng = np.random.default_rng(1)
    b, n, d = 32, 32768, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    extra = make_extra(n)
    got = np.asarray(
        gmax_l1(jnp.asarray(q), jnp.asarray(v), extra, interpret=True)
    )
    want = _ref_gmax_l1(q, v, np.asarray(extra))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_gmax_l1_bf16_plane():
    rng = np.random.default_rng(2)
    b, n, d = 8, 4096, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v32 = rng.standard_normal((n, d)).astype(np.float32)
    v = jnp.asarray(v32).astype(jnp.bfloat16)
    got = np.asarray(gmax_l1(jnp.asarray(q), v, make_extra(n), interpret=True))
    want = _ref_gmax_l1(q, np.asarray(v.astype(jnp.float32)), np.zeros(n, np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_gmax_l1_nan_rows_scrub():
    rng = np.random.default_rng(3)
    b, n, d = 8, 4096, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v[100, 5] = np.nan  # its whole group must not go NaN, only that row
    got = np.asarray(
        gmax_l1(jnp.asarray(q), jnp.asarray(v), make_extra(n), interpret=True)
    )
    assert not np.isnan(got).any()
    vv = v.copy()
    vv[100] = 1e9  # push the NaN row to -inf-equivalent: max of the rest
    want = _ref_gmax_l1(q, vv, np.zeros(n, np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_rank_top_k_manhattan_pallas_index_identical():
    rng = np.random.default_rng(4)
    b, n, d, k = 16, 8192, 128, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.8
    vals, idx = rank_top_k_manhattan_pallas(
        jnp.asarray(q), jnp.asarray(v), k=k, row_mask=jnp.asarray(mask),
        interpret=True,
    )
    want_vals, want_idx = _oracle_top_k(q, v, k, mask)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)


def test_gmax_l1_nan_query_bottoms_out():
    """A NaN query scrubs to +inf under the hoisted-scrub contract: every
    distance is +inf, every group max -inf (the reference outcome — all
    its scores would be NaN -> -inf)."""
    rng = np.random.default_rng(9)
    b, n, d = 8, 4096, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    q[3, 7] = np.nan
    v = rng.standard_normal((n, d)).astype(np.float32)
    got = np.asarray(
        gmax_l1(jnp.asarray(q), jnp.asarray(v), make_extra(n), interpret=True)
    )
    assert (got[3] == -np.inf).all()
    assert np.isfinite(got[[0, 1, 2, 4, 5, 6, 7]]).all()


def test_rank_top_k_manhattan_pallas_recency_delegates_to_stream():
    """Recency queries delegate to the streamed XLA route inside the
    wrapper (a true-score in-kernel variant was measured OUT on chip:
    recency compresses group-max gaps below kernel summation noise —
    module note), so time-decay ranking stays oracle-identical."""
    rng = np.random.default_rng(8)
    b, n, d, k = 16, 8192, 128, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    rec = (rng.random(n) * 0.05).astype(np.float32)
    mask = rng.random(n) < 0.9
    vals, idx = rank_top_k_manhattan_pallas(
        jnp.asarray(q), jnp.asarray(v), k=k, row_mask=jnp.asarray(mask),
        recency=jnp.asarray(rec), interpret=True,
    )
    want_vals, want_idx = _oracle_top_k(q, v, k, mask, rec)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(vals), want_vals, rtol=1e-6)


def test_rank_top_k_manhattan_pallas_duplicate_row_ties():
    """Exact ties (duplicated rows across groups) must resolve to the
    lowest row index, matching the oracle's stable order — the containment
    argument's tie clause."""
    rng = np.random.default_rng(5)
    b, n, d, k = 8, 4096, 128, 8
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v[1000] = v[0]  # exact duplicates in different groups
    v[2000] = v[0]
    vals, idx = rank_top_k_manhattan_pallas(
        jnp.asarray(q), jnp.asarray(v), k=k, interpret=True
    )
    want_vals, want_idx = _oracle_top_k(q, v, k)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_rank_top_k_manhattan_pallas_out_of_contract_falls_back():
    """Odd shapes (d % 128 != 0) must serve through the streamed/XLA path
    with identical results, never reach pallas_call."""
    rng = np.random.default_rng(6)
    b, n, d, k = 8, 4096, 96, 5
    assert not supported(b, n, d)
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = rank_top_k_manhattan_pallas(
        jnp.asarray(q), jnp.asarray(v), k=k, interpret=True
    )
    want_vals, want_idx = _oracle_top_k(q, v, k)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_margin_overfetch_bounds():
    """The stage-2 overfetch clamps to the group count on small corpora."""
    rng = np.random.default_rng(7)
    b, n, d = 8, 2048, 128
    k = n // GROUP  # k == g: margin must clamp, not overflow
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    vals, idx = rank_top_k_manhattan_pallas(
        jnp.asarray(q), jnp.asarray(v), k=k, interpret=True
    )
    want_vals, want_idx = _oracle_top_k(q, v, k)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    assert L1_GROUP_MARGIN > 0
