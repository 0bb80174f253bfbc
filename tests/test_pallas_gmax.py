"""Pallas grouped-max scan kernel: exactness vs the XLA formulation.

Runs in interpret mode (hermetic on the CPU test mesh); the real Mosaic
lowering is exercised by the TPU benchmarks (benchmarks/ab_gmax.py).
"""

import numpy as np

import jax.numpy as jnp

from hyperdb_tpu.ops.pallas_gmax import (
    GROUP,
    gmax_f,
    gmax_int8,
    make_extra,
    supported,
)
from hyperdb_tpu.ops.quantized import _quantize_device, quantize_rows


def _ref_gmax(s: np.ndarray) -> np.ndarray:
    b, n = s.shape
    return s.reshape(b, n // GROUP, GROUP).max(axis=-1)


def test_gmax_f_matches_xla():
    rng = np.random.default_rng(0)
    b, n, d = 8, 4096, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.9
    rec = (rng.random(n) * 0.1).astype(np.float32)
    extra = make_extra(n, jnp.asarray(mask), jnp.asarray(rec))
    got = np.asarray(gmax_f(jnp.asarray(q), jnp.asarray(v), extra, interpret=True))
    s = q @ v.T + np.asarray(extra)[None, :]
    np.testing.assert_allclose(got, _ref_gmax(s), rtol=1e-5, atol=1e-5)


def test_gmax_f_multi_block():
    """n larger than one kernel block: the grid walks corpus blocks."""
    rng = np.random.default_rng(1)
    b, n, d = 8, 16384, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    extra = make_extra(n)
    got = np.asarray(gmax_f(jnp.asarray(q), jnp.asarray(v), extra, interpret=True))
    np.testing.assert_allclose(got, _ref_gmax(q @ v.T), rtol=1e-5, atol=1e-5)


def test_gmax_int8_matches_xla():
    rng = np.random.default_rng(2)
    b, n, d = 8, 8192, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v_i8, v_sc = quantize_rows(v)
    q_i8, q_sc = _quantize_device(jnp.asarray(q))
    mask = rng.random(n) < 0.8
    extra = make_extra(n, jnp.asarray(mask))
    got = np.asarray(
        gmax_int8(
            q_i8, q_sc, jnp.asarray(v_i8), jnp.asarray(v_sc), extra,
            interpret=True,
        )
    )
    s = (
        np.asarray(q_i8, dtype=np.float32) @ v_i8.T.astype(np.float32)
    ) * (np.asarray(q_sc)[:, None] * v_sc[None, :]) + np.asarray(extra)[None, :]
    np.testing.assert_allclose(got, _ref_gmax(s), rtol=1e-5, atol=1e-4)


def test_supported_gate():
    assert supported(256, 1 << 20, 384)
    assert not supported(7, 1 << 20, 384)  # batch not sublane-aligned
    assert not supported(256, 1 << 20, 100)  # d not lane-aligned
    assert not supported(256, 12345, 384)  # n not block-divisible


def test_pipeline_dot_index_identical():
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    rng = np.random.default_rng(5)
    b, n, d, k = 8, 8192, 128, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.9
    rec = (rng.random(n) * 0.05).astype(np.float32)
    pv, pi = rank_top_k_grouped_pallas(
        jnp.asarray(q), jnp.asarray(v), k,
        row_mask=jnp.asarray(mask), recency=jnp.asarray(rec), interpret=True,
    )
    xv, xi = rank_top_k_grouped(
        jnp.asarray(q), jnp.asarray(v), k,
        row_mask=jnp.asarray(mask), recency=jnp.asarray(rec), group=GROUP,
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5)


def test_pipeline_int8_index_identical():
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_int8_pallas
    from hyperdb_tpu.ops.quantized import rank_top_k_int8

    rng = np.random.default_rng(6)
    b, n, d, k = 8, 8192, 128, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v_i8, v_sc = quantize_rows(v)
    mask = rng.random(n) < 0.9
    pv, pi = rank_top_k_int8_pallas(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(v_sc), k,
        row_mask=jnp.asarray(mask), interpret=True,
    )
    xv, xi = rank_top_k_int8(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(v_sc), k=k,
        row_mask=jnp.asarray(mask),
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5)


def test_wrappers_fall_back_on_out_of_contract_shapes():
    """Shapes outside the kernel contract (few groups vs k, f32 precision,
    odd row counts) must degrade to the exact XLA path, not crash."""
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import (
        rank_top_k_grouped_pallas,
        rank_top_k_int8_pallas,
    )
    from hyperdb_tpu.ops.quantized import quantize_rows

    rng = np.random.default_rng(0)
    # n//128 < k: selection would be impossible in the kernel form
    n, d, k = 1024, 128, 64
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    vals, idx = rank_top_k_grouped_pallas(jnp.asarray(q), jnp.asarray(v), k=k)
    s = v @ q.T
    want = np.argsort(-s, axis=0, kind="stable")[:k].T
    assert (np.asarray(idx) == want).all()

    v_i8, sc = quantize_rows(v)
    vals8, idx8 = rank_top_k_int8_pallas(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(sc), k=k
    )
    s8 = (v_i8.astype(np.float32) * sc[:, None]) @ np.asarray(
        np.clip(np.rint(q / (np.abs(q).max(axis=1, keepdims=True) / 127.0)),
                -127, 127)
    ).T
    # score-level agreement is enough (quantized ties); shape must be full k
    assert np.asarray(idx8).shape == (8, k)
    assert np.isfinite(np.asarray(vals8)).all()


def test_gmax_query_tiled_grid(monkeypatch):
    """Batches above _QBLK_MAX split over the inner query-tile grid
    dimension (VERDICT r3 #3 — removes the b<=1024 cap). Shrink the tile
    height so the multi-tile path runs hermetically."""
    from hyperdb_tpu.ops import pallas_gmax as pg

    monkeypatch.setattr(pg, "_QBLK_MAX", 16)
    rng = np.random.default_rng(5)
    b, n, d = 64, 8192, 128  # 4 query tiles x 2 corpus blocks
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.9
    extra = make_extra(n, jnp.asarray(mask))
    assert pg.supported(b, n, d)
    got = np.asarray(
        pg.gmax_f(jnp.asarray(q), jnp.asarray(v), extra, interpret=True)
    )
    s = q @ v.T + np.asarray(extra)[None, :]
    np.testing.assert_allclose(got, _ref_gmax(s), rtol=1e-5, atol=1e-5)

    # int8 variant through the same tiled grid
    v_i8, v_sc = quantize_rows(v)
    q_i8, q_sc = _quantize_device(jnp.asarray(q))
    got8 = np.asarray(
        pg.gmax_int8(q_i8, q_sc, jnp.asarray(v_i8), jnp.asarray(v_sc),
                     extra, interpret=True)
    )
    s8 = (
        np.asarray(q_i8, np.float32) @ np.asarray(v_i8, np.float32).T
        * (np.asarray(q_sc)[:, None] * np.asarray(v_sc)[None, :])
        + np.asarray(extra)[None, :]
    )
    np.testing.assert_allclose(got8, _ref_gmax(s8), rtol=1e-4, atol=1e-4)


def test_supported_tiled_batches():
    """b=2048 is in contract when divisible into full query tiles."""
    assert supported(2048, 1 << 20, 768)
    assert supported(1024, 1 << 20, 768)
    assert not supported(1536, 1 << 20, 768)  # not a multiple of 1024


def test_float_route_gate(monkeypatch):
    """rank_top_k routes big-batch bf16 dot-form scans through the Pallas
    stage 1 only when every kernel contract holds (ops/ranking.
    _use_pallas_gmax_f) — the decision logic is hermetic even though the
    kernel itself needs a TPU."""
    import jax

    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import ranking as rk

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    n, d = 1 << 20, 384
    v16 = jnp.zeros((n, d), dtype=jnp.bfloat16)
    q = jnp.zeros((512, d), dtype=jnp.bfloat16)
    assert rk._use_pallas_gmax_f(q, v16, 10)
    assert rk._use_pallas_gmax_f(jnp.zeros((2048, d), jnp.bfloat16), v16, 10)

    # below the measured crossover XLA fuses the epilogue and wins
    assert not rk._use_pallas_gmax_f(jnp.zeros((256, d), jnp.bfloat16), v16, 10)
    # f32 corpora need HIGHEST-precision matmuls the kernel won't request
    assert not rk._use_pallas_gmax_f(
        jnp.zeros((512, d), jnp.float32), jnp.zeros((n, d), jnp.float32), 10
    )
    # Mosaic has no f16
    assert not rk._use_pallas_gmax_f(
        jnp.zeros((512, d), jnp.float16), jnp.zeros((n, d), jnp.float16), 10
    )
    # ... and an f16 QUERY wire against a bf16 plane keeps dot_precision at
    # DEFAULT, so the operand check must refuse it too (advisor r3, high:
    # this combination compiled the route and crashed Mosaic at serve time)
    assert not rk._use_pallas_gmax_f(jnp.zeros((2048, d), jnp.float16), v16, 10)
    # the per-shard wire cast repairs exactly that combination
    from hyperdb_tpu.parallel.distributed import _match_wire_dtype

    assert _match_wire_dtype(
        jnp.zeros((4, d), jnp.float16), v16
    ).dtype == jnp.bfloat16
    # f32 wires are the caller's precision decision — untouched
    assert _match_wire_dtype(
        jnp.zeros((4, d), jnp.float32), v16
    ).dtype == jnp.float32
    # config off switches
    monkeypatch.setattr(CONFIG, "pallas_gmax_f_min_batch", 0)
    assert not rk._use_pallas_gmax_f(q, v16, 10)
    monkeypatch.setattr(CONFIG, "pallas_gmax_f_min_batch", 512)
    monkeypatch.setattr(CONFIG, "pallas_gmax", 0)
    assert not rk._use_pallas_gmax_f(q, v16, 10)

    # CPU backend (the hermetic suite itself) never routes
    monkeypatch.undo()
    assert not rk._use_pallas_gmax_f(q, v16, 10)


def test_metric_surrogate_pipeline_index_identical(monkeypatch):
    """rank_top_k_grouped_metric_pallas (surrogate stage 1 on the dot-form
    kernel + true-metric stage 3; true-score kernel for jaccard) matches
    the XLA epilogue formulation for euclidean/hamming/jaccard, incl.
    masks and multi-block grids, in interpret mode.

    Rows are the bf16 device plane (the engine layout — f32 rows fail the
    kernel's DEFAULT-precision gate and would vacuously compare the XLA
    form to itself); the kernel branch is asserted to actually run.
    """
    from hyperdb_tpu.ops import pallas_gmax as pg
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped_metric

    rng = np.random.default_rng(9)
    b, n, d, k = 32, 8192, 128, 7
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    mask = jnp.asarray(rng.random(n) < 0.9)
    v16 = jnp.asarray(v, dtype=jnp.bfloat16)  # device plane

    calls = {"f": 0, "j": 0}
    real_f, real_j = pg.gmax_f, pg.gmax_jaccard
    monkeypatch.setattr(
        pg, "gmax_f",
        lambda *a, **kw: (calls.__setitem__("f", calls["f"] + 1),
                          real_f(*a, **kw))[1],
    )
    monkeypatch.setattr(
        pg, "gmax_jaccard",
        lambda *a, **kw: (calls.__setitem__("j", calls["j"] + 1),
                          real_j(*a, **kw))[1],
    )

    # euclidean: raw rows, aux = |v|^2 (from the host master, engine-style)
    aux = jnp.asarray(np.sum(v.astype(np.float32) ** 2, axis=1))
    want_v, want_i = rank_top_k_grouped_metric(
        jnp.asarray(q), v16, aux, k, "euclidean_metric",
        row_mask=mask, group=GROUP,
    )
    got_v, got_i = pg.rank_top_k_grouped_metric_pallas(
        jnp.asarray(q), v16, aux, k, "euclidean_metric",
        row_mask=mask, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-6
    )
    assert calls["f"] == 1  # the surrogate kernel branch genuinely ran

    # hamming/jaccard: binarized bf16 rows (store.binary_view layout),
    # aux = popcount; queries binarize inside
    vb = (v > 0).astype(np.float32)
    vb16 = jnp.asarray(vb, dtype=jnp.bfloat16)
    auxb = jnp.asarray(vb.sum(axis=1))
    want_v, want_i = rank_top_k_grouped_metric(
        jnp.asarray(q), vb16, auxb, k, "hamming_distance",
        row_mask=mask, group=GROUP,
    )
    got_v, got_i = pg.rank_top_k_grouped_metric_pallas(
        jnp.asarray(q), vb16, auxb, k, "hamming_distance",
        row_mask=mask, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    assert calls["f"] == 2

    want_v, want_i = rank_top_k_grouped_metric(
        jnp.asarray(q), vb16, auxb, k, "jaccard_similarity",
        row_mask=mask, group=GROUP,
    )
    got_v, got_i = pg.rank_top_k_grouped_metric_pallas(
        jnp.asarray(q), vb16, auxb, k, "jaccard_similarity",
        row_mask=mask, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    assert calls["j"] == 1  # the jaccard true-score kernel genuinely ran


def test_metric_surrogate_out_of_contract_falls_back():
    """Jaccard (non-affine) and unsupported shapes degrade to the XLA form."""
    from hyperdb_tpu.ops import pallas_gmax as pg
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped_metric

    rng = np.random.default_rng(10)
    b, n, d, k = 8, 1024, 64, 5  # d % 128 != 0 -> unsupported
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    aux = jnp.asarray(np.sum(v ** 2, axis=1))
    want_v, want_i = rank_top_k_grouped_metric(
        jnp.asarray(q), jnp.asarray(v), aux, k, "euclidean_metric",
        group=GROUP,
    )
    got_v, got_i = pg.rank_top_k_grouped_metric_pallas(
        jnp.asarray(q), jnp.asarray(v), aux, k, "euclidean_metric",
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_gmax_f_sub_matches_reference():
    """Dual-output kernel (swapped orientation): group AND subgroup maxes
    both match the NumPy reference on masked+recency scores."""
    from hyperdb_tpu.ops.pallas_gmax import gmax_f_sub

    rng = np.random.default_rng(7)
    b, n, d, sub = 128, 16384, 128, 32
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.9
    rec = (rng.random(n) * 0.1).astype(np.float32)
    extra = make_extra(n, jnp.asarray(mask), jnp.asarray(rec))
    gm, sm = gmax_f_sub(
        jnp.asarray(q), jnp.asarray(v), extra, sub=sub, interpret=True
    )
    s = q @ v.T + np.asarray(extra)[None, :]
    np.testing.assert_allclose(np.asarray(gm), _ref_gmax(s), rtol=1e-5, atol=1e-5)
    want_sm = s.reshape(b, n // sub, sub).max(axis=-1)
    np.testing.assert_allclose(np.asarray(sm), want_sm, rtol=1e-5, atol=1e-5)

    # round 5: the single-output emission form (subgroup maxes only, group
    # maxes derived by an XLA max outside) is BITWISE identical — max is
    # exact and associative over the same operands. It exists because the
    # dual-output program never compiled at capacity scale (probe_2p24_sub).
    gm1, sm1 = gmax_f_sub(
        jnp.asarray(q), jnp.asarray(v), extra, sub=sub, interpret=True,
        dual=False,
    )
    def _eq(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return ((a == b) | (np.isneginf(a) & np.isneginf(b))).all()
    assert _eq(gm1, gm) and _eq(sm1, sm)


def test_pipeline_two_level_index_identical(monkeypatch):
    """The two-level (group -> subgroup) pipeline returns exactly the XLA
    grouped route's winners, with mask + recency, at a lane-aligned batch
    (the regime where the subgroup refinement actually engages)."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    rng = np.random.default_rng(11)
    b, n, d, k = 128, 8192, 128, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    mask = rng.random(n) < 0.9
    rec = (rng.random(n) * 0.05).astype(np.float32)
    xv, xi = rank_top_k_grouped(
        jnp.asarray(q), jnp.asarray(v), k,
        row_mask=jnp.asarray(mask), recency=jnp.asarray(rec), group=GROUP,
    )
    for sub in (32, 64):
        monkeypatch.setattr(CONFIG, "pallas_subgroup", sub)
        pv, pi = rank_top_k_grouped_pallas(
            jnp.asarray(q), jnp.asarray(v), k,
            row_mask=jnp.asarray(mask), recency=jnp.asarray(rec),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
        np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5)

    # disabled knob -> single-level path, same winners
    monkeypatch.setattr(CONFIG, "pallas_subgroup", 0)
    pv, pi = rank_top_k_grouped_pallas(
        jnp.asarray(q), jnp.asarray(v), k,
        row_mask=jnp.asarray(mask), recency=jnp.asarray(rec), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))

    # invalid widths (not a divisor of GROUP / out of range) fall back to
    # single-level instead of crashing
    for bad in (7, 48, 128, 256):
        monkeypatch.setattr(CONFIG, "pallas_subgroup", bad)
        _, pi = rank_top_k_grouped_pallas(
            jnp.asarray(q), jnp.asarray(v), k,
            row_mask=jnp.asarray(mask), recency=jnp.asarray(rec),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_two_level_skips_sub_lane_batches(monkeypatch):
    """Below a lane-aligned query tile the swapped kernel is out of
    contract; the route must stay on single-level and stay exact."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    monkeypatch.setattr(CONFIG, "pallas_subgroup", 32)
    rng = np.random.default_rng(13)
    b, n, d, k = 8, 8192, 128, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    pv, pi = rank_top_k_grouped_pallas(
        jnp.asarray(q), jnp.asarray(v), k, interpret=True
    )
    xv, xi = rank_top_k_grouped(jnp.asarray(q), jnp.asarray(v), k, group=GROUP)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))


def test_metric_two_level_index_identical(monkeypatch):
    """At lane-aligned batches the euclid/hamming surrogate route refines
    group -> subgroup (gmax_f_sub) and still matches the XLA epilogue
    formulation exactly; jaccard stays on its true-score kernel."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import pallas_gmax as pg
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped_metric

    monkeypatch.setattr(CONFIG, "pallas_subgroup", 32)
    rng = np.random.default_rng(17)
    b, n, d, k = 128, 8192, 128, 7
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    mask = jnp.asarray(rng.random(n) < 0.9)
    v16 = jnp.asarray(v, dtype=jnp.bfloat16)

    calls = {"sub": 0}
    real_sub = pg.gmax_f_sub
    monkeypatch.setattr(
        pg, "gmax_f_sub",
        lambda *a, **kw: (calls.__setitem__("sub", calls["sub"] + 1),
                          real_sub(*a, **kw))[1],
    )

    aux = jnp.asarray(np.sum(v.astype(np.float32) ** 2, axis=1))
    want_v, want_i = rank_top_k_grouped_metric(
        jnp.asarray(q), v16, aux, k, "euclidean_metric",
        row_mask=mask, group=GROUP,
    )
    got_v, got_i = pg.rank_top_k_grouped_metric_pallas(
        jnp.asarray(q), v16, aux, k, "euclidean_metric",
        row_mask=mask, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-6
    )
    assert calls["sub"] == 1  # the two-level branch genuinely ran

    vb = (v > 0).astype(np.float32)
    vb16 = jnp.asarray(vb, dtype=jnp.bfloat16)
    auxb = jnp.asarray(vb.sum(axis=1))
    want_v, want_i = rank_top_k_grouped_metric(
        jnp.asarray(q), vb16, auxb, k, "hamming_distance",
        row_mask=mask, group=GROUP,
    )
    got_v, got_i = pg.rank_top_k_grouped_metric_pallas(
        jnp.asarray(q), vb16, auxb, k, "hamming_distance",
        row_mask=mask, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    assert calls["sub"] == 2


def test_windows_partition():
    """_windows covers the grid exactly with <=cap-block disjoint windows."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import pallas_gmax as pg

    saved = CONFIG.pallas_max_grid_blocks
    try:
        CONFIG.pallas_max_grid_blocks = 0
        assert pg._windows(2048) == ((0, 2048),)
        CONFIG.pallas_max_grid_blocks = 1536
        assert pg._windows(1280) == ((0, 1280),)  # 10M int8 stays monolithic
        for grid, cap in ((2048, 1536), (2048, 1024), (7, 3), (1, 4), (5, 1)):
            CONFIG.pallas_max_grid_blocks = cap
            wins = pg._windows(grid)
            assert all(g <= cap for _, g in wins)
            off = 0
            for o, g in wins:
                assert o == off and g > 0
                off += g
            assert off == grid
    finally:
        CONFIG.pallas_max_grid_blocks = saved


def test_gmax_f_windowed_bitwise_equal(monkeypatch):
    """Grid windowing is exact: windowed stage 1 == monolithic, bitwise.

    Each window computes its own blocks' maxes from the same operand bytes
    with the same per-block arithmetic, so the concat must reproduce the
    monolithic output exactly (the capacity-robustness knob may never
    change results — config.pallas_max_grid_blocks)."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import pallas_gmax as pg

    rng = np.random.default_rng(23)
    b, n, d = 8, 65536, 128  # grid = 4 blocks at the default budget
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.9)
    extra = make_extra(n, mask)

    monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 2)
    pg.gmax_f.clear_cache()
    got = np.asarray(pg.gmax_f(q, v, extra, interpret=True))
    monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 0)
    pg.gmax_f.clear_cache()
    want = np.asarray(pg.gmax_f(q, v, extra, interpret=True))
    pg.gmax_f.clear_cache()
    np.testing.assert_array_equal(got, want)


def test_gmax_f_sub_windowed_bitwise_equal(monkeypatch):
    """Both subgroup emission forms window exactly (dual and single)."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import pallas_gmax as pg

    rng = np.random.default_rng(29)
    b, n, d, sub = 128, 65536, 128, 32  # swapped kernel: lane-aligned b
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    extra = make_extra(n, jnp.asarray(rng.random(n) < 0.9))

    for dual in (True, False):
        monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 3)
        pg.gmax_f_sub.clear_cache()
        gm_w, sm_w = pg.gmax_f_sub(
            q, v, extra, sub=sub, interpret=True, dual=dual
        )
        gm_w, sm_w = np.asarray(gm_w), np.asarray(sm_w)
        monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 0)
        pg.gmax_f_sub.clear_cache()
        gm_m, sm_m = pg.gmax_f_sub(
            q, v, extra, sub=sub, interpret=True, dual=dual
        )
        pg.gmax_f_sub.clear_cache()
        np.testing.assert_array_equal(gm_w, np.asarray(gm_m))
        np.testing.assert_array_equal(sm_w, np.asarray(sm_m))


def test_gmax_int8_windowed_bitwise_equal(monkeypatch):
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import pallas_gmax as pg

    rng = np.random.default_rng(31)
    b, n, d = 8, 65536, 128
    q = rng.standard_normal((b, d)).astype(np.float32)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v_i8, v_scales = quantize_rows(v)
    q_i8, q_scale = _quantize_device(jnp.asarray(q))
    extra = make_extra(n, jnp.asarray(rng.random(n) < 0.9))

    monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 2)
    pg.gmax_int8.clear_cache()
    got = np.asarray(pg.gmax_int8(
        q_i8, q_scale, jnp.asarray(v_i8), jnp.asarray(v_scales), extra,
        interpret=True,
    ))
    monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 0)
    pg.gmax_int8.clear_cache()
    want = np.asarray(pg.gmax_int8(
        q_i8, q_scale, jnp.asarray(v_i8), jnp.asarray(v_scales), extra,
        interpret=True,
    ))
    pg.gmax_int8.clear_cache()
    np.testing.assert_array_equal(got, want)


def test_pipeline_windowed_index_identical(monkeypatch):
    """Full two-level routed pipeline under grid windowing == XLA grouped."""
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops import pallas_gmax as pg
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    rng = np.random.default_rng(37)
    b, n, d, k = 128, 65536, 128, 9
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    mask = jnp.asarray(rng.random(n) < 0.9)
    rec = jnp.asarray((rng.random(n) * 0.1).astype(np.float32))

    monkeypatch.setattr(CONFIG, "pallas_subgroup", 32)
    monkeypatch.setattr(CONFIG, "pallas_max_grid_blocks", 2)
    pg.gmax_f_sub.clear_cache()
    pg._grouped_pallas_impl.clear_cache()
    got_v, got_i = pg.rank_top_k_grouped_pallas(
        q, v, k=k, row_mask=mask, recency=rec, interpret=True
    )
    want_v, want_i = rank_top_k_grouped(
        q, v, k=k, row_mask=mask, recency=rec, group=GROUP
    )
    pg.gmax_f_sub.clear_cache()
    pg._grouped_pallas_impl.clear_cache()
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5
    )
