"""Pallas stage-1 manhattan (L1) kernel: per-group maxes of -distance.

Manhattan (score = 1/(1+L1), /root/reference/hyperdb/ranking_algorithm.py:
54-61) has no matmul form — it is the one metric whose scan runs on the
VPU, not the MXU. The XLA streamed route (ops/ranking.
rank_top_k_manhattan_stream) removed the (B, N) HBM materialization but
its fused (B, tile, d) abs-diff-reduce runs well below the VPU roof and
degrades further at large batches (config-4: 2.2k q/s b=256, 860 q/s
b=2048 at 1M x 384 — vs a ~6.5 T op/s VPU roof that prices the same scan
at ~45 ms/b256, benchmarks/probe_l1.py). This kernel owns the loop
structure instead of hoping XLA fuses it:

    per grid cell (corpus block i, query tile j): the (blk, d) corpus
    block is cast to f32 once; a rolled ``while_loop`` walks the query
    tile, each step computing one query's (blk, 1) NEGATED L1 distances
    as a lane-reduce of |v - q_i| (corpus rows stay in sublanes end to
    end — no relayout anywhere), applying the mask additive (-inf on
    dead rows, fed SUBLANE-major as (N, 1) blocks to match) and NaN
    scrub, group-reducing 128 sublane rows to the query's (blkg, 1)
    column, and merging that column into a (blkg, qblk) scratch via a
    lane-id select (Mosaic only allows 128-aligned lane-dim dynamic
    stores; the select is 4K ops against the query's 2.4M-op distance
    pass). The scratch flushes to the transposed (1, blkg, qblk) output
    block — the same lane-aligned layout ops/pallas_gmax.py uses.

Emitting -L1 (not the 1/(1+L1) score) keeps stage 2 a plain ``top_k``
over (B, g): the true score is a strictly increasing transform of -L1,
so the best k groups by -L1 max are the best k by true-score max — the
euclidean-surrogate argument (pallas_gmax.rank_top_k_grouped_metric_
pallas). Unlike the matmul kernels, the d-wise SUM ORDER here differs
from XLA's, so group maxes can disagree with the oracle by f32
summation noise (~1e-5 absolute on d=384 distances against ~1e-4
adjacent group-max gaps at 1M rows); stage 2 therefore overfetches
``k + L1_GROUP_MARGIN`` groups before the exact stage-3 rescore, which
recomputes the true scores with the SAME XLA formulation the oracle
uses (sum-over-last-dim of the gathered candidates) — containment then
fails only if ``margin+1`` adjacent group maxes sit within summation
noise of the k-th boundary (~1e-8/query at margin 8), which the gate
(benchmarks/tpu_gate.py ``manhattan_pallas_*``) checks empirically on
chip.

RECENCY delegates to the streamed XLA route: a true-score in-kernel
variant (recency folded into the additive) was built and measured out —
see the in-kernel comment; the failure is fundamental (recency
compresses group-max gaps below summation noise), not an engineering
gap, so the carve-out is permanent. (probe_l1 rows, 2026-08-19.)

Exactness parity is pinned hermetically in tests/test_pallas_l1.py
(interpret mode); the on-chip A/B and routing threshold live in
benchmarks/probe_l1.py and BASELINE.md.

ROUND 5: the default stage 1 for corpora under the transpose cap is the
TRANSPOSED-corpus kernel (:func:`gmax_l1t` below — measured +8.5-12.5%,
3.9k q/s at b=2048); this sublane kernel remains the capacity-scale
route. See the round-5 lever note mid-module for why both formulations
sit on the same VMEM-temp wall.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hyperdb_tpu.ops.pallas_gmax import (
    GROUP,
    _VMEM_BUDGET,
    _compiler_params,
)

# Stage-2 group overfetch absorbing kernel-vs-XLA f32 summation-order noise
# at the k-th group boundary (see module docstring). Raised 8 -> 12 in
# round 5: one unreproducible index_equal=false appeared at b=2048
# (probe_l1t 10:30 row; the immediate rerun on the identical draw found 0
# differing rows for both kernels — probe_l1_mismatch). The margin is
# cheap insurance (stage 3 is ~4% of the scan) against whatever produced
# that one-off.
L1_GROUP_MARGIN = 12

# Query-tile width = the accumulator's lane extent. 256 lanes keeps the
# (blk, qblk) f32 accumulator at 2 lane-vregs wide while bounding the
# rolled loop's trip count; batches above it split over the inner grid dim
# (corpus block fetched once, query tiles revisit it — pallas_gmax rule).
_QBLK_MAX = 256


def _q_tile(b: int) -> int:
    return b if b <= _QBLK_MAX else _QBLK_MAX


def _block_rows(b: int, d: int, itemsize: int, n: int | None = None) -> int:
    """Largest corpus block (rows) under the shared VMEM budget: the corpus
    tile is double-buffered, and the f32 cast + the (blk, qblk) accumulator
    live alongside it."""
    qblk = _q_tile(b)  # noqa: F841 — scratch is (blkg, qblk), negligible
    blk = 16384
    while blk > GROUP and (
        2 * blk * d * itemsize  # double-buffered corpus tile
        + 4 * blk * d           # f32 cast of the block
        + 4 * blk * d           # |v32 - q| loop temp (Mosaic stack-allocates
                                # the full-tile elementwise result before the
                                # lane-reduce — measured: 16K-row blocks OOM
                                # the 56 MB scoped vmem at d=384 bf16)
    ) > _VMEM_BUDGET:
        blk //= 2
    if n is not None:
        while blk > GROUP and n % blk:
            blk //= 2
    return blk


def _l1_kernel(q_ref, v_ref, extra_ref, out_ref, gm_ref):
    # q: (qblk, d) f32, v: (blk, d) f32/bf16, extra: (blk, 1) f32 sublane-
    # major, out: (1, blkg, qblk) transposed block, gm scratch: (blkg, qblk).
    from jax.experimental import pallas as pl

    qblk = q_ref.shape[0]
    blk = v_ref.shape[0]
    v32 = v_ref[:].astype(jnp.float32)  # cast once per cell, reused qblk x
    # NaN scrub HOISTED out of the per-query loop: a NaN corpus value
    # becomes -inf so the row's distance is +inf (score -inf — the
    # reference scrub's outcome); the caller scrubs query NaN to +inf
    # (never -inf, or a doubly-NaN pair would make |(-inf)-(-inf)| NaN
    # again). Every per-query (blk, 1) pass costs ~1024 mostly-empty
    # vregs — comparable to the whole (blk, d) distance pass — so loop
    # passes are the scarce resource here.
    v32 = jnp.where(jnp.isnan(v32), -jnp.inf, v32)
    extra = extra_ref[:]  # (blk, 1): -inf on masked/padding rows
    # lane-id plane for the per-query column merge: Mosaic only allows
    # 128-aligned lane-dim dynamic stores, so query i's group-max column
    # lands in scratch via a (blkg, qblk) select — 4K ops against the
    # query's 2.4M-op distance pass, and no relayout anywhere (corpus
    # rows stay in sublanes end to end)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (blk // GROUP, qblk), 1)

    def body(i):
        qrow = q_ref[pl.dslice(i, 1), :]  # (1, d), sublane-dynamic load
        dist = jnp.sum(jnp.abs(v32 - qrow), axis=1, keepdims=True)  # (blk,1)
        # -L1 surrogate, NOT the 1/(1+L1) score: the true transform was
        # built and measured OUT on chip (probe_l1 2026-08-19) — the
        # in-loop reciprocal runs on (blk, 1) sublane-major vregs (1024
        # vregs at 8 useful lanes each) and cost 40% of throughput
        # (1.45k vs 2.46k q/s), and its purpose (riding recency exactly)
        # fails anyway: recency dominates manhattan's tiny score spread,
        # collapsing group-max gaps (~5e-8) below the kernel's summation
        # noise (~1e-7), where NO overfetch margin restores containment
        # (measured index mismatches at b=2048 +recency).
        # dist is NaN-free by the hoisted operand scrubs above, so no
        # per-query scrub pass is needed
        s = extra - dist
        # sublane-axis split + cross-sublane reduce: no relayout (the
        # lane axis is untouched)
        gm = jnp.max(s.reshape(blk // GROUP, GROUP, 1), axis=1)  # (blkg,1)
        gm_ref[:] = jnp.where(lanes == i, gm, gm_ref[:])
        return i + 1

    jax.lax.while_loop(lambda i: i < qblk, body, 0)
    out_ref[0] = gm_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmax_l1(
    queries: jax.Array,
    vectors: jax.Array,
    extra: jax.Array,
    interpret: bool = False,
):
    """Per-group maxes of ``-L1(q, v) + extra`` (extra: 0 live / -inf dead).

    Args:
        queries: (B, d) f32, B % 8 == 0, d % 128 == 0.
        vectors: (N, d) f32/bf16 corpus, N % block == 0.
        extra: (N,) f32 additive MASK vector (no recency — module note).

    Returns: (B, N // 128) f32 group maxes of the negated distances.

    Infinite distances (a row of ±inf values, or a NaN operand under the
    hoisted scrubs) surrogate to -inf here while their true score is 0 —
    both are the global minimum, so containment is unaffected (and stage
    3 rescores fetched rows with the true 0) unless fewer than k
    finite-distance rows exist (a corpus of infinities).
    """
    from jax.experimental import pallas as pl

    b, d = queries.shape
    n = vectors.shape[0]
    qblk = _q_tile(b)
    blk = _block_rows(b, d, vectors.dtype.itemsize, n)
    grid = n // blk

    def scratch():
        from jax.experimental.pallas import tpu as pltpu

        return [pltpu.VMEM((blk // GROUP, qblk), jnp.float32)]

    out = pl.pallas_call(
        _l1_kernel,
        grid=(grid, b // qblk),
        in_specs=[
            pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
            pl.BlockSpec((blk, d), lambda i, j: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk // GROUP, qblk), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((grid, blk // GROUP, b), jnp.float32),
        scratch_shapes=scratch(),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(
        # query NaN -> +inf (the kernel's hoisted-scrub contract: paired
        # with corpus NaN -> -inf, any NaN operand yields dist +inf and
        # the row/query bottoms out at -inf, the reference outcome)
        jnp.where(
            jnp.isnan(queries), jnp.inf, queries.astype(jnp.float32)
        ),
        vectors,
        extra.reshape(n, 1),
    )
    return out.transpose(2, 0, 1).reshape(b, n // GROUP)


def supported(b: int, n: int, d: int, itemsize: int = 2) -> bool:
    """Shape gate — engine bucket padding guarantees these for big corpora.

    The accumulator's lane extent is the query tile, so sub-tile batches
    only need sublane alignment (b % 8); above the tile they must split
    evenly. f16 planes are the caller's check (Mosaic has no f16); f32
    planes are FINE here — the kernel is exact-f32 VPU arithmetic, there
    is no matmul precision to lose (unlike pallas_gmax)."""
    blk = _block_rows(b, d, itemsize, n)
    tiles_ok = (b % 8 == 0) if b <= _QBLK_MAX else (b % _QBLK_MAX == 0)
    return (
        tiles_ok
        and d % 128 == 0
        and blk >= 1024
        and n % blk == 0
        and n // GROUP >= 2
    )


# ---------------------------------------------------------------------------
# Round-5 lever (VERDICT r4 #5): the TRANSPOSED-corpus kernel.
#
# Vreg accounting of the round-4 kernel above (per query, per corpus row,
# in 8x128-vreg operations): the (blk, d) distance pass costs ~1.0
# ops/row (abs+sub on 0.375 vregs/row plus the d/128 column fold), but the
# LANE-reduction tree that collapses each row's 128 lanes to a scalar
# costs ~1.75 ops/row (7 shuffle+add levels on blk/8 vregs), and the
# (blk, 1) sublane-major epilogue (extra subtract, group reduce, merge
# select) another ~0.3 — so only ~1/3 of the VPU work is the distance
# arithmetic the "3 ops/elem, ~6.5 T op/s" roof prices. Measured ~2.4k q/s
# = ~40% of that naive roof is therefore EXPLAINED: the round-4 kernel is
# near the ceiling of its own (rows-on-sublanes) formulation.
#
# The layout escape: with the corpus tile TRANSPOSED to (d, blk) — rows
# on LANES — the d-reduce becomes cross-vreg sublane adds (dense, ~1.03
# ops/row) and the group reduce the same minor-128 lane-split reshape the
# shipped gmax_f kernel uses, batched over 8 queries; the only new cost
# is extracting each query's (d, 1) column by masked lane-reduce (~900
# vreg-ops/query, blk-independent). The vreg model predicted ~2x;
# MEASURED on chip (probe_l1t, 2026-08-19): +8.5% at b=256 (83.3 ->
# 76.8 ms) and +12.5% at b=2048 (594 -> 528 ms, 3.9k q/s), both
# index-identical to the streamed oracle. Two formulations with ~2.4x
# different vreg-op counts running within 12% of each other says the
# binding resource is NOT vector issue slots — consistent with the
# round-4 finding that Mosaic materializes the full elementwise |v - q|
# tile before every reduce (see _block_rows): that temp's VMEM
# round-trip (~12.6 MB per query per block, identical in both layouts)
# is the shared wall, and d-chunked variants re-materialize the same
# total bytes, so no further named lever is known. The transposed form
# is the cheaper epilogue on the same wall and ships as the default
# (config.pallas_l1t) under its HBM transpose cap.
# ---------------------------------------------------------------------------

_L1T_BLK = 8192  # (d, blk) bf16 x2 buffers + f32 cast + diff temp ~ 38 MB
_L1T_MAX_BYTES = 4 << 30  # transpose copy cap: keep 2x corpus << HBM


def _l1t_kernel(qt_ref, vt_ref, extra_ref, out_ref, acc_ref):
    # qt: (d, qblk) f32, vt: (d, blk) corpus block TRANSPOSED (rows on
    # lanes), extra: (1, blk) f32 (-inf on dead rows), out: (1, qblk, blkg)
    # group MINS of L1 distance, acc scratch: (qblk, blkg) f32.
    from jax.experimental import pallas as pl

    d, qblk = qt_ref.shape
    blk = vt_ref.shape[1]
    v32 = vt_ref[:].astype(jnp.float32)  # cast once per cell, reused qblk x
    # scrubs hoisted like the sublane kernel: corpus NaN -> -inf, dead rows
    # -> +inf (their distance sums to +inf under the query's NaN -> +inf
    # scrub, so they can never win the group MIN)
    v32 = jnp.where(jnp.isnan(v32), -jnp.inf, v32)
    v32 = jnp.where(jnp.isinf(extra_ref[:]), jnp.inf, v32)  # (1,blk) bcast
    qt = qt_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (d, qblk), 1)

    def body8(t):
        rows = []
        for jj in range(8):  # static 8-query unroll per rolled step
            col = t * 8 + jj
            # (d, 1) query column via masked lane-reduce: Mosaic has no
            # sub-128 dynamic lane slice, and a (1, d) sublane slice would
            # need the forbidden sublane->lane relayout
            qcol = jnp.max(
                jnp.where(lanes == col, qt, -jnp.inf), axis=1, keepdims=True
            )
            rows.append(
                jnp.sum(jnp.abs(v32 - qcol), axis=0, keepdims=True)
            )  # (1, blk) lane-major distances
        r8 = jnp.concatenate(rows, axis=0)  # (8, blk)
        # minor-128 lane-split reshape (the gmax_f _emit_gmax pattern) —
        # segmented group MIN for all 8 queries in one dense reduce
        gm8 = jnp.min(r8.reshape(8, blk // GROUP, GROUP), axis=-1)
        acc_ref[pl.dslice(t * 8, 8), :] = gm8  # sublane-dynamic store
        return t + 1

    jax.lax.while_loop(lambda t: t < qblk // 8, body8, 0)
    out_ref[0] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmax_l1t(
    queries: jax.Array,
    vectors_t: jax.Array,
    extra: jax.Array,
    interpret: bool = False,
):
    """Per-group MINS of ``L1(q, v)`` over a TRANSPOSED (d, N) corpus.

    Args:
        queries: (B, d) f32, B % 8 == 0 (transposed to (d, B) here — tiny).
        vectors_t: (d, N) f32/bf16 TRANSPOSED corpus, N % _L1T_BLK == 0.
        extra: (N,) f32 mask vector (0 live / -inf dead; no recency).

    Returns: (B, N // 128) f32 group minimums of the true distances
    (negate for the -L1 surrogate the selection stage ranks on).
    """
    from jax.experimental import pallas as pl

    b, d = queries.shape
    n = vectors_t.shape[1]
    qblk = _q_tile(b)
    blk = _L1T_BLK
    grid = n // blk

    # NaN-query scrub uses a LARGE FINITE (not +inf): dead rows are +inf
    # here, and inf - inf would re-introduce NaN into the group min. A
    # 1e30 coordinate makes every finite row's distance ~3.8e32 (< f32
    # max, no overflow at d<=4096) — the query's groups all bottom out,
    # and stage 3's true-score rescore of whatever it fetched yields the
    # reference's all -inf row exactly like the sublane kernel.
    qt = jnp.where(
        jnp.isnan(queries), 1e30, queries.astype(jnp.float32)
    ).T  # (d, B)

    def scratch():
        from jax.experimental.pallas import tpu as pltpu

        return [pltpu.VMEM((qblk, blk // GROUP), jnp.float32)]

    out = pl.pallas_call(
        _l1t_kernel,
        grid=(grid, b // qblk),
        in_specs=[
            pl.BlockSpec((d, qblk), lambda i, j: (0, j)),
            pl.BlockSpec((d, blk), lambda i, j: (0, i)),
            pl.BlockSpec((1, blk), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec(
            (1, qblk, blk // GROUP), lambda i, j: (i, j, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((grid, b, blk // GROUP), jnp.float32),
        scratch_shapes=scratch(),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(qt, vectors_t, extra.reshape(1, n))
    return out.transpose(1, 0, 2).reshape(b, n // GROUP)


def supported_t(b: int, n: int, d: int) -> bool:
    """Shape gate for the transposed kernel: fixed 8192-row blocks, 8-query
    inner unroll, lane-major (d, qblk) query tiles."""
    tiles_ok = (b % 8 == 0) if b <= _QBLK_MAX else (b % _QBLK_MAX == 0)
    return (
        tiles_ok
        and d % 128 == 0
        and n % _L1T_BLK == 0
        and n // GROUP >= 2
    )


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def rank_top_k_manhattan_pallas(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    interpret: bool = False,
):
    """Manhattan exact top-k with the Pallas stage-1 kernel.

    Three stages: per-group maxes of -L1 (Pallas), ``top_k`` over (B, g)
    overfetching ``k + L1_GROUP_MARGIN`` groups, exact rescore of the
    winners' rows with the true reference score (same XLA formulation as
    the oracle — see module docstring for the containment argument).
    Recency delegates to the streamed XLA route (measured out — module
    docstring).
    """
    from hyperdb_tpu.ops.pallas_gmax import make_extra
    from hyperdb_tpu.ops.ranking import NEG_INF, rank_top_k_manhattan_stream
    from hyperdb_tpu.ops.ranking import _manhattan_tile

    n, d = vectors.shape
    b = queries.shape[0]
    if (
        recency is not None
        or not supported(b, n, d, vectors.dtype.itemsize)
        or n // GROUP < k
        or vectors.dtype == jnp.float16  # Mosaic has no f16
        or queries.dtype == jnp.float16
    ):
        tile = _manhattan_tile(b, n, k)
        if tile:
            return rank_top_k_manhattan_stream(
                queries, vectors, k=k, row_mask=row_mask, recency=recency,
                tile=tile,
            )
        # remaining shapes are small/odd corpora: materialize (B, N) like
        # the small-corpus engine path (NOT rank_top_k — its manhattan
        # branch routes back here, and this module must not recurse)
        from hyperdb_tpu.ops.metrics import manhattan_scores
        from hyperdb_tpu.ops.ranking import exact_top_k

        s = manhattan_scores(queries, vectors)
        s = jnp.where(jnp.isnan(s), NEG_INF, s)
        if recency is not None:
            s = s + recency[None, :]
        if row_mask is not None:
            s = jnp.where(row_mask[None, :], s, NEG_INF)
        return exact_top_k(s, k)
    q32 = queries.astype(jnp.float32)
    extra = make_extra(n, row_mask)
    from hyperdb_tpu.config import CONFIG

    # transposed-corpus stage 1 (round 5): ~2x the sublane kernel by vreg
    # accounting (module note). The (d, N) operand is materialized by one
    # XLA transpose per call — ~2 ms of HBM copy against a >500 ms scan at
    # 1M — but doubles the corpus's transient HBM footprint, so capacity-
    # scale corpora stay on the in-place kernel. Trace-time knob
    # (HYPERDB_PALLAS_L1T), default measurement-set.
    if (
        CONFIG.pallas_l1t
        and supported_t(b, n, d)
        and n * d * vectors.dtype.itemsize <= _L1T_MAX_BYTES
    ):
        gm = -gmax_l1t(q32, vectors.T, extra, interpret=interpret)
    else:
        gm = gmax_l1(q32, vectors, extra, interpret=interpret)  # (B, g)
    g = n // GROUP
    m = min(k + L1_GROUP_MARGIN, g)
    _, gidx = jax.lax.top_k(gm, m)  # (B, m)

    r3 = vectors.reshape(g, GROUP, d)
    cand = jnp.take(r3, gidx, axis=0).reshape(b, m * GROUP, d)
    # the oracle's own formulation (ops/metrics.manhattan_scores /
    # rank_top_k_manhattan_stream.tile_scores): XLA's d-reduce order is
    # stable across leading shapes, so these bits match the oracle's
    dist = jnp.sum(
        jnp.abs(cand.astype(jnp.float32) - q32[:, None, :]), axis=-1
    )
    cs = 1.0 / (1.0 + dist)
    cs = jnp.where(jnp.isnan(cs), NEG_INF, cs)
    if row_mask is not None:
        mask3 = jnp.take(row_mask.reshape(g, GROUP), gidx, axis=0)
        cs = jnp.where(mask3.reshape(b, m * GROUP), cs, NEG_INF)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(gidx, pos // GROUP, axis=-1)
    return vals, (winner * GROUP + pos % GROUP).astype(jnp.int32)
