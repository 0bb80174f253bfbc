"""Pallas stage-1 grouped-scan kernel: matmul + epilogue + per-group max.

Why this exists: the XLA grouped top-k (ops/ranking.rank_top_k_grouped,
ops/quantized._int8_grouped_topk) computes scores groupwise and reduces each
group to its max, but XLA materializes the (B, g, group) f32 epilogue in HBM
before the reduce (kOutput fusion) — measured as a 10 GB temp (OOM) at
10M x 768 int8 batch 256, and roughly doubles HBM traffic everywhere else.
This kernel keeps the score tile in VMEM: each grid step streams one corpus
block HBM->VMEM, runs the (B, blk) matmul on the MXU, applies the scale /
additive epilogue on the VPU, reduces each 128-wide group to its max, and
writes only the (B, blk/128) maxes back. HBM traffic = corpus read + B*g
floats — the scan's bandwidth floor.

Scope is deliberately tiny: ONLY stage 1+2's input (the per-group maxes —
plus, on the float route since round 4, per-subgroup maxes from the same
VMEM tile, :func:`gmax_f_sub`, so selection can refine to 32-row subgroups
and shrink the stage-3 gather 4x). Selection (`lax.top_k` over the maxes)
and the exact stage-3 rescore of the winners stay in XLA. Masks and recency collapse into one additive `extra` vector
(0 or recency on live rows, -inf on dead/padding rows), added after the
scale — identical score semantics to the XLA formulation, same containment
argument, so the final top-k is index-identical.

Round-1 history (why a *previous* Pallas kernel was retired): that kernel
fused the full scan *including a running top-k merge per tile* and lost to
XLA's pipelining (config.py note). This one replaces only the reduction
XLA provably fuses badly, and keeps everything XLA does well.

Unlike the reference's NumPy argpartition ranker
(/root/reference/hyperdb/ranking_algorithm.py:149-204) this is a
bandwidth-shaped device program; exactness parity is pinned in
tests/test_pallas_gmax.py (interpret mode, hermetic).

Layout rules honored (CLAUDE.md): aux vectors are fed lane-major as
(1, N) blocks — never reshaped from (N, 1) inside the kernel; group is
fixed at 128 = the lane width, so the group reduction is a lane reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GROUP = 128  # one VPU lane tile per group; stage-3 rescore depends on it

_BLK_N_DEFAULT = 16384  # corpus rows per grid step (VMEM-sized, /128)

# Round-4 probe (benchmarks/probe_gmax_r4{,b}.py, results.jsonl): the
# round-3 "12 MB working set is the ceiling" finding was an artifact of
# Mosaic's DEFAULT vmem limit — raising vmem_limit_bytes admits 4x corpus
# blocks (46 MB working set compiles and runs), and marking the grid dims
# parallel/arbitrary lets Mosaic schedule the corpus sweep better. Both
# are EXACT (bit-identical maxes). Measured on chip, same run/phase:
# stage-1 b=1024 13.2 -> 9.0 ms, b=2048 18.9 -> 14.6 ms; full pipeline
# b=2048 27.7 -> 24.2 ms (+14.5%), b=1024 14.5 -> 14.0 ms. (bf16 output
# emission was also probed: best stage-1 everywhere, but the safe k+3k
# overfetch margin makes the PIPELINE 2.1x slower — measured OUT.)
_VMEM_BUDGET = 48 * (1 << 20)  # corpus tile (x2 buffers) + f32 score tile
_VMEM_LIMIT_BYTES = 56 * (1 << 20)  # headroom over budget for Mosaic's own
_DIMSEM = ("parallel", "arbitrary")  # grid dims write disjoint out blocks


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=_DIMSEM, vmem_limit_bytes=_VMEM_LIMIT_BYTES,
    )

# Query-tile height: batches above this split over a second grid dimension
# (innermost, so each corpus block is fetched ONCE and query tiles revisit
# it in VMEM — corpus HBM traffic stays one read regardless of batch).
# Removes round 2's b<=1024 cap, where b=2048 at 10M x 768 int8 regressed
# to the chunked XLA scan (BASELINE.md row 5, VERDICT r3 #3).
_QBLK_MAX = 1024


def _q_tile(b: int) -> int:
    return b if b <= _QBLK_MAX else _QBLK_MAX


def _block_rows(b: int, d: int, itemsize: int, n: int | None = None) -> int:
    """Largest corpus block (rows) keeping VMEM under ``_VMEM_BUDGET``: the
    corpus tile is double-buffered by the pipeline and the (qblk, blk) f32
    score tile lives alongside it. ``b`` is the per-tile query height.

    When ``n`` is given, the block additionally shrinks to the largest
    power-of-two that divides the corpus — engine buckets at >=1M rows are
    multiples of 2^17 (core/store.bucket_size) so the full block survives
    there, while odd-multiple small buckets degrade gracefully instead of
    pushing the whole call out of contract."""
    qblk = _q_tile(b)
    blk = _BLK_N_DEFAULT
    while blk > GROUP and (
        2 * blk * d * itemsize + 4 * qblk * blk
    ) > _VMEM_BUDGET:
        blk //= 2
    if n is not None:
        while blk > GROUP and n % blk:
            blk //= 2
    return blk


def _emit_gmax(out_ref, s, transposed: bool):
    """Group-reduce the (qblk, blk) score tile and store one grid slice.

    Output layout is chosen by the caller (see :func:`_out_layout`): the
    transposed (blkg, qblk) orientation keeps the array's LAST dim a lane
    multiple — the straight (qblk, blkg) orientation's last dim is blkg
    (typically 16), which TPU T(8,128) tiling pads 8x, inflating a 512 MB
    result to 4 GB of allocation AND write traffic at 2^24 x 768 int8
    (the round-3 capacity OOM). The in-kernel transpose of the small max
    tile measured FASTER than the padded store (8.46 vs 9.18 ms at
    1M x 384 b=1024, results.jsonl probe)."""
    b, blk = s.shape
    gm = jnp.max(s.reshape(b, blk // GROUP, GROUP), axis=-1)
    out_ref[0] = gm.T if transposed else gm


def _gmax_kernel_f(q_ref, v_ref, extra_ref, out_ref, *, transposed):
    # q: (B, d) f, v: (blk, d) f, extra: (1, blk) f32
    # out: one grid step's (1, qblk, blkg) or transposed (1, blkg, qblk)
    # slice — 3D so the block equals the array's trailing dims, satisfying
    # Mosaic's lane tiling; the caller transposes back outside the kernel
    s = jax.lax.dot_general(
        q_ref[:],
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + extra_ref[:]
    # NaN scrub mirrors the XLA path: inf scores on masked rows (extra=-inf)
    # would otherwise poison the group max and steal a winner slot
    s = jnp.where(jnp.isnan(s), -jnp.inf, s)
    _emit_gmax(out_ref, s, transposed)


def _gmax_kernel_int8(q_ref, qs_ref, v_ref, vs_ref, extra_ref, out_ref, *, transposed):
    # q: (B, d) i8, qs: (B, 1) f32, v: (blk, d) i8, vs/extra: (1, blk) f32
    s = jax.lax.dot_general(
        q_ref[:],
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = s.astype(jnp.float32) * (qs_ref[:] * vs_ref[:]) + extra_ref[:]
    s = jnp.where(jnp.isnan(s), -jnp.inf, s)
    _emit_gmax(out_ref, s, transposed)


def _windows(grid: int) -> tuple[tuple[int, int], ...]:
    """((block_offset, nblocks), ...) grid windows for one stage-1 scan.

    Grids past CONFIG.pallas_max_grid_blocks split into near-equal windows
    of at most that many corpus blocks; each window is its own pallas_call
    over the SAME operands with block-offset index maps (no operand slicing
    — a top-level slice of a capacity plane would copy gigabytes per call)
    and the per-window stage-1 outputs concatenate along the block axis.
    Exact by construction: every block's maxes are computed by exactly one
    window from the same operand bytes. Cost: one extra HBM round trip of
    the small stage-1 result for the concat (~3 ms against a ~53 ms 2^24
    scan). Why: the remote Mosaic compile helper has failed 9+ hours
    straight on every 2048-block gmax form while 1280-block programs
    compile fine (probe_2p24_sub, round 5) — capacity scans must not
    depend on the helper accepting its largest grids. The cap is read at
    trace time (the repo's documented config semantics — see
    rank_top_k_grouped_pallas)."""
    from hyperdb_tpu.config import CONFIG

    cap = CONFIG.pallas_max_grid_blocks
    if cap <= 0 or grid <= cap:
        return ((0, grid),)
    nwin = -(-grid // cap)
    base = -(-grid // nwin)
    out = []
    off = 0
    while off < grid:
        g = min(base, grid - off)
        out.append((off, g))
        off += g
    return tuple(out)


def _cat_windows(outs):
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _out_layout(pl, grid: int, b: int, qblk: int, blkg: int):
    """(transposed, out_spec, out_shape) for a gmax pallas_call.

    Lane-aligned (transposed) whenever the query tile is a lane multiple;
    below 128 queries the straight layout pads less (qblk in the lane dim
    would pad 128/qblk x while blkg >= 8 in the sublane dim pads at most
    8/blkg x on a result that is tiny at such batches anyway)."""
    transposed = qblk % 128 == 0
    if transposed:
        return (
            True,
            pl.BlockSpec((1, blkg, qblk), lambda i, j: (i, 0, j)),
            jax.ShapeDtypeStruct((grid, blkg, b), jnp.float32),
        )
    return (
        False,
        pl.BlockSpec((1, qblk, blkg), lambda i, j: (i, j, 0)),
        jax.ShapeDtypeStruct((grid, b, blkg), jnp.float32),
    )


def _untile_gmax(out, transposed: bool, b: int, n: int):
    """(grid, ., .) pallas output -> (B, N // GROUP) group-max matrix."""
    perm = (2, 0, 1) if transposed else (1, 0, 2)
    return out.transpose(*perm).reshape(b, n // GROUP)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmax_f(
    queries: jax.Array,
    vectors: jax.Array,
    extra: jax.Array,
    interpret: bool = False,
):
    """Per-group score maxes for one-matmul metrics (dot / prenorm cosine).

    Args:
        queries: (B, d), B % 8 == 0 (f32 sublane), d % 128 == 0.
        vectors: (N, d) corpus, N % block == 0 (engine bucket padding).
        extra: (N,) f32 additive term — recency on live rows, -inf (or a
            very negative finite) on masked/padding rows, 0 otherwise.

    Returns: (B, N // 128) f32 group maxes.
    """
    from jax.experimental import pallas as pl

    b, d = queries.shape
    n = vectors.shape[0]
    qblk = _q_tile(b)
    blk = _block_rows(b, d, vectors.dtype.itemsize, n)
    grid = n // blk
    transposed = qblk % 128 == 0
    # 2-D grid (corpus blocks, query tiles) with query tiles INNERMOST:
    # the corpus block's index map ignores j, so Pallas keeps the fetched
    # block resident across the j sweep — one corpus read total. Capacity
    # grids run as block-offset windows (see _windows).
    outs = []
    for off, gw in _windows(grid):
        _, out_spec, out_shape = _out_layout(pl, gw, b, qblk, blk // GROUP)
        outs.append(pl.pallas_call(
            functools.partial(_gmax_kernel_f, transposed=transposed),
            grid=(gw, b // qblk),
            in_specs=[
                pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
                pl.BlockSpec((blk, d), lambda i, j, off=off: (i + off, 0)),
                pl.BlockSpec((1, blk), lambda i, j, off=off: (0, i + off)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(queries, vectors, extra.reshape(1, n)))
    return _untile_gmax(_cat_windows(outs), transposed, b, n)


@functools.partial(jax.jit, static_argnames=("sub", "interpret", "dual"))
def gmax_f_sub(
    queries: jax.Array,
    vectors: jax.Array,
    extra: jax.Array,
    sub: int = 32,
    interpret: bool = False,
    dual: bool = True,
):
    """Per-group AND per-subgroup score maxes for one-matmul metrics.

    Two-level selection needs per-``sub``-row maxes alongside the 128-row
    group maxes so stage 3 can gather only (B, k, sub, d) candidate rows —
    4x less rescore traffic at sub=32 (the stage-3 gather is the pipeline's
    whole tail: 9.2 of 23.8 ms at b=2048, probe_sub32 2026-08-19).

    Mosaic rejects lane-splitting reshapes below the 128-lane width
    ((qblk, blk) -> (qblk, blk/32, 32) fails "infer-vector-layout:
    unsupported shape cast"), so this kernel SWAPS the matmul orientation:
    scores come out (blk, qblk) with corpus rows on SUBLANES, where the /32
    and /128 splits leave the minor dim untouched and both reduces are
    sublane reduces. Bonus: the max tiles land directly in the transposed
    (blkg, qblk) output layout — no in-kernel transpose — measuring
    slightly FASTER than :func:`gmax_f` (13.6 vs 14.0 ms at b=2048).

    Args: as :func:`gmax_f`; ``sub`` must divide :data:`GROUP` and the
    block size (any power of two 8..128 does). Requires B % 128 == 0
    (lane-aligned query tiles — the big-batch regime this serves).

    Returns: ``(gm, sm)`` — (B, N/128) group maxes, (B, N/sub) subgroup
    maxes, both f32.
    """
    from jax.experimental import pallas as pl

    b, d = queries.shape
    n = vectors.shape[0]
    qblk = _q_tile(b)
    blk = _block_rows(b, d, vectors.dtype.itemsize, n)
    # SWAPPED-orientation cap (round 5): at b=256 the budget formula admits
    # blk=16384 (every b>=512 shape lands on 8192), and the remote compile
    # helper crashes DETERMINISTICALLY on the resulting (16384, qblk)
    # sublane-major tile + /sub /128 sublane splits — six consecutive
    # exit-code-1 failures across ~11 min in the round-5 gate (the round-4
    # red-gate case), while the same b=256 shape compiles fine in the
    # straight orientation (gmax_f) and blk=8192 swapped tiles are the
    # chip-validated production shapes (b=512..4096). Clamp to the
    # validated block; one extra grid step at b=256 is noise against the
    # corpus-read floor.
    while blk > 8192:
        blk //= 2
    grid = n // blk
    blkg = blk // GROUP
    blks = blk // sub

    def kernel(q_ref, v_ref, extra_ref, gm_ref, sm_ref=None):
        s = jax.lax.dot_general(
            v_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk, qblk) — corpus rows on sublanes
        s = s + extra_ref[:]  # (blk, 1) broadcasts across the lane dim
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        blkr, bq = s.shape
        if sm_ref is None:  # single-output form: gm_ref holds the SM maxes
            gm_ref[0] = jnp.max(s.reshape(blkr // sub, sub, bq), axis=1)
            return
        gm_ref[0] = jnp.max(s.reshape(blkr // GROUP, GROUP, bq), axis=1)
        sm_ref[0] = jnp.max(s.reshape(blkr // sub, sub, bq), axis=1)

    if dual:
        gms, sms = [], []
        for off, gw in _windows(grid):
            gm_w, sm_w = pl.pallas_call(
                kernel,
                grid=(gw, b // qblk),
                in_specs=[
                    pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
                    pl.BlockSpec((blk, d), lambda i, j, off=off: (i + off, 0)),
                    pl.BlockSpec((blk, 1), lambda i, j, off=off: (i + off, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, blkg, qblk), lambda i, j: (i, 0, j)),
                    pl.BlockSpec((1, blks, qblk), lambda i, j: (i, 0, j)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((gw, blkg, b), jnp.float32),
                    jax.ShapeDtypeStruct((gw, blks, b), jnp.float32),
                ],
                compiler_params=None if interpret else _compiler_params(),
                interpret=interpret,
            )(queries, vectors, extra.reshape(n, 1))
            gms.append(gm_w)
            sms.append(sm_w)
        gm = _cat_windows(gms).transpose(2, 0, 1).reshape(b, n // GROUP)
        sm = _cat_windows(sms).transpose(2, 0, 1).reshape(b, n // sub)
        return gm, sm

    # Single-output form (round 5): the kernel emits ONLY the subgroup
    # maxes and the 128-row group maxes are derived outside by an XLA
    # max over each ratio-run — bitwise identical (max is exact and
    # associative over the same operands). Motivation: the dual-output
    # program is the one gmax form that has never compiled at capacity
    # scale (grid 2048 at 2^24 rows; probe_2p24_sub), while single-output
    # programs at the same grid compile fine. Costs one extra HBM pass
    # over sm (~0.7 ms at 1M b=2048 against a 13.6 ms stage 1).
    sms = []
    for off, gw in _windows(grid):
        sms.append(pl.pallas_call(
            kernel,
            grid=(gw, b // qblk),
            in_specs=[
                pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
                pl.BlockSpec((blk, d), lambda i, j, off=off: (i + off, 0)),
                pl.BlockSpec((blk, 1), lambda i, j, off=off: (i + off, 0)),
            ],
            out_specs=pl.BlockSpec((1, blks, qblk), lambda i, j: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct((gw, blks, b), jnp.float32),
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(queries, vectors, extra.reshape(n, 1)))
    sm = _cat_windows(sms).transpose(2, 0, 1).reshape(b, n // sub)
    gm = jnp.max(
        sm.reshape(b, n // GROUP, GROUP // sub), axis=-1
    )
    return gm, sm


def _gmax_kernel_jaccard(
    q_ref, qc_ref, v_ref, aux_ref, extra_ref, out_ref, *, transposed
):
    # q: (B, d) 0/1 binarized, qc: (B, 1) f32 = |qb|, v: (blk, d) 0/1,
    # aux: (1, blk) f32 = popcount |vb|, extra: (1, blk) f32 mask additive.
    # The true jaccard score inter/(|qb|+|vb|-inter) is NOT a monotone
    # transform of any dot surrogate (|vb| varies per row), so unlike
    # euclid/hamming it needs its own VPU epilogue — still one matmul and
    # the same VMEM-resident group-max.
    inter = jax.lax.dot_general(
        q_ref[:],
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = inter / (qc_ref[:] + aux_ref[:] - inter)  # 0/0 -> NaN (both empty)
    s = jnp.where(jnp.isnan(s), -jnp.inf, s)  # reference NaN->-inf scrub
    s = s + extra_ref[:]  # -inf on masked/padding rows
    _emit_gmax(out_ref, s, transposed)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmax_jaccard(
    queries: jax.Array,
    vectors: jax.Array,
    q_sum: jax.Array,
    aux: jax.Array,
    extra: jax.Array,
    interpret: bool = False,
):
    """Per-group maxes of the TRUE jaccard scores (binary 0/1 operands).

    Shapes as :func:`gmax_f` plus ``q_sum`` (B, 1) f32 per-query popcounts
    and ``aux`` (N,) f32 per-row popcounts; ``extra`` carries the mask
    (and recency — additive after the true score, so exactness holds).
    """
    from jax.experimental import pallas as pl

    b, d = queries.shape
    n = vectors.shape[0]
    qblk = _q_tile(b)
    blk = _block_rows(b, d, vectors.dtype.itemsize, n)
    grid = n // blk
    transposed = qblk % 128 == 0
    # query tiles innermost — corpus block fetched once (see gmax_f);
    # capacity grids run as block-offset windows (see _windows)
    outs = []
    for off, gw in _windows(grid):
        _, out_spec, out_shape = _out_layout(pl, gw, b, qblk, blk // GROUP)
        outs.append(pl.pallas_call(
            functools.partial(_gmax_kernel_jaccard, transposed=transposed),
            grid=(gw, b // qblk),
            in_specs=[
                pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
                pl.BlockSpec((qblk, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((blk, d), lambda i, j, off=off: (i + off, 0)),
                pl.BlockSpec((1, blk), lambda i, j, off=off: (0, i + off)),
                pl.BlockSpec((1, blk), lambda i, j, off=off: (0, i + off)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(queries, q_sum, vectors, aux.reshape(1, n), extra.reshape(1, n)))
    return _untile_gmax(_cat_windows(outs), transposed, b, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmax_int8(
    q_i8: jax.Array,
    q_scale: jax.Array,
    v_i8: jax.Array,
    v_scales: jax.Array,
    extra: jax.Array,
    interpret: bool = False,
):
    """Per-group maxes of the rescaled int8 scores:
    max over each 128-row group of  (q_i8 . v_i8) * q_scale * v_scale + extra.
    Shapes as :func:`gmax_f`; q_scale (B,), v_scales (N,).
    """
    from jax.experimental import pallas as pl

    b, d = q_i8.shape
    n = v_i8.shape[0]
    qblk = _q_tile(b)
    blk = _block_rows(b, d, 1, n)
    grid = n // blk
    transposed = qblk % 128 == 0
    # query tiles innermost — corpus block fetched once (see gmax_f);
    # capacity grids run as block-offset windows (see _windows)
    outs = []
    for off, gw in _windows(grid):
        _, out_spec, out_shape = _out_layout(pl, gw, b, qblk, blk // GROUP)
        outs.append(pl.pallas_call(
            functools.partial(_gmax_kernel_int8, transposed=transposed),
            grid=(gw, b // qblk),
            in_specs=[
                pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
                pl.BlockSpec((qblk, 1), lambda i, j: (j, 0)),
                pl.BlockSpec((blk, d), lambda i, j, off=off: (i + off, 0)),
                pl.BlockSpec((1, blk), lambda i, j, off=off: (0, i + off)),
                pl.BlockSpec((1, blk), lambda i, j, off=off: (0, i + off)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(
            q_i8,
            q_scale.reshape(b, 1),
            v_i8,
            v_scales.reshape(1, n),
            extra.reshape(1, n),
        ))
    return _untile_gmax(_cat_windows(outs), transposed, b, n)


def supported(b: int, n: int, d: int) -> bool:
    """Shape gate: engine bucket padding guarantees these for big corpora.

    Batches above ``_QBLK_MAX`` ride the query-tile grid dimension (each
    tile's VMEM working set equals the b=1024 case that always compiled),
    so the round-2 b<=1024 cap is gone; they only need to divide evenly
    into tiles. Sub-tile batches must be sublane-aligned (b % 8).

    ``_block_rows(n=...)`` degrades the block to divide odd-multiple
    buckets; below 1024 rows/block the kernel shape was never measured
    (every probed win used blk >= 2048), so such corpora stay on XLA.
    """
    blk = _block_rows(b, d, 1, n)
    tiles_ok = (b % 8 == 0) if b <= _QBLK_MAX else (b % _QBLK_MAX == 0)
    return (
        tiles_ok
        and d % 128 == 0
        and blk >= 1024
        and n % blk == 0
        and n // GROUP >= 2
    )


def make_extra(n: int, row_mask=None, recency=None):
    """Fold mask + recency into the kernel's one additive (N,) f32 vector."""
    extra = jnp.zeros((n,), dtype=jnp.float32)
    if recency is not None:
        extra = extra + recency.astype(jnp.float32)
    if row_mask is not None:
        extra = jnp.where(row_mask, extra, float("-inf"))
    return extra


def _select_subgroups(gm, sm, b: int, n: int, k: int, sub: int):
    """Two-level selection: top-k groups -> (B, k) global subgroup ids.

    Shared by the dot and metric-surrogate Pallas routes (ADVICE r4 #2 —
    one copy of the tie handling). The ``spos`` sort keeps candidates in
    the oracle's (group-rank, subgroup-position) order: discrete metrics
    (hamming) tie at the k-th value, and the final top_k must prefer the
    same leftmost candidate the single-level/XLA forms prefer.
    """
    ratio = GROUP // sub
    _, gidx = jax.lax.top_k(gm, k)  # (B, k) group ids
    smg = sm.reshape(b, n // GROUP, ratio)
    sub_cand = jnp.take_along_axis(smg, gidx[..., None], axis=1)  # (B,k,ratio)
    _, spos = jax.lax.top_k(sub_cand.reshape(b, k * ratio), k)
    spos = jnp.sort(spos, axis=-1)
    return (
        jnp.take_along_axis(gidx, spos // ratio, axis=-1) * ratio
        + spos % ratio
    )


def _finish_candidates(cs, sidx, b: int, k: int, width: int):
    """Final top-k over (B, k, width) rescored candidate scores -> global
    row ids (width = subgroup size, or GROUP on the single-level tails)."""
    cs = cs.reshape(b, k * width)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(sidx, pos // width, axis=-1)
    return vals, (winner * width + pos % width).astype(jnp.int32)


def rank_top_k_grouped_pallas(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    interpret: bool = False,
):
    """Dot-metric grouped exact top-k with the Pallas stage-1 kernel.

    Same three stages as ops/ranking.rank_top_k_grouped (group fixed at 128):
    per-group maxes (Pallas — no HBM epilogue materialization), narrow
    ``lax.top_k`` over (B, g), exact rescore of the winners in XLA. With
    ``config.pallas_subgroup`` (default 32) selection refines group ->
    subgroup before the rescore (see :func:`gmax_f_sub`). Index-identical
    to the XLA formulation (same containment argument; ties at the k-th
    value resolve by the same lax.top_k order).

    This thin wrapper resolves the CONFIG knob OUTSIDE the jitted impl so
    the impl's own jit cache keys on it. Callers that reach here through
    an outer jitted program (ranking.rank_top_k, the sharded shard_map
    program) read the knob at THEIR trace time and cache by shape only —
    the repo's documented trace-time-config semantics (see rank_top_k's
    thresholds note): changing the knob at runtime affects new programs,
    not already-compiled ones (ADVICE r4 #1).
    """
    from hyperdb_tpu.config import CONFIG

    sub = CONFIG.pallas_subgroup
    if not (8 <= sub < GROUP and GROUP % sub == 0):
        sub = 0
    return _grouped_pallas_impl(
        queries, vectors, row_mask, recency, k=k, interpret=interpret,
        sub=sub, dual=bool(CONFIG.pallas_sub_dual),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "interpret", "sub", "dual")
)
def _grouped_pallas_impl(
    queries: jax.Array,
    vectors: jax.Array,
    row_mask: jax.Array | None,
    recency: jax.Array | None,
    k: int,
    interpret: bool,
    sub: int,
    dual: bool = True,
):
    from hyperdb_tpu.ops import metrics as _metrics
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    n, d = vectors.shape
    b = queries.shape[0]
    blk = _block_rows(b, d, vectors.dtype.itemsize, n)
    out_of_contract = (
        not supported(b, n, d)
        or n % blk
        or n // GROUP < k
        or vectors.dtype == jnp.float16  # Mosaic has no f16
        # f32 exactness needs HIGHEST-precision matmuls, which the kernel
        # does not request — the Pallas path serves low-precision scans
        # (measured wins: chunked-regime int8, and bf16 at batch >= 512
        # where XLA materializes the epilogue — ops/ranking._use_pallas_gmax_f)
        or _metrics.dot_precision(queries, vectors) != jax.lax.Precision.DEFAULT
    )
    if out_of_contract:
        return rank_top_k_grouped(
            queries, vectors, k=k, row_mask=row_mask, recency=recency,
            group=GROUP,
        )
    extra = make_extra(n, row_mask, recency)

    # Two-level selection (round 4): stage 1 also emits per-sub-row maxes,
    # selection refines top-k groups -> top-k subgroups, and the stage-3
    # rescore gathers only (B, k, sub, d) rows. The gather was the whole
    # pipeline tail (9.2 of 23.8 ms at b=2048); measured 1.32x end to end
    # at b=2048/4096, index-identical (probe_sub32, config.pallas_subgroup).
    # Exactness: a subgroup holding a true top-j row (j <= k) has
    # submax >= s_j; were it outside the top-k subgroups, k subgroups would
    # each hold a row outscoring s_j — contradiction. The same argument one
    # level up keeps those subgroups inside the top-k groups, so the
    # refinement loses nothing (ties at the k-th value admit any winner
    # set, the standing grouped-route caveat).
    if (
        sub
        and n % sub == 0
        and _q_tile(b) % 128 == 0  # swapped kernel stores lane-major tiles
    ):
        gm, sm = gmax_f_sub(
            queries, vectors, extra, sub=sub, interpret=interpret, dual=dual
        )
        sidx = _select_subgroups(gm, sm, b, n, k, sub)
        r3 = vectors.reshape(n // sub, sub, d)
        e3 = extra.reshape(n // sub, sub)
        cand = jnp.take(r3, sidx, axis=0)  # (B, k, sub, d)
        cs = jnp.einsum(
            "bd,bksd->bks", queries, cand, preferred_element_type=jnp.float32
        )
        cs = jnp.where(jnp.isnan(cs), float("-inf"), cs)
        cs = cs + jnp.take(e3, sidx, axis=0)
        return _finish_candidates(cs, sidx, b, k, sub)

    gm = gmax_f(queries, vectors, extra, interpret=interpret)  # (B, g)
    _, gidx = jax.lax.top_k(gm, k)  # (B, k)

    g = n // GROUP
    r3 = vectors.reshape(g, GROUP, d)
    e3 = extra.reshape(g, GROUP)
    cand = jnp.take(r3, gidx, axis=0)  # (B, k, GROUP, d)
    cs = jnp.einsum(
        "bd,bkgd->bkg", queries, cand, preferred_element_type=jnp.float32
    )
    cs = jnp.where(jnp.isnan(cs), float("-inf"), cs)
    cs = cs + jnp.take(e3, gidx, axis=0)
    return _finish_candidates(cs, gidx, b, k, GROUP)


def rank_top_k_grouped_metric_pallas(
    queries: jax.Array,
    rows: jax.Array,
    row_aux: jax.Array,
    k: int,
    metric: str,
    row_mask: jax.Array | None = None,
    interpret: bool = False,
):
    """CONFIG-resolving wrapper (see :func:`rank_top_k_grouped_pallas`):
    the jit cache keys on the subgroup knob via a static arg."""
    from hyperdb_tpu.config import CONFIG

    sub = CONFIG.pallas_subgroup
    if not (8 <= sub < GROUP and GROUP % sub == 0):
        sub = 0
    return _grouped_metric_pallas_impl(
        queries, rows, row_aux, row_mask,
        k=k, metric=metric, interpret=interpret, sub=sub,
        dual=bool(CONFIG.pallas_sub_dual),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "interpret", "sub", "dual")
)
def _grouped_metric_pallas_impl(
    queries: jax.Array,
    rows: jax.Array,
    row_aux: jax.Array,
    row_mask: jax.Array | None,
    k: int,
    metric: str,
    interpret: bool,
    sub: int,
    dual: bool = True,
):
    """Euclidean/hamming grouped exact top-k with the Pallas stage-1 kernel.

    The true scores are monotone transforms of the per-row SURROGATE
    ``u = 2 q.v - aux`` (aux = |v|^2 for euclidean over raw rows, popcount
    |vb| for hamming over 0/1 rows):

        euclidean: 1/(1 + sqrt(max(|q|^2 - u, 0)))   — non-decreasing in u
        hamming:   (d - |qb|) + u                     — affine in u

    so the per-group max of the true score is the transform of the
    per-group max of u, and stage 1 can ride the existing dot-form kernel:
    ``gmax_f(2*q, rows, extra = -aux [masked])``. Doubling the query is a
    power-of-two scale — bitwise ``2*(q.v)`` in the f32 accumulator — so
    the surrogate ranks groups exactly as the XLA epilogue form
    (ops/ranking.rank_top_k_grouped_metric). Stage 3 rescores the winning
    groups with the TRUE metric epilogue, identical to the XLA path.
    Selection can differ from the XLA form only across rows whose f32
    scores tie exactly (clamped euclidean zeros / ulp-level rounding), where
    any winner set is valid — the same caveat as every grouped kernel here.

    Jaccard has no dot surrogate (|vb| varies per row inside the ratio), so
    its stage 1 is the :func:`gmax_jaccard` kernel computing the TRUE score
    in VMEM — same traffic shape, exact group maxes by construction.

    Recency breaks the monotonicity argument (it adds per-row AFTER the
    transform): callers route recency queries to the XLA form.
    """
    from hyperdb_tpu.ops import metrics as _metrics
    from hyperdb_tpu.ops.ranking import (
        NEG_INF,
        _grouped_metric_scores,
        rank_top_k_grouped_metric,
    )

    n, d = rows.shape
    b = queries.shape[0]
    blk = _block_rows(b, d, rows.dtype.itemsize, n)
    if (
        metric not in (
            "euclidean_metric", "hamming_distance", "jaccard_similarity",
        )
        or not supported(b, n, d)
        or n % blk
        or n // GROUP < k
        or rows.dtype == jnp.float16  # Mosaic has no f16
    ):
        return rank_top_k_grouped_metric(
            queries, rows, row_aux, k, metric, row_mask=row_mask,
            group=GROUP,
        )
    if metric in ("hamming_distance", "jaccard_similarity"):
        q32 = (queries > 0).astype(jnp.float32)
    else:
        q32 = queries.astype(jnp.float32)
    qq = _metrics._match_low_precision(q32, rows)
    if _metrics.dot_precision(qq, rows) != jax.lax.Precision.DEFAULT:
        # f32 corpora need HIGHEST-precision matmuls the kernel won't request
        return rank_top_k_grouped_metric(
            queries, rows, row_aux, k, metric, row_mask=row_mask,
            group=GROUP,
        )

    aux32 = row_aux.astype(jnp.float32)
    if metric == "jaccard_similarity":
        qsum = jnp.sum(q32, axis=-1, keepdims=True)  # (B, 1) f32 popcounts
        gm = gmax_jaccard(
            qq, rows, qsum, aux32, make_extra(n, row_mask),
            interpret=interpret,
        )  # (B, g) TRUE grouped maxes
    else:
        extra = make_extra(n, row_mask) - aux32  # -inf on masked survives
        # Two-level selection: the surrogate's monotone (non-decreasing)
        # transform to the true score makes a subgroup's surrogate max and
        # true-score max coincide in ORDER, so the group->subgroup
        # containment argument (rank_top_k_grouped_pallas) transfers
        # verbatim. Jaccard stays single-level (its TRUE-score kernel has
        # no dual-output variant yet).
        if (
            sub
            and n % sub == 0
            and _q_tile(b) % 128 == 0
        ):
            gm, sm = gmax_f_sub(
                qq * 2, rows, extra, sub=sub, interpret=interpret, dual=dual
            )
            sidx = _select_subgroups(gm, sm, b, n, k, sub)
            r3 = rows.reshape(n // sub, sub, d)
            aux3 = aux32.reshape(n // sub, sub)
            cand = jnp.take(r3, sidx, axis=0)  # (B, k, sub, d)
            inter_c = jnp.einsum(
                "bd,bksd->bks", qq, cand, preferred_element_type=jnp.float32
            )
            cs = _grouped_metric_scores(
                inter_c, jnp.take(aux3, sidx, axis=0), q32, metric, d
            )
            cs = jnp.where(jnp.isnan(cs), NEG_INF, cs)
            if row_mask is not None:
                cs = jnp.where(
                    jnp.take(row_mask.reshape(n // sub, sub), sidx, axis=0),
                    cs, NEG_INF,
                )
            return _finish_candidates(cs, sidx, b, k, sub)
        gm = gmax_f(qq * 2, rows, extra, interpret=interpret)  # surrogate
    _, gidx = jax.lax.top_k(gm, k)  # (B, k)

    g = n // GROUP
    r3 = rows.reshape(g, GROUP, d)
    aux3 = aux32.reshape(g, GROUP)
    cand = jnp.take(r3, gidx, axis=0)  # (B, k, GROUP, d)
    inter_c = jnp.einsum(
        "bd,bkgd->bkg", qq, cand, preferred_element_type=jnp.float32
    )
    cs = _grouped_metric_scores(
        inter_c, jnp.take(aux3, gidx, axis=0), q32, metric, d
    )
    cs = jnp.where(jnp.isnan(cs), NEG_INF, cs)
    if row_mask is not None:
        cs = jnp.where(
            jnp.take(row_mask.reshape(g, GROUP), gidx, axis=0), cs, NEG_INF
        )
    return _finish_candidates(cs, gidx, b, k, GROUP)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def rank_top_k_int8_pallas(
    queries: jax.Array,
    v_i8: jax.Array,
    v_scales: jax.Array,
    k: int,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    interpret: bool = False,
):
    """Int8 grouped top-k with the Pallas stage-1 kernel (int8-pure mode:
    quantized scores, no full-precision rescore rows). Mirrors
    ops/quantized.rank_top_k_int8 without ``rescore_rows``."""
    from hyperdb_tpu.ops.quantized import (
        _quantize_device,
        _rescore_groups,
        rank_top_k_int8,
    )

    n, d = v_i8.shape
    b = queries.shape[0]
    blk = _block_rows(b, d, 1, n)
    if not supported(b, n, d) or n % blk or n // GROUP < k:
        # out-of-contract shapes degrade to the XLA scan (whose internal
        # pallas routing re-checks supported(), so this cannot recurse)
        return rank_top_k_int8(
            queries, v_i8, v_scales, k=k, row_mask=row_mask, recency=recency
        )
    q32 = queries.astype(jnp.float32)
    q_i8, q_scale = _quantize_device(q32)
    extra = make_extra(n, row_mask, recency)
    gm = gmax_int8(q_i8, q_scale, v_i8, v_scales, extra, interpret=interpret)
    _, gidx = jax.lax.top_k(gm, k)
    # stage 3 is the SAME exact group rescore the engine pairs with
    # gmax_int8 — shared so masking/recency/precision fixes reach both
    return _rescore_groups(
        q_i8, q_scale, v_i8, v_scales, gidx, GROUP, row_mask, recency
    )
