"""Fused score + top-k Pallas TPU kernel (the BASELINE.json north star).

The XLA brute-force path materializes the (B, N) score matrix in HBM and
then runs TopK over it — for a 1M-row corpus and a 64-query batch that is an
extra 256 MB written + read per batch, roughly doubling HBM traffic. This
kernel streams the corpus through VMEM in row tiles and carries a running
per-query top-k in VMEM scratch across grid steps, so HBM traffic is exactly
one read of the corpus:

    for each (TILE_N, d) corpus tile (sequential TPU grid):
        s    = q @ tile.T            (MXU, f32 accumulation)
        s   += recency; s = mask ? s : -inf        (fused VPU epilogue)
        carry = top_k(concat(carry, s))            (VPU k-step selection)
    outputs written once on the last step

Selection is an unrolled K-step max/argmax sweep — exact, with lax.top_k's
lowest-index tie-breaking reproduced by construction (carry columns hold
earlier rows and argmax takes the first occurrence).

Supported metrics: dot_product, cosine (pre-normalized rows), and
euclidean_metric via precomputed row square norms. Manhattan/jaccard/
pearson/hamming stay on the XLA path (no matmul form or NaN semantics).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)  # sentinel; avoids -inf NaN traps

FUSED_METRICS = ("dot_product", "cosine_similarity", "euclidean_metric")


def _rolled_loop(k, body, init):
    """K-iteration loop that Mosaic will NOT fully unroll.

    A fori_loop with static bounds gets unrolled by the Mosaic pipeline,
    stack-allocating every iteration's temporaries at once (~65 MB for
    K=10 x (B, TILE_N) buffers). A while_loop with a carried counter stays
    rolled, so only one iteration's buffers are ever live.
    """

    def cond(carry):
        return carry[0] < k

    def step(carry):
        j = carry[0]
        return (j + 1,) + tuple(body(j, carry[1:]))

    out = jax.lax.while_loop(cond, step, (jnp.int32(0),) + tuple(init))
    return out[1:]


def _kernel(
    q_ref,
    rows_ref,
    valid_ref,
    rec_ref,
    norms_ref,
    vals_out,
    idx_out,
    vals_s,
    idx_s,
    *,
    k: int,
    tile_n: int,
    metric: str,
):
    i = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    b = q_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        vals_s[:] = jnp.full(vals_s.shape, NEG_INF, dtype=jnp.float32)
        idx_s[:] = jnp.zeros(idx_s.shape, dtype=jnp.int32)

    q = q_ref[:]
    tile = rows_ref[:]
    s = jax.lax.dot_general(
        q,
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, TILE_N)

    # aux inputs arrive as (1, TILE_N) lane-major blocks: broadcasting them
    # over the batch is free, whereas a (TILE_N, 1) -> (1, TILE_N) reshape
    # would be a sublane->lane transpose Mosaic materializes with ~65 MB of
    # relayout scratch.
    if metric == "euclidean_metric":
        qsq = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1)
        d2 = norms_ref[:] - 2.0 * s + qsq[:, None]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        s = 1.0 / (1.0 + dist)

    s = s + rec_ref[:]
    s = jnp.where(valid_ref[:] > 0, s, NEG_INF)

    # Threshold skip (the big win, cf. TPU-KNN): a tile can only change the
    # answer if some query's tile max beats that query's current k-th best.
    # After the first few tiles almost every tile fails this test, so the
    # selection sweep runs O(K) times total instead of O(K * num_tiles) —
    # the kernel cost converges to the matmul + one pass over the scores.
    # Using strict '>' preserves exact lax.top_k tie semantics: an equal
    # score in a later tile has a higher row index and loses the tie anyway.
    tile_max = jnp.max(s, axis=1)  # (B,)
    kth_best = jnp.min(vals_s[:], axis=1)  # (B,)
    need_update = jnp.any(tile_max > kth_best)

    @pl.when(need_update)
    def _update():
        _selection(s, vals_s, idx_s, i=i, b=b, k=k, tile_n=tile_n)

    @pl.when(i == num_tiles - 1)
    def _emit():
        vals_out[:] = vals_s[:]
        idx_out[:] = idx_s[:]


def _selection(s, vals_s, idx_s, *, i, b, k, tile_n):
    """Exact top-k update of the (vals_s, idx_s) carry with tile scores."""
    # Phase 1: tile-local top-k. K-step max/argmax sweep over the (B, TILE_N)
    # scores; results accumulate in (B, K) registers via one-hot writes
    # (dynamic lane stores would need 128-alignment; unrolling would blow the
    # VMEM stack with K live copies of the score tile).
    col_pos = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    slot_pos = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def extract(j, carry):
        (s_cur, tv, ti) = carry
        m = jnp.max(s_cur, axis=1)
        am = jnp.argmax(s_cur, axis=1).astype(jnp.int32)
        sel = col_pos == am[:, None]
        slot = slot_pos == j
        tv = jnp.where(slot, m[:, None], tv)
        ti = jnp.where(slot, am[:, None] + i * tile_n, ti)
        return jnp.where(sel, NEG_INF, s_cur), tv, ti

    _, tile_v, tile_i = _rolled_loop(
        k,
        extract,
        (
            s,
            jnp.full((b, k), NEG_INF, dtype=jnp.float32),
            jnp.zeros((b, k), dtype=jnp.int32),
        ),
    )

    # Phase 2: merge the (B, K) tile winners with the (B, K) running carry.
    # Carry columns come first so argmax's first-occurrence tie-break keeps
    # the lowest global row index, matching lax.top_k.
    mv = jnp.concatenate([vals_s[:], tile_v], axis=1)  # (B, 2K)
    mi = jnp.concatenate([idx_s[:], tile_i], axis=1)
    mcol = jax.lax.broadcasted_iota(jnp.int32, (b, 2 * k), 1)

    def merge(j, carry):
        (comb, ov, oi) = carry
        m = jnp.max(comb, axis=1)
        am = jnp.argmax(comb, axis=1)
        sel = mcol == am[:, None]
        chosen = jnp.max(jnp.where(sel, mi, -1), axis=1)
        slot = slot_pos == j
        ov = jnp.where(slot, m[:, None], ov)
        oi = jnp.where(slot, chosen[:, None], oi)
        return jnp.where(sel, NEG_INF, comb), ov, oi

    _, out_v, out_i = _rolled_loop(
        k,
        merge,
        (
            mv,
            jnp.full((b, k), NEG_INF, dtype=jnp.float32),
            jnp.zeros((b, k), dtype=jnp.int32),
        ),
    )
    vals_s[:] = out_v
    idx_s[:] = out_i


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_n", "interpret")
)
def fused_topk(
    queries: jax.Array,
    rows: jax.Array,
    k: int,
    metric: str = "dot_product",
    row_valid: jax.Array | None = None,
    recency: jax.Array | None = None,
    row_sq_norms: jax.Array | None = None,
    tile_n: int = 2048,
    interpret: bool = False,
):
    """Fused score+top-k over (B, d) queries and (N, d) rows.

    ``rows`` must be pre-normalized for cosine. N is padded to a multiple of
    ``tile_n`` internally; ``row_valid`` marks live rows (None = all live).
    Returns (values (B, k) f32, indices (B, k) i32).
    """
    if metric not in FUSED_METRICS:
        raise ValueError(f"fused_topk does not support metric '{metric}'")
    # Mosaic has no f16 type; bf16 is the TPU-native 16-bit format.
    if rows.dtype == jnp.float16:
        rows = rows.astype(jnp.bfloat16)
    if queries.dtype == jnp.float16:
        queries = queries.astype(jnp.bfloat16)
    b, d = queries.shape
    n = rows.shape[0]
    pad = (-n) % tile_n
    n_pad = n + pad

    # jnp.pad copies the whole corpus on device every call; pass rows
    # already padded to a tile_n multiple to avoid it (the engine's device
    # view pads to power-of-two-step buckets, which tile_n always divides).
    rows_p = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows
    valid = (
        jnp.ones(n, dtype=jnp.int32) if row_valid is None
        else row_valid.astype(jnp.int32)
    )
    valid_p = jnp.pad(valid, (0, pad)).reshape(1, n_pad)
    rec = (
        jnp.zeros(n, dtype=jnp.float32) if recency is None
        else recency.astype(jnp.float32)
    )
    rec_p = jnp.pad(rec, (0, pad)).reshape(1, n_pad)
    if metric == "euclidean_metric":
        if row_sq_norms is None:
            rows32 = rows.astype(jnp.float32)
            row_sq_norms = jnp.sum(rows32 * rows32, axis=1)
        norms_p = jnp.pad(row_sq_norms.astype(jnp.float32), (0, pad)).reshape(
            1, n_pad
        )
    else:
        norms_p = jnp.zeros((1, n_pad), dtype=jnp.float32)

    num_tiles = n_pad // tile_n
    kernel = functools.partial(_kernel, k=k, tile_n=tile_n, metric=metric)

    vals, idx = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d,
            bytes_accessed=n_pad * d * rows.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(queries, rows_p, valid_p, rec_p, norms_p)
    # sentinel -> true -inf for parity with the XLA path
    vals = jnp.where(vals <= NEG_INF, -jnp.inf, vals)
    return vals, idx


def pick_tile(n: int, d: int, dtype_bytes: int = 2, budget_mb: int = 13) -> int:
    """Largest power-of-two row tile whose corpus block fits the VMEM budget.

    Measured on v5e (benchmarks/bench_tile_sweep.py, 1M x 384 bf16, b=64):
    tile 2048 -> 8.4k qps, 8192 -> 10.3k, 16384 -> 10.5k, 32768 -> VMEM OOM.
    The 13 MB budget selects 16384 for d=384.
    """
    tile = 16384
    while tile > 512 and tile * d * dtype_bytes > budget_mb * 1024 * 1024:
        tile //= 2
    return tile
