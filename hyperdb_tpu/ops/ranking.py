"""Fused scoring + recency + top-k ranking.

This replaces the reference's brute-force NumPy ranker
(``/root/reference/hyperdb/ranking_algorithm.py:149-204``: metric -> NaN
scrub -> recency add -> argpartition top-k) with a single jitted XLA program:
one MXU matmul for the scores, fused elementwise epilogue for the NaN/-inf
policy, mask, and recency term, and ``lax.top_k`` for selection — no (B, N)
score matrix ever round-trips to the host.

Two call surfaces:

- :func:`rank_top_k` — the batched device-native core used by the query
  engine. Static over (metric, k); masks and recency are dense arrays.
- :func:`ranking_algorithm_sort` — host-facing parity shim with the exact
  contract of ``hyperDB_ranking_algorithm_sort`` (NaN raises, unknown-metric
  raises, non-2D raises, single-document short-circuit, numpy outputs).

Reference semantics preserved:
- NaN in *inputs* raises ValueError (ranking_algorithm.py:150-151).
- NaN *scores* (constant-vector pearson, 0/0 jaccard) become -inf so they
  rank last (ranking_algorithm.py:174).
- Recency term ``recency_bias * exp(t - max(t))`` added to similarities
  (ranking_algorithm.py:180-186, Q17 in SURVEY.md).
- top_k clamped to the number of rows (ranking_algorithm.py:195).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hyperdb_tpu.ops import metrics as _metrics
from hyperdb_tpu.ops.metrics import METRICS, scores

NEG_INF = float("-inf")

def exact_top_k(s: jax.Array, k: int):
    """Exact top-k along the last axis = XLA's native TopK.

    A two-stage per-block variant (block top-k then merge) was measured
    10-20x SLOWER than native TopK on v5e (per-block sorts dominate;
    BASELINE.md "Engineering findings") and has been removed; the fast wide
    path is :func:`exact_top_k_grouped`, which replaces the block *sort*
    with a block *max*.
    """
    return jax.lax.top_k(s, k)


def exact_top_k_grouped(s: jax.Array, k: int, group: int = 1024):
    """Exact top-k via group-max pre-selection (no wide sorts).

    The earlier two-stage attempt ran ``lax.top_k`` per block — sort-bound
    and 10-20x slower than one native TopK (header note). This formulation
    replaces the per-block *sort* with a per-group *max* (a bandwidth-optimal
    VPU reduce):

        1. gmax[g]   = max over each group of ``group`` scores
        2. top-k of gmax          (width N/group — a narrow sort)
        3. gather the k winning groups' scores (k*group values per row)
        4. final top-k over the gathered candidates

    Exactness: every row with score >= the true k-th score lives in a group
    whose max >= that score, and (ignoring ties at the k-th value, where any
    winner set is valid — argpartition has the same freedom) at most k
    groups satisfy that, so the k selected groups contain the true top-k.
    """
    n = s.shape[-1]
    if n <= k * group or n <= group:
        return jax.lax.top_k(s, k)
    pad = (-n) % group
    if pad:
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, pad)], constant_values=NEG_INF)
    g = s.shape[-1] // group
    lead = s.shape[:-1]
    s3 = s.reshape(*lead, g, group)
    gmax = jnp.max(s3, axis=-1)  # (..., g)
    _, gidx = jax.lax.top_k(gmax, k)  # (..., k)
    cand = jnp.take_along_axis(s3, gidx[..., None], axis=-2)  # (..., k, group)
    cand_flat = cand.reshape(*lead, k * group)
    vals, pos = jax.lax.top_k(cand_flat, k)
    # flattened candidate j sits in group gidx[..., j // group], offset j % group
    winner_group = jnp.take_along_axis(gidx, pos // group, axis=-1)
    idx = winner_group * group + pos % group
    return vals, idx.astype(jnp.int32)


def _auto_group(batch: int) -> int:
    """Measured on v5e (benchmarks/ab_grouped_topk3.py): group=128 is best at
    batch>=128 (53k qps vs 18k native TopK at b=256), 256 at small batches."""
    return 128 if batch >= 128 else 256


@functools.partial(jax.jit, static_argnames=("k", "group"))
def rank_top_k_grouped(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    group: int = 128,
):
    """Exact dot-metric top-k via group-max selection + candidate rescore.

    XLA's native TopK sorts the full (B, N) score matrix — measured 8.5+ ms
    of a 14 ms scan at (256, 1M). This kernel never sorts anything wide:

        1. scores reshaped (B, N/group, group); per-group max (VPU reduce,
           single consumer of the matmul so XLA keeps it in the epilogue)
        2. lax.top_k over the (B, N/group) group maxes — a narrow sort
        3. gather the k winning groups' *corpus rows* and rescore them
           (k*group rows per query; recomputing beats gathering from a
           materialized f32 score tensor by ~25%)
        4. final top-k over (B, k*group)

    Exact: every true top-k row lives in a group whose max >= the k-th
    score, and at most k groups can satisfy that (module ties at the k-th
    value, where any winner set is valid). Index-level agreement with
    native TopK verified on 1M-row corpora (benchmarks/ab_grouped_topk3.py).

    Only valid for metrics whose score is one matmul (dot product, or
    cosine over pre-normalized rows — pass the normalized query). Mask and
    recency are applied identically in stages 1 and 3, preserving the
    containment argument.
    """
    n, d = vectors.shape
    # f32 corpora keep true-f32 MXU accuracy here exactly like the exact
    # path's _qv_dot — otherwise the >=grouped-threshold route would score
    # at the backend's reduced default and break f32 reference parity.
    prec = _metrics.dot_precision(queries, vectors)
    if n % group or n <= k * group:
        s = jax.lax.dot_general(
            queries, vectors, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        s = jnp.where(jnp.isnan(s), NEG_INF, s)
        if recency is not None:
            s = s + recency[None, :]
        if row_mask is not None:
            s = jnp.where(row_mask[None, :], s, NEG_INF)
        return jax.lax.top_k(s, k)

    g = n // group
    r3 = vectors.reshape(g, group, d)
    s3 = jax.lax.dot_general(
        queries, r3, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (B, g, group)
    s3 = jnp.where(jnp.isnan(s3), NEG_INF, s3)
    rec3 = mask3 = None
    if recency is not None:
        rec3 = recency.reshape(g, group)
        s3 = s3 + rec3[None]
    if row_mask is not None:
        mask3 = row_mask.reshape(g, group)
        s3 = jnp.where(mask3[None], s3, NEG_INF)
    gmax = jnp.max(s3, axis=-1)
    _, gidx = jax.lax.top_k(gmax, k)  # (B, k)

    cand_rows = jnp.take(r3, gidx, axis=0)  # (B, k, group, d)
    cs = jnp.einsum(
        "bd,bkgd->bkg", queries, cand_rows,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cs = jnp.where(jnp.isnan(cs), NEG_INF, cs)
    if rec3 is not None:
        cs = cs + jnp.take(rec3, gidx, axis=0)
    if mask3 is not None:
        cs = jnp.where(jnp.take(mask3, gidx, axis=0), cs, NEG_INF)
    cs = cs.reshape(queries.shape[0], k * group)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(gidx, pos // group, axis=-1)
    return vals, (winner * group + pos % group).astype(jnp.int32)


def _manhattan_tile(batch: int, n: int, k: int = 1) -> int:
    """Row tile for the streamed manhattan scan (0 = no valid tile).

    Bounds the per-tile score block to ~16 MB f32 (batch * tile <= 2^22
    cells) so the fused (B, tile, d) difference+reduce stays comfortably in
    on-chip memory at every batch height, and requires tile | n — engine
    corpora are bucket-padded to tile-friendly sizes; odd raw row counts
    fall back to the materializing path (they are small-corpus shapes).
    The tile must also hold ``k`` rows: the stream seeds its carry from
    tile 0 (see rank_top_k_manhattan_stream)."""
    floor = max(512, 1 << max(0, (min(k, n) - 1)).bit_length())
    cap = max(floor, min(8192, (1 << 22) // max(batch, 1)))
    tile = 1 << (cap.bit_length() - 1)  # round down to a power of two
    while tile >= floor and n % tile:
        tile //= 2
    return tile if tile >= floor and n % tile == 0 and n // tile >= 2 else 0


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def rank_top_k_manhattan_stream(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    tile: int = 2048,
):
    """Streamed manhattan top-k — the (B, N) score matrix never exists.

    Manhattan (1/(1+L1), ranking_algorithm.py:54-61) has no matmul form: it
    is a VPU elementwise+reduce metric, so the big-batch engineering that
    removed the (B, N) HBM materialization for every other metric (grouped
    epilogues, Pallas gmax, pearson plane) does not transfer. Instead the
    corpus streams in row tiles through a ``lax.scan`` whose carry holds the
    running exact top-k (VERDICT r3 weak #1):

        per tile: dist (B, tile) = sum_d |v - q|  (XLA fuses the (B, tile,
        d) difference into the reduce — nothing 3-D is materialized);
        score = 1/(1+dist) with the NaN -> -inf scrub, recency and mask
        applied per tile in the reference order; merge = one ``lax.top_k``
        over [carry | tile scores].

    Exactness AND tie-breaking match a single global ``lax.top_k``: the
    carry is SEEDED from tile 0's real scores (so -inf entries carry their
    true row ids — a synthetic -inf init would win ties against genuine
    -inf rows and return fabricated indices), it always holds rows from
    earlier (lower-index) tiles, and it sits LEFT of the tile block in each
    merge; lax.top_k prefers the leftmost of equal values, so ties resolve
    toward the lowest row index exactly like the one-shot sort over the
    full matrix. Requires k <= tile (the seed must hold k rows —
    :func:`_manhattan_tile` guarantees it).

    Peak live memory: O(B * tile) score cells + the (B, k) carry, vs the
    (B, N) f32 matrix of the materializing route (8 GB at b=2048 x 1M —
    the shape that could not compile at all).
    """
    b = queries.shape[0]
    n, d = vectors.shape
    if n % tile:
        raise ValueError(f"tile ({tile}) must divide corpus rows ({n})")
    k_eff = min(k, n)
    if k_eff > tile:
        raise ValueError(f"k ({k_eff}) must be <= tile ({tile})")
    q32 = queries.astype(jnp.float32)
    n_tiles = n // tile
    vt = vectors.reshape(n_tiles, tile, d)

    has_rec = recency is not None
    has_mask = row_mask is not None
    rect = (
        recency.astype(jnp.float32).reshape(n_tiles, tile) if has_rec else None
    )
    maskt = row_mask.reshape(n_tiles, tile) if has_mask else None

    def tile_scores(vb, rb, mb):
        dist = jnp.sum(
            jnp.abs(vb.astype(jnp.float32)[None, :, :] - q32[:, None, :]),
            axis=-1,
        )
        s = 1.0 / (1.0 + dist)
        s = jnp.where(jnp.isnan(s), NEG_INF, s)
        if rb is not None:
            s = s + rb[None, :]
        if mb is not None:
            s = jnp.where(mb[None, :], s, NEG_INF)
        return s

    s0 = tile_scores(
        vt[0],
        rect[0] if has_rec else None,
        maskt[0] if has_mask else None,
    )
    cv0, ci0 = jax.lax.top_k(s0, k_eff)

    def body(carry, xs):
        cv, ci = carry
        vb = xs[0]
        off = xs[-1]
        i = 1
        rb = mb = None
        if has_rec:
            rb = xs[i]
            i += 1
        if has_mask:
            mb = xs[i]
        s = tile_scores(vb, rb, mb)
        gidx = off * tile + jnp.arange(tile, dtype=jnp.int32)
        allv = jnp.concatenate([cv, s], axis=1)
        alli = jnp.concatenate(
            [ci, jnp.broadcast_to(gidx[None, :], (b, tile))], axis=1
        )
        nv, pos = jax.lax.top_k(allv, k_eff)
        ni = jnp.take_along_axis(alli, pos, axis=1)
        return (nv, ni), None

    xs = [vt[1:]]
    if has_rec:
        xs.append(rect[1:])
    if has_mask:
        xs.append(maskt[1:])
    xs.append(jnp.arange(1, n_tiles, dtype=jnp.int32))
    (vals, idx), _ = jax.lax.scan(
        body, (cv0, ci0.astype(jnp.int32)), tuple(xs)
    )
    return vals, idx


# Metrics served by rank_top_k_grouped_metric: one matmul + a per-row scalar
# aux array turn the exact score into a fused epilogue of the grouped matmul.
GROUPED_METRICS = ("euclidean_metric", "hamming_distance", "jaccard_similarity")


def _grouped_metric_scores(inter, aux, q32, metric: str, dim: int):
    """Exact similarity from the inner-product term + per-row constants.

    ``inter`` is q.v (euclidean, over raw rows) or qb.vb (hamming/jaccard,
    over 0/1 binarized rows) with any leading/group shape; ``aux`` broadcasts
    against it carrying |v|^2 (euclidean) or popcount |vb| (hamming/jaccard).
    ``q32`` is the (B, d) f32 query block (raw or binarized to match rows).
    """
    extra = (1,) * (inter.ndim - 1)
    if metric == "euclidean_metric":
        qsq = jnp.sum(q32 * q32, axis=-1).reshape(-1, *extra)
        d2 = aux - 2.0 * inter + qsq
        return 1.0 / (1.0 + jnp.sqrt(jnp.maximum(d2, 0.0)))
    qsum = jnp.sum(q32, axis=-1).reshape(-1, *extra)
    if metric == "hamming_distance":
        return jnp.float32(dim) - (aux + qsum - 2.0 * inter)
    if metric == "jaccard_similarity":
        union = aux + qsum - inter
        return inter / union  # 0/0 -> NaN, scrubbed to -inf by the caller
    raise ValueError(f"metric '{metric}' has no grouped epilogue form")


@functools.partial(jax.jit, static_argnames=("k", "group", "metric"))
def rank_top_k_grouped_metric(
    queries: jax.Array,
    rows: jax.Array,
    row_aux: jax.Array,
    k: int,
    metric: str,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    group: int = 128,
):
    """Grouped exact top-k for euclidean/hamming/jaccard without ever
    materializing the (B, N) score matrix.

    The dot-metric grouped kernel (:func:`rank_top_k_grouped`) wins by
    replacing the wide TopK sort with a per-group max fused into the matmul
    epilogue. These metrics are equally one matmul plus *per-row constants*
    (reference ranking_algorithm.py:44-52,63-75,128-147):

        euclidean:  1/(1 + sqrt(|v|^2 - 2 q.v + |q|^2))
        hamming:    d - (|vb| + |qb| - 2 qb.vb)        (0/1 rows)
        jaccard:    qb.vb / (|vb| + |qb| - qb.vb)      (0/1 rows)

    so the exact score lives in the epilogue too: stage 1 computes it
    groupwise (B, N/group, group) feeding straight into the group max, and
    stage 3 recomputes it on the k winning groups' gathered rows.

    Args:
        queries: (B, d) query block — raw for euclidean; callers pass raw
            queries for hamming/jaccard too (binarized here).
        rows: (N, d) corpus — RAW rows for euclidean, BINARIZED 0/1 rows
            (``x > 0``) for hamming/jaccard (``VectorStore.device_view``'s
            lazy binary view).
        row_aux: (N,) f32 per-row constant — |v|^2 (euclidean) or popcount
            |vb| (hamming/jaccard); zero on padding rows.
        k, row_mask, recency, group: as in :func:`rank_top_k_grouped`.
    """
    if metric in ("hamming_distance", "jaccard_similarity"):
        q32 = (queries > 0).astype(jnp.float32)
        qq = _metrics._match_low_precision(q32, rows)
        # 0/1 operands are exact in every float dtype and the accumulator is
        # f32 either way, so the fast DEFAULT precision loses nothing here.
        prec = jax.lax.Precision.DEFAULT
    else:
        q32 = queries.astype(jnp.float32)
        qq = _metrics._match_low_precision(q32, rows)
        # precision follows the ACTUAL matmul operands (qq may have been
        # cast down to a low-precision corpus dtype, where DEFAULT is native
        # throughput and lossless)
        prec = _metrics.dot_precision(qq, rows)
    n, d = rows.shape

    if (
        recency is None
        and metric in GROUPED_METRICS
        and _use_pallas_gmax_f(qq, rows, k)
        and prec == jax.lax.Precision.DEFAULT
    ):
        # big-batch euclid/hamming: the true score is a monotone transform
        # of the surrogate 2 q.v - aux, so stage 1 rides the Pallas gmax
        # kernel (VMEM-resident epilogue) with the exact metric rescored in
        # stage 3; jaccard gets its own true-score kernel epilogue
        # (gmax_jaccard); recency breaks the euclid/hamming monotonicity
        # argument, so recency queries stay here
        from hyperdb_tpu.ops.pallas_gmax import (
            rank_top_k_grouped_metric_pallas,
        )

        return rank_top_k_grouped_metric_pallas(
            queries, rows, row_aux, k, metric, row_mask=row_mask
        )

    def epilogue(inter, aux):
        s = _grouped_metric_scores(inter, aux, q32, metric, d)
        s = jnp.where(jnp.isnan(s), NEG_INF, s)
        return s

    if n % group or n <= k * group:
        s = epilogue(
            jax.lax.dot_general(
                qq, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ),
            row_aux[None, :],
        )
        if recency is not None:
            s = s + recency[None, :]
        if row_mask is not None:
            s = jnp.where(row_mask[None, :], s, NEG_INF)
        return jax.lax.top_k(s, k)

    g = n // group
    r3 = rows.reshape(g, group, d)
    aux3 = row_aux.reshape(g, group)
    inter3 = jax.lax.dot_general(
        qq, r3, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (B, g, group)
    s3 = epilogue(inter3, aux3[None])
    rec3 = mask3 = None
    if recency is not None:
        rec3 = recency.reshape(g, group)
        s3 = s3 + rec3[None]
    if row_mask is not None:
        mask3 = row_mask.reshape(g, group)
        s3 = jnp.where(mask3[None], s3, NEG_INF)
    gmax = jnp.max(s3, axis=-1)
    _, gidx = jax.lax.top_k(gmax, k)  # (B, k)

    cand_rows = jnp.take(r3, gidx, axis=0)  # (B, k, group, d)
    inter_c = jnp.einsum(
        "bd,bkgd->bkg", qq, cand_rows,
        preferred_element_type=jnp.float32, precision=prec,
    )
    cs = epilogue(inter_c, jnp.take(aux3, gidx, axis=0))
    if rec3 is not None:
        cs = cs + jnp.take(rec3, gidx, axis=0)
    if mask3 is not None:
        cs = jnp.where(jnp.take(mask3, gidx, axis=0), cs, NEG_INF)
    cs = cs.reshape(queries.shape[0], k * group)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(gidx, pos // group, axis=-1)
    return vals, (winner * group + pos % group).astype(jnp.int32)


def _use_pallas_gmax_f(queries, vectors, k: int) -> bool:
    """Route big-batch float dot-form scans through the Pallas gmax stage 1.

    Above HYPERDB_PALLAS_GMAX_F_MIN_BATCH queries, XLA materializes the
    grouped matmul's (B, g, group) f32 epilogue in HBM before the group-max
    (4 GB at b=1024 x 1M rows) and the Pallas kernel wins — 1.56x at b=2048
    (benchmarks/ab_gmax.py). Every condition the kernel itself would bounce
    on is checked here so the route only fires when Pallas genuinely runs
    (a silent internal fallback would change the group size mid-route)."""
    from hyperdb_tpu.config import CONFIG

    min_b = CONFIG.pallas_gmax_f_min_batch
    b = int(queries.shape[0])
    if not CONFIG.pallas_gmax or min_b <= 0 or b < min_b:
        return False
    if jax.default_backend() == "cpu":
        return False  # Mosaic lowering is TPU-only
    from hyperdb_tpu.ops import pallas_gmax as _pg

    n, d = vectors.shape
    blk = _pg._block_rows(b, d, vectors.dtype.itemsize)
    return (
        _pg.supported(b, n, d)
        and n % blk == 0
        and n // _pg.GROUP >= k
        # Mosaic has no f16 — NEITHER operand may carry it into pallas_call.
        # (An f16 query wire against a bf16 plane keeps dot_precision at
        # DEFAULT, so without the query-side check this route would fire
        # and fail to compile at serve time — advisor r3, high.)
        and vectors.dtype != jnp.float16
        and queries.dtype != jnp.float16
        # f32 parity needs HIGHEST-precision matmuls the kernel won't request
        and _metrics.dot_precision(queries, vectors) == jax.lax.Precision.DEFAULT
    )


def _use_pallas_l1(queries, vectors, k: int) -> bool:
    """Route batched manhattan scans through the Pallas L1 stage-1 kernel.

    Mirrors :func:`_use_pallas_gmax_f`: every condition the kernel itself
    would bounce on is checked here so the route only fires when Pallas
    genuinely runs. f32 planes DO qualify (the kernel is exact-f32 VPU
    arithmetic — no matmul precision to lose); f16 never reaches Mosaic."""
    from hyperdb_tpu.config import CONFIG

    min_b = CONFIG.pallas_l1_min_batch
    b = int(queries.shape[0])
    if min_b <= 0 or b < min_b:
        return False
    if jax.default_backend() == "cpu":
        return False  # Mosaic lowering is TPU-only
    from hyperdb_tpu.ops import pallas_l1 as _pl1

    n, d = vectors.shape
    return (
        _pl1.supported(b, n, d, vectors.dtype.itemsize)
        and n // _pl1.GROUP >= k
        and vectors.dtype != jnp.float16
        and queries.dtype != jnp.float16
    )


@functools.partial(jax.jit, static_argnames=("metric", "k", "prenormalized"))
def rank_top_k(
    queries: jax.Array,
    vectors: jax.Array,
    k: int,
    metric: str = "cosine_similarity",
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    prenormalized: bool = False,
):
    """Score a (B, d) query block against an (N, d) corpus and take top-k.

    Args:
        queries: (B, d) query block.
        vectors: (N, d) corpus block (any float dtype; f32 accumulation).
        k: static number of results per query (<= N).
        metric: one of :data:`hyperdb_tpu.ops.metrics.METRICS`.
        row_mask: optional (N,) bool; False rows score -inf (filters,
            tombstones, and capacity padding all compile to this one mask).
        recency: optional (N,) f32 recency term added to similarities
            *after* the NaN scrub, matching the reference order.
        prenormalized: static flag — corpus rows are already unit-norm, so
            cosine skips the per-query corpus normalization.

    Returns:
        (values, indices): each (B, k); indices index rows of ``vectors``.

    Corpora at least HYPERDB_GROUPED_TOPK_MIN_ROWS rows avoid the wide
    native-TopK sort (thresholds read at trace time, cached per shape):
    dot-form metrics (dot product, prenormalized cosine) route through the
    rescoring grouped top-k (:func:`rank_top_k_grouped`, ~3x at batch 256);
    every other metric keeps its scores and uses group-max selection over
    them (:func:`exact_top_k_grouped`, ~1.6x, provably exact).
    """
    from hyperdb_tpu.config import CONFIG

    group = _auto_group(int(queries.shape[0]))
    # engine-padded corpora divide the preferred group; for raw row counts
    # (e.g. 1M = 2^6 * 5^6) fall to the largest dividing power of two —
    # group=64 still measured 2.2x native TopK at batch 256
    while group >= 32 and vectors.shape[0] % group:
        group //= 2
    use_grouped = (
        CONFIG.grouped_topk_min_rows > 0
        and vectors.shape[0] >= CONFIG.grouped_topk_min_rows
        and group >= 32
        and vectors.shape[0] % group == 0
    )

    if use_grouped and (
        metric == "dot_product"
        or (metric == "cosine_similarity" and prenormalized)
    ):
        qq = queries
        if metric == "cosine_similarity":
            # mirror cosine_scores_prenormalized's numerics exactly
            qq = _metrics._match_low_precision(
                _metrics.normalize(queries), vectors
            )
        elif (
            qq.dtype in (jnp.float16, jnp.bfloat16)
            and vectors.dtype in (jnp.float16, jnp.bfloat16)
            and qq.dtype != vectors.dtype
        ):
            # mismatched low-precision wire (f16 queries vs the bf16 device
            # plane) would promote the dot matmul to f32 — match the corpus
            # dtype instead; f32 dot queries keep their HIGHEST-precision
            # scoring unchanged
            qq = qq.astype(vectors.dtype)
        if _use_pallas_gmax_f(qq, vectors, k):
            from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas

            return rank_top_k_grouped_pallas(
                qq, vectors, k=k, row_mask=row_mask, recency=recency
            )
        return rank_top_k_grouped(
            qq, vectors, k=k, row_mask=row_mask, recency=recency, group=group
        )
    if (
        metric == "manhattan_distance"
        and CONFIG.grouped_topk_min_rows > 0
        and vectors.shape[0] >= CONFIG.grouped_topk_min_rows
    ):
        # the last no-materialization route (VERDICT r3 weak #1): never
        # build the (B, N) f32 score matrix (8 GB at b=2048 x 1M, the
        # shape that could not compile at all). Batched queries take the
        # Pallas L1 stage-1 kernel (ops/pallas_l1.py — owns the VPU loop
        # XLA fuses poorly at batch height); recency stays on the
        # streamed XLA scan (a true-score in-kernel variant was measured
        # out: recency compresses group-max gaps below the kernel's f32
        # summation noise, where no overfetch margin restores index
        # identity — ops/pallas_l1.py module note).
        if recency is None and _use_pallas_l1(queries, vectors, k):
            from hyperdb_tpu.ops.pallas_l1 import rank_top_k_manhattan_pallas

            return rank_top_k_manhattan_pallas(
                queries, vectors, k=k, row_mask=row_mask
            )
        tile = _manhattan_tile(int(queries.shape[0]), int(vectors.shape[0]), k)
        if tile:
            return rank_top_k_manhattan_stream(
                queries, vectors, k=k, row_mask=row_mask, recency=recency,
                tile=tile,
            )
    if metric == "cosine_similarity" and prenormalized:
        s = _metrics.cosine_scores_prenormalized(queries, vectors)
    else:
        s = scores(queries, vectors, metric)
    s = jnp.where(jnp.isnan(s), NEG_INF, s)
    if recency is not None:
        s = s + recency[None, :]
    if row_mask is not None:
        s = jnp.where(row_mask[None, :], s, NEG_INF)
    if use_grouped:
        return exact_top_k_grouped(s, k, group=group)
    return exact_top_k(s, k)


@functools.partial(jax.jit, static_argnames=("k", "offsets"))
def _merge_plane_topk(vals_parts, idx_parts, k: int, offsets: tuple):
    """Merge per-plane (B, k_i) winners into the global (B, k) top-k.

    ``offsets[i]`` is the global row index of plane i's row 0 (static — it
    depends only on plane shapes). Planes concatenate in plane order, so on
    equal values ``lax.top_k``'s prefer-earlier tie rule picks the earliest
    plane's entry — the LOWER global index, exactly what a monolithic
    ``lax.top_k`` over the concatenated corpus would pick.
    """
    vals = jnp.concatenate(vals_parts, axis=1)
    idxs = jnp.concatenate(
        [p + off for p, off in zip(idx_parts, offsets)], axis=1
    )
    mv, mi = jax.lax.top_k(vals, k)
    return mv, jnp.take_along_axis(idxs, mi, axis=1)


def rank_top_k_planar(
    queries: jax.Array,
    planes,
    k: int,
    metric: str = "cosine_similarity",
    row_masks=None,
    recencies=None,
    prenormalized: bool = False,
):
    """Exact top-k over a corpus stored as SEPARATE device planes.

    The single-chip capacity route (> ~2^23 rows): no single XLA program
    ever touches a monolithic capacity buffer. Each (N_i, d) plane is
    ranked by the routed :func:`rank_top_k` program — one cached compile
    per plane shape-class, the same ~10M-row program class the gate proves
    every round — and the per-plane winners merge through one small
    (B, sum k_i) jitted top-k. Dispatch is async below
    ``CONFIG.planar_serial_bytes`` total plane bytes, so the plane calls
    pipeline on device. ABOVE it — the capacity regime the planar route
    exists for — each plane's program is forced to retire (a tiny winner
    readback; ``block_until_ready`` does not block on this platform)
    before the next is dispatched: with the planes themselves pinning
    most of HBM, two in-flight plane programs' stage-1/top-k temps
    co-resident is exactly the OOM the 2026-08-20 clean-HBM gate run
    caught (results.jsonl planar_bf16_2p24_b512 05:37 — planes built,
    reference ran, the two async routed programs exhausted the rest).
    One extra ~25-30 ms round trip per plane against a capacity scan is
    the cost of fitting.

    Exactness: every metric in :data:`METRICS` scores a row independently
    of the rest of the corpus (the reference contract,
    ``ranking_algorithm.py:149-204``), so the global top-k is contained in
    the union of per-plane top-k and the merge loses nothing. Ties resolve
    to the lowest global index, identical to a monolithic ``lax.top_k``
    (see :func:`_merge_plane_topk`).

    Args mirror :func:`rank_top_k`, with per-plane lists for the dense
    row-local terms: ``planes`` is a sequence of (N_i, d) arrays;
    ``row_masks`` / ``recencies`` are optional sequences aligned with it
    (entries may be None).

    Returns (values, indices), indices global over the plane concatenation.
    """
    planes = list(planes)
    if not planes:
        raise ValueError("rank_top_k_planar: need at least one plane")
    if len(planes) == 1:
        rm = row_masks[0] if row_masks is not None else None
        rc = recencies[0] if recencies is not None else None
        return rank_top_k(
            queries, planes[0], k=min(k, int(planes[0].shape[0])),
            metric=metric, row_mask=rm, recency=rc,
            prenormalized=prenormalized,
        )
    from hyperdb_tpu.config import CONFIG

    serial_cap = CONFIG.planar_serial_bytes
    serialize = 0 < serial_cap <= sum(
        int(p.size) * p.dtype.itemsize for p in planes
    )
    vals_parts, idx_parts, offsets = [], [], []
    offset = 0
    for i, plane in enumerate(planes):
        rm = row_masks[i] if row_masks is not None else None
        rc = recencies[i] if recencies is not None else None
        kp = min(k, int(plane.shape[0]))
        v, idx = rank_top_k(
            queries, plane, k=kp, metric=metric, row_mask=rm, recency=rc,
            prenormalized=prenormalized,
        )
        if (
            serialize
            and i + 1 < len(planes)
            and not isinstance(idx, jax.core.Tracer)
        ):
            # force THIS plane's program (and its temps) to retire before
            # the next plane's dispatch — see the capacity note above. The
            # winners are (B, kp): the readback is a few KB.
            np.asarray(idx)
        vals_parts.append(v)
        idx_parts.append(idx)
        offsets.append(offset)
        offset += int(plane.shape[0])
    k_eff = min(k, sum(int(p.shape[1]) for p in idx_parts))
    return _merge_plane_topk(
        tuple(vals_parts), tuple(idx_parts), k_eff, tuple(offsets)
    )


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "num_docs", "prenormalized")
)
def rank_docs_top_k(
    queries: jax.Array,
    rows: jax.Array,
    row_docs: jax.Array,
    row_valid: jax.Array,
    k: int,
    num_docs: int,
    metric: str = "cosine_similarity",
    doc_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    prenormalized: bool = False,
):
    """Chunk-aware ranking: score rows, reduce to documents, take top-k docs.

    The corpus has one *row per chunk* but results are per *document*
    (SURVEY.md Q1): row scores are segment-max-reduced through the
    chunk->document map, so a document's score is its best chunk's score.
    Masks (filters, skip_doc, tombstones, padding) and the recency term are
    fused into the same program — the (B, N) score matrix never leaves the
    device.

    Args:
        queries: (B, d) query block.
        rows: (N_pad, d) padded corpus rows.
        row_docs: (N_pad,) i32 chunk-row -> document index.
        row_valid: (N_pad,) bool, False on capacity padding.
        k: static top-k (<= num_docs).
        num_docs: static padded document count (segment count).
        doc_mask: optional (num_docs,) bool document filter mask.
        recency: optional (num_docs,) f32 recency term (Q17).
        prenormalized: rows are unit-norm (cosine fast path).

    Returns:
        (values, doc_indices): each (B, k).
    """
    if metric == "cosine_similarity" and prenormalized:
        s = _metrics.cosine_scores_prenormalized(queries, rows)
    else:
        s = scores(queries, rows, metric)
    s = jnp.where(jnp.isnan(s), NEG_INF, s)
    valid = row_valid
    if doc_mask is not None:
        valid = valid & doc_mask[row_docs]
    s = jnp.where(valid[None, :], s, NEG_INF)

    def reduce_rows(s_row):
        # source_indices are non-decreasing by construction (chunks are
        # appended contiguously and renumbering preserves order), which lets
        # XLA lower the segment reduction without a general scatter.
        return jax.ops.segment_max(
            s_row, row_docs, num_segments=num_docs, indices_are_sorted=True
        )

    doc_s = jax.vmap(reduce_rows)(s)  # (B, num_docs); empty segments -> -inf
    if recency is not None:
        doc_s = doc_s + recency[None, :]
    if doc_mask is not None:
        doc_s = jnp.where(doc_mask[None, :], doc_s, NEG_INF)
    return exact_top_k(doc_s, k)


@functools.partial(
    jax.jit, static_argnames=("metric", "k", "prenormalized")
)
def rank_gathered(
    queries: jax.Array,
    rows: jax.Array,
    cand_ids: jax.Array,
    cand_valid: jax.Array,
    k: int,
    metric: str = "cosine_similarity",
    recency: jax.Array | None = None,
    prenormalized: bool = False,
):
    """IVF fast path: gather candidate rows and score only those.

    ``cand_ids`` is a padded (C,) i32 vector of global row ids with
    ``cand_valid`` marking live entries; the returned indices are global row
    ids. Compute and HBM traffic scale with the candidate count, not the
    corpus (the point of the IVF pre-filter).

    ``cand_valid`` may also be a (B, C) matrix — the batched-IVF shape, where
    the candidate union is shared across the query block but each query only
    scores the clusters it probed (IVFIndex.probe_batch).
    """
    sub = rows[cand_ids]  # (C, d) gather
    if metric == "cosine_similarity" and prenormalized:
        s = _metrics.cosine_scores_prenormalized(queries, sub)
    else:
        s = scores(queries, sub, metric)
    s = jnp.where(jnp.isnan(s), NEG_INF, s)
    if recency is not None:
        s = s + recency[None, :]
    valid = cand_valid if cand_valid.ndim == 2 else cand_valid[None, :]
    s = jnp.where(valid, s, NEG_INF)
    vals, pos = exact_top_k(s, k)
    idx = cand_ids[pos]
    return vals, idx


def recency_scores(timestamps: np.ndarray, recency_bias: float) -> np.ndarray:
    """``recency_bias * exp(t - max(t))`` (ranking_algorithm.py:183, Q17)."""
    t = np.asarray(timestamps, dtype=np.float64)
    if t.size == 0:
        return np.zeros(0, dtype=np.float32)
    return (recency_bias * np.exp(t - t.max())).astype(np.float32)


def ranking_algorithm_sort(
    vectors,
    query_vector,
    top_k: int = 5,
    metric: str = "cosine_similarity",
    timestamps=None,
    recency_bias: float = 0,
):
    """Parity shim for ``hyperDB_ranking_algorithm_sort``
    (ranking_algorithm.py:149-204): same validation, same outputs, but the
    compute runs as one fused XLA program.
    """
    vectors = np.asarray(vectors)
    query = np.asarray(query_vector)
    if np.isnan(vectors).any() or np.isnan(query).any():
        raise ValueError("Vectors and query_vector should not contain NaN values.")
    if metric not in METRICS:
        raise ValueError(f"Unknown metric: {metric}")
    if vectors.ndim != 2:
        raise ValueError("Vectors should be a 2D array of shape (N, d).")

    q = query.reshape(1, -1) if query.ndim == 1 else np.asarray(query)[:1]

    recency = None
    if timestamps is not None and len(timestamps) > 0:
        r = recency_scores(np.asarray(timestamps), recency_bias)
        if r.shape[0] != vectors.shape[0]:
            raise ValueError("timestamps must have one entry per vector row.")
        recency = jnp.asarray(r)

    n = vectors.shape[0]
    if n == 1:
        # Single-document short-circuit with the reference's stdout INFO
        # and (1, 1) score shape (ranking_algorithm.py:189-191 returns
        # np.array([scores]) around the 1-element score row).
        vals, _ = rank_top_k(
            jnp.asarray(q, dtype=jnp.float32),
            jnp.asarray(vectors, dtype=jnp.float32),
            k=1,
            metric=metric,
            recency=recency,
        )
        print("Info: Only one document left.")
        return np.array([0]), np.array([np.asarray(vals[0])])

    k = max(0, min(int(top_k), n))
    if k == 0:
        return [], []

    vals, idx = rank_top_k(
        jnp.asarray(q, dtype=jnp.float32),
        jnp.asarray(vectors, dtype=jnp.float32),
        k=k,
        metric=metric,
        recency=recency,
    )
    from hyperdb_tpu.utils.devio import fetch

    idx_h, vals_h = fetch(idx, vals)  # one tunnel round trip, not two
    return idx_h[0], vals_h[0]
