"""Int8 quantized scoring path.

HBM bandwidth is the brute-force scan's bottleneck (the (N, d) corpus read
dominates); symmetric per-row int8 quantization halves the bytes relative to
bf16 — roughly doubling scan throughput — and doubles corpus capacity per
chip (10M x 768 int8 = 7.7 GB fits one v5e's HBM, where bf16 does not).

The MXU multiplies int8 x int8 natively with int32 accumulation; scores are
rescaled by the per-row scale product afterwards:

    s[b, n] = (q_i8[b] . v_i8[n]) * q_scale[b] * v_scale[n]

Quantization error is ~1/127 per element; for exact results the engine
overfetches candidates from the int8 scan and re-scores them against the
full-precision rows (``rank_top_k_int8`` with ``rescore_rows``) — the true
top-k survives inside a 4x overfetch with overwhelming probability, and the
re-scoring gather touches only O(B * 4k * d) bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hyperdb_tpu.ops import metrics as _metrics
from hyperdb_tpu.ops.ranking import NEG_INF, _auto_group, exact_top_k_grouped


def quantize_rows(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization (host-side, at ingest)."""
    rows = np.asarray(rows, dtype=np.float32)
    max_abs = np.max(np.abs(rows), axis=1)
    scales = (max_abs / 127.0).astype(np.float32)
    safe = np.where(scales == 0, 1.0, scales)
    q = np.clip(np.rint(rows / safe[:, None]), -127, 127).astype(np.int8)
    return q, scales


def _quantize_device(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    max_abs = jnp.max(jnp.abs(x), axis=1)
    scales = max_abs / 127.0
    safe = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scales.astype(jnp.float32)


def int8_scores(
    q_i8: jax.Array, q_scale: jax.Array, v_i8: jax.Array, v_scales: jax.Array
) -> jax.Array:
    s = jax.lax.dot_general(
        q_i8,
        v_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return s.astype(jnp.float32) * (q_scale[:, None] * v_scales[None, :])


def _rescore_groups(
    q_i8, q_scale, v_i8, v_scales, gidx, group, row_mask, recency,
    group_valid=None,
):
    """Stage 3 of the grouped int8 scan: exactly rescore the winning groups'
    gathered int8 rows and take the final top-k (k = gidx.shape[-1]).
    Shared by the XLA stage-1 forms and the Pallas gmax path.

    ``group_valid`` (B, k) masks selection slots that never held a real
    group (the chunked frontier's NEG_INF carry seeds keep their init id, so
    without the mask a sparse filter could rescore group 0 twice and return
    duplicate rows).
    """
    n, d = v_i8.shape
    g = n // group
    k = gidx.shape[-1]
    r3 = v_i8.reshape(g, group, d)
    sc3 = v_scales.reshape(g, group)
    cand_rows = jnp.take(r3, gidx, axis=0)  # (B, k, group, d) int8
    inter_c = jnp.einsum(
        "bd,bkgd->bkg", q_i8.astype(jnp.float32), cand_rows.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    cs = inter_c * (q_scale[:, None, None] * jnp.take(sc3, gidx, axis=0))
    if recency is not None:
        cs = cs + jnp.take(recency.reshape(g, group), gidx, axis=0)
    if row_mask is not None:
        cs = jnp.where(
            jnp.take(row_mask.reshape(g, group), gidx, axis=0), cs, NEG_INF
        )
    if group_valid is not None:
        cs = jnp.where(group_valid[:, :, None], cs, NEG_INF)
    cs = cs.reshape(q_i8.shape[0], k * group)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(gidx, pos // group, axis=-1)
    return vals, (winner * group + pos % group).astype(jnp.int32)


def _use_pallas_gmax(b: int, n: int, d: int) -> bool:
    """Route stage 1 through the Pallas gmax kernel only where the XLA form
    must chunk (epilogue over _EPILOGUE_BUDGET_BYTES): measured 2.2x there
    (10M x 768 int8 batch 256) and a tie/loss elsewhere (ab_gmax.py)."""
    from hyperdb_tpu.config import CONFIG

    if not CONFIG.pallas_gmax:
        return False
    if jax.default_backend() == "cpu":
        return False  # Mosaic lowering is TPU-only (tests run interpret mode)
    from hyperdb_tpu.ops.pallas_gmax import supported

    return supported(b, n, d)


def _int8_grouped_topk(
    q_i8, q_scale, v_i8, v_scales, k, group, row_mask, recency
):
    """Grouped int8 scan: the (B, N) f32 score tensor is never materialized.

    Stage 1 runs the int8 matmul GROUPWISE — (B, g, group) int32 straight
    into the scale/mask/recency epilogue and the per-group max — so HBM
    traffic is the int8 corpus read plus (B, g) maxes, not a (B, N) f32
    write+read (1 GB at batch 256 x 1M rows, which dominated the flat form).
    Stage 3 rescoring gathers only the k winning groups' int8 rows. Same
    containment argument as ops/ranking.rank_top_k_grouped.
    """
    n, d = v_i8.shape
    g = n // group
    r3 = v_i8.reshape(g, group, d)
    sc3 = v_scales.reshape(g, group)
    inter3 = jax.lax.dot_general(
        q_i8, r3, (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, g, group) int32
    s3 = inter3.astype(jnp.float32) * (q_scale[:, None, None] * sc3[None])
    if recency is not None:
        s3 = s3 + recency.reshape(g, group)[None]
    if row_mask is not None:
        s3 = jnp.where(row_mask.reshape(g, group)[None], s3, NEG_INF)
    gmax = jnp.max(s3, axis=-1)
    _, gidx = jax.lax.top_k(gmax, k)  # (B, k)
    return _rescore_groups(
        q_i8, q_scale, v_i8, v_scales, gidx, group, row_mask, recency
    )


# The (B, g, group) f32 scale/mask epilogue is materialized by XLA before
# the group-max (kOutput fusion), so its bytes are bounded here: above this
# budget the scan runs row-chunked via lax.scan (measured OOM otherwise at
# 10M x 768 int8, batch 256: a 10 GB temp on a 16 GB chip).
_EPILOGUE_BUDGET_BYTES = 1 << 31  # 2 GB


def _int8_grouped_topk_chunked(
    q_i8, q_scale, v_i8, v_scales, k, group, row_mask, recency, n_chunks
):
    """Row-chunked grouped int8 scan: lax.scan over corpus chunks keeps the
    per-step epilogue at (B, g/n_chunks, group) f32 while carrying a running
    (B, k) frontier of the best group maxes. Stage-3 rescoring then gathers
    the k winning groups from the full corpus exactly as the unchunked form.
    """
    b = q_i8.shape[0]
    n, d = v_i8.shape
    g = n // group
    g_c = g // n_chunks
    r4 = v_i8.reshape(n_chunks, g_c, group, d)
    sc4 = v_scales.reshape(n_chunks, g_c, group)
    rec4 = recency.reshape(n_chunks, g_c, group) if recency is not None else None
    mask4 = row_mask.reshape(n_chunks, g_c, group) if row_mask is not None else None

    def step(carry, xs):
        best_v, best_g = carry
        chunk_i, rows_c, sc_c, rec_c, mask_c = xs
        inter = jax.lax.dot_general(
            q_i8, rows_c, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, g_c, group)
        s3 = inter.astype(jnp.float32) * (q_scale[:, None, None] * sc_c[None])
        if rec_c is not None:
            s3 = s3 + rec_c[None]
        if mask_c is not None:
            s3 = jnp.where(mask_c[None], s3, NEG_INF)
        gmax = jnp.max(s3, axis=-1)  # (B, g_c)
        k_c = min(k, g_c)
        v_c, i_c = jax.lax.top_k(gmax, k_c)
        cat_v = jnp.concatenate([best_v, v_c], axis=-1)
        cat_g = jnp.concatenate(
            [best_g, (i_c + chunk_i * g_c).astype(jnp.int32)], axis=-1
        )
        nv, npos = jax.lax.top_k(cat_v, k)
        ng = jnp.take_along_axis(cat_g, npos, axis=-1)
        return (nv, ng), None

    init = (
        jnp.full((b, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((b, k), dtype=jnp.int32),
    )
    xs = (jnp.arange(n_chunks, dtype=jnp.int32), r4, sc4, rec4, mask4)
    (gvals, gidx), _ = jax.lax.scan(step, init, xs)

    # stage 3: rescore the k winning groups from the full corpus; slots whose
    # carried max is still NEG_INF never saw a real group — mask them so the
    # init id (0) cannot surface duplicate rows
    return _rescore_groups(
        q_i8, q_scale, v_i8, v_scales, gidx, group, row_mask, recency,
        group_valid=jnp.isfinite(gvals),
    )


def _pick_chunks(b: int, n: int, group: int) -> int:
    """Smallest chunk count dividing g that keeps the per-step epilogue
    under _EPILOGUE_BUDGET_BYTES (1 = unchunked)."""
    g = n // group
    n_chunks = 1
    while (
        b * (g // n_chunks) * group * 4 > _EPILOGUE_BUDGET_BYTES
        and n_chunks < g
    ):
        n_chunks += 1
        while g % n_chunks and n_chunks < g:
            n_chunks += 1
    return n_chunks if g % n_chunks == 0 else 1


@functools.partial(jax.jit, static_argnames=("k", "overfetch"))
def rank_top_k_int8(
    queries: jax.Array,
    v_i8: jax.Array,
    v_scales: jax.Array,
    k: int,
    row_mask: jax.Array | None = None,
    recency: jax.Array | None = None,
    rescore_rows: jax.Array | None = None,
    overfetch: int = 4,
):
    """Int8 scan + optional full-precision re-score of the top candidates.

    ``queries`` are float (any precision); they are quantized on device.
    ``rescore_rows`` (N, d) enables the exact re-ranking pass. Returns
    (values (B, k) f32, indices (B, k) i32).
    """
    q32 = queries.astype(jnp.float32)
    q_i8, q_scale = _quantize_device(q32)
    group = _auto_group(int(queries.shape[0]))
    n, d = v_i8.shape
    k_fetch = k if rescore_rows is None else min(k * overfetch, n)

    if n % group == 0 and n > k_fetch * group:
        n_chunks = _pick_chunks(int(queries.shape[0]), n, group)
        if n_chunks > 1 and _use_pallas_gmax(int(queries.shape[0]), n, d):
            # The regime where XLA must chunk is exactly where the Pallas
            # stage-1 kernel wins (10M x 768 b=256: 23.1 vs 50.5 ms, b=64
            # tie — benchmarks/ab_gmax.py); selection + rescore stay in XLA.
            from hyperdb_tpu.ops import pallas_gmax as _pg

            extra = _pg.make_extra(n, row_mask, recency)
            gm = _pg.gmax_int8(q_i8, q_scale, v_i8, v_scales, extra)
            _, gidx = jax.lax.top_k(gm, min(k_fetch, n // _pg.GROUP))
            vals, cand = _rescore_groups(
                q_i8, q_scale, v_i8, v_scales, gidx, _pg.GROUP,
                row_mask, recency,
            )
        elif n_chunks > 1 and (n // group) // n_chunks > k_fetch:
            vals, cand = _int8_grouped_topk_chunked(
                q_i8, q_scale, v_i8, v_scales, k_fetch, group,
                row_mask, recency, n_chunks,
            )
        else:
            vals, cand = _int8_grouped_topk(
                q_i8, q_scale, v_i8, v_scales, k_fetch, group, row_mask, recency
            )
    else:
        s = int8_scores(q_i8, q_scale, v_i8, v_scales)
        if recency is not None:
            # recency shifts the ranking like a score offset, so candidate
            # selection must see it too, not just the re-score pass
            s = s + recency[None, :]
        if row_mask is not None:
            s = jnp.where(row_mask[None, :], s, NEG_INF)
        vals, cand = exact_top_k_grouped(s, k_fetch, group=group)

    if rescore_rows is None:
        return vals, cand

    sub = rescore_rows[cand]  # (B, k_fetch, d) gather
    # Precision follows the SOURCE plane's dtype (ops.metrics.dot_precision):
    # casting to f32 and multiplying at the backend default would silently
    # score at bf16, breaking the exact-rescore contract for f32 corpora.
    exact = jnp.einsum(
        "bd,bkd->bk",
        q32,
        sub.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=_metrics.dot_precision(q32, sub),
    )
    if recency is not None:
        exact = exact + recency[cand]
    if row_mask is not None:
        exact = jnp.where(row_mask[cand], exact, NEG_INF)
    vals, pos = jax.lax.top_k(exact, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    return vals, idx
