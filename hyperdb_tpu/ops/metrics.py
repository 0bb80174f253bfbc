"""Dense similarity metric kernels, TPU-first.

These are the L0 scoring kernels of the engine: every metric is expressed as
batched dense array math over a ``(B, d)`` query block and an ``(N, d)``
corpus block, returning a ``(B, N)`` score matrix. Wherever possible the
arithmetic is routed through a single ``dot_general`` so XLA can tile it onto
the MXU (dot/cosine/euclidean/jaccard/hamming/pearson all reduce to one
matmul plus fused elementwise epilogues); only manhattan is inherently
elementwise and is streamed through a ``lax.scan`` over row tiles to bound
memory.

Behavioral parity with the reference implementation
(``/root/reference/hyperdb/ranking_algorithm.py:24-147``):

- All metrics are "higher is better" similarities: euclidean and manhattan
  distances are transformed via ``1/(1+dist)`` (ranking_algorithm.py:50-51,60),
  hamming via ``d_max - dist`` (ranking_algorithm.py:144-146).
- jaccard/hamming binarize inputs with ``x > 0`` — but *purely*, never
  mutating the caller's arrays (the reference mutates in place,
  ranking_algorithm.py:116-126; that is a latent bug we consciously fix).
- pearson returns NaN whenever either the query or a corpus row is constant
  (ranking_algorithm.py:107-111); NaN scores are ranked last by the ranker.
- jaccard of two all-zero vectors is 0/0 = NaN (ranking_algorithm.py:74),
  which likewise ranks last.
- Zero-norm vectors are normalized with norm treated as 1
  (ranking_algorithm.py:8-21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pearson_center_normalize(x: "np.ndarray") -> "np.ndarray":
    """IN PLACE: center + unit-normalize rows of an OWNED float32 array.

    This is THE host-side transform behind every pearson-as-dot plane and
    query block (store.pearson_view, the engine's host-query branch, the
    sharded plane and its incremental-add sync): pearson(q, v) ==
    dot(T(q), T(v)) for T = this function. Constant rows divide 0/0 -> NaN
    ON PURPOSE — every ranking kernel scrubs NaN -> -inf after its matmul,
    reproducing the reference's constant-vector contract
    (ranking_algorithm.py:107-111). In place so the full-corpus plane build
    needs exactly one (n_pad, d) f32 temp; callers must pass an array they
    own (a fresh copy or the padded staging buffer), never user data.
    """
    x -= x.mean(axis=1, keepdims=True)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        x /= norms  # constant rows -> NaN rows (intended)
    return x

# Canonical query-metric names (reference hyperdb.py:1449).
METRICS = (
    "dot_product",
    "cosine_similarity",
    "euclidean_metric",
    "manhattan_distance",
    "jaccard_similarity",
    "pearson_correlation",
    "hamming_distance",
)

# Row-tile size for the streamed (memory-bound) manhattan path. 2048 rows of
# 384-d f32 is ~3 MB per tile — comfortably VMEM-resident after XLA fusion.
_MANHATTAN_TILE = 2048


def normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2-normalize along ``axis``; zero norms are treated as 1.

    Parity with ``get_norm_vector`` (ranking_algorithm.py:8-21), minus the
    in-place warning prints (NaN policy is enforced by the ranker/ingest).
    Norms are accumulated in float32 regardless of input dtype so fp16/bf16
    corpora do not overflow.
    """
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    n = jnp.where(n == 0, 1.0, n)
    return x / n


def dot_precision(q: jax.Array, v: jax.Array) -> jax.lax.Precision:
    """MXU precision rule shared by every scoring matmul in the engine.

    HIGHEST so f32 corpora score with true f32 accuracy (matching the NumPy
    reference at ranking level) instead of the backend's reduced-precision
    default; DEFAULT when both operands are already f16/bf16, which runs at
    native MXU throughput without changing the math (the inputs themselves
    carry the reduced precision).
    """
    low_precision_inputs = v.dtype in (jnp.float16, jnp.bfloat16) and q.dtype in (
        jnp.float16,
        jnp.bfloat16,
    )
    return (
        jax.lax.Precision.DEFAULT
        if low_precision_inputs
        else jax.lax.Precision.HIGHEST
    )


def _qv_dot(q: jax.Array, v: jax.Array) -> jax.Array:
    """(B, d) x (N, d) -> (B, N) contraction on the MXU, f32 accumulation,
    precision per :func:`dot_precision`."""
    return jax.lax.dot_general(
        q,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(q, v),
    )


def _row_sq_norms(x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    return jnp.sum(x32 * x32, axis=-1)


def dot_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """Raw inner products (ranking_algorithm.py:24-30)."""
    return _qv_dot(q, v)


def _match_low_precision(q: jax.Array, v: jax.Array) -> jax.Array:
    """Cast a (small) query block to the corpus dtype when the corpus is
    f16/bf16, so the big matmul runs at native low-precision MXU throughput
    instead of promoting the whole corpus to f32. Covers f32 queries AND
    mismatched low-precision wires (an f16 serving wire against the bf16
    device plane would otherwise promote the matmul — JAX's f16 x bf16
    common type is f32)."""
    if v.dtype in (jnp.float16, jnp.bfloat16) and q.dtype in (
        jnp.float32, jnp.float16, jnp.bfloat16,
    ) and q.dtype != v.dtype:
        return q.astype(v.dtype)
    return q


def cosine_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """Cosine similarity (ranking_algorithm.py:32-42)."""
    vn = normalize(v)
    return _qv_dot(_match_low_precision(normalize(q), vn), vn)


def cosine_scores_prenormalized(q: jax.Array, v_normalized: jax.Array) -> jax.Array:
    """Cosine against a corpus whose rows are already unit-norm.

    The engine pre-normalizes the corpus once at ingest so the per-query cost
    is a single matmul (the reference re-normalizes the whole corpus on every
    query, ranking_algorithm.py:37).
    """
    return _qv_dot(_match_low_precision(normalize(q), v_normalized), v_normalized)


def euclidean_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """1/(1 + L2 distance) (ranking_algorithm.py:44-52).

    Expanded as |v|^2 - 2 q.v + |q|^2 so the O(B*N*d) work is one MXU matmul
    instead of materializing (B, N, d) differences.
    """
    d2 = (
        _row_sq_norms(v)[None, :]
        - 2.0 * _qv_dot(q, v)
        + _row_sq_norms(q)[:, None]
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    return 1.0 / (1.0 + dist)


def manhattan_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """1/(1 + L1 distance) (ranking_algorithm.py:54-61).

    Inherently elementwise (no matmul form), so the corpus is streamed in row
    tiles via ``lax.scan`` to keep the (B, tile, d) intermediate bounded.
    """
    q32 = q.astype(jnp.float32)
    n = v.shape[0]
    if n <= _MANHATTAN_TILE:
        dist = jnp.sum(jnp.abs(v.astype(jnp.float32)[None, :, :] - q32[:, None, :]), axis=-1)
    else:
        tile = _MANHATTAN_TILE
        pad = (-n) % tile
        vp = jnp.pad(v, ((0, pad), (0, 0)))
        vt = vp.reshape(-1, tile, v.shape[1])

        def body(_, vb):
            return None, jnp.sum(jnp.abs(vb.astype(jnp.float32)[None, :, :] - q32[:, None, :]), axis=-1)

        _, parts = jax.lax.scan(body, None, vt)  # (tiles, B, tile)
        dist = jnp.moveaxis(parts, 0, 1).reshape(q.shape[0], -1)[:, :n]
    return 1.0 / (1.0 + dist)


def _binarize(x: jax.Array) -> jax.Array:
    """Pure 0/1 binarization with the reference's threshold (>0 -> 1)."""
    return (x > 0).astype(jnp.float32)


def jaccard_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """Jaccard similarity over binarized vectors (ranking_algorithm.py:63-75).

    |intersection| is a 0/1 dot product (MXU); |union| = |v| + |q| - |inter|.
    An all-zero pair yields 0/0 = NaN, matching NumPy division semantics in
    the reference; the ranker maps NaN to -inf.
    """
    qb, vb = _binarize(q), _binarize(v)
    inter = _qv_dot(qb, vb)
    union = jnp.sum(vb, axis=-1)[None, :] + jnp.sum(qb, axis=-1)[:, None] - inter
    return inter / union


def hamming_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """d_max - hamming distance over binarized vectors (ranking_algorithm.py:128-147).

    For 0/1 vectors, popcount(x XOR y) == |x| + |y| - 2 x.y, which keeps the
    whole metric on the MXU instead of TPU-hostile uint8 bit unpacking.
    """
    qb, vb = _binarize(q), _binarize(v)
    inter = _qv_dot(qb, vb)
    dist = jnp.sum(vb, axis=-1)[None, :] + jnp.sum(qb, axis=-1)[:, None] - 2.0 * inter
    return jnp.float32(v.shape[-1]) - dist


def pearson_scores(q: jax.Array, v: jax.Array) -> jax.Array:
    """Pearson correlation (ranking_algorithm.py:77-113).

    r = (qc . vc) / (||qc|| * ||vc||) after mean-centering; NaN whenever
    either side is constant (reference lines 107-111 set both the AND and the
    XOR constant cases to NaN, i.e. any constant vector involved).
    """
    q32 = q.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    qc = q32 - jnp.mean(q32, axis=-1, keepdims=True)
    vc = v32 - jnp.mean(v32, axis=-1, keepdims=True)
    num = _qv_dot(qc, vc)
    qn = jnp.sqrt(jnp.sum(qc * qc, axis=-1))
    vn = jnp.sqrt(jnp.sum(vc * vc, axis=-1))
    den = qn[:, None] * vn[None, :]
    r = num / jnp.where(den == 0, 1.0, den)
    return jnp.where(den == 0, jnp.nan, r)


_METRIC_FNS = {
    "dot_product": dot_scores,
    "cosine_similarity": cosine_scores,
    "euclidean_metric": euclidean_scores,
    "manhattan_distance": manhattan_scores,
    "jaccard_similarity": jaccard_scores,
    "pearson_correlation": pearson_scores,
    "hamming_distance": hamming_scores,
}


def scores(q: jax.Array, v: jax.Array, metric: str) -> jax.Array:
    """Dispatch to a metric kernel: (B, d) x (N, d) -> (B, N) similarities."""
    try:
        fn = _METRIC_FNS[metric]
    except KeyError:
        raise ValueError(f"Unknown metric: {metric}") from None
    return fn(q, v)
