"""Distributed (multi-chip) query path.

Scale-out design (SURVEY.md §2.2, BASELINE.json config 5): the corpus
(N, d) matrix is row-sharded over the mesh's 'data' axis; queries are
replicated. Each chip scores its shard with the same fused metric kernels,
takes a *local* top-k, and only the (k scores, k global row ids) per chip —
not the (B, N) score matrix — crosses the interconnect via ``all_gather``;
a final top-k over the S*k merged candidates is exact because top-k is
distributive over row partitions.

Communication cost per query batch: S * B * k * 8 bytes on ICI, independent
of corpus size.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from hyperdb_tpu.ops.metrics import scores as _scores
from hyperdb_tpu.ops.ranking import (
    NEG_INF,
    _auto_group,
    _manhattan_tile,
    _use_pallas_gmax_f,
    _use_pallas_l1,
    rank_top_k_grouped,
    rank_top_k_manhattan_stream,
)


def _match_wire_dtype(q: jax.Array, rows: jax.Array) -> jax.Array:
    """Mismatched low-precision wire rule, per shard (the exact twin of
    ops/ranking.rank_top_k's dot-path cast): an f16 query block against a
    bf16 shard plane would (a) promote the dot matmul to f32 and, worse,
    (b) keep ``dot_precision`` at DEFAULT so the Pallas gmax route fires
    with an f16 operand — Mosaic has no f16, so the program fails to
    compile at serve time (advisor r3, high). Casting the (B, d) query
    block to the plane dtype is shard-local and elementwise (no
    collectives). f32 wires are NOT touched here — the caller decides
    whether HIGHEST-precision scoring is the contract (plain dot) or the
    plane dtype is (cosine/pearson planes, see ShardedHyperDB.query_batch).
    """
    if (
        rows.dtype in (jnp.float16, jnp.bfloat16)
        and q.dtype in (jnp.float16, jnp.bfloat16)
        and q.dtype != rows.dtype
    ):
        return q.astype(rows.dtype)
    return q


def sharded_rank_top_k(
    mesh: Mesh,
    queries: jax.Array,
    rows: jax.Array,
    row_valid: jax.Array,
    k: int,
    metric: str = "cosine_similarity",
    recency: jax.Array | None = None,
    axis: str = "data",
):
    """Exact distributed top-k over a row-sharded corpus.

    Args:
        mesh: device mesh with a ``axis`` dimension.
        queries: (B, d), replicated.
        rows: (N, d) with N divisible by the axis size; sharded on rows.
        row_valid: (N,) bool validity/filter mask (padding + filters).
        k: top-k per query (must be <= N / axis_size).
        recency: optional (N,) f32 additive term.

    Returns:
        (values, global_row_indices): each (B, k), replicated.
    """
    n = rows.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"rows ({n}) must divide evenly over '{axis}' ({n_shards})")
    n_local = n // n_shards
    if k > n:
        raise ValueError(f"k ({k}) must be <= total rows ({n})")
    # Per-shard candidates are capped at the shard's row count; the merge
    # still returns the global top-k exactly (with k_local = min(k, n_local)
    # each shard contributes its ENTIRE row set whenever k >= n_local, so
    # S * k_local >= k candidates always cover the true top-k).
    k_local = min(k, n_local)

    has_recency = recency is not None
    fn = _sharded_topk_program(mesh, axis, n_local, k, k_local, metric,
                               has_recency)
    args = [queries, rows, row_valid]
    if has_recency:
        args.append(recency)
    return fn(*args)


@functools.lru_cache(maxsize=None)
def _sharded_topk_program(mesh, axis, n_local, k, k_local, metric,
                          has_recency):
    """One JITTED shard_map program per (mesh, shape-class, metric) config.

    Eagerly-applied shard_map executes primitive by primitive — on the
    tunnel TPU platform every primitive is its own ~25 ms dispatch, which
    measured 8.5 s/call at 1M x 384 b=512 (results.jsonl tpu_gate
    sharded_bf16_1m_b512, pre-fix). jit compiles the whole local program +
    collectives into one dispatch; the cache keys on everything the trace
    closes over (Mesh is hashable), and jit itself handles per-shape
    retraces within a config."""

    def local_fn(q, rows_shard, valid_shard, *rest):
        from hyperdb_tpu.config import CONFIG

        q = _match_wire_dtype(q, rows_shard)
        group = _auto_group(int(q.shape[0]))
        use_grouped = (
            metric == "dot_product"
            and CONFIG.grouped_topk_min_rows > 0
            and n_local >= CONFIG.grouped_topk_min_rows
            and n_local % group == 0
        )
        if use_grouped:
            rec = rest[0] if has_recency else None
            if _use_pallas_gmax_f(q, rows_shard, k_local):
                # big-batch bf16: keep the group-max epilogue in VMEM on
                # each shard, exactly like the single-chip route
                # (ops/ranking._use_pallas_gmax_f; validated on-chip with a
                # 1-device mesh — benchmarks/tpu_gate.py sharded case)
                from hyperdb_tpu.ops.pallas_gmax import (
                    rank_top_k_grouped_pallas,
                )

                vals, idx = rank_top_k_grouped_pallas(
                    q, rows_shard, k=k_local, row_mask=valid_shard,
                    recency=rec,
                )
            else:
                # per-shard grouped exact top-k: same 3x-at-large-batch win
                # as the single-chip scan (ops/ranking.rank_top_k_grouped)
                vals, idx = rank_top_k_grouped(
                    q, rows_shard, k=k_local, row_mask=valid_shard,
                    recency=rec, group=group,
                )
        else:
            big_l1 = (
                metric == "manhattan_distance"
                and CONFIG.grouped_topk_min_rows > 0
                and n_local >= CONFIG.grouped_topk_min_rows
            )
            mtile = (
                _manhattan_tile(int(q.shape[0]), n_local, k_local)
                if big_l1 else 0
            )
            if big_l1 and not has_recency and _use_pallas_l1(
                q, rows_shard, k_local
            ):
                # per-shard Pallas L1 stage 1 (ops/pallas_l1.py): flat-in-
                # batch VPU kernel — same routing rule as the single-chip
                # scan (recency stays streamed, pallas_l1 module note)
                from hyperdb_tpu.ops.pallas_l1 import (
                    rank_top_k_manhattan_pallas,
                )

                vals, idx = rank_top_k_manhattan_pallas(
                    q, rows_shard, k=k_local, row_mask=valid_shard,
                )
            elif mtile:
                # per-shard streamed manhattan (ops/ranking notes): the
                # (B, n_local) score block never materializes on any chip
                vals, idx = rank_top_k_manhattan_stream(
                    q, rows_shard, k=k_local, row_mask=valid_shard,
                    recency=rest[0] if has_recency else None, tile=mtile,
                )
            else:
                s = _scores(q, rows_shard, metric)  # (B, n_local)
                s = jnp.where(jnp.isnan(s), NEG_INF, s)
                if has_recency:
                    s = s + rest[0][None, :]
                s = jnp.where(valid_shard[None, :], s, NEG_INF)
                vals, idx = jax.lax.top_k(s, k_local)  # (B, k_local)
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * n_local

        all_vals = jax.lax.all_gather(vals, axis)  # (S, B, k_local)
        all_idx = jax.lax.all_gather(gidx, axis)
        all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q.shape[0], -1)
        all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q.shape[0], -1)
        merged_vals, merged_pos = jax.lax.top_k(all_vals, k)
        merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=1)
        return merged_vals, merged_idx

    in_specs = [P(), P(axis, None), P(axis)]
    if has_recency:
        in_specs.append(P(axis))
    return jax.jit(shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_rank_top_k_int8(
    mesh: Mesh,
    queries: jax.Array,
    rows_q: jax.Array,
    row_scales: jax.Array,
    row_valid: jax.Array,
    k: int,
    recency: jax.Array | None = None,
    axis: str = "data",
):
    """Exact distributed top-k over a row-sharded INT8 corpus (int8-pure
    mode: quantized scores, no rescore rows — ops/quantized semantics).

    Each shard runs the grouped int8 scan (Pallas gmax stage 1 where that
    regime applies, ops/quantized.rank_top_k_int8) on its rows; only
    (k scores, k global ids) per shard cross the interconnect. Merged
    results equal the unsharded int8 scan on the full corpus (top-k is
    distributive over row partitions; tested on the CPU mesh).

    Row shards are quantized per-row, so per-shard scales are just the row
    slice — no cross-shard calibration needed.
    """
    n = rows_q.shape[0]
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"rows ({n}) must divide evenly over '{axis}' ({n_shards})")
    n_local = n // n_shards
    if k > n:
        raise ValueError(f"k ({k}) must be <= total rows ({n})")
    k_local = min(k, n_local)  # same exactness argument as sharded_rank_top_k
    has_recency = recency is not None
    fn = _sharded_topk_int8_program(mesh, axis, n_local, k, k_local,
                                    has_recency)
    args = [queries, rows_q, row_scales, row_valid]
    if has_recency:
        args.append(recency)
    return fn(*args)


@functools.lru_cache(maxsize=None)
def _sharded_topk_int8_program(mesh, axis, n_local, k, k_local, has_recency):
    """Jitted shard_map program cache — same rationale as
    :func:`_sharded_topk_program` (eager shard_map = one tunnel dispatch
    per primitive on the TPU platform)."""
    from hyperdb_tpu.ops.quantized import rank_top_k_int8

    def local_fn(q, rq, rs, valid, *rest):
        vals, idx = rank_top_k_int8(
            q, rq, rs, k=k_local, row_mask=valid,
            recency=rest[0] if has_recency else None,
        )
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * n_local
        all_vals = jax.lax.all_gather(vals, axis)
        all_idx = jax.lax.all_gather(gidx, axis)
        all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q.shape[0], -1)
        all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q.shape[0], -1)
        merged_vals, merged_pos = jax.lax.top_k(all_vals, k)
        merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=1)
        return merged_vals, merged_idx

    in_specs = [P(), P(axis, None), P(axis), P(axis)]
    if has_recency:
        in_specs.append(P(axis))
    return jax.jit(shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    ))


class DistributedCorpus:
    """A row-sharded device-resident corpus with an exact distributed query.

    The host-side HyperDB remains the source of truth; this wraps its vector
    matrix for mesh execution (used by the benchmark harness and the
    multi-chip dry run).
    """

    def __init__(
        self,
        mesh: Mesh,
        vectors: np.ndarray,
        metric: str = "cosine_similarity",
        axis: str = "data",
        precision: str = "auto",
    ):
        """``precision='int8'`` serves the per-row-quantized corpus (int8-pure
        semantics: ~0.98 recall@10 for cosine/dot, half the per-chip HBM of
        bf16 — 2x corpus capacity per mesh)."""
        if precision not in ("auto", "int8"):
            raise ValueError("precision must be 'auto' or 'int8'.")
        if precision == "int8" and metric not in (
            "cosine_similarity", "dot_product"
        ):
            raise ValueError(
                "int8 distributed serving supports cosine_similarity and "
                f"dot_product only (got '{metric}')."
            )
        self.mesh = mesh
        self.metric = metric
        self.axis = axis
        self.precision = precision
        n, d = vectors.shape
        n_shards = mesh.shape[axis]
        # pad rows so every shard holds the same count, mask the tail
        per_shard = -(-n // n_shards)
        # keep per-shard rows lane-aligned
        per_shard = -(-per_shard // 128) * 128  # grouped-topk tile alignment
        n_pad = per_shard * n_shards
        host = np.zeros((n_pad, d), dtype=vectors.dtype)
        host[:n] = vectors
        valid = np.zeros(n_pad, dtype=bool)
        valid[:n] = True

        row_sharding = NamedSharding(mesh, P(axis, None))
        mask_sharding = NamedSharding(mesh, P(axis))
        self.n = n
        self.n_pad = n_pad
        if precision == "int8":
            from hyperdb_tpu.ops.quantized import quantize_rows

            h32 = host.astype(np.float32)
            if metric == "cosine_similarity":
                norms = np.linalg.norm(h32, axis=1, keepdims=True)
                h32 = h32 / np.where(norms == 0, 1.0, norms)
            rows_q, scales = quantize_rows(h32)
            self.rows_q = jax.device_put(rows_q, row_sharding)
            self.row_scales = jax.device_put(scales, mask_sharding)
        else:
            self.rows = jax.device_put(host, row_sharding)
        self.row_valid = jax.device_put(valid, mask_sharding)
        self._query = functools.partial(
            sharded_rank_top_k, mesh, axis=axis, metric=metric
        )

    def query(self, queries: np.ndarray, k: int):
        """(B, d) queries -> ((B, k) scores, (B, k) global row ids)."""
        q = np.asarray(queries, dtype=np.float32)
        if self.precision == "int8":
            if self.metric == "cosine_similarity":
                norms = np.linalg.norm(q, axis=1, keepdims=True)
                q = q / np.where(norms == 0, 1.0, norms)
            vals, idx = sharded_rank_top_k_int8(
                self.mesh, jnp.asarray(q), self.rows_q, self.row_scales,
                self.row_valid, k=k, axis=self.axis,
            )
            return np.asarray(vals), np.asarray(idx)
        vals, idx = sharded_rank_top_k(
            self.mesh, jnp.asarray(q), self.rows, self.row_valid, k=k,
            metric=self.metric, axis=self.axis,
        )
        return np.asarray(vals), np.asarray(idx)
