"""A/B: Pallas stage-1 gmax kernel vs the XLA grouped formulation.

The XLA grouped top-k materializes its (B, g, group) f32 epilogue in HBM
before the group-max (see ops/pallas_gmax.py header); the Pallas kernel
keeps the score tile in VMEM. This measures both full pipelines (stage 1-3,
index-identical results asserted) on the real chip:

  A) 1M x 384 bf16 dot, batches 8 / 64 / 256
  B) int8 10M x 768 (device-generated), batches 64 / 256 — the config where
     the XLA form needs the row-chunked lax.scan (bench_10m_int8 history)

Emits one JSON line per case; appends to results.jsonl. Run cases guarded:
the Mosaic remote compile occasionally wedges, so each variant prints
progress before compiling.

Usage: python benchmarks/ab_gmax.py [a|b|ab] [batch ...] (default ab; batches
default to 8/64/256 for case A, 64/256 for case B)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict):
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def _time_chained(fn, q, iters=10, trials=3):
    import jax.numpy as jnp

    vals, idx = fn(q)
    np.asarray(idx)
    best = float("inf")
    for _ in range(trials):
        acc = jnp.zeros((), q.dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            vv, _ = fn(q + acc * 0)
            acc = vv[0, 0].astype(q.dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def case_a(batches=(8, 64, 256)):
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    rng = np.random.default_rng(0)
    n, d, k = 1 << 20, 384, 10
    v = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16
    )
    for b in batches:
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
        )
        print(f"A b={b}: compiling pallas...", flush=True)
        pv, pi = rank_top_k_grouped_pallas(q, v, k)
        print(f"A b={b}: compiling xla...", flush=True)
        xv, xi = rank_top_k_grouped(q, v, k, group=128)
        same = bool((np.asarray(pi) == np.asarray(xi)).all())
        t_p = _time_chained(lambda qq: rank_top_k_grouped_pallas(qq, v, k), q)
        t_x = _time_chained(lambda qq: rank_top_k_grouped(qq, v, k, group=128), q)
        emit(
            {
                "bench": "ab_gmax_dot_1m_384_bf16",
                "batch": b,
                "pallas_ms": round(t_p * 1e3, 2),
                "xla_ms": round(t_x * 1e3, 2),
                "index_identical": same,
            }
        )


def case_b(batches=(64, 256)):
    import functools

    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_int8_pallas
    from hyperdb_tpu.ops.quantized import rank_top_k_int8

    n, d, k = 10_485_760, 768, 10
    chunk = 1 << 19

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (chunk, d), dtype=jnp.float32)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        x = x / jnp.where(norm == 0, 1.0, norm)
        max_abs = jnp.max(jnp.abs(x), axis=1)
        scales = max_abs / 127.0
        safe = jnp.where(scales == 0, 1.0, scales)
        q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
        return q, scales.astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("row0",))
    def write_chunk(buf_q, buf_s, qc, sc, row0):
        return (
            jax.lax.dynamic_update_slice(buf_q, qc, (row0, 0)),
            jax.lax.dynamic_update_slice(buf_s, sc, (row0,)),
        )

    t0 = time.time()
    rows_q = jnp.zeros((n, d), dtype=jnp.int8)
    scales = jnp.zeros((n,), dtype=jnp.float32)
    for i, key in enumerate(jax.random.split(jax.random.PRNGKey(0), n // chunk)):
        qc, sc = gen_chunk(key)
        rows_q, scales = write_chunk(rows_q, scales, qc, sc, i * chunk)
    jax.block_until_ready(scales)
    print(f"B: built {n} x {d} int8 in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(1)
    for b in batches:
        q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
        print(f"B b={b}: compiling pallas...", flush=True)
        pv, pi = rank_top_k_int8_pallas(q, rows_q, scales, k)
        print(f"B b={b}: compiling xla...", flush=True)
        xv, xi = rank_top_k_int8(q, rows_q, scales, k=k)
        same = bool((np.asarray(pi) == np.asarray(xi)).all())
        t_p = _time_chained(
            lambda qq: rank_top_k_int8_pallas(qq, rows_q, scales, k), q, iters=5
        )
        t_x = _time_chained(
            lambda qq: rank_top_k_int8(qq, rows_q, scales, k=k), q, iters=5
        )
        emit(
            {
                "bench": "ab_gmax_int8_10m_768",
                "batch": b,
                "pallas_ms": round(t_p * 1e3, 2),
                "xla_ms": round(t_x * 1e3, 2),
                "index_identical": same,
            }
        )


def case_m(batches=(512, 1024, 2048), only=None):
    """Euclid/hamming surrogate route (ops/pallas_gmax.
    rank_top_k_grouped_metric_pallas) vs the XLA epilogue form at 1M x 384
    bf16 — the same big-batch regime where the dot form won (case A)."""
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_metric_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped_metric

    rng = np.random.default_rng(2)
    n, d, k = 1 << 20, 384, 10
    raw = rng.standard_normal((n, d), dtype=np.float32)
    cases = {
        "euclidean_metric": (
            jnp.asarray(raw, dtype=jnp.bfloat16),
            jnp.asarray(np.sum(raw * raw, axis=1)),
        ),
        "hamming_distance": (
            jnp.asarray((raw > 0).astype(np.float32), dtype=jnp.bfloat16),
            jnp.asarray((raw > 0).sum(axis=1).astype(np.float32)),
        ),
        "jaccard_similarity": (
            jnp.asarray((raw > 0).astype(np.float32), dtype=jnp.bfloat16),
            jnp.asarray((raw > 0).sum(axis=1).astype(np.float32)),
        ),
    }
    from hyperdb_tpu.config import CONFIG

    def xla_form(qq, v, aux, metric):
        # rank_top_k_grouped_metric itself routes to the Pallas surrogate at
        # b >= pallas_gmax_f_min_batch; measure the PURE XLA form by turning
        # the route off (jit caches key on shapes, not config — clear them)
        saved = CONFIG.pallas_gmax_f_min_batch
        CONFIG.pallas_gmax_f_min_batch = 0
        rank_top_k_grouped_metric.clear_cache()
        try:
            return rank_top_k_grouped_metric(qq, v, aux, k, metric, group=128)
        finally:
            CONFIG.pallas_gmax_f_min_batch = saved
            rank_top_k_grouped_metric.clear_cache()

    if only:
        cases = {m: c for m, c in cases.items() if only in m}
    for metric, (v, aux) in cases.items():
        for b in batches:
            q = jnp.asarray(
                rng.standard_normal((b, d), dtype=np.float32),
                dtype=jnp.bfloat16,
            )
            print(f"M {metric} b={b}: compiling pallas...", flush=True)
            pv, pi = rank_top_k_grouped_metric_pallas(q, v, aux, k, metric)
            print(f"M {metric} b={b}: compiling xla...", flush=True)
            xv, xi = xla_form(q, v, aux, metric)
            same = bool((np.asarray(pi) == np.asarray(xi)).all())
            t_p = _time_chained(
                lambda qq: rank_top_k_grouped_metric_pallas(
                    qq, v, aux, k, metric
                ), q,
            )
            saved = CONFIG.pallas_gmax_f_min_batch
            CONFIG.pallas_gmax_f_min_batch = 0
            rank_top_k_grouped_metric.clear_cache()
            try:
                t_x = _time_chained(
                    lambda qq: rank_top_k_grouped_metric(
                        qq, v, aux, k, metric, group=128
                    ), q,
                )
            finally:
                CONFIG.pallas_gmax_f_min_batch = saved
                rank_top_k_grouped_metric.clear_cache()
            emit(
                {
                    "bench": "ab_gmax_metric_1m_384_bf16",
                    "metric": metric,
                    "batch": b,
                    "pallas_ms": round(t_p * 1e3, 2),
                    "xla_ms": round(t_x * 1e3, 2),
                    "index_identical": same,
                }
            )


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "ab").lower()
    rest = sys.argv[2:]
    only = None  # e.g. `m 1024 2048 only=jaccard` narrows case M's metrics
    for tok in list(rest):
        if tok.startswith("only="):
            only = tok.split("=", 1)[1]
            rest.remove(tok)
    batches = tuple(int(x) for x in rest)
    if "a" in which:
        case_a(batches or (8, 64, 256))
    if "b" in which:
        case_b(batches or (64, 256))
    if "m" in which:
        case_m(batches or (512, 1024, 2048), only=only)
    return 0


if __name__ == "__main__":
    sys.exit(main())
