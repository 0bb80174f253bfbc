"""A/B on the real chip: pearson plane-as-dot route vs the materialized
(B, N) pearson-score route it replaced (the round-2 default for this metric
at big batch). Same device math class as the engine's two routings:

- OLD: ops/metrics.pearson_scores over the bf16 rows plane (one matmul plus
  per-row norm epilogue materialized in HBM) -> exact_top_k_grouped.
- NEW: centered unit-norm bf16 plane (store.pearson_view algebra) ->
  rank_top_k routed as dot_product (grouped / Pallas gmax stage 1).

Indices must agree up to the planes' quantization (both are bf16 views of
the same f32 corpus but round different values, so near-ties at the k-th
score may differ — overlap is reported, and both routes are separately
exactness-gated: the NEW one in benchmarks/tpu_gate.py pearson case, the
OLD one by the hermetic metric suites). Appends one line per batch to
results.jsonl. Run: python benchmarks/ab_pearson.py [batches...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(rec: dict):
    rec["bench"] = "ab_pearson_1m_384_bf16"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def timed(fn, *args, iters=10, trials=3):
    import jax.numpy as jnp

    out = fn(*args)
    np.asarray(out[0])
    q_dtype = args[0].dtype
    best = float("inf")
    for _ in range(trials):
        acc = jnp.zeros((), q_dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(args[0] + acc * 0, *args[1:])
            acc = out[0].reshape(-1)[0].astype(q_dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.metrics import (
        pearson_center_normalize,
        pearson_scores,
    )
    from hyperdb_tpu.ops.ranking import exact_top_k_grouped, rank_top_k

    print("devices:", jax.devices(), flush=True)
    batches = [int(a) for a in sys.argv[1:]] or [1024]
    n, d, k = 1 << 20, 384, 10
    rng = np.random.default_rng(7)
    host = rng.standard_normal((n, d), dtype=np.float32)
    rows = jnp.asarray(host, dtype=jnp.bfloat16)  # the engine's dv["rows"]
    plane_host = pearson_center_normalize(host.copy())
    plane = jnp.asarray(plane_host, dtype=jnp.bfloat16)

    @jax.jit
    def old_route(qq, rr):
        s = pearson_scores(qq, rr)
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        return exact_top_k_grouped(s, k, group=128)

    @jax.jit
    def new_route(qq, pp):
        return rank_top_k(qq, pp, k=k, metric="dot_product")

    for b in batches:
        qf = rng.standard_normal((b, d), dtype=np.float32)
        q_old = jnp.asarray(qf, jnp.bfloat16)
        q_new = jnp.asarray(
            pearson_center_normalize(qf.copy()), jnp.bfloat16
        )
        rec: dict = {"batch": b}
        print(f"compiling old route (b={b})...", flush=True)
        try:
            old_s, (_, oi) = timed(old_route, q_old, rows)
            rec["old_materialized_ms"] = round(old_s * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — the OOM IS the finding
            # b=2048 materializes an 8 GB (B, N) f32 score matrix and OOMs
            # HBM at compile — the old route cannot serve this shape at all
            old_s, oi = None, None
            rec["old_materialized_error"] = str(e)[:160]
        print(f"compiling new route (b={b})...", flush=True)
        new_s, (_, ni) = timed(new_route, q_new, plane)
        rec["new_plane_ms"] = round(new_s * 1e3, 2)
        if old_s is not None:
            oi, ni_h = np.asarray(oi), np.asarray(ni)
            rec["speedup"] = round(old_s / new_s, 2)
            rec["topk_overlap"] = round(float(
                np.mean([len(set(a) & set(c)) / k for a, c in zip(oi, ni_h)])
            ), 4)
        emit(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
