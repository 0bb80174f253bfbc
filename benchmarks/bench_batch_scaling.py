"""Batch-size scaling of the exact grouped scan at 1M x 384 bf16.

The scan is bandwidth-bound at batch 256 (decompose_grouped.py: 3.95 ms vs
a 3.57 ms corpus-read probe), so per-batch time should stay ~flat as the
batch grows until the matmul goes compute-bound (~B=1024 at this shape:
786 GFLOP vs ~197 bf16 TFLOP/s), scaling queries/s nearly linearly with B.
This records the actual curve so BASELINE.md can state the peak-throughput
operating point, not just the driver's fixed B=256.

Emits one JSON line; appends to benchmarks/results.jsonl.
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


def main():
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.ranking import rank_top_k

    n_pad, d, k = 1 << 20, 384, 10
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.standard_normal((n_pad, d), dtype=np.float32), dtype=jnp.bfloat16
    )

    def timed(b, iters=20, trials=3):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
        )

        def fn(qq, rr):
            # the production entry (engine routing included): dot-form
            # grouped top-k, Pallas stage 1 above the measured crossover
            # (config.pallas_gmax_f_min_batch)
            return rank_top_k(qq, rr, k=k, metric="dot_product")

        vals, idx = fn(q, rows)
        np.asarray(idx)
        best = float("inf")
        for _ in range(trials):
            acc = jnp.zeros((), jnp.bfloat16)
            t0 = time.perf_counter()
            for _ in range(iters):
                vv, _ = fn(q + acc * 0, rows)
                acc = vv[0, 0].astype(jnp.bfloat16)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    record = {"bench": "batch_scaling_1m_384_bf16"}
    # round 5: sweep to the OOM boundary — the two-level (sub32) selection
    # cut the stage-3 gather 4x, so the round-3 b=16384 OOM may have moved
    # (VERDICT r4 #2); every batch is caught independently so the sweep
    # records exactly where the ceiling now is
    for b in (64, 256, 512, 1024, 2048, 4096, 8192, 16384):
        try:
            t = timed(b, iters=20 if b <= 2048 else 8)
        except Exception as e:  # noqa: BLE001 — record the boundary
            record[f"b{b}"] = {"error": str(e)[:160]}
            print(b, "FAILED:", str(e)[:160], flush=True)
            continue
        record[f"b{b}"] = {"ms": round(t * 1e3, 2), "qps": round(b / t, 1)}
        print(b, record[f"b{b}"], flush=True)
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
