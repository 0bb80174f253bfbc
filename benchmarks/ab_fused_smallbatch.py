"""Decide the Pallas fused kernel's fate (VERDICT round-1 weak item 1).

Measures the fused Pallas scan (ops/pallas_topk.fused_topk) against the
grouped exact top-k (ops/ranking.rank_top_k_grouped) and native TopK at
SMALL batch sizes — the only regime round 1 left open ("XLA wins for large
batches, the fused kernel for small ones", config.py) — on a 1M x 384 bf16
corpus. Run on the TPU; appends results to benchmarks/results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_topk import fused_topk, pick_tile
    from hyperdb_tpu.ops.ranking import exact_top_k_grouped, rank_top_k_grouped

    n, d, k = 1_048_576, 384, 10
    rng = np.random.default_rng(0)
    host = rng.standard_normal((n, d), dtype=np.float32)
    host /= np.linalg.norm(host, axis=1, keepdims=True)
    rows = jnp.asarray(host.astype(np.float16)).astype(jnp.bfloat16)
    valid = jnp.ones(n, dtype=bool)

    def bench(fn, q, iters=30, trials=3):
        vals, idx = fn(q)
        np.asarray(idx)  # compile + settle
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

    results = {}
    for b in (1, 8, 32, 64):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
        )
        tile = pick_tile(n, d)

        t_fused = bench(
            lambda qq: fused_topk(
                qq, rows, k=k, metric="dot_product", row_valid=valid, tile_n=tile
            ),
            q,
        )
        t_grouped = bench(
            lambda qq: rank_top_k_grouped(qq, rows, k=k, row_mask=valid, group=128),
            q,
        )

        def native(qq):
            s = jax.lax.dot_general(
                qq, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jax.lax.top_k(s, k)

        t_native = bench(native, q)
        results[f"b{b}"] = {
            "fused_ms": round(t_fused * 1000, 2),
            "grouped_ms": round(t_grouped * 1000, 2),
            "native_topk_ms": round(t_native * 1000, 2),
        }
        print(f"b={b}: {results[f'b{b}']}", flush=True)

    record = {"bench": "ab_fused_smallbatch_1m_384_bf16", **results}
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl"), "a"
    ) as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
