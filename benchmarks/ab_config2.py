"""Decompose BASELINE config 2 (100k x 384 f32, batch-64, masked cosine).

Round-2 row: 4,786 q/s (13.4 ms/batch) — ~40x off the roofline floor
(~0.3 ms: 153 MB corpus read + 4.9 GFLOP matmul), the largest relative gap
left in BASELINE.md. Two suspects, measured here as an A/B at the exact
driver shape:

1. the round-1 bench scored the RAW corpus (per-batch corpus
   re-normalization) where the engine serves prenormalized device rows;
2. 100k rows sits below HYPERDB_GROUPED_TOPK_MIN_ROWS (262,144), so
   selection pays the wide native TopK instead of group-max.

Variants (all masked, k=10, exactness asserted against variant A's indices):
  A  raw f32 corpus, cosine scores, native TopK        (the round-1 bench)
  B  prenormalized f32 corpus, native TopK             (what the engine does)
  C  prenormalized f32, grouped exact top-k (group-max selection)
  D  prenormalized f32, rescoring grouped top-k (rank_top_k_grouped)
  E  D with bf16 corpus+queries (the engine's bf16 serving mode)

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

    from hyperdb_tpu.ops.ranking import (
        exact_top_k,
        exact_top_k_grouped,
        rank_top_k,
        rank_top_k_grouped,
    )
    from hyperdb_tpu.ops import metrics as M

    rng = np.random.default_rng(0)
    n, d, b, k = 100_000, 384, 64, 10
    v = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((b, d), dtype=np.float32)
    mask = rng.random(n) < 0.5
    mask[:1000] = False

    norms = np.linalg.norm(v, axis=1, keepdims=True)
    norms[norms == 0] = 1
    vn = v / norms

    vj = jnp.asarray(v)
    vnj = jnp.asarray(vn)
    qj = jnp.asarray(q)
    rmask = jnp.asarray(mask)
    vnb = vnj.astype(jnp.bfloat16)

    @jax.jit
    def variant_a(qq, rows, m):
        return rank_top_k(qq, rows, k=k, metric="cosine_similarity", row_mask=m)

    @jax.jit
    def variant_b(qq, rows, m):
        s = M.cosine_scores_prenormalized(qq, rows)
        s = jnp.where(m[None, :], s, -jnp.inf)
        return exact_top_k(s, k)

    @jax.jit
    def variant_c(qq, rows, m):
        s = M.cosine_scores_prenormalized(qq, rows)
        s = jnp.where(m[None, :], s, -jnp.inf)
        return exact_top_k_grouped(s, k, group=32)

    @jax.jit
    def variant_d(qq, rows, m):
        qn = M.normalize(qq)
        return rank_top_k_grouped(qn, rows, k=k, row_mask=m, group=32)

    @jax.jit
    def variant_e(qq, rows, m):
        qn = M.normalize(qq).astype(rows.dtype)
        return rank_top_k_grouped(qn, rows, k=k, row_mask=m, group=32)

    def timed(fn, rows, iters=30, trials=3):
        vals, idx = fn(qj, rows, rmask)
        np.asarray(idx)
        best = float("inf")
        for _ in range(trials):
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(iters):
                vv, _ = fn(qj + acc * 0, rows, rmask)
                acc = vv[0, 0].astype(jnp.float32)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, np.asarray(fn(qj, rows, rmask)[1])

    out = {}
    ref_idx = None
    for name, fn, rows in [
        ("raw_f32_native", variant_a, vj),
        ("prenorm_f32_native", variant_b, vnj),
        ("prenorm_f32_gmax", variant_c, vnj),
        ("prenorm_f32_grouped", variant_d, vnj),
        ("prenorm_bf16_grouped", variant_e, vnb),
    ]:
        t, idx = timed(fn, rows)
        if ref_idx is None:
            ref_idx = idx
        out[name] = {
            "ms": round(t * 1e3, 2),
            "qps": round(b / t, 1),
            "idx_match": bool((idx == ref_idx).all()),
        }
        print(f"{name}: {out[name]}", flush=True)

    record = {"bench": "ab_config2_100k_masked", **out,
              "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
