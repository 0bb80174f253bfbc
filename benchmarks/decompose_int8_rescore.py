"""Isolate the int8 exact-mode rescore tail (ROADMAP open item).

precision='int8' serves exact results by overfetching from the int8 scan
and re-scoring candidates against the full-precision rows. This times the
scan stages separately at 1M x 384 (b=256, k=10, overfetch 4):

  stage1     int8 grouped scan, k_fetch winners, NO rescore (int8-pure form)
  full       the same + the (B, k_fetch, d) gather + exact einsum + top-k

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

    from hyperdb_tpu.ops.quantized import quantize_rows, rank_top_k_int8

    n, d, b, k = 1 << 20, 384, 256, 10
    rng = np.random.default_rng(0)
    host = rng.standard_normal((n, d), dtype=np.float32)
    v_i8, scales = quantize_rows(host)
    rows16 = jnp.asarray(host, dtype=jnp.bfloat16)
    vq = jnp.asarray(v_i8)
    sc = jnp.asarray(scales)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))

    def timed(fn, iters=20, trials=3):
        out = fn(q)
        jax.tree_util.tree_map(np.asarray, out)
        best = float("inf")
        for _ in range(trials):
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(iters):
                vv, _ = fn(q + acc * 0)
                acc = vv[0, 0].astype(jnp.float32)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_stage1 = timed(lambda qq: rank_top_k_int8(qq, vq, sc, k=k))
    t_full = timed(
        lambda qq: rank_top_k_int8(qq, vq, sc, k=k, rescore_rows=rows16)
    )
    record = {
        "bench": "decompose_int8_rescore_1m_384_b256",
        "stage1_ms": round(t_stage1 * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "rescore_tail_ms": round((t_full - t_stage1) * 1e3, 2),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
