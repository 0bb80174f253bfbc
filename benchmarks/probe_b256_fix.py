"""Standalone probe for the round-5 gmax_f_sub b=256 compile fix.

The round-4/5 gate's ``pallas_gmax_bf16_1m_b256`` case crashed the remote
compile helper deterministically (6 consecutive exit-code-1 failures over
~11 min, results.jsonl 2026-08-19): b=256 was the only engaged shape whose
budget formula admitted blk=16384 in the SWAPPED orientation. This probe
verifies the clamp-to-8192 fix compiles and stays index-identical to
native TopK at exactly that shape, without paying the full gate's
10M/2^24 builds. Run: python benchmarks/probe_b256_fix.py
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


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_gate import timed  # retry-aware compile+timing
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas

    n, d, b, k = 1 << 20, 384, 256, 10
    rng = np.random.default_rng(42)
    rows = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), jnp.bfloat16
    )
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)

    @jax.jit
    def native(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    @jax.jit
    def pallas_path(qq, rr):
        return rank_top_k_grouped_pallas(qq, rr, k=k)

    print("compiling native...", flush=True)
    _, (_, ref_idx) = timed(native, q, rows, iters=5, trials=1)
    print("compiling pallas sub32 b=256 (the fixed shape)...", flush=True)
    sec, (_, p_idx) = timed(pallas_path, q, rows)
    eq = bool((np.asarray(p_idx) == np.asarray(ref_idx)).all())
    rec = {"bench": "probe_b256_fix", "index_equal": eq,
           "qps": round(b / sec), "ms": round(sec * 1e3, 2),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return 0 if eq else 1


if __name__ == "__main__":
    sys.exit(main())
