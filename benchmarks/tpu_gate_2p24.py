"""Focused re-run of the tpu_gate 2^24 capacity case (round 5).

The full gate's `routed_bf16_2p24_b512` case sits inside a degraded
compile-helper window where EVERY capacity-scale program (all kernel
forms, and even a plain dot+top_k slows to ~6 min) 500s repeatedly while
1M-class programs compile fine (probe_2p24_sub forensics, CLAUDE.md).
This script re-checks just that case — device corpus build, native
reference at b=8, the routed two-level path at b=512, index equality —
so the window can be re-probed cheaply between rounds of other work
without paying the full gate's 10M/1M cases. Emits the same gate row.
Run: python benchmarks/tpu_gate_2p24.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict):
    record["bench"] = "tpu_gate"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_gate import timed
    from hyperdb_tpu.ops.ranking import rank_top_k

    n, d, b, k = 1 << 24, 384, 512, 10
    chunk = 1 << 19
    print(f"building {n} x {d} bf16 corpus on device...", flush=True)

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (chunk, d), dtype=jnp.float32)
        nn = jnp.linalg.norm(x, axis=1, keepdims=True)
        return (x / jnp.where(nn == 0, 1.0, nn)).astype(jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_chunk(buf, c, row0):
        return jax.lax.dynamic_update_slice(buf, c, (row0, 0))

    rows = jnp.zeros((n, d), dtype=jnp.bfloat16)
    for i, kk in enumerate(jax.random.split(jax.random.PRNGKey(4), n // chunk)):
        rows = write_chunk(rows, gen_chunk(kk), jnp.int32(i * chunk))
    jax.block_until_ready(rows)

    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)

    @jax.jit
    def native(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    @jax.jit
    def routed(qq, rr):
        return rank_top_k(qq, rr, k=k, metric="dot_product")

    try:
        print("compiling native reference (b=8)...", flush=True)
        _, (_, ref_idx) = timed(native, q[:8], rows, iters=3, trials=1)
        ref_idx = np.asarray(ref_idx)
        print("compiling routed rank_top_k (2^24, b=512)...", flush=True)
        sec, (_, idx) = timed(routed, q, rows, iters=5, trials=2)
        eq = bool((np.asarray(idx)[:8] == ref_idx).all())
        emit({"gate": "routed_bf16_2p24_b512", "index_equal": eq,
              "qps": round(b / sec), "ms": round(sec * 1e3, 2),
              "note": "focused re-run (tpu_gate_2p24)"})
        return 0 if eq else 1
    except Exception as e:  # noqa: BLE001
        emit({"gate": "routed_bf16_2p24_b512", "error": str(e)[:200],
              "note": "focused re-run (tpu_gate_2p24)"})
        return 1


if __name__ == "__main__":
    sys.exit(main())
