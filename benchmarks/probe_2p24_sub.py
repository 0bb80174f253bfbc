"""Is the 2^24-row sub32 routed compile failure deterministic?

`routed_bf16_2p24_b512` has failed the remote compile 500-style once in
round 4 (post-promotion) and repeatedly in round 5's gate, while the same
route compiles at 1M and the single-level kernel compiled at 2^24 in
round 4 (01:56 run, 9.6k q/s). This probe separates shape-determinism
from tunnel weather: at 2^24 x 384 bf16 b=512 it tries the routed path
with the two-level kernel (sub=32, grid 2048, dual outputs) and with
single-level selection (sub=0), each through the gate's retry ladder,
and records which compiles and the q/s. Depending on the outcome the
engine either keeps sub32 everywhere, or gates the two-level path by
corpus size with a measured receipt. Run: python benchmarks/probe_2p24_sub.py
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
    rec["bench"] = "probe_2p24_sub"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_gate import timed
    from hyperdb_tpu.config import CONFIG
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

    t0 = time.time()
    rows = jnp.zeros((n, d), dtype=jnp.bfloat16)
    for i, kk in enumerate(jax.random.split(jax.random.PRNGKey(4), n // chunk)):
        rows = write_chunk(rows, gen_chunk(kk), jnp.int32(i * chunk))
    jax.block_until_ready(rows)
    print(f"built in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)

    @jax.jit
    def native8(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    print("compiling native reference (b=8)...", flush=True)
    _, (_, ref_idx) = timed(native8, q[:8], rows, iters=3, trials=1)
    ref_idx = np.asarray(ref_idx)

    saved = (CONFIG.pallas_subgroup, CONFIG.pallas_sub_dual)
    for name, sub, dual in (
        ("sub32_dual", 32, 1),      # the round-4 shipped form
        ("sub32_single", 32, 0),    # round-5: subgroup-only emission
        ("single_level", 0, 1),     # pre-round-4 selection
    ):
        CONFIG.pallas_subgroup = sub
        CONFIG.pallas_sub_dual = dual

        @jax.jit
        def routed(qq, rr):
            return rank_top_k(qq, rr, k=k, metric="dot_product")

        print(f"compiling routed 2^24 b=512 {name}...", flush=True)
        try:
            sec, (_, idx) = timed(routed, q, rows, iters=5, trials=2)
            eq = bool((np.asarray(idx)[:8] == ref_idx).all())
            emit({"variant": name, "n": "2^24", "index_equal": eq,
                  "qps": round(b / sec), "ms": round(sec * 1e3, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"variant": name, "n": "2^24", "error": str(e)[:200]})

    # ---- 1M perf check: the single-output form must not cost the
    # headline (b=2048, the shipped operating point's constituent) ----
    del rows
    n1 = 1 << 20
    rows1 = jnp.zeros((n1, d), dtype=jnp.bfloat16)
    for i, kk in enumerate(jax.random.split(jax.random.PRNGKey(5), n1 // chunk)):
        rows1 = write_chunk(rows1, gen_chunk(kk), jnp.int32(i * chunk))
    jax.block_until_ready(rows1)
    q2k = jnp.asarray(
        rng.standard_normal((2048, d), dtype=np.float32), jnp.bfloat16
    )
    ref1 = None
    for name, dual in (("sub32_dual", 1), ("sub32_single", 0)):
        CONFIG.pallas_subgroup = 32
        CONFIG.pallas_sub_dual = dual

        @jax.jit
        def routed1(qq, rr):
            return rank_top_k(qq, rr, k=k, metric="dot_product")

        print(f"compiling routed 1M b=2048 {name}...", flush=True)
        try:
            sec, (_, idx) = timed(routed1, q2k, rows1, iters=10, trials=3)
            idx = np.asarray(idx)
            rec = {"variant": name, "n": "1M", "b": 2048,
                   "qps": round(2048 / sec), "ms": round(sec * 1e3, 2)}
            if ref1 is None:
                ref1 = idx
            else:
                rec["index_equal_vs_dual"] = bool((idx == ref1).all())
            emit(rec)
        except Exception as e:  # noqa: BLE001
            emit({"variant": name, "n": "1M", "b": 2048,
                  "error": str(e)[:200]})
    CONFIG.pallas_subgroup, CONFIG.pallas_sub_dual = saved
    return 0


if __name__ == "__main__":
    sys.exit(main())
