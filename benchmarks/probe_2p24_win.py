"""Chip probe: the grid-WINDOWED routed path at 2^24 (round 5).

The monolithic 2048-block gmax programs have crashed the remote compile
helper for 9+ hours across every kernel form (probe_2p24_sub, the
tpu_gate_2p24 ladder twice), while 1280-block (10M int8) and 1M-class
grids compile fine. ops/pallas_gmax._windows now splits capacity grids
into <=HYPERDB_PALLAS_MAX_GRID_BLOCKS-block windows (default 1536 ->
2 x 1024 at 2^24). This probe validates the windowed default on chip:
compile, index identity vs the native XLA reference at b=8, and q/s at
the gate's b=512 shape. Run: python benchmarks/probe_2p24_win.py
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


def emit(rec: dict):
    rec["bench"] = "probe_2p24_win"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> int:
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

    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)

    @jax.jit
    def native(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    print("compiling native reference (b=8)...", flush=True)
    _, (_, ref_idx) = timed(native, q[:8], rows, iters=3, trials=1)
    ref_idx = np.asarray(ref_idx)

    for cap in (1536, 768):
        CONFIG.pallas_max_grid_blocks = cap

        @jax.jit
        def routed(qq, rr):
            return rank_top_k(qq, rr, k=k, metric="dot_product")

        nwin = -(-2048 // -(-2048 // cap) // 1)
        print(f"compiling routed 2^24 b=512 windowed cap={cap}...", flush=True)
        try:
            sec, (_, idx) = timed(routed, q, rows, iters=5, trials=3)
            eq = bool((np.asarray(idx)[:8] == ref_idx).all())
            emit({"variant": f"win_cap{cap}", "n": "2^24", "index_equal": eq,
                  "qps": round(b / sec), "ms": round(sec * 1e3, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"variant": f"win_cap{cap}", "n": "2^24",
                  "error": str(e)[:200]})
    return 0


if __name__ == "__main__":
    sys.exit(main())
