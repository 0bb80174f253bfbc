"""Controlled 2^24 compile forensics (round 5).

Separates three explanations for the capacity-scale compile failures:
(a) helper globally degraded -> the 1M control fails too;
(b) grid-count limit -> windowed sub32 (cap 768: <=683-block grids,
    smaller than the 10M int8 case's 1280 that compiled at 12:33) works;
(c) stage-1 OUTPUT size limit -> single-level (268 MB out at 2^24 b=512,
    the form that compiled 01:56) works while sub32 (1.07 GB out) fails
    at every cap.
Emits one row per case. Run: python benchmarks/probe_2p24_ctl.py
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
    rec["bench"] = "probe_2p24_ctl"
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

    d, b, k = 384, 512, 10
    chunk = 1 << 19

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (chunk, d), dtype=jnp.float32)
        nn = jnp.linalg.norm(x, axis=1, keepdims=True)
        return (x / jnp.where(nn == 0, 1.0, nn)).astype(jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_chunk(buf, c, row0):
        return jax.lax.dynamic_update_slice(buf, c, (row0, 0))

    def build(n):
        rows = jnp.zeros((n, d), dtype=jnp.bfloat16)
        for i, kk in enumerate(
            jax.random.split(jax.random.PRNGKey(4), n // chunk)
        ):
            rows = write_chunk(rows, gen_chunk(kk), jnp.int32(i * chunk))
        jax.block_until_ready(rows)
        return rows

    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)

    @jax.jit
    def native(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    def run_case(name, rows, sub, cap, ref_idx, iters=5):
        CONFIG.pallas_subgroup = sub
        CONFIG.pallas_max_grid_blocks = cap

        @jax.jit
        def routed(qq, rr):
            return rank_top_k(qq, rr, k=k, metric="dot_product")

        print(f"compiling {name}...", flush=True)
        try:
            sec, (_, idx) = timed(routed, q, rows, iters=iters, trials=2)
            eq = bool((np.asarray(idx)[:8] == ref_idx).all())
            emit({"case": name, "index_equal": eq,
                  "qps": round(b / sec), "ms": round(sec * 1e3, 2)})
            return True
        except Exception as e:  # noqa: BLE001
            emit({"case": name, "error": str(e)[:160]})
            return False

    # -- control: 1M-class fresh compile in THIS process/phase --
    print("building 1M control corpus...", flush=True)
    rows1 = build(1 << 20)
    _, (_, ref1) = timed(native, q[:8], rows1, iters=3, trials=1)
    ok_ctl = run_case("control_1m_sub32", rows1, 32, 0, np.asarray(ref1))
    del rows1
    if not ok_ctl:
        emit({"case": "verdict", "note": "helper degraded for 1M-class too"})
        return 1

    print("building 2^24 corpus...", flush=True)
    rows = build(1 << 24)
    _, (_, ref) = timed(native, q[:8], rows, iters=3, trials=1)
    ref = np.asarray(ref)

    # -- the 01:56-validated single-level form (268 MB stage-1 out) --
    ok_single = run_case("single_level_2p24", rows, 0, 0, ref)
    # -- windowed single-level --
    if not ok_single:
        run_case("single_level_2p24_cap1536", rows, 0, 1536, ref)
    # -- windowed sub32 at a sub-1280 grid cap --
    run_case("sub32_2p24_cap768", rows, 32, 768, ref)
    return 0


if __name__ == "__main__":
    sys.exit(main())
