"""Chip probe: the PLANAR capacity route at 2^24 (round 5).

The production engine stores capacity corpora as split device planes
(CONFIG.plane_rows = 2^23; query/engine.py planar branch) so no XLA
program ever compiles against a monolithic capacity operand — the class
the 2026-08-19 forensics showed crashing/wedging the remote compile
helper in oscillating windows (probe_2p24_ctl passed cap768 at 20:39;
the same shape 500'd at 21:02). This probe proves the 2^24 capacity
ceiling through the planar route: two 2^23-row bf16 planes, per-plane
native references merged on host, index identity, q/s at the gate's
b=512 shape. Emits the full gate's `planar_bf16_2p24_b512` row.
Run: python benchmarks/probe_2p24_planar.py
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
    rec["bench"] = "tpu_gate"
    rec["note"] = "focused planar probe (probe_2p24_planar)"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_gate import timed
    from hyperdb_tpu.ops.ranking import rank_top_k_planar

    n, d, b, k = 1 << 24, 384, 512, 10
    half, chunk = n // 2, 1 << 19

    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (chunk, d), dtype=jnp.float32)
        nn = jnp.linalg.norm(x, axis=1, keepdims=True)
        return (x / jnp.where(nn == 0, 1.0, nn)).astype(jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_chunk(buf, c, row0):
        return jax.lax.dynamic_update_slice(buf, c, (row0, 0))

    def build(rows_n, seed):
        rows = jnp.zeros((rows_n, d), dtype=jnp.bfloat16)
        for i, kk in enumerate(
            jax.random.split(jax.random.PRNGKey(seed), rows_n // chunk)
        ):
            rows = write_chunk(rows, gen_chunk(kk), jnp.int32(i * chunk))
        jax.block_until_ready(rows)
        return rows

    print(f"building 2 x {half} x {d} bf16 planes...", flush=True)
    t0 = time.time()
    planes = [build(half, 14 + i) for i in (0, 1)]
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

    print("compiling per-plane native reference (b=8)...", flush=True)
    ref_v, ref_i = [], []
    for pi, plane in enumerate(planes):
        _, (v8, i8) = timed(native, q[:8], plane, iters=3, trials=1)
        ref_v.append(np.asarray(v8))
        ref_i.append(np.asarray(i8) + pi * half)
    cat_v = np.concatenate(ref_v, axis=1)
    cat_i = np.concatenate(ref_i, axis=1)
    order = np.argsort(-cat_v, axis=1, kind="stable")[:, :k]
    ref_idx = np.take_along_axis(cat_i, order, axis=1)

    print("running planar routed top-k (2^24, b=512)...", flush=True)
    # A process that exited seconds earlier can leave its HBM unreclaimed
    # for minutes (CLAUDE.md chip-claim note); at 12.9 GB of planes the
    # planar run sits near the ceiling, so transient ResourceExhausted
    # gets a spaced retry rather than a verdict.
    last = None
    for attempt, delay in enumerate((0, 120, 240)):
        if delay:
            print(f"  ResourceExhausted, retrying in {delay}s", flush=True)
            time.sleep(delay)
        try:
            sec, (_, idxp) = timed(
                lambda qq: rank_top_k_planar(
                    qq, planes, k=k, metric="dot_product"
                ),
                q, iters=5, trials=3,
            )
            eq = bool((np.asarray(idxp)[:8] == ref_idx).all())
            emit({"gate": "planar_bf16_2p24_b512", "index_equal": eq,
                  "qps": round(b / sec), "ms": round(sec * 1e3, 2)})
            return 0 if eq else 1
        except Exception as e:  # noqa: BLE001
            last = e
            if "RESOURCE_EXHAUSTED" not in str(e):
                break
    emit({"gate": "planar_bf16_2p24_b512", "error": str(last)[:200]})
    return 1


if __name__ == "__main__":
    sys.exit(main())
