"""Round-4 gmax follow-up: combine the EXACT stage-1 wins from
probe_gmax_r4 and measure the production pipeline with them.

probe_gmax_r4 found (same tunnel phase, same data):
  - dimension_semantics ("parallel", "arbitrary"): 9.27 vs 10.14 ms b=1024
  - vmem_limit 56 MB + blk x4: 14.44 vs 15.49 ms b=2048
  - bf16 emission: best stage-1 everywhere (8.81 b=1024) but the full
    pipeline LOSES 2x at the safe k+3k overfetch margin (54.5 vs 25.7 ms)
    — stage-3 rescore grows linearly in margin, exactly as docs/ROADMAP.md
    predicted. bf16 emission is therefore measured OUT for the pipeline.

This probe crosses the two EXACT knobs (plus CostEstimate) per batch and
times the full grouped top-k pipeline with the best combo, asserting
index-identity vs the production route. Winner gets promoted into
ops/pallas_gmax.py.
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
GROUP = 128


def emit(record: dict):
    record["bench"] = "probe_gmax_r4b"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def timed(fn, *args, iters=10, trials=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    q_dtype = args[0].dtype
    best = float("inf")
    for _ in range(trials):
        acc = jnp.zeros((), q_dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(args[0] + acc * 0, *args[1:])
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            acc = leaf.reshape(-1)[0].astype(q_dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.probe_gmax_r4 import gmax_variant
    from hyperdb_tpu.ops.pallas_gmax import _block_rows, gmax_f

    print("devices:", jax.devices(), flush=True)
    n, d, k = 1 << 20, 384, 10
    rng = np.random.default_rng(42)
    rows = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), jnp.bfloat16
    )
    extra = jnp.zeros((n,), dtype=jnp.float32)

    pa = ("parallel", "arbitrary")
    for b in (1024, 2048):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
        )
        blk0 = _block_rows(b, d, rows.dtype.itemsize)
        print(f"--- b={b}: base (blk={blk0}) ---", flush=True)
        sec, base_gm = timed(
            jax.jit(lambda qq, rr: gmax_f(qq, rr, extra)), q, rows
        )
        base_gm = np.asarray(base_gm)
        emit({"probe": f"base_b{b}", "ms": round(sec * 1e3, 2),
              "qps": round(b / sec)})

        variants = [
            ("pa", dict(blk=blk0, dimsem=pa)),
            ("pa_ce", dict(blk=blk0, dimsem=pa, cost_estimate=True)),
            ("pa_vmem56_blk4x",
             dict(blk=blk0 * 4, dimsem=pa, vmem_limit=56 << 20)),
            ("pa_ce_vmem56_blk4x",
             dict(blk=blk0 * 4, dimsem=pa, vmem_limit=56 << 20,
                  cost_estimate=True)),
            ("pa_vmem28_blk2x",
             dict(blk=blk0 * 2, dimsem=pa, vmem_limit=28 << 20)),
        ]
        for name, kw in variants:
            print(f"--- b={b}: {name} ---", flush=True)
            try:
                fn = jax.jit(
                    lambda qq, rr, _kw=kw: gmax_variant(qq, rr, extra, **_kw)
                )
                sec, gm = timed(fn, q, rows)
                exact = bool((np.asarray(gm) == base_gm).all())
                emit({"probe": f"{name}_b{b}", "ms": round(sec * 1e3, 2),
                      "qps": round(b / sec), "max_equal": exact,
                      "blk": kw["blk"]})
            except Exception as e:  # noqa: BLE001
                emit({"probe": f"{name}_b{b}", "error": str(e)[:300]})

    # ---- full pipeline with the combo kernel vs production ----
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas

    @jax.jit
    def full_prod(qq, rr):
        return rank_top_k_grouped_pallas(qq, rr, k=k)

    def make_full(kw):
        @jax.jit
        def full(qq, rr):
            gm = gmax_variant(qq, rr, extra, **kw)
            _, gidx = jax.lax.top_k(gm, k)
            g = n // GROUP
            r3 = rr.reshape(g, GROUP, d)
            cand = jnp.take(r3, gidx, axis=0)
            cs = jnp.einsum("bd,bkgd->bkg", qq, cand,
                            preferred_element_type=jnp.float32)
            cs = jnp.where(jnp.isnan(cs), -jnp.inf, cs)
            cs = cs.reshape(qq.shape[0], k * GROUP)
            vals, pos = jax.lax.top_k(cs, k)
            winner = jnp.take_along_axis(gidx, pos // GROUP, axis=-1)
            return vals, (winner * GROUP + pos % GROUP).astype(jnp.int32)
        return full

    for b in (1024, 2048):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
        )
        blk0 = _block_rows(b, d, rows.dtype.itemsize)
        print(f"--- b={b}: pipeline production ---", flush=True)
        sec_p, (_, idx_p) = timed(full_prod, q, rows)
        emit({"probe": f"pipeline_prod_b{b}", "ms": round(sec_p * 1e3, 2),
              "qps": round(b / sec_p)})
        for name, kw in (
            ("pa", dict(blk=blk0, dimsem=pa)),
            ("pa_vmem56_blk4x",
             dict(blk=blk0 * 4, dimsem=pa, vmem_limit=56 << 20)),
        ):
            print(f"--- b={b}: pipeline {name} ---", flush=True)
            try:
                sec_c, (_, idx_c) = timed(make_full(kw), q, rows)
                eq = bool((np.asarray(idx_c) == np.asarray(idx_p)).all())
                emit({"probe": f"pipeline_{name}_b{b}",
                      "ms": round(sec_c * 1e3, 2),
                      "qps": round(b / sec_c), "index_equal": eq})
            except Exception as e:  # noqa: BLE001
                emit({"probe": f"pipeline_{name}_b{b}",
                      "error": str(e)[:300]})

    return 0


if __name__ == "__main__":
    sys.exit(main())
