"""Tune the Pallas gmax kernel's VMEM budget (corpus block height).

ops/pallas_gmax._block_rows keeps the per-step working set under ~12 MB —
conservative against Mosaic's double buffering (the round-2 model
undercounted it). v5e VMEM is 128 MB, so bigger corpus blocks may lift MXU
efficiency at big batches (b=2048 measures 25.2 ms vs a ~15 ms
dispatch+compute floor). This sweeps the budget at the 1M x 384 bf16 shape,
asserting index-identical results against the XLA formulation each time.

Emits one JSON line per (budget, batch); appends to results.jsonl.

Usage: python benchmarks/tune_gmax_blk.py [batch ...] (default 1024 2048)
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


def emit(record: dict):
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main():
    import jax.numpy as jnp

    from hyperdb_tpu.ops import pallas_gmax as pg
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    batches = tuple(int(x) for x in sys.argv[1:]) or (1024, 2048)
    rng = np.random.default_rng(0)
    n, d, k = 1 << 20, 384, 10
    v = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16
    )

    def timed(fn, q, iters=10, trials=3):
        vals, idx = fn(q)
        np.asarray(idx)
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

    orig_block_rows = pg._block_rows

    def patched(budget_mb):
        def _block_rows(b, dd, itemsize):
            qblk = pg._q_tile(b)
            blk = 16384
            while blk > pg.GROUP and (
                2 * blk * dd * itemsize + 4 * qblk * blk
            ) > budget_mb * (1 << 20):
                blk //= 2
            return blk

        return _block_rows

    for b in batches:
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
        )
        pg._block_rows = orig_block_rows
        xv, xi = rank_top_k_grouped(q, v, k, group=128)
        ref_idx = np.asarray(xi)
        for budget in (12, 24, 48, 96):
            pg._block_rows = patched(budget)
            blk = pg._block_rows(b, d, 2)
            # jit caches key on shapes, not on the patched module global —
            # drop the cached programs so each budget re-traces
            for fn in (pg.rank_top_k_grouped_pallas, pg.gmax_f):
                try:
                    fn.clear_cache()
                except AttributeError:
                    pass
            print(f"b={b} budget={budget}MB blk={blk}: compiling...", flush=True)
            try:
                pv, pi = pg.rank_top_k_grouped_pallas(q, v, k)
                same = bool((np.asarray(pi) == ref_idx).all())
                t = timed(lambda qq: pg.rank_top_k_grouped_pallas(qq, v, k), q)
                emit({
                    "bench": "tune_gmax_blk_1m_384_bf16",
                    "batch": b, "budget_mb": budget, "blk": blk,
                    "pallas_ms": round(t * 1e3, 2),
                    "index_identical": same,
                })
            except Exception as e:  # compile failures are data, not crashes
                emit({
                    "bench": "tune_gmax_blk_1m_384_bf16",
                    "batch": b, "budget_mb": budget, "blk": blk,
                    "error": str(e)[:200],
                })
        pg._block_rows = orig_block_rows
    return 0


if __name__ == "__main__":
    sys.exit(main())
