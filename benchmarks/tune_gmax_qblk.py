"""Tune the Pallas gmax kernel's QUERY-tile height at the fixed VMEM budget.

tune_gmax_blk.py swept the corpus-block budget at qblk = min(b, 1024) and
found every budget above ~12 MB fails the remote Mosaic compile. The
orthogonal axis is unexplored: at a FIXED 12 MB working set, a shorter
query tile shrinks the (qblk, blk) f32 score tile, freeing budget for a
taller corpus block (e.g. b=1024: qblk 1024 x blk 2048 today vs qblk 256 x
blk 4096) and possibly pipelining better — the kernel currently runs ~30%
MFU at b=1024 (13.9 ms vs the ~4.2 ms bf16 MXU roof), so the headroom
question matters for every big-batch metric that rides this stage 1.

Patches ops/pallas_gmax._QBLK_MAX, asserts index-identical results against
the XLA grouped formulation per point, appends one JSON line per
(batch, qblk) to results.jsonl.

Usage: python benchmarks/tune_gmax_qblk.py [batch ...] (default 1024 2048)
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
    record["bench"] = "tune_gmax_qblk_1m_384_bf16"
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

    orig_qblk_max = pg._QBLK_MAX
    try:
        for b in batches:
            q = jnp.asarray(
                rng.standard_normal((b, d), dtype=np.float32),
                dtype=jnp.bfloat16,
            )
            pg._QBLK_MAX = orig_qblk_max
            xv, xi = rank_top_k_grouped(q, v, k, group=128)
            ref_idx = np.asarray(xi)
            for qblk in (1024, 512, 256, 128):
                if qblk > b:
                    continue
                pg._QBLK_MAX = qblk
                blk = pg._block_rows(b, d, 2)
                for fn in (pg.rank_top_k_grouped_pallas, pg.gmax_f):
                    try:
                        fn.clear_cache()
                    except AttributeError:
                        pass
                print(f"b={b} qblk={qblk} blk={blk}: compiling...", flush=True)
                try:
                    pv, pi = pg.rank_top_k_grouped_pallas(q, v, k)
                    same = bool((np.asarray(pi) == ref_idx).all())
                    t = timed(
                        lambda qq: pg.rank_top_k_grouped_pallas(qq, v, k), q
                    )
                    emit({
                        "batch": b, "qblk": qblk, "blk": blk,
                        "pallas_ms": round(t * 1e3, 2),
                        "index_identical": same,
                    })
                except Exception as e:  # compile failures are data
                    emit({
                        "batch": b, "qblk": qblk, "blk": blk,
                        "error": str(e)[:200],
                    })
    finally:
        pg._QBLK_MAX = orig_qblk_max
    return 0


if __name__ == "__main__":
    sys.exit(main())
