"""On-chip A/B: transposed-corpus L1 stage 1 (gmax_l1t) vs the round-4
sublane kernel (gmax_l1) vs the streamed XLA scan.

The round-5 lever pass (VERDICT r4 #5): vreg accounting says the sublane
kernel spends ~2/3 of its VPU work on the per-query 7-level lane-reduce
tree and the (blk, 1) sublane-major epilogue; the transposed layout
replaces both with dense sublane folds (~2x predicted — see the
ops/pallas_l1.py round-5 module note). This probe measures both kernels
END TO END through rank_top_k_manhattan_pallas (selection + rescore
included) at the routed shapes and checks index identity against the
streamed oracle. Run: python benchmarks/probe_l1t.py
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
    rec["bench"] = "probe_l1t"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_gate import timed
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops.pallas_l1 import rank_top_k_manhattan_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_manhattan_stream

    n, d, k = 1 << 20, 384, 10
    rng = np.random.default_rng(42)
    rows = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), jnp.bfloat16
    )

    for b in (256, 2048):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
        )
        print(f"--- b={b}: streamed oracle ---", flush=True)
        try:
            _, (_, ref_idx) = timed(
                lambda qq: rank_top_k_manhattan_stream(qq, rows, k=k,
                                                       tile=2048),
                q, iters=2, trials=1,
            )
            ref_idx = np.asarray(ref_idx)
        except Exception as e:  # noqa: BLE001
            emit({"variant": "stream", "b": b, "error": str(e)[:200]})
            continue

        for name, knob in (("l1_sublane", 0), ("l1t", 1)):
            CONFIG.pallas_l1t = knob
            rank_top_k_manhattan_pallas.clear_cache()
            print(f"--- b={b}: {name} ---", flush=True)
            try:
                sec, (_, idx) = timed(
                    lambda qq: rank_top_k_manhattan_pallas(qq, rows, k=k),
                    q, iters=3, trials=3,
                )
                eq = bool((np.asarray(idx) == ref_idx).all())
                emit({"variant": name, "b": b, "ms": round(sec * 1e3, 2),
                      "qps": round(b / sec), "index_equal": eq})
            except Exception as e:  # noqa: BLE001
                emit({"variant": name, "b": b, "error": str(e)[:200]})
        rank_top_k_manhattan_pallas.clear_cache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
