"""Diagnose the probe_l1t l1_sublane b=2048 index mismatch (round 5).

probe_l1t (2026-08-19 10:30) recorded index_equal=false for the SUBLANE
L1 kernel against the streamed oracle at 1M x 384 bf16 b=2048 — the
first observed disagreement (the round-4 gate case passed with its own
query draw). Two benign/harmful cases:

  - TIE SHUFFLING: the differing indices carry byte-equal true scores
    (1/(1+L1) f32) — any winner set is valid, the standing grouped-route
    caveat. No action.
  - MARGIN BREACH: a true top-k row's group fell outside the
    k + L1_GROUP_MARGIN overfetch because >margin adjacent group maxes
    sat within kernel-vs-XLA summation noise. Action: raise the margin
    (stage-3 gather is a small fraction of the scan).

This probe reruns the exact probe_l1t shapes for BOTH kernels, finds
every row where indices differ from the stream, and classifies each by
comparing the score multisets. Run: python benchmarks/probe_l1_mismatch.py
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
    import jax.numpy as jnp

    from benchmarks.tpu_gate import timed
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops.pallas_l1 import rank_top_k_manhattan_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_manhattan_stream

    n, d, k, b = 1 << 20, 384, 10, 2048
    rng = np.random.default_rng(42)
    rows = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), jnp.bfloat16
    )
    # reproduce probe_l1t's draw order exactly: it drew a b=256 query
    # block before the b=2048 one, from the same seed-42 stream
    rng.standard_normal((256, d), dtype=np.float32)
    q2 = jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
    )

    print("streamed oracle...", flush=True)
    _, (sv, si) = timed(
        lambda qq: rank_top_k_manhattan_stream(qq, rows, k=k, tile=2048),
        q2, iters=1, trials=1,
    )
    sv, si = np.asarray(sv), np.asarray(si)

    for name, knob in (("l1_sublane", 0), ("l1t", 1)):
        CONFIG.pallas_l1t = knob
        rank_top_k_manhattan_pallas.clear_cache()
        print(f"{name}...", flush=True)
        _, (pv, pi) = timed(
            lambda qq: rank_top_k_manhattan_pallas(qq, rows, k=k),
            q2, iters=1, trials=1,
        )
        pv, pi = np.asarray(pv), np.asarray(pi)
        bad = np.nonzero((pi != si).any(axis=1))[0]
        ties = breaches = 0
        worst = 0.0
        for r in bad:
            if np.array_equal(np.sort(pv[r]), np.sort(sv[r])) or np.allclose(
                np.sort(pv[r]), np.sort(sv[r]), rtol=0, atol=0
            ):
                ties += 1
            else:
                breaches += 1
                worst = max(worst, float(np.max(np.abs(
                    np.sort(pv[r]) - np.sort(sv[r])
                ))))
        rec = {"bench": "probe_l1_mismatch", "variant": name, "b": b,
               "rows_differing": int(len(bad)), "tie_rows": ties,
               "breach_rows": breaches, "worst_score_gap": worst,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
