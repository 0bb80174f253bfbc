"""Measure the batched-IVF crossover for real (VERDICT r1 item 7).

``HYPERDB_BATCH_IVF_MIN_ROWS`` defaults to 2M, but round 1 never ran
``query_batch`` at >=2M rows with the IVF path on vs off — the default was a
guess extrapolated from 1M-row measurements. This benchmark builds real
engine-level corpora (clustered, like embedding corpora — uniform noise is
the degenerate worst case for any ANN structure) at 2M/4M rows and times
``db.query_batch`` end-to-end both ways, plus the IVF path's recall@k
against the exact scan on the same queries.

Engine-level timing deliberately includes the host probe, the union gather,
the (B, U) validity upload, and the tunnel round trip — the quantities the
crossover decision actually trades off.

Usage: python benchmarks/bench_ivf_crossover.py [--sizes 2000000 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict):
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def clustered_corpus(n: int, d: int, n_centers: int, rng):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 2
    assign = rng.integers(0, n_centers, size=n)
    v = centers[assign] + rng.standard_normal((n, d)).astype(np.float32)
    return centers, v.astype(np.float16)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[2_000_000, 4_000_000])
    parser.add_argument("--batches", type=int, nargs="+", default=[64, 256])
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    from hyperdb_tpu import HyperDB
    from hyperdb_tpu.config import CONFIG

    d, k = args.d, args.k
    rng = np.random.default_rng(0)

    for n in args.sizes:
        centers, v = clustered_corpus(n, d, 1024, rng)
        docs = [{"i": int(i)} for i in range(n)]
        t0 = time.time()
        db = HyperDB(documents=docs, vectors=v, fp_precision="float16")
        build_s = time.time() - t0
        assert db.ann_index is not None and getattr(db.ann_index, "is_ann", False)
        print(f"n={n}: ingest+IVF build {build_s:.1f}s", flush=True)

        for b in args.batches:
            q = (
                centers[rng.integers(0, 1024, size=b)]
                + rng.standard_normal((b, d)).astype(np.float32)
            ).astype(np.float32)

            def run_batch(min_rows):
                old = CONFIG.batch_ivf_min_rows
                CONFIG.batch_ivf_min_rows = min_rows
                try:
                    return db.query_batch(q, top_k=k)
                finally:
                    CONFIG.batch_ivf_min_rows = old

            def timed(min_rows):
                run_batch(min_rows)  # warm / compile
                best = float("inf")
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    out = run_batch(min_rows)
                    best = min(best, time.perf_counter() - t0)
                return best, out

            t_exact, exact_out = timed(1 << 62)
            t_ivf, ivf_out = timed(0)
            recalls = [
                len({r[2] for r in ivf_out[i]} & {r[2] for r in exact_out[i]}) / k
                for i in range(b)
            ]
            emit(
                {
                    "bench": "ivf_crossover",
                    "n": n,
                    "batch": b,
                    "exact_ms": round(t_exact * 1e3, 1),
                    "ivf_ms": round(t_ivf * 1e3, 1),
                    "exact_qps": round(b / t_exact, 1),
                    "ivf_qps": round(b / t_ivf, 1),
                    "ivf_recall_at_k": round(float(np.mean(recalls)), 4),
                    "build_s": round(build_s, 1),
                }
            )
        del db, docs, v
    return 0


if __name__ == "__main__":
    sys.exit(main())
