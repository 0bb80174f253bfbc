"""Ingest-to-serving latency at scale: construct, first query, steady state.

Round-2 changes moved ingest off the critical path: the IVF k-means build
is opt-in (config.py:ivf_threshold — it cost 117 s at 1M rows, measured by
bench_single_ivf.py) and the two full-corpus device planes upload lazily on
first use (store._LazyDeviceView), so a cosine-serving DB pays exactly one
corpus transfer, at first query rather than at construction. This benchmark
records the resulting budget split at the driver's 1M x 384 f16 shape:

  construct_s    HyperDB(documents, vectors) — host-side only now
  first_query_s  lazy rows_norm upload + remote compile
  query_ms       steady-state single-query median afterwards

Usage: python benchmarks/bench_ingest.py [--n 1000000] [--d 384]
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

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--queries", type=int, default=20)
    args = parser.parse_args()

    from hyperdb_tpu import HyperDB

    rng = np.random.default_rng(0)
    n, d = args.n, args.d
    v = rng.standard_normal((n, d)).astype(np.float16)
    docs = [{"i": int(i)} for i in range(n)]
    queries = rng.standard_normal((args.queries, d)).astype(np.float32)

    t0 = time.time()
    db = HyperDB(documents=docs, vectors=v, fp_precision="float16")
    construct_s = time.time() - t0

    t0 = time.time()
    db.query(queries[0], top_k=10)
    first_query_s = time.time() - t0

    lat = []
    for q in queries[1:]:
        t0 = time.perf_counter()
        db.query(q, top_k=10)
        lat.append(time.perf_counter() - t0)
        db.clear_cache()

    record = {
        "bench": "ingest_to_serving",
        "n": n,
        "d": d,
        "construct_s": round(construct_s, 1),
        "first_query_s": round(first_query_s, 1),
        "query_ms_median": round(float(np.median(lat) * 1e3), 2),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
