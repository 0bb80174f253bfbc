"""Single-query latency: IVF routing vs the exact scan, same engine.

With HYPERDB_IVF_THRESHOLD=65536 (the round-1 default; opt-in since
round 2) the engine routes single queries through the IVF probe +
candidate gather above 65k rows. Round-1 config-3
telemetry (results.jsonl 2026-08-16T08:36) recorded probe 2.5 ms +
gather/rank 80 ms per query at 1M rows — while the exact grouped scan
measured ~3.2 ms at batch 1 on the same corpus shape. If that holds at the
engine surface, the ANN routing is a net loss at every corpus size that
fits one chip and the threshold default should flip to exact-by-default.

Times db.query end-to-end (tunnel round trip included — both paths pay it)
over distinct queries (cache misses) with the SAME built DB: once with the
IVF index installed, once with it swapped for the flat exact index.

Usage: python benchmarks/bench_single_ivf.py [--n 1000000] [--queries 40]
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

# this benchmark MEASURES the IVF routing, which is opt-in since round 2
os.environ.setdefault("HYPERDB_IVF_THRESHOLD", "65536")

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--queries", type=int, default=40)
    parser.add_argument("--k", type=int, default=10)
    args = parser.parse_args()

    from hyperdb_tpu import HyperDB
    from hyperdb_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(0)
    n, d, k = args.n, args.d, args.k
    centers = rng.standard_normal((1024, d)).astype(np.float32) * 2
    assign = rng.integers(0, 1024, size=n)
    v = (centers[assign] + rng.standard_normal((n, d)).astype(np.float32)).astype(
        np.float16
    )
    docs = [{"i": int(i)} for i in range(n)]
    t0 = time.time()
    db = HyperDB(documents=docs, vectors=v, fp_precision="float16")
    build_s = time.time() - t0
    assert getattr(db.ann_index, "is_ann", False), "expected IVF above threshold"
    queries = (
        centers[rng.integers(0, 1024, size=args.queries)]
        + rng.standard_normal((args.queries, d)).astype(np.float32)
    ).astype(np.float32)

    def run(label):
        db.query(queries[-1], top_k=k)  # warm/compile
        lat = []
        out = []
        for q in queries:
            t0 = time.perf_counter()
            out.append(db.query(q, top_k=k))
            lat.append(time.perf_counter() - t0)
            db.clear_cache()
        lat = np.array(lat)
        return {
            "median_ms": round(float(np.median(lat) * 1e3), 2),
            "p90_ms": round(float(np.percentile(lat, 90) * 1e3), 2),
            "qps": round(float(1.0 / np.median(lat)), 1),
        }, out

    ivf_stats, ivf_out = run("ivf")
    ivf_index = db.ann_index
    db.ann_index = FlatIndex(db.ann_metric, d)
    db.clear_cache()
    exact_stats, exact_out = run("exact")
    db.ann_index = ivf_index

    recalls = [
        len({r[2] for r in a} & {r[2] for r in b}) / k
        for a, b in zip(ivf_out, exact_out)
    ]
    record = {
        "bench": "single_query_ivf_vs_exact",
        "n": n,
        "ivf": ivf_stats,
        "exact": exact_stats,
        "ivf_recall_at_k": round(float(np.mean(recalls)), 4),
        "build_s": round(build_s, 1),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
