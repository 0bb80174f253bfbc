"""DB-level performance harness.

Port of the reference's ad-hoc perf suite (/root/reference/tests/
perf_hyperdb.py: add-10k / single query / remove-1k / save+load, wall time +
RSS), extended with batched-query throughput and engine stats. Prints a JSON
line per phase.

Run: python benchmarks/perf_db.py [--n 10000]
"""

import argparse
import json
import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import numpy as np  # noqa: E402

from hyperdb_tpu import HyperDB  # noqa: E402


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def report(phase: str, seconds: float, extra=None):
    out = {"phase": phase, "seconds": round(seconds, 4), "rss_mb": round(rss_mb(), 1)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000)
    parser.add_argument("--remove", type=int, default=1_000)
    parser.add_argument(
        "--embedder", default=None, choices=["auto", "hash", "local"],
        help="override HYPERDB_DEFAULT_EMBEDDER for this run",
    )
    parser.add_argument(
        "--stream", action="store_true",
        help="ingest via add_stream (producer-thread embedding overlapped "
        "with commit/index work) instead of one add()",
    )
    args = parser.parse_args()
    if args.embedder:
        os.environ["HYPERDB_DEFAULT_EMBEDDER"] = args.embedder

    rng = random.Random(0)
    docs = [
        {"text": "".join(rng.choices(string.ascii_lowercase + " ", k=50))}
        for _ in range(args.n)
    ]

    db = HyperDB()
    emb_name = type(db._embedder()).__name__
    t0 = time.perf_counter()
    if args.stream:
        db.add_stream(docs, batch_size=2048)
    else:
        db.add(docs)
    report(
        "add_documents", time.perf_counter() - t0,
        {"n": args.n, "embedder": emb_name, "stream": bool(args.stream)},
    )

    t0 = time.perf_counter()
    db.query("a random query string", top_k=10)
    report("first_query(compile)", time.perf_counter() - t0)

    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        db.query(f"query number {i}", top_k=10)
    dt = time.perf_counter() - t0
    report("query", dt / iters, {"qps": round(iters / dt, 1)})

    queries = np.random.default_rng(0).standard_normal((64, db.dim)).astype(np.float32)
    db.query_batch(queries, top_k=10)  # compile at this batch shape
    t0 = time.perf_counter()
    db.query_batch(queries, top_k=10)
    dt = time.perf_counter() - t0
    report("query_batch_64", dt, {"qps": round(64 / dt, 1)})

    t0 = time.perf_counter()
    db.remove_document(list(range(args.remove)))
    report("remove_documents", time.perf_counter() - t0, {"n": args.remove})

    path = "/tmp/perf_db.pickle.gz"
    t0 = time.perf_counter()
    db.save(path)
    report("save", time.perf_counter() - t0)

    new_db = HyperDB()
    t0 = time.perf_counter()
    new_db.load(path)
    report("load", time.perf_counter() - t0)
    os.remove(path)

    print(json.dumps({"stats": db.stats.snapshot()}, indent=None))


if __name__ == "__main__":
    main()
