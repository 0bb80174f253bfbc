"""End-to-end HTTP serving throughput: the full production stack on chip.

Every engine number so far times device programs; this measures what a
CLIENT of `python -m hyperdb_tpu serve` actually gets — sockets, HTTP
parsing, batching windows, the engine lock, device dispatch, and tunnel
readback, all included.

Setup: 1M x 384 f16 cosine corpus (the driver-headline config) served by
either front-end (`--server python|native`); client worker PROCESSES
(spawn — fork of the JAX parent deadlocks) drive `--concurrency`
keep-alive connections of `--mode json|binary|text` requests, optionally
HTTP/1.1-pipelined `--pipeline` deep (outstanding = concurrency x
pipeline — a few pipelined connections exercise flush depths that would
otherwise need thousands of client threads). A loopback probe first
reports the raw engine call cost per flush size and wire dtype, so the
HTTP numbers decompose against the no-HTTP floor.

The platform model (BASELINE.md serving section) predicts the shape:
each flush is one engine call costing ~25 ms round-trip floor + upload
(~30-60 MB/s; f16 wire halves it) + compute, so served q/s ~ flush /
W(flush) — flush depth is the only lever, and batch-dim bucketing keeps
arbitrary flush sizes on a handful of compiled programs instead of
recompiling 30-90 s per new size.

Usage: python benchmarks/bench_serving.py [--n 1000000] [--seconds 20]
       [--concurrency 32 128 512] [--server native] [--pipeline 128]
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = "--cpu" in sys.argv  # hermetic smoke mode (tests/CI)
if SMOKE:
    sys.argv.remove("--cpu")
    os.environ["HYPERDB_CHIP_LOCK_BYPASS"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")

from benchmarks._chiplock import claim_chip  # noqa: E402

if __name__ == "__main__":
    # spawn client workers re-import this file as __mp_main__; only the
    # real entrypoint may claim the chip (a child claiming would deadlock
    # against its own parent holding the lock)
    claim_chip()

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict) -> None:
    record["bench"] = "serving"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(record), flush=True)
    if not SMOKE:  # smoke runs must not pollute the chip-results log
        with open(RESULTS, "a") as f:
            f.write(json.dumps(record) + "\n")


def build_db(n: int, d: int):
    from hyperdb_tpu import HyperDB

    rng = np.random.default_rng(0)
    v = rng.standard_normal((n, d), dtype=np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    docs = [{"i": int(i)} for i in range(n)]
    return HyperDB(documents=docs, vectors=v, fp_precision="float16"), v


def loopback_probe(db, v, sizes, seconds_budget=60.0):
    """Time ``query_batch_arrays`` directly (no HTTP, no batcher): the
    per-flush engine wall the serving loop pays. Separates 'the engine
    call is slow over the tunnel' from 'the HTTP plane is slow'."""
    rng = np.random.default_rng(7)
    for b in sizes:
        q32 = (v[rng.integers(0, len(v), size=b)]
               + 0.01 * rng.standard_normal((b, v.shape[1]))
               ).astype(np.float32)
        for dt in (np.float32, np.float16):
            q = q32.astype(dt)
            db.query_batch_arrays(q, top_k=10)  # warm this exact shape
            trials = []
            deadline = time.perf_counter() + seconds_budget
            for _ in range(7):
                t0 = time.perf_counter()
                db.query_batch_arrays(q, top_k=10)
                trials.append(time.perf_counter() - t0)
                if time.perf_counter() > deadline:
                    break
            best = min(trials)
            emit({
                "loopback_flush": b,
                "wire": np.dtype(dt).name,
                "best_ms": round(best * 1e3, 2),
                "median_ms": round(sorted(trials)[len(trials) // 2] * 1e3, 2),
                "engine_qps_at_flush": round(b / best, 1),
            })


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--seconds", type=float, default=20.0)
    parser.add_argument("--port", type=int, default=8917)
    parser.add_argument("--max-batch", type=int, default=256)
    parser.add_argument("--window-ms", type=float, default=4.0)
    parser.add_argument("--concurrency", type=int, nargs="*",
                        default=[32, 128, 512])
    parser.add_argument("--mode", choices=["json", "binary", "text"],
                        default="binary",
                        help="text = text/plain bodies through the text hot "
                             "path (server embeds each flush in one encoder "
                             "pass)")
    parser.add_argument("--server", choices=["python", "native"],
                        default="python",
                        help="python = stdlib ThreadingHTTPServer + "
                             "_DynamicBatcher; native = C++ epoll front-end "
                             "(native/server.cc), one engine call per batch")
    parser.add_argument("--pipeline", type=int, default=1,
                        help="in-flight requests per client connection "
                             "(HTTP/1.1 pipelining; binary/text modes). "
                             "Outstanding total = concurrency * pipeline")
    parser.add_argument("--accept-binary", action="store_true",
                        help="ask for binary responses (native server only; "
                             "the python server ignores Accept)")
    args = parser.parse_args()

    from hyperdb_tpu.server import make_server

    print(f"building {args.n} x {args.d} f16 corpus ...", flush=True)
    t0 = time.time()
    db, v = build_db(args.n, args.d)
    print(f"built in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(42)
    qids = rng.integers(0, args.n, size=1024)
    qvecs = [
        (v[int(i)] + 0.01 * rng.standard_normal(args.d)).astype(np.float32)
        for i in qids
    ]
    accept = "application/octet-stream" if args.accept_binary else None
    if args.mode == "binary":
        bodies = [q.tobytes() for q in qvecs]
        path, ctype = "/query?top_k=10", "application/octet-stream"
    elif args.mode == "text":
        words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
        bodies = [
            (" ".join(rng.choice(words, size=10))).encode()
            for _ in range(256)
        ]
        path, ctype = "/query?top_k=10", "text/plain"
    else:
        bodies = [
            json.dumps({"vector": q.astype(float).round(5).tolist(),
                        "top_k": 10}).encode()
            for q in qvecs
        ]
        path, ctype = "/query", "application/json"

    # Warm every pow2 batch bucket the dynamic batcher can flush, so the
    # measured window contains zero remote compiles (30-90 s each). Warm
    # BOTH wire dtypes: the f16 corpus flips the servers to f16 flush
    # blocks (wire_dtype='auto'), which are distinct jit signatures — an
    # f32-only warm leaves every serving flush cold.
    t0 = time.time()
    wire_dtypes = [np.float32]
    if db._store.low_precision_device:
        wire_dtypes.append(np.float16)
    b = 1
    while b <= args.max_batch:
        for dt in wire_dtypes:
            db.query_batch_arrays((v[:b] + 0.01).astype(dt), top_k=10)
        b *= 2
    print(f"warmed {args.max_batch.bit_length()} batch buckets "
          f"x{len(wire_dtypes)} dtypes in {time.time() - t0:.1f}s",
          flush=True)

    if args.mode == "text":
        # warm the encoder's (seq bucket, pow2 batch) program shapes the
        # text flushes will hit (the encoder slices batches at 512)
        from hyperdb_tpu.query.engine import (
            generate_query_vectors_batch,
            generate_query_vectors_batch_device,
        )

        t0 = time.time()
        body_texts = [x.decode() for x in bodies]
        b = 1
        while b <= min(args.max_batch, 512):
            # the bodies' own distribution => their exact WordPiece seq
            # bucket (a fixed warm sentence warmed the WRONG bucket and the
            # first chip run measured remote compiles instead of serving)
            generate_query_vectors_batch(
                db, [body_texts[i % len(body_texts)] for i in range(b)]
            )
            b *= 2
        # the serving flush takes the DEVICE text path (f32-epilogue
        # forward + concat past 512 — programs DISJOINT from the host
        # path's): warm it for every pow2 flush bucket, and run the
        # chained scan once so the full flush program set is hot
        b = 1
        while b <= args.max_batch:
            texts = [body_texts[i % len(body_texts)] for i in range(b)]
            dev = generate_query_vectors_batch_device(db, texts)
            if dev is None:
                break  # host-embedder db: nothing device-side to warm
            db.query_batch_arrays(dev, top_k=10, n_valid=b)
            b *= 2
        print(f"warmed text-encode buckets in {time.time() - t0:.1f}s",
              flush=True)
        rng0 = np.random.default_rng(3)
        for b in sorted({32, 256, min(args.max_batch, 512)}):
            texts = [body_texts[i % len(body_texts)] for i in range(b)]
            generate_query_vectors_batch(db, texts)  # warm exact shape
            trials = []
            for _ in range(5):
                t1 = time.perf_counter()
                qb = generate_query_vectors_batch(db, texts)
                db.query_batch_arrays(
                    qb + 0.001 * rng0.standard_normal(qb.shape).astype(
                        np.float32),
                    top_k=10,
                )
                trials.append(time.perf_counter() - t1)
            best = min(trials)
            emit({
                "loopback_text_flush": b,
                "path": "host",
                "best_ms": round(best * 1e3, 2),
                "engine_qps_at_flush": round(b / best, 1),
            })
            # device-chained twin: embed -> scan without the intermediate
            # readback/re-upload (what the servers actually flush)
            if generate_query_vectors_batch_device(db, texts) is not None:
                trials = []
                for _ in range(5):
                    t1 = time.perf_counter()
                    dv = generate_query_vectors_batch_device(db, texts)
                    db.query_batch_arrays(dv, top_k=10, n_valid=b)
                    trials.append(time.perf_counter() - t1)
                best = min(trials)
                emit({
                    "loopback_text_flush": b,
                    "path": "device",
                    "best_ms": round(best * 1e3, 2),
                    "engine_qps_at_flush": round(b / best, 1),
                })

    # No-HTTP floor first: what one engine call costs per flush size.
    loopback_probe(db, v, sorted({32, 256, args.max_batch}))

    if args.server == "native":
        from hyperdb_tpu.native.server import NativeQueryServer

        native_srv = NativeQueryServer(
            db, port=args.port, max_batch=args.max_batch,
            window_ms=args.window_ms,
        )
        httpd = None
    else:
        native_srv = None
        httpd = make_server(db, port=args.port,
                            dynamic_batch_ms=args.window_ms,
                            max_batch=args.max_batch)
        server_thread = threading.Thread(target=httpd.serve_forever,
                                         daemon=True)
        server_thread.start()

    import multiprocessing as mp

    from benchmarks._serving_client import worker_main

    # spawn, not fork: forking this JAX-multithreaded parent deadlocks
    # children (observed on chip: the 2nd concurrency level's workers hung
    # and the bench died on queue timeout). worker_main lives in a
    # stdlib-only module so spawn re-imports stay cheap; bodies (<8 MB)
    # ship by pickle.
    ctx = mp.get_context("spawn")
    n_workers = min(8, os.cpu_count() or 4)
    ramp = 2.0
    for conc in args.concurrency:
        per = -(-conc // n_workers)
        workers = []
        out_q = ctx.Queue()
        for w in range(n_workers):
            t = min(per, conc - w * per)
            if t <= 0:
                break
            p = ctx.Process(target=worker_main,
                            args=(args.port, bodies, t, args.seconds, ramp,
                                  out_q, path, ctype, accept,
                                  args.pipeline))
            p.start()
            workers.append(p)
        done, all_lats, errors = 0, [], 0
        for _ in workers:
            c, l, e = out_q.get(timeout=ramp + args.seconds + 60)
            done += c
            all_lats.extend(l)
            errors += e
        for p in workers:
            p.join(timeout=10.0)
        if not all_lats:
            emit({"concurrency": conc, "error": "no completed requests",
                  "errors": errors})
            continue
        all_lats.sort()
        p50 = all_lats[len(all_lats) // 2] * 1e3
        p95 = all_lats[int(len(all_lats) * 0.95)] * 1e3
        p99 = all_lats[min(len(all_lats) - 1, int(len(all_lats) * 0.99))] * 1e3
        rec = {
            "concurrency": conc,
            "pipeline": args.pipeline,
            "mode": args.mode,
            "server": args.server,
            "qps": round(done / args.seconds, 1),
            "p50_ms": round(p50, 1),
            "p95_ms": round(p95, 1),
            "p99_ms": round(p99, 1),
            "errors": errors,
            "n": args.n,
            "max_batch": args.max_batch,
            "window_ms": args.window_ms,
        }
        if native_srv is not None:
            # in-process: read + reset the per-flush accounting directly so
            # each concurrency level reports its own flush profile
            f = max(1, native_srv.flushes)
            rec["flushes"] = native_srv.flushes
            rec["mean_flush"] = round(native_srv.flushed_queries / f, 1)
            rec["max_flush"] = native_srv.max_flush
            rec["engine_ms_per_flush"] = round(
                1e3 * native_srv.engine_s / f, 2)
            rec["worker_idle_s"] = round(native_srv.idle_s, 2)
            native_srv.flushes = native_srv.flushed_queries = 0
            native_srv.engine_s = native_srv.idle_s = 0.0
            native_srv.max_flush = 0
        emit(rec)

    # where does the flush wall time go? (the engine keeps per-phase stats)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", args.port)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        print("engine stats:", json.dumps(stats.get("phases", stats))[:800],
              flush=True)
        conn.close()
    except Exception as e:  # diagnostics only
        print("stats fetch failed:", e, flush=True)

    if native_srv is not None:
        native_srv.close()
    else:
        httpd.shutdown()
        if httpd.batcher is not None:
            httpd.batcher.close()


if __name__ == "__main__":
    main()
