"""Crossover measurement: two-stage reduced-rank scan vs exact int8-pure.

VERDICT r3 #6's deliverable: a design that beats the exact scan at some
measured scale — or a rigorous negative result — recorded in
results.jsonl. The contender is index/projscan (PCA-d' int8 stage A +
exact int8 rescore of the overfetch winners); the incumbent is the
int8-pure grouped scan (BASELINE.md row 5: 14.3k q/s at 10M x 768 b1024).

Bandwidth accounting at the measured ~230-310 GB/s platform cap
(benchmarks/bw_ladder.py): exact = N*768 bytes/batch; two-stage =
N*d' + B*overfetch*768 bytes. At 10M/b1024/d'=96/c=256: 0.96 GB + 0.2 GB
vs 7.7 GB — a ~6.6x traffic reduction, so the *potential* is ~6x q/s.
Recall is the price and depends on the data's spectrum: measured on BOTH
a clustered corpus (rank-deficient, like real embeddings) and isotropic
Gaussian (the adversarial case — sqrt(d'/d) score correlation).

Recall oracle: the exact int8 ranking on the same queries (the thing the
two-stage path approximates; int8-vs-f32 loss is the store's own,
measured elsewhere at 0.981).

Usage: python benchmarks/bench_projscan.py [--n 10000000] [--batch 1024]
       [--data clustered|gaussian|both] [--dprimes 64,96] [--overfetch 128,256,1024]
"""

from __future__ import annotations

import argparse
import functools
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
    record["bench"] = "projscan_crossover"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000_000)
    parser.add_argument("--d", type=int, default=768)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--chunk", type=int, default=1 << 19)
    parser.add_argument("--clusters", type=int, default=4096)
    parser.add_argument("--data", default="clustered",
                        choices=["clustered", "gaussian", "spectrum", "both"])
    parser.add_argument("--dprimes", default="96")
    parser.add_argument("--overfetch", default="256")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.core.store import bucket_size
    from hyperdb_tpu.index.projscan import ProjScanIndex
    from hyperdb_tpu.ops.quantized import rank_top_k_int8

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    n, d, b, k = args.n, args.d, args.batch, args.k
    n_pad = bucket_size(n)
    chunk = args.chunk
    assert n_pad % chunk == 0

    datasets = (
        ["clustered", "gaussian"] if args.data == "both" else [args.data]
    )
    dprimes = [int(x) for x in args.dprimes.split(",")]
    overfetches = [int(x) for x in args.overfetch.split(",")]

    for data_kind in datasets:
        # ---- device-side generation (normalized rows, int8) ----
        centers = jax.random.normal(
            jax.random.PRNGKey(99), (args.clusters, d), dtype=jnp.float32
        )

        # 'spectrum': per-dim power-law scaling (1+i)^-0.5 — the decaying
        # eigenspectrum real embedding corpora have (top-128 of 768 dims
        # carry ~73% of variance), which 'clustered' (isotropic centers)
        # and 'gaussian' deliberately lack. This is the regime a PCA
        # stage-A can help in; the flat kinds are the adversarial control.
        decay = jnp.asarray(
            (1.0 + np.arange(d)) ** -0.5, dtype=jnp.float32
        )

        @jax.jit
        def gen_chunk(key, cents):
            kc, kn = jax.random.split(key)
            x = jax.random.normal(kn, (chunk, d), dtype=jnp.float32)
            if data_kind == "clustered":
                cid = jax.random.randint(kc, (chunk,), 0, args.clusters)
                # cluster radius 0.35: intra-cluster spread well below the
                # inter-center distance, like real embedding corpora
                x = cents[cid] + 0.35 * x
            elif data_kind == "spectrum":
                cid = jax.random.randint(kc, (chunk,), 0, args.clusters)
                x = (cents[cid] + 0.35 * x) * decay[None, :]
            norm = jnp.linalg.norm(x, axis=1, keepdims=True)
            x = x / jnp.where(norm == 0, 1.0, norm)
            max_abs = jnp.max(jnp.abs(x), axis=1)
            scales = max_abs / 127.0
            safe = jnp.where(scales == 0, 1.0, scales)
            q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
            return q, scales.astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def write_chunk(buf_q, buf_s, qc, sc, row0):
            buf_q = jax.lax.dynamic_update_slice(buf_q, qc, (row0, jnp.int32(0)))
            buf_s = jax.lax.dynamic_update_slice(buf_s, sc, (row0,))
            return buf_q, buf_s

        t0 = time.time()
        rows_q = jnp.zeros((n_pad, d), dtype=jnp.int8)
        row_scales = jnp.zeros((n_pad,), dtype=jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), n_pad // chunk)
        for i, key in enumerate(keys):
            qc, sc = gen_chunk(key, centers)
            rows_q, row_scales = write_chunk(
                rows_q, row_scales, qc, sc, jnp.int32(i * chunk)
            )
        jax.block_until_ready(row_scales)
        valid = np.zeros(n_pad, dtype=bool)
        valid[:n] = True
        row_valid = jnp.asarray(valid)
        print(f"[{data_kind}] corpus built in {time.time()-t0:.1f}s", flush=True)

        # ---- queries: near-duplicates of corpus rows ----
        @jax.jit
        def make_queries(key, ids, rq, rs):
            base = rq[ids].astype(jnp.float32) * rs[ids][:, None]
            noise = 0.05 * jax.random.normal(key, base.shape, dtype=jnp.float32)
            q = base + noise
            return q / jnp.linalg.norm(q, axis=1, keepdims=True)

        qids = jnp.asarray(
            np.random.default_rng(1).integers(0, n, size=b, dtype=np.int64)
        )
        queries = make_queries(jax.random.PRNGKey(7), qids, rows_q, row_scales)

        def timed(fn, iters, trials=3):
            out = fn(queries)
            jax.tree_util.tree_map(np.asarray, out)
            best = float("inf")
            for _ in range(trials):
                acc = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(queries + acc * 0)
                    acc = out[0].reshape(-1)[0]
                float(acc)
                best = min(best, (time.perf_counter() - t0) / iters)
            return best, out

        # ---- incumbent: exact int8-pure grouped scan ----
        # NOT wrapped in jax.jit: rank_top_k_int8 is itself jitted with the
        # corpus as an ARGUMENT — a wrapper closure would bake the 7.7 GB
        # buffer into the HLO as a captured constant and wedge the remote
        # compile helper (CLAUDE.md).
        def exact(qq):
            return rank_top_k_int8(
                qq, rows_q, row_scales, k=k, row_mask=row_valid
            )

        print("compiling exact scan...", flush=True)
        sec, (ev, eidx) = timed(exact, args.iters)
        exact_idx = np.asarray(eidx)
        exact_qps = b / sec
        emit({"data": data_kind, "path": "exact_int8", "batch": b, "n": n,
              "qps": round(exact_qps), "ms": round(sec * 1e3, 2)})

        # ---- contender: two-stage, sweeping d' and overfetch ----
        for d_prime in dprimes:
            t0 = time.time()
            idx = ProjScanIndex.build_from_device_rows(
                (rows_q, row_scales), num_rows=n, d_prime=d_prime,
                chunk=chunk,
            )
            build_s = time.time() - t0
            print(f"[{data_kind}] d'={d_prime} built in {build_s:.1f}s",
                  flush=True)
            for c in overfetches:
                # no jit wrapper — same captured-constant hazard as `exact`
                def two_stage(qq, c=c):
                    return idx.search(
                        qq, rows_q, row_scales, k=k, overfetch=c,
                        row_mask=row_valid,
                    )

                print(f"compiling two-stage d'={d_prime} c={c}...", flush=True)
                try:
                    sec, (tv, tidx) = timed(two_stage, args.iters)
                except Exception as e:  # noqa: BLE001
                    emit({"data": data_kind, "path": "projscan",
                          "d_prime": d_prime, "overfetch": c,
                          "error": str(e)[:200]})
                    continue
                tidx = np.asarray(tidx)
                recall = float(
                    np.mean([
                        len(set(tidx[i]) & set(exact_idx[i])) / k
                        for i in range(b)
                    ])
                )
                emit({"data": data_kind, "path": "projscan", "batch": b,
                      "n": n, "d_prime": d_prime, "overfetch": c,
                      "build_s": round(build_s, 1),
                      "qps": round(b / sec), "ms": round(sec * 1e3, 2),
                      "recall_vs_exact_int8@10": round(recall, 4),
                      "speedup_vs_exact": round((b / sec) / exact_qps, 2)})

        # free this dataset's buffers before the next build
        del rows_q, row_scales, queries
    return 0


if __name__ == "__main__":
    sys.exit(main())
