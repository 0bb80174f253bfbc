"""BASELINE config 5 scale on ONE chip: 10M x 768 int8-pure serving.

Round 1 left this config unmeasured ("10M x 768 f16 needs >1 chip of HBM")
while the store claimed int8-pure fits (core/store.py): 10M x 768 int8 =
7.68 GB on a 16 GB v5e. This benchmark builds and measures it:

- the corpus is GENERATED AND QUANTIZED ON DEVICE (jax.random chunks ->
  per-row symmetric int8), so nothing rides the ~tens-of-MB/s host tunnel;
  the host never holds the matrix.
- throughput: batched cosine top-10 over the full 10M rows via the int8
  grouped scan (ops/quantized.rank_top_k_int8, no rescore rows — the
  int8-pure mode), timed with device-side dependency chaining.
- recall@10: against the exact f32 oracle on a 128k-row window
  (regenerated from the same PRNG keys), isolating pure quantization loss.
- peak HBM from device memory_stats.

Emits one JSON line; appends to benchmarks/results.jsonl.

Usage: python benchmarks/bench_10m_int8.py [--n 10000000] [--batch 64]
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

import numpy as np


def emit(record: dict):
    line = json.dumps(record)
    print(line, flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")
    with open(path, "a") as f:
        f.write(line + "\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000_000)
    parser.add_argument("--d", type=int, default=768)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--chunk", type=int, default=1 << 19)  # 512k rows
    parser.add_argument("--oracle-rows", type=int, default=1 << 17)  # 128k
    parser.add_argument("--oracle-queries", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.core.store import bucket_size
    from hyperdb_tpu.ops.quantized import rank_top_k_int8
    from hyperdb_tpu.ops.ranking import rank_top_k

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n, d = args.n, args.d
    n_pad = bucket_size(n)
    chunk = args.chunk
    assert n_pad % chunk == 0, (n_pad, chunk)

    # ---- device-side generation + quantization (normalized rows) ----
    @jax.jit
    def gen_chunk(key):
        x = jax.random.normal(key, (chunk, d), dtype=jnp.float32)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        x = x / jnp.where(norm == 0, 1.0, norm)
        max_abs = jnp.max(jnp.abs(x), axis=1)
        scales = max_abs / 127.0
        safe = jnp.where(scales == 0, 1.0, scales)
        q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
        return q, scales.astype(jnp.float32)

    # donated in-place writes: the 7.7 GB corpus buffer is never duplicated
    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("row0",))
    def write_chunk(buf_q, buf_s, qc, sc, row0):
        buf_q = jax.lax.dynamic_update_slice(buf_q, qc, (row0, 0))
        buf_s = jax.lax.dynamic_update_slice(buf_s, sc, (row0,))
        return buf_q, buf_s

    t0 = time.time()
    rows_q = jnp.zeros((n_pad, d), dtype=jnp.int8)
    row_scales = jnp.zeros((n_pad,), dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), n_pad // chunk)
    for i, key in enumerate(keys):
        qc, sc = gen_chunk(key)  # fixed shape: one compile
        rows_q, row_scales = write_chunk(rows_q, row_scales, qc, sc, i * chunk)
    jax.block_until_ready(row_scales)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    row_valid = jnp.asarray(valid)
    build_s = time.time() - t0
    print(f"built {n_pad} x {d} int8 on device in {build_s:.1f}s", flush=True)

    stats = dev.memory_stats() or {}
    hbm_gb = stats.get("bytes_in_use", 0) / (1 << 30)
    peak_gb = stats.get("peak_bytes_in_use", 0) / (1 << 30)
    print(f"HBM in use: {hbm_gb:.2f} GB (peak {peak_gb:.2f})", flush=True)

    # ---- queries: corpus rows + noise (dequantized gather + jitter) ----
    # rq/rs MUST be jit arguments: closing over the 8 GB corpus bakes it
    # into the HLO as captured constants, which wedges the remote compile.
    @jax.jit
    def make_queries(key, ids, rq, rs):
        base = rq[ids].astype(jnp.float32) * rs[ids][:, None]
        noise = 0.05 * jax.random.normal(key, base.shape, dtype=jnp.float32)
        q = base + noise
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    qids = jnp.asarray(
        np.random.default_rng(1).integers(0, n, size=args.batch, dtype=np.int64)
    )
    queries = make_queries(jax.random.PRNGKey(7), qids, rows_q, row_scales)

    def rank(qq):
        return rank_top_k_int8(
            qq, rows_q, row_scales, k=args.k, row_mask=row_valid
        )

    # compile + correctness smoke: a query near row r should retrieve r
    vals, idx = rank(queries)
    hit = float(jnp.mean((idx[:, :3] == qids[:, None]).any(axis=1)))
    print(f"self-retrieval@3 (sanity): {hit:.2f}", flush=True)

    # ---- throughput: chained batches, single readback ----
    def trial():
        acc = jnp.zeros((), dtype=jnp.float32)
        start = time.perf_counter()
        for _ in range(args.iters):
            vals, _ = rank(queries + acc * 0)
            acc = vals[0, 0]
        float(acc)
        return time.perf_counter() - start

    best = min(trial() for _ in range(3))
    qps = args.batch * args.iters / best
    ms_per_batch = best / args.iters * 1000
    print(f"{qps:.0f} qps ({ms_per_batch:.1f} ms / {args.batch}-batch)", flush=True)

    # ---- recall@10 vs exact f32 oracle on the first window ----
    ow = args.oracle_rows
    key0 = keys[0]

    @jax.jit
    def window_rows():
        x = jax.random.normal(key0, (chunk, d), dtype=jnp.float32)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        return (x / jnp.where(norm == 0, 1.0, norm))[:ow]

    w = window_rows()
    oq_ids = jnp.asarray(
        np.random.default_rng(2).integers(0, ow, size=args.oracle_queries)
    )
    oqueries = make_queries(jax.random.PRNGKey(8), oq_ids, rows_q, row_scales)
    o_vals, o_idx = rank_top_k(
        oqueries, w, k=args.k, metric="dot_product"
    )  # exact f32 on unit rows == cosine
    wmask = np.zeros(n_pad, dtype=bool)
    wmask[:ow] = True
    i_vals, i_idx = rank_top_k_int8(
        oqueries, rows_q, row_scales, k=args.k, row_mask=jnp.asarray(wmask)
    )
    o_idx = np.asarray(o_idx)
    i_idx = np.asarray(i_idx)
    recalls = [
        len(set(o_idx[b].tolist()) & set(i_idx[b].tolist())) / args.k
        for b in range(o_idx.shape[0])
    ]
    recall = float(np.mean(recalls))
    print(f"recall@{args.k} vs exact f32 oracle ({ow} rows): {recall:.3f}", flush=True)

    stats = dev.memory_stats() or {}
    emit(
        {
            "config": 5,
            "desc": f"{n // 1_000_000}M x {d} int8-pure cosine top-{args.k} "
            f"batch-{args.batch}, one chip",
            "qps": round(qps, 1),
            "ms_per_batch": round(ms_per_batch, 2),
            "recall_at_k_vs_f32": round(recall, 4),
            "build_s": round(build_s, 1),
            "hbm_peak_gb": round(stats.get("peak_bytes_in_use", 0) / (1 << 30), 2),
            "hbm_in_use_gb": round(stats.get("bytes_in_use", 0) / (1 << 30), 2),
        }
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
