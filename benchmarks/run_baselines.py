"""BASELINE.json config sweep (SURVEY.md §7 stage 9).

Measures the TPU engine against the reference's NumPy brute-force path on
each driver config, printing one JSON line per config and appending to
benchmarks/results.jsonl:

  1  demo-scale:  151 docs, 384-d f32, cosine top-5
  2  100k x 384 f32, 64-query batch, cosine top-10, metadata+skip masks
  3  1M x 384 f16, IVF(nlist=4096) vs exact oracle: recall@10, QPS, build
  4  1M multi-metric (dot/euclidean/hamming) + time-decay, batch 256
  5  sharded per-chip top-k + all-gather merge (8-way mesh; CPU-simulated
     when only one real chip is attached)

Run:  python benchmarks/run_baselines.py [1 2 3 4 5]
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

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def emit(record: dict):
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def _chained_batch_time(fn, q, iters=30, trials=3):
    """Best-trial per-batch latency with device-side dependency chaining."""
    import jax.numpy as jnp

    vals, idx = fn(q)
    np.asarray(idx)  # compile + sync
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


def numpy_cosine_qps(vectors, queries, k, max_seconds=40.0):
    """Reference brute-force path timing (renormalizes corpus per query)."""
    start = time.perf_counter()
    done = 0
    for q in queries:
        norms = np.linalg.norm(vectors, axis=-1, keepdims=True)
        norms[norms == 0] = 1
        nv = vectors / norms
        sims = (nv @ (q / max(np.linalg.norm(q), 1e-12)).astype(nv.dtype)).astype(
            np.float64
        )
        top = np.argpartition(sims, -k)[-k:]
        top[np.argsort(-sims[top])]
        done += 1
        if time.perf_counter() - start > max_seconds and done >= 1:
            break
    return done / (time.perf_counter() - start)


def config1_demo():
    """Tiny demo corpus THROUGH THE ENGINE: the host fast path
    (HYPERDB_HOST_PATH_MAX_CELLS) must beat the reference's NumPy loop —
    the per-call device round trip made the raw TPU kernel lose this config
    in round 1 (BASELINE.md row 1: 132 vs 9,010 q/s)."""
    import jax.numpy as jnp

    from hyperdb_tpu import HyperDB
    from hyperdb_tpu.ops.ranking import rank_top_k

    rng = np.random.default_rng(0)
    v = rng.standard_normal((151, 384), dtype=np.float32)
    docs = [{"i": int(i)} for i in range(151)]
    db = HyperDB(documents=docs, vectors=v)
    queries = rng.standard_normal((2000, 384), dtype=np.float32)
    db.query(queries[0], top_k=5)  # warm (host path: no compile)
    start = time.perf_counter()
    for i in range(queries.shape[0]):
        db.query(queries[i], top_k=5)  # distinct queries -> all cache misses
    engine_qps = queries.shape[0] / (time.perf_counter() - start)

    q = queries[:1]
    t = _chained_batch_time(
        lambda qq: rank_top_k(qq, jnp.asarray(v), k=5, metric="cosine_similarity"),
        jnp.asarray(q),
    )
    np_qps = numpy_cosine_qps(v, queries[:50], 5)
    emit(
        {
            "config": 1,
            "desc": "151x384 f32 cosine top-5 (engine host path)",
            "engine_qps": round(engine_qps, 1),
            "tpu_kernel_qps": round(1 / t, 1),
            "numpy_qps": round(np_qps, 1),
            "speedup": round(engine_qps / np_qps, 2),
        }
    )


def config2_100k_filtered():
    import jax.numpy as jnp

    from hyperdb_tpu.ops.ranking import rank_top_k

    rng = np.random.default_rng(0)
    n, d, b, k = 100_000, 384, 64, 10
    v = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((b, d), dtype=np.float32)
    # metadata filter mask (~50% pass) + skip_doc(1000); unchunked corpus
    # -> rows == docs, the engine's row-mask fast path
    mask = rng.random(n) < 0.5
    mask[:1000] = False
    rmask = jnp.asarray(mask)
    vj = jnp.asarray(v)

    def fn(qq):
        return rank_top_k(
            qq, vj, k=k, metric="cosine_similarity", row_mask=rmask
        )

    t = _chained_batch_time(fn, jnp.asarray(q))
    np_qps = numpy_cosine_qps(v[mask], q[:3], k)
    emit(
        {
            "config": 2,
            "desc": "100k x 384 f32, batch-64 cosine top-10, metadata+skip masks",
            "tpu_qps": round(b / t, 1),
            "numpy_qps": round(np_qps, 2),
            "speedup": round((b / t) / np_qps, 1),
        }
    )


def config3_ivf_1m():
    import jax.numpy as jnp

    from hyperdb_tpu.index.ivf import IVFIndex
    from hyperdb_tpu.ops.ranking import rank_gathered, rank_top_k

    rng = np.random.default_rng(0)
    n, d, k, nq = 1_000_000, 384, 10, 32
    # clustered corpus so IVF has structure to find (random uniform is the
    # worst case for any ANN index and unrepresentative of embeddings)
    centers = rng.standard_normal((1024, d)).astype(np.float32) * 2
    assign = rng.integers(0, 1024, size=n)
    v = (centers[assign] + rng.standard_normal((n, d)).astype(np.float32)).astype(
        np.float16
    )
    queries = (
        centers[rng.integers(0, 1024, size=nq)]
        + rng.standard_normal((nq, d)).astype(np.float32)
    ).astype(np.float32)

    t0 = time.perf_counter()
    index = IVFIndex.build(v.astype(np.float32), metric="cosine", nlist=4096)
    build_s = time.perf_counter() - t0

    v32 = v.astype(np.float32)
    norms = np.linalg.norm(v32, axis=1, keepdims=True)
    norms[norms == 0] = 1
    vn = jnp.asarray((v32 / norms).astype(np.float16))

    # exact oracle
    oracle = []
    qj = jnp.asarray(queries.astype(np.float16))
    ovals, oidx = rank_top_k(qj, vn, k=k, metric="cosine_similarity", prenormalized=True)
    oracle = np.asarray(oidx)

    budget = max(k * 20, n * 5 // 100)  # reference Q12 default ann_percent=5
    recalls = []
    probe_t = 0.0
    gather_t = 0.0
    for i, q in enumerate(queries):
        t0 = time.perf_counter()
        cand = index.probe(q, budget)
        probe_t += time.perf_counter() - t0
        c_pad = 1 << int(np.ceil(np.log2(max(cand.size, 1))))
        ids = np.zeros(c_pad, np.int32)
        ids[: cand.size] = cand
        valid = np.zeros(c_pad, bool)
        valid[: cand.size] = True
        t0 = time.perf_counter()
        vals, idx = rank_gathered(
            jnp.asarray(q[None, :].astype(np.float16)), vn,
            jnp.asarray(ids), jnp.asarray(valid), k=k,
            metric="cosine_similarity", prenormalized=True,
        )
        got = set(np.asarray(idx)[0].tolist())
        gather_t += time.perf_counter() - t0
        recalls.append(len(got & set(oracle[i].tolist())) / k)
    emit(
        {
            "config": 3,
            "desc": "1M x 384 f16 IVF(nlist=4096) vs exact, budget=5%",
            "recall_at_10": round(float(np.mean(recalls)), 4),
            "build_s": round(build_s, 1),
            "probe_ms": round(probe_t / nq * 1e3, 2),
            "gather_rank_ms": round(gather_t / nq * 1e3, 2),
        }
    )


def config4_multimetric():
    """Mirrors the engine's device shapes exactly: corpus padded to the
    bucket ladder (group=128), validity row_mask, recency padded — so dot
    rides rank_top_k_grouped and euclidean/hamming ride the grouped exact-
    metric epilogue kernel (the paths db.query actually takes)."""
    import jax.numpy as jnp

    from hyperdb_tpu.core.store import bucket_size
    from hyperdb_tpu.ops.ranking import (
        rank_top_k,
        rank_top_k_grouped_metric,
        recency_scores,
    )

    rng = np.random.default_rng(0)
    n, d, b, k = 1_000_000, 384, 256, 10
    n_pad = bucket_size(n)
    v32 = np.zeros((n_pad, d), dtype=np.float32)
    v32[:n] = rng.standard_normal((n, d), dtype=np.float32)
    v = jnp.asarray(v32, dtype=jnp.bfloat16)
    row_sq = jnp.asarray(np.sum(v32 * v32, axis=1))
    vbin32 = (v32 > 0).astype(np.float32)
    vbin32[n:] = 0.0
    vbin = jnp.asarray(vbin32, dtype=jnp.bfloat16)
    bin_sum = jnp.asarray(np.sum(vbin32, axis=1))
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    rmask = jnp.asarray(valid)
    q = jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
    )
    rec_h = np.zeros(n_pad, dtype=np.float32)
    rec_h[:n] = recency_scores(rng.uniform(0, 100, size=n), recency_bias=0.5)
    rec = jnp.asarray(rec_h)

    def dot_fn(qq):
        return rank_top_k(
            qq, v, k=k, metric="dot_product", row_mask=rmask, recency=rec
        )

    def euclid_fn(qq):
        return rank_top_k_grouped_metric(
            qq, v, row_sq, k=k, metric="euclidean_metric",
            row_mask=rmask, recency=rec,
        )

    def hamming_fn(qq):
        return rank_top_k_grouped_metric(
            qq, vbin, bin_sum, k=k, metric="hamming_distance",
            row_mask=rmask, recency=rec,
        )

    def manhattan_fn(qq):
        # routes through rank_top_k_manhattan_stream at this scale (the
        # streamed lax.scan carry — no (B, N) materialization; VPU-bound)
        return rank_top_k(
            qq, v, k=k, metric="manhattan_distance", row_mask=rmask,
            recency=rec,
        )

    out = {}
    for metric, fn in (
        ("dot_product", dot_fn),
        ("euclidean_metric", euclid_fn),
        ("hamming_distance", hamming_fn),
        ("manhattan_distance", manhattan_fn),
    ):
        t = _chained_batch_time(fn, q, iters=10, trials=2)
        out[metric] = round(b / t, 1)
    emit(
        {
            "config": 4,
            "desc": "1M x 384 bf16 (engine-padded), batch-256 top-10 "
            "with time-decay",
            "qps": out,
        }
    )


def config5_sharded():
    import jax

    from hyperdb_tpu.parallel import DistributedCorpus, make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh(min(n_dev, 8) if n_dev >= 2 else 1)
    rng = np.random.default_rng(0)
    n, d, b, k = 200_000 * mesh.shape["data"], 768, 16, 10
    v = rng.standard_normal((n, d)).astype(np.float16)
    corpus = DistributedCorpus(mesh, v, metric="cosine_similarity")
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus.query(q, k=k)  # compile
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        vals, idx = corpus.query(q, k=k)
    dt = (time.perf_counter() - t0) / iters
    emit(
        {
            "config": 5,
            "desc": f"{n}x768 f16 sharded over {dict(mesh.shape)} mesh, "
            "per-chip top-k + all-gather merge",
            "devices": n_dev,
            "qps": round(b / dt, 1),
        }
    )


CONFIGS = {
    "1": config1_demo,
    "2": config2_100k_filtered,
    "3": config3_ivf_1m,
    "4": config4_multimetric,
    "5": config5_sharded,
}


def main():
    which = sys.argv[1:] or list(CONFIGS)
    for key in which:
        try:
            CONFIGS[key]()
        except Exception as e:
            emit({"config": int(key), "error": str(e)[:300]})


if __name__ == "__main__":
    main()
