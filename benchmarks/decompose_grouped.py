"""Decompose the grouped exact top-k at the driver headline shape.

bench.py's 1M x 384 bf16 batch-256 scan runs ~4.4 ms/batch while the
roofline floor (768 MB corpus read overlapping a 196 GFLOP bf16 matmul) is
~1 ms. Hypothesis (docs/ROADMAP.md): XLA materializes the grouped matmul's
(B, g, group) f32 stage-1 epilogue in HBM before the group-max — at this
shape that temp is 1 GB, i.e. ~2.4 ms of extra HBM traffic. Variants:

  touch       pure corpus-read bandwidth probe (one reduce, no (B, N))
  stage1      grouped matmul + group-max ONLY -> (B, g) out
  full        rank_top_k_grouped (stage 1 + narrow top-k + gather rescore)
  stage1_scan stage 1 as a lax.scan over row chunks (bounds the temp to
              chunk size — the fix that recovered the 10M int8 case)
  full_scan   scan stage 1 + the same selection/rescore tail

Emits one JSON line; appends to benchmarks/results.jsonl.
"""

from __future__ import annotations

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


def main():
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    n, d, b, k, group = 1_000_000, 384, 256, 10, 128
    # the engine's bucket ladder pads 1M rows to exactly 2^20
    # (core/store.bucket_size) — use the same padded shape
    n_pad = 1 << 20
    rng = np.random.default_rng(0)
    host = np.zeros((n_pad, d), dtype=np.float32)
    host[:n] = rng.standard_normal((n, d), dtype=np.float32)
    rows = jnp.asarray(host, dtype=jnp.bfloat16)
    q = jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
    )
    g = n_pad // group

    @jax.jit
    def touch(qq, rr):
        return (
            jnp.sum(rr.astype(jnp.float32) * rr.astype(jnp.float32))
            + qq[0, 0].astype(jnp.float32)
        )[None]

    @jax.jit
    def stage1(qq, rr):
        r3 = rr.reshape(g, group, d)
        s3 = jax.lax.dot_general(
            qq, r3, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s3, axis=-1)  # (B, g)

    @jax.jit
    def full(qq, rr):
        return rank_top_k_grouped(qq, rr, k=k, group=group)

    def make_scan(n_chunks):
        rows_per = n_pad // n_chunks
        g_per = rows_per // group

        @jax.jit
        def stage1_scan(qq, rr):
            rc = rr.reshape(n_chunks, g_per, group, d)

            def body(_, chunk):
                s3 = jax.lax.dot_general(
                    qq, chunk, (((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return None, jnp.max(s3, axis=-1)  # (B, g_per)

            _, parts = jax.lax.scan(body, None, rc)  # (n_chunks, B, g_per)
            return jnp.moveaxis(parts, 0, 1).reshape(qq.shape[0], g)

        @jax.jit
        def full_scan(qq, rr):
            gmax = stage1_scan(qq, rr)
            _, gidx = jax.lax.top_k(gmax, k)
            r3 = rr.reshape(g, group, d)
            cand = jnp.take(r3, gidx, axis=0)
            cs = jnp.einsum(
                "bd,bkgd->bkg", qq, cand, preferred_element_type=jnp.float32
            ).reshape(qq.shape[0], k * group)
            vals, pos = jax.lax.top_k(cs, k)
            winner = jnp.take_along_axis(gidx, pos // group, axis=-1)
            return vals, (winner * group + pos % group).astype(jnp.int32)

        return stage1_scan, full_scan

    def timed(fn, iters=20, trials=3):
        out = fn(q, rows)
        jax.tree_util.tree_map(np.asarray, out)
        best = float("inf")
        for _ in range(trials):
            acc = jnp.zeros((), jnp.bfloat16)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(q + acc * 0, rows)
                leaf = out[0] if isinstance(out, (tuple, list)) else out
                acc = leaf.reshape(-1)[0].astype(jnp.bfloat16)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    record = {"bench": "decompose_grouped_1m_384_bf16_b256"}
    record["touch_ms"] = round(timed(touch) * 1e3, 2)
    print("touch", record["touch_ms"], flush=True)
    record["stage1_ms"] = round(timed(stage1) * 1e3, 2)
    print("stage1", record["stage1_ms"], flush=True)
    record["full_ms"] = round(timed(full) * 1e3, 2)
    print("full", record["full_ms"], flush=True)
    for n_chunks in (8, 16, 32):
        s_fn, f_fn = make_scan(n_chunks)
        record[f"stage1_scan{n_chunks}_ms"] = round(timed(s_fn) * 1e3, 2)
        record[f"full_scan{n_chunks}_ms"] = round(timed(f_fn) * 1e3, 2)
        print(
            n_chunks,
            record[f"stage1_scan{n_chunks}_ms"],
            record[f"full_scan{n_chunks}_ms"],
            flush=True,
        )
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(record), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
