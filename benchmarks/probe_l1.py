"""On-chip A/B for the Pallas manhattan (L1) stage-1 kernel.

The streamed XLA manhattan route (ops/ranking.rank_top_k_manhattan_stream)
is the config-4 outlier: 2.2k q/s at b=256 / 860 q/s at b=2048 against a
VPU roof that prices the same 1M x 384 scan near 45 ms/b256 (the scan is
3 VPU ops per (row, dim) cell: subtract, abs, accumulate — no MXU form
exists for L1). ops/pallas_l1.py owns the loop structure instead; this
probe measures both routes end-to-end (full top-k, not stage 1 alone) at
the flagship corpus across batch heights, asserts INDEX-IDENTITY of the
Pallas route against the streamed oracle on every shape, and records the
routing threshold evidence for config.pallas_l1_min_batch.

Timing uses device-side dependency chaining + one final host readback
(CLAUDE.md: block_until_ready does not block over the tunnel).

Results append to benchmarks/results.jsonl (bench="probe_l1").
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


def emit(record: dict):
    record["bench"] = "probe_l1"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def timed(fn, *args, iters=8, trials=3):
    import jax  # noqa: F401
    import jax.numpy as jnp

    out = fn(*args)
    np.asarray(out[0])  # warm compile + settle
    best = float("inf")
    for _ in range(trials):
        acc = jnp.zeros((), args[0].dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(args[0] + acc * 0, *args[1:])
            acc = out[0].reshape(-1)[0].astype(args[0].dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_l1 import (
        rank_top_k_manhattan_pallas,
        supported,
    )
    from hyperdb_tpu.ops.ranking import (
        _manhattan_tile,
        rank_top_k_manhattan_stream,
    )

    print("backend:", jax.default_backend(), flush=True)
    n, d, k = 1 << 20, 384, 10
    rng = np.random.default_rng(7)
    v = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16
    )
    mask = jnp.asarray(rng.random(n) < 0.95)

    for b in (64, 256, 1024, 2048):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
        )
        assert supported(b, n, d, 2), (b, n, d)
        tile = _manhattan_tile(b, n, k)

        def stream(qq):
            return rank_top_k_manhattan_stream(
                qq, v, k=k, row_mask=mask, tile=tile
            )

        def pallas(qq):
            return rank_top_k_manhattan_pallas(qq, v, k=k, row_mask=mask)

        t_s, out_s = timed(stream, q)
        t_p, out_p = timed(pallas, q)
        idx_s = np.asarray(out_s[1])
        idx_p = np.asarray(out_p[1])
        eq = bool((idx_s == idx_p).all())
        mism = int((idx_s != idx_p).sum())
        emit({
            "shape": f"1M x {d} bf16 b={b} k={k}",
            "stream_ms": round(t_s * 1e3, 2),
            "pallas_ms": round(t_p * 1e3, 2),
            "speedup": round(t_s / t_p, 2),
            "stream_qps": round(b / t_s, 1),
            "pallas_qps": round(b / t_p, 1),
            "index_equal": eq,
            "mismatches": mism,
        })
        if not eq:
            # locate whether mismatches are value-ties or true errors
            vals_s = np.asarray(out_s[0])
            vals_p = np.asarray(out_p[0])
            bad = np.abs(vals_s - vals_p) > 1e-6
            emit({"shape": f"b={b}", "value_mismatches": int(bad.sum())})

    # recency case (the config-4 flagship shape: batch-256 + time-decay):
    # the kernel computes the TRUE score per row, so recency folds into
    # its additive extra and must stay index-identical to the stream
    rec = jnp.asarray((rng.random(n) * 0.05).astype(np.float32))
    for b in (256, 2048):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16
        )
        tile = _manhattan_tile(b, n, k)
        t_s, out_s = timed(
            lambda qq: rank_top_k_manhattan_stream(
                qq, v, k=k, row_mask=mask, recency=rec, tile=tile
            ), q,
        )
        t_p, out_p = timed(
            lambda qq: rank_top_k_manhattan_pallas(
                qq, v, k=k, row_mask=mask, recency=rec
            ), q,
        )
        eq = bool((np.asarray(out_s[1]) == np.asarray(out_p[1])).all())
        emit({
            "shape": f"1M x {d} bf16 b={b} k={k} +recency",
            "stream_ms": round(t_s * 1e3, 2),
            "pallas_ms": round(t_p * 1e3, 2),
            "speedup": round(t_s / t_p, 2),
            "pallas_qps": round(b / t_p, 1),
            "index_equal": eq,
        })
    return 0


if __name__ == "__main__":
    sys.exit(main())
