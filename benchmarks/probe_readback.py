"""Per-call host<->device pattern probe: where do the serving flush's
milliseconds go on the tunnel platform?

bench_serving's loopback probe measured ~64 ms per query_batch_arrays call
at flush 256 while the chained-dependency scan runs 3.95 ms — the per-call
serving path pays upload + dispatch + TWO blocking readbacks. This probe
times each host<->device interaction pattern in isolation on a tiny
program (outputs are KB — the costs here are round trips, not bytes):

  rtt_floor      dispatch + one scalar readback (the per-call floor)
  two_asarray    np.asarray(vals); np.asarray(idx)     [current engine]
  device_get     jax.device_get((vals, idx))           [batched transfer?]
  packed         one (B, 2k) f32 array, bitcast-unpacked on host
  arg_upload     f(np_q) vs f(jnp.asarray(np_q))       [is upload a 2nd RTT?]

Run on the real chip (queues behind the chip lock):
    python benchmarks/probe_readback.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = "--cpu" in sys.argv
if SMOKE:
    os.environ["HYPERDB_CHIP_LOCK_BYPASS"] = "1"

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")

B, D, K = 256, 384, 16
ITERS = 30


def emit(rec):
    rec["bench"] = "probe_readback"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(rec), flush=True)
    if not SMOKE:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")


def best_ms(fn, iters=ITERS):
    fn()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[0] * 1e3, 2), round(ts[len(ts) // 2] * 1e3, 2)


def main():
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((D, K)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((D, K)).astype(np.float32))
    qnp = rng.standard_normal((B, D)).astype(np.float32)
    qdev = jnp.asarray(qnp)

    @jax.jit
    def f(q):
        vals = q @ w
        idx = (q @ w2).astype(jnp.int32)
        return vals, idx

    @jax.jit
    def f_packed(q):
        vals = q @ w
        idx = (q @ w2).astype(jnp.int32)
        return jnp.concatenate(
            [vals, jax.lax.bitcast_convert_type(idx, jnp.float32)], axis=1
        )

    @jax.jit
    def f_scalar(q):
        return (q @ w)[0, 0]

    # the floor: one dispatch + one tiny readback
    best, med = best_ms(lambda: float(f_scalar(qdev)))
    emit({"pattern": "rtt_floor", "best_ms": best, "median_ms": med})

    def two_asarray():
        vals, idx = f(qdev)
        np.asarray(vals)
        np.asarray(idx)

    best, med = best_ms(two_asarray)
    emit({"pattern": "two_asarray", "best_ms": best, "median_ms": med})

    def dget():
        jax.device_get(f(qdev))

    best, med = best_ms(dget)
    emit({"pattern": "device_get", "best_ms": best, "median_ms": med})

    def packed():
        out = np.asarray(f_packed(qdev))
        out[:, :K]
        out[:, K:].view(np.int32)

    best, med = best_ms(packed)
    emit({"pattern": "packed", "best_ms": best, "median_ms": med})

    # is a host np.ndarray argument a second round trip vs pre-uploaded?
    def arg_np():
        vals, idx = f(qnp)
        np.asarray(vals)
        np.asarray(idx)

    best, med = best_ms(arg_np)
    emit({"pattern": "arg_np_upload", "best_ms": best, "median_ms": med})

    def arg_explicit():
        vals, idx = f(jnp.asarray(qnp))
        np.asarray(vals)
        np.asarray(idx)

    best, med = best_ms(arg_explicit)
    emit({"pattern": "arg_explicit_upload", "best_ms": best, "median_ms": med})

    # pipelined depth-2: dispatch i+1 before reading back i — does the
    # tunnel overlap a readback with the next dispatch at all?
    def serial_pair():
        a = f_packed(qdev)
        np.asarray(a)
        b = f_packed(qdev * 1.0001)
        np.asarray(b)

    best, med = best_ms(serial_pair)
    emit({"pattern": "serial_pair", "best_ms": best, "median_ms": med})

    def pipelined_pair():
        a = f_packed(qdev)
        b = f_packed(qdev * 1.0001)
        np.asarray(a)
        np.asarray(b)

    best, med = best_ms(pipelined_pair)
    emit({"pattern": "pipelined_pair", "best_ms": best, "median_ms": med})

    # upload ladder: what does shipping the query block cost per size and
    # dtype? (serving flushes upload (B, 384) per call; loopback deltas
    # suggest ~35 ms for 1.5 MB — if so, f16 halves it)
    @jax.jit
    def g(q):
        return (q.astype(jnp.float32) @ w)[0, 0]

    for rows in (256, 1024, 4096):
        qb32 = rng.standard_normal((rows, D)).astype(np.float32)
        qb16 = qb32.astype(np.float16)
        best, med = best_ms(lambda: float(g(qb32)), iters=15)
        emit({"pattern": f"upload_f32_{rows}", "bytes": qb32.nbytes,
              "best_ms": best, "median_ms": med})
        best, med = best_ms(lambda: float(g(qb16)), iters=15)
        emit({"pattern": f"upload_f16_{rows}", "bytes": qb16.nbytes,
              "best_ms": best, "median_ms": med})


if __name__ == "__main__":
    main()
