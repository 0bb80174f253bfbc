"""Probe: strip-formulated gmax stage 1 vs the production score-tile kernel.

Hypothesis (ROADMAP "gmax ~30% MFU" item): the production kernel is bound
by the (qblk, blk) f32 score tile's VMEM round trip — MXU writes it, VPU
reads it back for the group max — at b x n x 8 bytes total (604 GB/s fits
the flat 13.9 ms @ b=1024 exactly). This probe reformulates stage 1 the
flash-attention way: a rolled loop over 128-row GROUP strips inside each
corpus block, each strip one (qblk, d) x (d, 128) dot whose (qblk, 128)
result is lane-max-reduced immediately — small enough to live in vector
registers, so the score never touches VMEM.

Compares against ops/pallas_gmax.gmax_f for index-identical group maxes
and wall time at 1M x 384 bf16. Appends results.jsonl lines. Run:
python benchmarks/probe_gmax_strips.py [batch ...]
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
GROUP = 128


def emit(rec: dict):
    rec["bench"] = "probe_gmax_strips_1m_384_bf16"
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def make_strips(qblk: int, blk: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    blkg = blk // GROUP

    def kernel(q_ref, v_ref, extra_ref, out_ref):
        # q: (qblk, d) bf16; v: (blk, d) bf16; extra: (blkg, GROUP) f32
        # out: (1, blkg, qblk) f32 (lane-aligned transposed layout)
        q = q_ref[:]

        def body(g, carry):
            vs = v_ref[pl.dslice(g * GROUP, GROUP), :]  # (GROUP, d)
            s = jax.lax.dot_general(
                q, vs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (qblk, GROUP) — registers, never a VMEM tile
            s = s + extra_ref[pl.dslice(g, 1), :]  # (1, GROUP) broadcast
            s = jnp.where(jnp.isnan(s), -jnp.inf, s)
            out_ref[0, pl.dslice(g, 1), :] = jnp.max(s, axis=1)[None, :]
            return carry

        jax.lax.fori_loop(0, blkg, body, 0, unroll=False)

    @functools.partial(jax.jit, static_argnames=())
    def gmax_strips(queries, vectors, extra):
        b, d = queries.shape
        n = vectors.shape[0]
        grid = n // blk
        out = pl.pallas_call(
            kernel,
            grid=(grid, b // qblk),
            in_specs=[
                pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
                pl.BlockSpec((blk, d), lambda i, j: (i, 0)),
                pl.BlockSpec((blkg, GROUP), lambda i, j: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, blkg, qblk), lambda i, j: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct((grid, blkg, b), jnp.float32),
            interpret=interpret,
        )(queries, vectors, extra.reshape(n // GROUP, GROUP))
        return out.transpose(2, 0, 1).reshape(b, n // GROUP)

    return gmax_strips


def main() -> int:
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import gmax_f, make_extra

    batches = [int(a) for a in sys.argv[1:]] or [1024]
    n, d = 1 << 20, 384
    rng = np.random.default_rng(3)
    v = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), jnp.bfloat16
    )
    extra = make_extra(n)

    def timed(fn, q, *rest, iters=10, trials=3):
        out = fn(q, *rest)
        np.asarray(out)
        best = float("inf")
        for _ in range(trials):
            acc = jnp.zeros((), q.dtype)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(q + acc * 0, *rest)
                acc = out.reshape(-1)[0].astype(q.dtype)
            float(acc)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, out

    for b in batches:
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
        )
        print(f"b={b}: baseline gmax_f...", flush=True)
        base_s, base = timed(lambda qq: gmax_f(qq, v, extra), q)
        for qblk, blk in ((256, 8192), (256, 4096), (1024, 8192)):
            if qblk > b:
                continue
            tag = f"qblk{qblk}_blk{blk}"
            print(f"b={b} strips {tag}: compiling...", flush=True)
            try:
                fn = make_strips(qblk, blk, interpret=False)
                sec, got = timed(lambda qq: fn(qq, v, extra), q)
                same = bool(
                    np.allclose(np.asarray(got), np.asarray(base),
                                rtol=0, atol=0)
                )
                emit({
                    "batch": b, "qblk": qblk, "blk": blk,
                    "strips_ms": round(sec * 1e3, 2),
                    "baseline_ms": round(base_s * 1e3, 2),
                    "speedup": round(base_s / sec, 2),
                    "bit_identical": same,
                })
            except Exception as e:  # noqa: BLE001 — compile failures are data
                emit({
                    "batch": b, "qblk": qblk, "blk": blk,
                    "error": str(e)[:200],
                })
    return 0


if __name__ == "__main__":
    sys.exit(main())
