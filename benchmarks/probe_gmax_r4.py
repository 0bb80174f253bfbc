"""Round-4 gmax stage-1 experiments: earn or retire the "~30% MFU is the
compiler ceiling" claim (VERDICT r3 #2).

The roadmap names two untried levers; this probe runs them plus the two
CompilerParams knobs this JAX exposes that the round-3 sweeps never touched:

  A. bf16 score-tile EMISSION — the (B, g) group-max output written in
     bf16 instead of f32 (halves stage-1 output write + stage-2 read
     traffic). Rounding can reorder groups whose f32 maxes collide within
     one bf16 ULP, so the full pipeline overfetches k+MARGIN groups and the
     f32 stage-3 rescore restores exact order; index-identity is asserted
     against the f32 route on the same data.
  B. dimension_semantics — both grid dims write disjoint output blocks, so
     ("parallel", ...) is semantically valid; the default treats them as
     sequential ("arbitrary"). Mosaic may schedule/pipeline differently.
  C. vmem_limit_bytes — round 3's >=24 MB working-set sweep points failed
     the remote Mosaic compile AT THE DEFAULT VMEM LIMIT; raising the limit
     may admit 2-4x corpus blocks (fewer grid steps).
  D. pl.CostEstimate — scheduling hint with the true flops/bytes.

Each variant times STAGE 1 ONLY (the kernel under question) at the
flagship 1M x 384 bf16 shape, b=1024 and b=2048, best-of-trials with
device-side dependency chaining (CLAUDE.md: block_until_ready does not
block over the tunnel). Equality vs the production kernel's maxes is
asserted for f32 variants; bf16 emission is compared after casting.

Results append to benchmarks/results.jsonl (bench="probe_gmax_r4").
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


def emit(record: dict):
    record["bench"] = "probe_gmax_r4"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def timed(fn, *args, iters=10, trials=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    q_dtype = args[0].dtype
    best = float("inf")
    for _ in range(trials):
        acc = jnp.zeros((), q_dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(args[0] + acc * 0, *args[1:])
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            acc = leaf.reshape(-1)[0].astype(q_dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def gmax_variant(
    queries, vectors, extra, *, blk, out_dtype=None, dimsem=None,
    vmem_limit=None, cost_estimate=False,
):
    """Parametrized clone of ops/pallas_gmax.gmax_f (lane-major reduce,
    transposed store) with the experiment knobs exposed."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = queries.shape
    n = vectors.shape[0]
    qblk = min(b, 1024)
    grid = n // blk
    blkg = blk // GROUP
    odt = out_dtype or jnp.float32

    def kernel(q_ref, v_ref, extra_ref, out_ref):
        s = jax.lax.dot_general(
            q_ref[:], v_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + extra_ref[:]
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        bq, bb = s.shape
        gm = jnp.max(s.reshape(bq, bb // GROUP, GROUP), axis=-1)
        out_ref[0] = gm.T.astype(odt)

    params = {}
    if dimsem is not None:
        params["dimension_semantics"] = dimsem
    if vmem_limit is not None:
        params["vmem_limit_bytes"] = vmem_limit
    kwargs = {}
    if params:
        kwargs["compiler_params"] = pltpu.CompilerParams(**params)
    if cost_estimate:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * b * d * n,
            bytes_accessed=(
                n * d * vectors.dtype.itemsize
                + b * d * queries.dtype.itemsize
                + b * (n // GROUP) * jnp.dtype(odt).itemsize
            ),
            transcendentals=0,
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid, b // qblk),
        in_specs=[
            pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
            pl.BlockSpec((blk, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, blk), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, blkg, qblk), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((grid, blkg, b), odt),
        **kwargs,
    )(queries, vectors, extra.reshape(1, n))
    return out.transpose(2, 0, 1).reshape(b, n // GROUP)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import _block_rows, gmax_f

    print("devices:", jax.devices(), flush=True)
    n, d, k = 1 << 20, 384, 10
    rng = np.random.default_rng(42)
    rows = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32), jnp.bfloat16
    )
    extra = jnp.zeros((n,), dtype=jnp.float32)

    for b in (1024, 2048):
        q = jnp.asarray(
            rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
        )
        blk0 = _block_rows(b, d, rows.dtype.itemsize)

        print(f"--- b={b}: baseline (blk={blk0}) ---", flush=True)
        # never close a jit over the 768 MB corpus (CLAUDE.md): rows ride
        # as an argument through every timed program below
        sec, base_gm = timed(
            jax.jit(lambda qq, rr: gmax_f(qq, rr, extra)), q, rows
        )
        base_gm = np.asarray(base_gm)
        emit({"probe": f"base_b{b}", "ms": round(sec * 1e3, 2),
              "blk": blk0, "qps": round(b / sec)})

        variants = [
            ("dimsem_pa", dict(blk=blk0, dimsem=("parallel", "arbitrary"))),
            ("dimsem_pp", dict(blk=blk0, dimsem=("parallel", "parallel"))),
            ("dimsem_ap", dict(blk=blk0, dimsem=("arbitrary", "parallel"))),
            ("cost_est", dict(blk=blk0, cost_estimate=True)),
            ("vmem28_blk2x", dict(blk=blk0 * 2, vmem_limit=28 << 20)),
            ("vmem56_blk4x", dict(blk=blk0 * 4, vmem_limit=56 << 20)),
            ("bf16out", dict(blk=blk0, out_dtype=jnp.bfloat16)),
            ("bf16out_vmem28_blk2x",
             dict(blk=blk0 * 2, out_dtype=jnp.bfloat16,
                  vmem_limit=28 << 20)),
        ]
        for name, kw in variants:
            print(f"--- b={b}: {name} ---", flush=True)
            try:
                fn = jax.jit(
                    lambda qq, rr, _kw=kw: gmax_variant(
                        qq, rr, extra, **_kw
                    )
                )
                sec, gm = timed(fn, q, rows)
                gm = np.asarray(gm, dtype=np.float32)
                if kw.get("out_dtype") is None:
                    exact = bool((gm == base_gm).all())
                else:
                    # bf16 emission: equal after rounding the f32 maxes
                    exact = bool(
                        (gm == np.asarray(
                            jnp.asarray(base_gm).astype(jnp.bfloat16)
                        ).astype(np.float32)).all()
                    )
                emit({"probe": f"{name}_b{b}", "ms": round(sec * 1e3, 2),
                      "qps": round(b / sec), "max_equal": exact, **{
                          kk: (vv if not isinstance(vv, tuple) else
                               "/".join(vv))
                          for kk, vv in kw.items()
                          if kk in ("blk", "dimsem", "vmem_limit")
                      }})
            except Exception as e:  # noqa: BLE001
                emit({"probe": f"{name}_b{b}", "error": str(e)[:300]})

    # ---- full-pipeline bf16 emission with k+margin overfetch ----
    # Containment: the true top-k rows live in groups whose f32 max is
    # >= the k-th best f32 max. bf16 rounding is monotone, so a group can
    # fall behind another only if their bf16-rounded maxes are EQUAL —
    # selecting k+m groups keeps every true winner unless > m groups tie
    # at the rounded k-th value. m = 3k bounds ties generously; the gate
    # asserts index-identity against the f32 route on this data.
    b = 2048
    q = jnp.asarray(
        rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16
    )
    blk0 = _block_rows(b, d, rows.dtype.itemsize)
    margin = 3 * k

    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas

    @jax.jit
    def full_f32(qq, rr):
        return rank_top_k_grouped_pallas(qq, rr, k=k)

    @jax.jit
    def full_bf16out(qq, rr):
        gm = gmax_variant(qq, rr, extra, blk=blk0, out_dtype=jnp.bfloat16)
        _, gidx = jax.lax.top_k(gm, k + margin)
        g = n // GROUP
        r3 = rr.reshape(g, GROUP, d)
        cand = jnp.take(r3, gidx, axis=0)
        cs = jnp.einsum("bd,bkgd->bkg", qq, cand,
                        preferred_element_type=jnp.float32)
        cs = jnp.where(jnp.isnan(cs), -jnp.inf, cs)
        cs = cs.reshape(b, (k + margin) * GROUP)
        vals, pos = jax.lax.top_k(cs, k)
        winner = jnp.take_along_axis(gidx, pos // GROUP, axis=-1)
        return vals, (winner * GROUP + pos % GROUP).astype(jnp.int32)

    print("--- full pipeline: f32 route ---", flush=True)
    sec_f32, (_, idx_f32) = timed(full_f32, q, rows)
    emit({"probe": "pipeline_f32_b2048", "ms": round(sec_f32 * 1e3, 2),
          "qps": round(b / sec_f32)})
    print("--- full pipeline: bf16out + overfetch ---", flush=True)
    try:
        sec_bf, (_, idx_bf) = timed(full_bf16out, q, rows)
        eq = bool((np.asarray(idx_bf) == np.asarray(idx_f32)).all())
        emit({"probe": "pipeline_bf16out_b2048", "ms": round(sec_bf * 1e3, 2),
              "qps": round(b / sec_bf), "index_equal": eq,
              "margin": margin})
    except Exception as e:  # noqa: BLE001
        emit({"probe": "pipeline_bf16out_b2048", "error": str(e)[:300]})

    return 0


if __name__ == "__main__":
    sys.exit(main())
