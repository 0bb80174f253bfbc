"""Round-4 stage-3 tail experiment: two-level (group -> subgroup) selection.

Motivation (BASELINE.md): at the big-batch operating point the pipeline's
non-stage-1 tail is ~40% (b=2048: stage-1 14.6 ms of 24.2 ms full). Stage 3
gathers the k winning 128-row groups' corpus rows — (B, k, 128, d), 4.03 GB
bf16 at b=4096 — which XLA materializes and re-reads for the rescore einsum
(~3x that volume in HBM traffic). The reference has no analog (its ranker
sorts the full score vector on host, ranking_algorithm.py:149-204).

Experiment: the stage-1 kernel also emits per-SUB-row (SUB=32) subgroup
maxes. Selection then refines: top-k groups by group max (narrow, as today)
-> gather those groups' subgroup maxes (B, k, 128/SUB — tiny) -> top-k
SUBGROUPS -> gather only (B, k, SUB, d) rows for the exact rescore. 4x less
stage-3 gather volume for SUB=32.

Containment (exactness): a subgroup containing a true top-j row (j <= k)
has submax >= that row's score = s_j; if >= k subgroups had larger maxes,
each contains a row outscoring s_j, contradicting rank j <= k. So true
top-k rows live in the top-k subgroups. The same argument one level up
puts those subgroups inside the top-k groups, so the two-stage refinement
loses nothing. Ties at the k-th value admit any winner set (same caveat,
and the same lax.top_k leftmost order, as the production grouped route).

Variants timed (1M x 384 bf16, k=10, b in {2048, 4096}), best-of-trials
with device-side dependency chaining:
  prod       — rank_top_k_grouped_pallas (production route)
  s1         — gmax_f stage 1 alone
  s12        — stage 1 + lax.top_k over (B, g)
  sub32      — two-level pipeline, SUB=32 (kernel emits gm AND sm)
  sub64      — two-level pipeline, SUB=64 (half the refinement, safer layout)
  s1sub      — the dual-output stage-1 kernel alone (stage-1 cost delta)

Index-identity of sub32/sub64 vs prod is asserted on-device data.
Results append to benchmarks/results.jsonl (bench="probe_sub32").
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

import jax  # noqa: E402  (after chip claim)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")
GROUP = 128


def emit(record: dict):
    record["bench"] = "probe_sub32"
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


def gmax_sub(queries, vectors, extra, *, sub: int, interpret: bool = False):
    """gmax_f clone emitting BOTH (B, n/128) group maxes and (B, n/sub)
    subgroup maxes from the same VMEM score tile (one corpus read).

    Mosaic rejects lane-splitting reshapes below the 128-lane width
    ((qblk, blk) -> (qblk, blk/32, 32): "unsupported shape cast", probe run
    2026-08-19T04:44), so this kernel SWAPS the matmul orientation: scores
    come out (blk, qblk) with corpus rows on SUBLANES, where the /32 and
    /128 splits are sublane reshapes (minor dim untouched) and the group
    reduce is a sublane reduce. Bonus: the group-max tile lands directly in
    the transposed (blkg, qblk) output layout — no in-kernel transpose."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from hyperdb_tpu.ops.pallas_gmax import _block_rows, _compiler_params, _q_tile

    b, d = queries.shape
    n = vectors.shape[0]
    qblk = _q_tile(b)
    blk = _block_rows(b, d, vectors.dtype.itemsize, n)
    grid = n // blk
    blkg = blk // GROUP
    blks = blk // sub

    def kernel(q_ref, v_ref, extra_ref, gm_ref, sm_ref):
        s = jax.lax.dot_general(
            v_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (blk, qblk) — corpus rows on sublanes
        s = s + extra_ref[:]  # (blk, 1) broadcasts across the lane dim
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        blkr, bq = s.shape
        gm_ref[0] = jnp.max(s.reshape(blkr // GROUP, GROUP, bq), axis=1)
        sm_ref[0] = jnp.max(s.reshape(blkr // sub, sub, bq), axis=1)

    gm, sm = pl.pallas_call(
        kernel,
        grid=(grid, b // qblk),
        in_specs=[
            pl.BlockSpec((qblk, d), lambda i, j: (j, 0)),
            pl.BlockSpec((blk, d), lambda i, j: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blkg, qblk), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, blks, qblk), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, blkg, b), jnp.float32),
            jax.ShapeDtypeStruct((grid, blks, b), jnp.float32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(queries, vectors, extra.reshape(n, 1))
    gm = gm.transpose(2, 0, 1).reshape(b, n // GROUP)
    sm = sm.transpose(2, 0, 1).reshape(b, n // sub)
    return gm, sm


@functools.partial(jax.jit, static_argnames=("k", "sub", "interpret"))
def rank_two_level(queries, vectors, extra, k: int, sub: int, interpret=False):
    """Two-level grouped exact top-k: group maxes pick k groups, their
    subgroup maxes pick k subgroups, exact rescore touches only
    (B, k, sub, d) rows."""
    import jax
    import jax.numpy as jnp

    b, d = queries.shape
    n = vectors.shape[0]
    ratio = GROUP // sub
    gm, sm = gmax_sub(queries, vectors, extra, sub=sub, interpret=interpret)
    _, gidx = jax.lax.top_k(gm, k)  # (B, k) group ids

    smg = sm.reshape(b, n // GROUP, ratio)
    sub_cand = jnp.take_along_axis(smg, gidx[..., None], axis=1)  # (B, k, ratio)
    _, spos = jax.lax.top_k(sub_cand.reshape(b, k * ratio), k)  # (B, k)
    sidx = (
        jnp.take_along_axis(gidx, spos // ratio, axis=-1) * ratio + spos % ratio
    )  # (B, k) global subgroup ids

    r3 = vectors.reshape(n // sub, sub, d)
    e3 = extra.reshape(n // sub, sub)
    cand = jnp.take(r3, sidx, axis=0)  # (B, k, sub, d)
    cs = jnp.einsum(
        "bd,bksd->bks", queries, cand, preferred_element_type=jnp.float32
    )
    cs = jnp.where(jnp.isnan(cs), -jnp.inf, cs)
    cs = cs + jnp.take(e3, sidx, axis=0)
    cs = cs.reshape(b, k * sub)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(sidx, pos // sub, axis=-1)
    return vals, (winner * sub + pos % sub).astype(jnp.int32)


def main():
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import gmax_f, make_extra, rank_top_k_grouped_pallas

    n, d, k = 1_000_000, 384, 10
    # engine buckets pad 1M to a 2^17 multiple; use the padded shape the
    # production route actually serves (1,048,576 rows) with -inf extra on pad
    n_pad = 1 << 20
    rng = np.random.default_rng(0)
    print(f"building corpus {n_pad}x{d} bf16 ...", flush=True)
    v_host = rng.standard_normal((n_pad, d), dtype=np.float32)
    vectors = jnp.asarray(v_host, dtype=jnp.bfloat16)
    extra = make_extra(n_pad)
    extra = extra.at[n:].set(-jnp.inf)  # tombstone the pad rows like the engine
    np.asarray(extra)  # force upload

    subs_only = "--subs-only" in sys.argv

    for b in (2048, 4096):
        q_host = rng.standard_normal((b, d), dtype=np.float32)
        queries = jnp.asarray(q_host, dtype=jnp.bfloat16)

        prod = jax.jit(
            lambda q, v, e: rank_top_k_grouped_pallas(q, v, k, row_mask=None, recency=e)
        )
        # production route folds extra via make_extra(recency=e); recency=e
        # reproduces the same additive semantics (e is already the folded vec)
        if subs_only:
            out_prod = prod(queries, vectors, extra)
            jax.tree_util.tree_map(np.asarray, out_prod)
        else:
            t_prod, out_prod = timed(prod, queries, vectors, extra)
            emit({"variant": "prod", "b": b, "ms": round(t_prod * 1e3, 2),
                  "qps": round(b / t_prod)})

            s1 = jax.jit(lambda q, v, e: gmax_f(q, v, e))
            t_s1, _ = timed(s1, queries, vectors, extra)
            emit({"variant": "s1", "b": b, "ms": round(t_s1 * 1e3, 2)})

            s12 = jax.jit(lambda q, v, e: jax.lax.top_k(gmax_f(q, v, e), k))
            t_s12, _ = timed(s12, queries, vectors, extra)
            emit({"variant": "s12", "b": b, "ms": round(t_s12 * 1e3, 2)})

        idx_prod = np.asarray(out_prod[1])
        for sub in (32, 64):
            fn = jax.jit(functools.partial(rank_two_level, k=k, sub=sub))
            try:
                t_sub, out_sub = timed(fn, queries, vectors, extra)
            except Exception as e:  # compile failure is a finding, not a crash
                emit({"variant": f"sub{sub}", "b": b, "error": repr(e)[:200]})
                continue
            idx_sub = np.asarray(out_sub[1])
            eq = bool(np.array_equal(np.sort(idx_sub, 1), np.sort(idx_prod, 1)))
            emit({"variant": f"sub{sub}", "b": b, "ms": round(t_sub * 1e3, 2),
                  "qps": round(b / t_sub), "index_equal": eq})

        s1sub = jax.jit(lambda q, v, e: gmax_sub(q, v, e, sub=32))
        t_s1s, _ = timed(s1sub, queries, vectors, extra)
        emit({"variant": "s1sub32", "b": b, "ms": round(t_s1s * 1e3, 2)})


if __name__ == "__main__":
    main()
