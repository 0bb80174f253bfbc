"""Round 3: v2 group sweep + index-level exactness vs native TopK."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from hyperdb_tpu.ops import metrics as _metrics

rng = np.random.default_rng(0)
n, d, k = 1 << 20, 384, 10
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("mode", "group"))
def rank(q, rows, mode, group):
    if mode == "single":
        s = jax.lax.dot_general(q, rows, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, k)
    g = rows.shape[0] // group
    r3 = rows.reshape(g, group, d)
    s3 = jax.lax.dot_general(q, r3, (((1,), (2,)), ((), ())),
                             preferred_element_type=jnp.float32)
    gmax = jnp.max(s3, axis=-1)
    _, gidx = jax.lax.top_k(gmax, k)
    cand_rows = jnp.take(r3, gidx, axis=0)  # (B, k, group, d)
    cs = jnp.einsum("bd,bkgd->bkg", q, cand_rows,
                    preferred_element_type=jnp.float32)
    cs = cs.reshape(q.shape[0], k * group)
    vals, pos = jax.lax.top_k(cs, k)
    winner = jnp.take_along_axis(gidx, pos // group, axis=-1)
    return vals, winner * group + pos % group


def bench(fn, q, iters=20, trials=3):
    vals, idx = fn(q)
    np.asarray(idx)
    best = 1e9
    for _ in range(trials):
        acc = jnp.zeros((), q.dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            vv, _ = fn(q + acc * 0)
            acc = vv[0, 0].astype(q.dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


for b in (64, 256):
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
    ref_idx = None
    for mode, group in (("single", 0), ("v2", 64), ("v2", 128), ("v2", 256),
                        ("v2", 512)):
        fn = lambda qq, m=mode, g=group: rank(qq, rows, m, g)
        vals, idx = fn(q)
        ia = np.sort(np.asarray(idx), axis=1)
        if ref_idx is None:
            ref_idx = ia
        else:
            match = np.mean(ia == ref_idx)
            tag = "EXACT" if match == 1.0 else f"match={match:.6f}"
            print(f"  {mode}-{group} index {tag}", flush=True)
        t = bench(fn, q)
        print(f"b={b} {mode}-{group}: {t*1000:.2f} ms/batch = {b/t:.0f} qps",
              flush=True)
