"""A/B: native XLA TopK vs group-max exact top-k on the 1M-row scan.

Chained-dependency timing per CLAUDE.md (block_until_ready does not block
over the tunnel); best of 3 trials. One TPU process at a time.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from hyperdb_tpu.ops import metrics as _metrics
from hyperdb_tpu.ops.ranking import exact_top_k_grouped

rng = np.random.default_rng(0)
n, d, k = 1_000_000, 384, 10
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("mode", "group"))
def rank(q, rows, mode, group):
    s = _metrics.cosine_scores_prenormalized(q, rows)
    s = jnp.where(jnp.isnan(s), -jnp.inf, s)
    if mode == "single":
        return jax.lax.top_k(s, k)
    return exact_top_k_grouped(s, k, group=group)


def bench(fn, q, iters=20, trials=3):
    vals, idx = fn(q)
    np.asarray(idx)  # compile + sync
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
    ref_vals = None
    for mode, group in (("single", 0), ("grouped", 512), ("grouped", 1024),
                        ("grouped", 4096), ("grouped", 8192)):
        fn = lambda qq, m=mode, g=group: rank(qq, rows, m, g)
        vals, idx = fn(q)
        va = np.asarray(vals, dtype=np.float32)
        if ref_vals is None:
            ref_vals = va
        else:
            exact = np.array_equal(va, ref_vals)
            if not exact:
                print(f"  !! value mismatch vs single TopK (mode={mode} g={group})",
                      flush=True)
        t = bench(fn, q)
        label = mode if mode == "single" else f"grouped-{group}"
        print(f"b={b} {label}: {t*1000:.2f} ms/batch = {b/t:.0f} qps", flush=True)
