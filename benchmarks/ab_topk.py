import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import hyperdb_tpu.ops.ranking as R

rng = np.random.default_rng(0)
n, d = 1_000_000, 384
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)

def bench(fn, q, iters=20, trials=3):
    vals, idx = fn(q); np.asarray(idx)
    best = 1e9
    for _ in range(trials):
        acc = jnp.zeros((), q.dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            vv, _ = fn(q + acc*0)
            acc = vv[0,0].astype(q.dtype)
        float(acc)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

for b in (64, 256):
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
    for block in (32768, 1 << 30):
        R._TOPK_BLOCK = block
        R.rank_top_k._clear_cache() if hasattr(R.rank_top_k, '_clear_cache') else None
        import functools
        # re-jit with a fresh wrapper to avoid stale cache of the closure constant
        f = jax.jit(functools.partial(R.rank_top_k.__wrapped__, k=10, metric='dot_product'), static_argnames=())
        def fn(qq, f=f):
            return f(qq, rows)
        t = bench(fn, q)
        label = 'two-stage' if block == 32768 else 'single'
        print(f'b={b} {label}: {t*1000:.2f} ms/batch = {b/t:.0f} qps', flush=True)
