import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks._chiplock import claim_chip
claim_chip()
import numpy as np, jax, jax.numpy as jnp

rng = np.random.default_rng(0)
n, d, b, k = 1_000_000, 384, 256, 10
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)

@jax.jit
def matmul_max(qq, rows):
    s = jax.lax.dot_general(qq, rows, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    return jnp.max(s, axis=1), jnp.argmax(s, axis=1)  # cheap reduce, no (B,N) output

@jax.jit
def matmul_topk(qq, rows):
    s = jax.lax.dot_general(qq, rows, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    return jax.lax.top_k(s, k)

@jax.jit
def corpus_touch(qq, rows):
    # pure bandwidth probe: one reduction over the corpus, no (B,N) scores
    return jnp.sum(rows.astype(jnp.float32) * rows.astype(jnp.float32)) + qq[0,0].astype(jnp.float32)

def bench(fn, iters=20, trials=3):
    out = fn(q, rows); jax.tree_util.tree_map(np.asarray, out)
    best = 1e9
    for _ in range(trials):
        acc = jnp.zeros((), jnp.bfloat16)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q + acc*0, rows)
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            acc = leaf.reshape(-1)[0].astype(jnp.bfloat16)
        float(acc)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

print(f'corpus touch (bandwidth probe): {bench(corpus_touch)*1000:.2f} ms', flush=True)
print(f'matmul+max:                     {bench(matmul_max)*1000:.2f} ms', flush=True)
print(f'matmul+topk:                    {bench(matmul_topk)*1000:.2f} ms', flush=True)
