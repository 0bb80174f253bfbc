import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from hyperdb_tpu.ops import metrics as M

rng = np.random.default_rng(0)
n, d, k = 1_000_000, 384, 10
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)

ITERS = 50
@functools.partial(jax.jit, static_argnames=('b',))
def loop_scan(q, rows, b):
    def body(i, acc):
        s = jax.lax.dot_general(q + acc*0, rows, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
        vals, idx = jax.lax.top_k(s, k)
        return vals[0,0].astype(q.dtype)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), q.dtype))

for b in (64, 256):
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
    r = loop_scan(q, rows, b); float(r)  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop_scan(q, rows, b))
        best = min(best, (time.perf_counter()-t0))
    per = best / ITERS
    print(f'device-loop b={b}: {per*1000:.2f} ms/batch = {b/per:.0f} qps', flush=True)
