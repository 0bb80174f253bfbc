import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from hyperdb_tpu.ops.pallas_topk import fused_topk
from hyperdb_tpu.ops.ranking import rank_top_k
rng = np.random.default_rng(0)
n, d, b, k = 1_000_000, 384, 64, 10
v = rng.standard_normal((n, d), dtype=np.float32)
rows = jnp.asarray(v, dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
vals, idx = fused_topk(q, rows, k=k, metric='dot_product', tile_n=2048)
idx_h = np.asarray(idx)
ovals, oidx = rank_top_k(q, rows, k=k, metric='dot_product')
np.asarray(oidx)
print('idx match:', np.array_equal(idx_h, np.asarray(oidx)), flush=True)
def bench(fn, iters=30):
    acc = jnp.zeros((), jnp.bfloat16)
    t0 = time.perf_counter()
    for _ in range(iters):
        vv, ii = fn(q + acc*0)
        acc = vv[0,0].astype(jnp.bfloat16)
    float(acc)
    return (time.perf_counter()-t0)/iters
t = min(bench(lambda qq: fused_topk(qq, rows, k=k, metric='dot_product', tile_n=2048)) for _ in range(3))
print(f'fused tile=2048: {t*1000:.3f} ms/batch = {b/t:.0f} qps', flush=True)
t_xla = min(bench(lambda qq: rank_top_k(qq, rows, k=k, metric='dot_product')) for _ in range(3))
print(f'xla: {t_xla*1000:.3f} ms/batch = {b/t_xla:.0f} qps', flush=True)
