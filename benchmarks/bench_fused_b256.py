import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from hyperdb_tpu.ops.pallas_topk import fused_topk
from hyperdb_tpu.ops.ranking import rank_top_k
rng = np.random.default_rng(0)
n, d, b, k = 1_000_000, 384, 256, 10
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
def bench(fn, iters=20, trials=3):
    vv, ii = fn(q); np.asarray(ii)
    best = 1e9
    for _ in range(trials):
        acc = jnp.zeros((), jnp.bfloat16)
        t0 = time.perf_counter()
        for _ in range(iters):
            vv, _ = fn(q + acc*0)
            acc = vv[0,0].astype(jnp.bfloat16)
        float(acc)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best
for tile in (4096, 8192):
    try:
        t = bench(lambda qq, tt=tile: fused_topk(qq, rows, k=k, metric='dot_product', tile_n=tt))
        print(f'fused b=256 tile={tile}: {t*1000:.2f} ms = {b/t:.0f} qps', flush=True)
    except Exception as e:
        print(f'tile={tile} FAIL: {str(e)[:100]}', flush=True)
# correctness
vals, idx = fused_topk(q, rows, k=k, metric='dot_product', tile_n=4096)
ovals, oidx = rank_top_k(q, rows, k=k, metric='dot_product')
print('idx match:', np.array_equal(np.asarray(idx), np.asarray(oidx)), flush=True)
