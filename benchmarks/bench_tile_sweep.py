import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from hyperdb_tpu.ops.pallas_topk import fused_topk
rng = np.random.default_rng(0)
n, d, b, k = 1_000_000, 384, 64, 10
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
def bench(tile, iters=30):
    vals, idx = fused_topk(q, rows, k=k, metric='dot_product', tile_n=tile)
    np.asarray(idx)
    best = 1e9
    for _ in range(3):
        acc = jnp.zeros((), jnp.bfloat16)
        t0 = time.perf_counter()
        for _ in range(iters):
            vv, ii = fused_topk(q + acc*0, rows, k=k, metric='dot_product', tile_n=tile)
            acc = vv[0,0].astype(jnp.bfloat16)
        float(acc)
        best = min(best, (time.perf_counter()-t0)/iters)
    print(f'tile={tile}: {best*1000:.3f} ms/batch = {b/best:.0f} qps', flush=True)
for tile in (4096, 8192, 16384, 32768):
    try:
        bench(tile)
    except Exception as e:
        print(f'tile={tile}: FAIL {str(e)[:120]}', flush=True)
