import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from hyperdb_tpu.ops.quantized import quantize_rows, rank_top_k_int8
from hyperdb_tpu.ops.ranking import rank_top_k

rng = np.random.default_rng(0)
n, d, b, k = 1_000_000, 384, 256, 10
v = rng.standard_normal((n, d), dtype=np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
v_i8, scales = quantize_rows(v)
rows_i8 = jnp.asarray(v_i8)
scales_j = jnp.asarray(scales)
rows_bf = jnp.asarray(v, dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))

def bench(fn, iters=20, trials=3):
    vv, ii = fn(q); np.asarray(ii)
    best = 1e9
    for _ in range(trials):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            vv, _ = fn(q + acc*0)
            acc = vv[0,0]
        float(acc)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

t = bench(lambda qq: rank_top_k_int8(qq, rows_i8, scales_j, k=k))
print(f'int8 scan:          {t*1000:.2f} ms/batch = {b/t:.0f} qps', flush=True)
t = bench(lambda qq: rank_top_k_int8(qq, rows_i8, scales_j, k=k, rescore_rows=rows_bf))
print(f'int8 scan+rescore:  {t*1000:.2f} ms/batch = {b/t:.0f} qps', flush=True)
t = bench(lambda qq: rank_top_k(qq.astype(jnp.bfloat16), rows_bf, k=k, metric='dot_product'))
print(f'bf16 exact:         {t*1000:.2f} ms/batch = {b/t:.0f} qps', flush=True)
# recall of pure int8 vs exact
_, iq = rank_top_k_int8(q, rows_i8, scales_j, k=k)
_, ie = rank_top_k(q.astype(jnp.bfloat16), rows_bf, k=k, metric='dot_product')
iq, ie = np.asarray(iq), np.asarray(ie)
rec = np.mean([len(set(a) & set(b))/k for a, b in zip(iq.tolist(), ie.tolist())])
print(f'int8-pure recall@10 vs bf16 exact: {rec:.4f}', flush=True)
