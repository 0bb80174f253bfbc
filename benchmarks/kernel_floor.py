import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
n, d, b, k = 1_000_000, 384, 256, 10
rows_h = rng.standard_normal((n, d), dtype=np.float32)
rows = jnp.asarray(rows_h, dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)

def make(tile_n, mode):
    pad = (-n) % tile_n
    n_pad = n + pad
    num_tiles = n_pad // tile_n
    def kernel(q_ref, rows_ref, out_ref, acc):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            acc[:] = jnp.full(acc.shape, -1e30, jnp.float32)
        s = jax.lax.dot_general(q_ref[:], rows_ref[:], (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
        if mode == 'max_only':
            m = jnp.max(s, axis=1, keepdims=True)   # (B,1)
            acc[:] = jnp.maximum(acc[:], m * jnp.ones_like(acc))
        elif mode == 'max_plus_branch':
            m = jnp.max(s, axis=1)
            kth = jnp.min(acc[:], axis=1)
            @pl.when(jnp.any(m > kth))
            def _():
                acc[:] = jnp.maximum(acc[:], m[:, None] * jnp.ones_like(acc))
        @pl.when(i == num_tiles - 1)
        def _():
            out_ref[:] = acc[:]
    @jax.jit
    def run(qq):
        rp = jnp.pad(rows, ((0, pad), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((b, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(qq, rp)
    return run

def bench(fn, iters=20, trials=3):
    out = fn(q); np.asarray(out)
    best = 1e9
    for _ in range(trials):
        acc = jnp.zeros((), jnp.bfloat16)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(q + acc*0)
            acc = o[0,0].astype(jnp.bfloat16)
        float(acc)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

for tile in (8192, 16384):
    for mode in ('max_only', 'max_plus_branch'):
        try:
            t = bench(make(tile, mode))
            print(f'tile={tile} {mode}: {t*1000:.2f} ms', flush=True)
        except Exception as e:
            print(f'tile={tile} {mode}: FAIL {str(e)[:90]}', flush=True)
