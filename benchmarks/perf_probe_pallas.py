import sys, time, functools
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, d, b, k = 1_000_000, 384, 64, 10
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)

def make(mode, tile_n):
    def kernel(q_ref, rows_ref, out_ref, acc):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        s = jax.lax.dot_general(q_ref[:], rows_ref[:], dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if mode == 'matmul_max':
            acc[:] = jnp.maximum(acc[:], jnp.max(s, axis=1, keepdims=True) * jnp.ones_like(acc))
        elif mode == 'copy_only':
            acc[:] = acc[:] + jnp.sum(rows_ref[:].astype(jnp.float32)) * jnp.ones_like(acc) * 0 + 1
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]
    pad = (-n) % tile_n
    @jax.jit
    def run(qq):
        rp = jnp.pad(rows, ((0, pad), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=((n + pad) // tile_n,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((b, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024),
        )(qq, rp)
    return run

def bench(fn, iters=30):
    out = fn(q); np.asarray(out)
    acc = jnp.zeros((), jnp.bfloat16)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(q + acc * 0)
        acc = o[0, 0].astype(jnp.bfloat16)
    float(acc)
    return (time.perf_counter() - t0) / iters

for mode in ('copy_only', 'matmul_max'):
    for tile in (2048, 8192):
        t = min(bench(make(mode, tile)) for _ in range(2))
        print(f'{mode} tile={tile}: {t*1000:.3f} ms', flush=True)
