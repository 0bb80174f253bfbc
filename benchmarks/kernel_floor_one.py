import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1] if len(sys.argv) > 1 else 'max_only'
tile_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

rng = np.random.default_rng(0)
n, d, b = 1_048_576, 384, 256  # n already a multiple of tile_n -> no pad copy
rows = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32), dtype=jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), dtype=jnp.bfloat16)
num_tiles = n // tile_n

def kernel(q_ref, rows_ref, out_ref, acc):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        acc[:] = jnp.full(acc.shape, -1e30, jnp.float32)
    s = jax.lax.dot_general(q_ref[:], rows_ref[:], (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    if mode == 'max_only':
        m = jnp.max(s, axis=1, keepdims=True)
        acc[:] = jnp.maximum(acc[:], m * jnp.ones_like(acc))
    elif mode == 'nothing':
        acc[:] = acc[:] + s[:, :128]
    @pl.when(i == num_tiles - 1)
    def _():
        out_ref[:] = acc[:]

@jax.jit
def run(qq):
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
    )(qq, rows)

t0 = time.perf_counter()
out = run(q); np.asarray(out)
print(f'compile+first: {time.perf_counter()-t0:.1f}s', flush=True)
best = 1e9
for _ in range(3):
    acc = jnp.zeros((), jnp.bfloat16)
    t0 = time.perf_counter()
    for _ in range(20):
        o = run(q + acc*0)
        acc = o[0,0].astype(jnp.bfloat16)
    float(acc)
    best = min(best, (time.perf_counter()-t0)/20)
print(f'{mode} tile={tile_n}: {best*1000:.2f} ms/pass', flush=True)
