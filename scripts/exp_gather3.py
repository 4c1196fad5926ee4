"""tpu.dynamic_gather via take_along_axis with shape-matched chunks."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(name, fn, n=20):
    @jax.jit
    def loop(salt0):
        def body(salt, _):
            r = fn(salt)
            return salt + jnp.sum(r.astype(jnp.float32)) * 1e-30, None
        salt, _ = jax.lax.scan(body, salt0, None, length=n)
        return salt
    jax.block_until_ready(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(jnp.float32(1e-32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt

N, K, F = 8192, 24, 128
rng = np.random.default_rng(0)
hb = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
hf = hb.astype(jnp.float32)
idx = jnp.asarray(rng.integers(0, N, size=(N, K)), jnp.int32)

# kernel: grid over K; block k gathers h[idx[:, k]] -> out[:, k, :]
def gather_k_kernel(h_ref, idx_ref, out_ref):
    ids = jnp.broadcast_to(idx_ref[...], (N, F)).astype(jnp.int32)
    out_ref[...] = jnp.take_along_axis(h_ref[...], ids, axis=0)[:, None, :]

def run(src):
    return pl.pallas_call(
        gather_k_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((N, F), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 1, F), lambda k: (0, k, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K, F), src.dtype),
    )(src, idx)

for nm, src in (("f32", hf), ("bf16", hb)):
    try:
        out = run(src)
        ref = src[idx]
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        print(f"pallas dyngather {nm}: max err", float(err), flush=True)
        timeit(f"pallas_dyngather_{nm}", lambda s: run(src + s.astype(src.dtype)))
    except Exception as e:
        print(f"pallas dyngather {nm} FAILED:", repr(e)[:400], flush=True)

timeit("xla_gather_f32", lambda s: (hf + s)[idx])
