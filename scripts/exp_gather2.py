"""Gather experiment round 2: take_along_axis forms + f32 gather."""
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

N, K, F, TILE = 8192, 24, 128, 256
rng = np.random.default_rng(0)
h = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
hf = h.astype(jnp.float32)
idx = jnp.asarray(rng.integers(0, N, size=(N, K)), jnp.int32)

def kernel_taa(h_ref, idx_ref, out_ref):
    t, k = idx_ref.shape
    flat = idx_ref[...].reshape(t * k)
    ids = jnp.broadcast_to(flat[:, None], (t * k, h_ref.shape[1]))
    g = jnp.take_along_axis(h_ref[...], ids, axis=0)
    out_ref[...] = g.reshape(t, k, -1)

def run_pallas(kernel, dtype):
    src = h if dtype == jnp.bfloat16 else hf
    return pl.pallas_call(
        kernel,
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((N, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, K, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K, F), src.dtype),
    )(src, idx)

timeit("xla_gather_bf16", lambda s: (h + s.astype(h.dtype))[idx])
timeit("xla_gather_f32", lambda s: (hf + s)[idx])
timeit("xla_taa_f32", lambda s: jnp.take_along_axis(
    (hf + s), idx.reshape(-1)[:, None] * jnp.ones((1, F), jnp.int32), axis=0))

for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    try:
        out = run_pallas(kernel_taa, dt)
        src = h if dt == jnp.bfloat16 else hf
        ref = src[idx]
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        print(f"pallas taa {dt_name}: max err", float(err), flush=True)
        timeit(f"pallas_taa_{dt_name}", lambda s: run_pallas(kernel_taa, dt) + s.astype(dt))
    except Exception as e:
        print(f"pallas taa {dt_name} FAILED:", repr(e)[:300], flush=True)
