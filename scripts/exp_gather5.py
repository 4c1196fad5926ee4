"""Find the size bound of tpu.dynamic_gather."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(name, fn, n=50):
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

F = 128
rng = np.random.default_rng(0)

for N in (8, 64, 256, 1024, 2048):
    h = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    idxs = jnp.asarray(rng.integers(0, N, size=(N,)), jnp.int32)

    def kern(h_ref, i_ref, o_ref):
        ids = jnp.broadcast_to(i_ref[0, :][:, None], (N, F)).astype(jnp.int32)
        o_ref[...] = jnp.take_along_axis(h_ref[...], ids, axis=0)

    def run(s):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((N, F), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, F), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, F), h.dtype),
        )(h + s, idxs[None, :])

    try:
        out = run(jnp.float32(0.0))
        ref = h[idxs]
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"N={N}: err={err}", flush=True)
        # time a grid version doing 8192*24/N gathers worth of rows
        reps = max(1, (8192 * 24) // N)
        def kern_loop(h_ref, i_ref, o_ref):
            h_ = h_ref[...]
            acc = jnp.zeros((N, F), h_.dtype)
            for _ in range(min(reps, 24)):
                ids = jnp.broadcast_to(i_ref[0, :][:, None], (N, F)).astype(jnp.int32)
                acc += jnp.take_along_axis(h_, ids, axis=0)
            o_ref[...] = acc
        def run_loop(s):
            return pl.pallas_call(
                kern_loop,
                in_specs=[
                    pl.BlockSpec((N, F), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, N), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N, F), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, F), h.dtype),
            )(h + s, idxs[None, :])
        t = timeit(f"  loop_{min(reps,24)}x_gather_N{N}", run_loop)
        rows_per_ms = N * min(reps, 24) / t
        print(f"  -> {rows_per_ms/1e3:.0f}k rows/ms (need 192k rows fast)", flush=True)
    except Exception as e:
        print(f"N={N} FAILED: {repr(e)[:200]}", flush=True)
