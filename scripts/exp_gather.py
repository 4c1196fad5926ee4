"""Experiment: in-kernel VMEM row gather vs XLA gather (hs_gath candidate)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
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
idx = jnp.asarray(rng.integers(0, N, size=(N, K)), jnp.int32)


def gather_kernel_take(h_ref, idx_ref, out_ref):
    t, k = idx_ref.shape
    flat = idx_ref[...].reshape(t * k)
    out_ref[...] = jnp.take(h_ref[...], flat, axis=0).reshape(t, k, -1)


def run_pallas(kernel):
    return pl.pallas_call(
        kernel,
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((N, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, K, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, K, F), h.dtype),
    )(h, idx)


# XLA baseline
timeit("xla_gather", lambda s: (h + s.astype(h.dtype))[idx])

try:
    out = run_pallas(gather_kernel_take)
    ref = h[idx]
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    print("pallas take: max err", float(err), flush=True)
    timeit(
        "pallas_gather_take",
        lambda s: run_pallas(gather_kernel_take) + s.astype(h.dtype),
    )
except Exception as e:
    print("pallas take FAILED:", repr(e)[:500], flush=True)


# variant: loop over K columns, take 1 column of indices at a time
def gather_kernel_cols(h_ref, idx_ref, out_ref):
    t, k = idx_ref.shape
    hh = h_ref[...]
    for j in range(k):
        out_ref[:, j, :] = jnp.take(hh, idx_ref[:, j], axis=0)


try:
    out = run_pallas(gather_kernel_cols)
    ref = h[idx]
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    print("pallas cols: max err", float(err), flush=True)
    timeit(
        "pallas_gather_cols",
        lambda s: run_pallas(gather_kernel_cols) + s.astype(h.dtype),
    )
except Exception as e:
    print("pallas cols FAILED:", repr(e)[:500], flush=True)
