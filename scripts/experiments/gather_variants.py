"""Gather experiments (round 2): every attempted form of the inter-step
h[senders] gather, preserved as one file of variants.

These are lab notes, not production code — each variant ran on a v5e and
its measurement is recorded in docs/performance.md ("Known costs left on
the table"). Summary of findings:

* variant 1: in-kernel VMEM row gather — Mosaic compile failures beyond
  tiny shapes;
* variant 2: take_along_axis forms and f32 vs bf16 gathers — no faster
  than the straight XLA gather;
* variants 3-5: tpu.dynamic_gather probing — compiles only up to 8 rows
  on this toolchain (dead end);
* variant 6: XLA gather knobs (dtype, flatness, sortedness,
  PROMISE_IN_BOUNDS) — none moved the ~2x-off-roofline cost.

The production answer became the round-3 windowed-select slot path (see
scripts/experiments/window_select.py and ops/fused_mp.py).

Run a single variant:  python scripts/experiments/gather_variants.py N
"""

import sys

# ======================================================================
# variant 1 (was scripts/exp_gather.py)
# ======================================================================

"""Experiment: in-kernel VMEM row gather vs XLA gather (hs_gath candidate)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

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


# ======================================================================
# variant 2 (was scripts/exp_gather2.py)
# ======================================================================

"""Gather experiment round 2: take_along_axis forms + f32 gather."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
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


# ======================================================================
# variant 3 (was scripts/exp_gather3.py)
# ======================================================================

"""tpu.dynamic_gather via take_along_axis with shape-matched chunks."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
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


# ======================================================================
# variant 4 (was scripts/exp_gather4.py)
# ======================================================================

"""dynamic_gather with (K,N) transposed indices, 8 columns per grid step."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
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

N, K, F, KB = 8192, 24, 128, 8
rng = np.random.default_rng(0)
hb = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
hf = hb.astype(jnp.float32)
idx = jnp.asarray(rng.integers(0, N, size=(N, K)), jnp.int32)
idx_t = idx.T.copy()  # (K, N)

def gather_kernel(h_ref, idx_ref, out_ref):
    h = h_ref[...]
    for j in range(KB):
        ids = jnp.broadcast_to(idx_ref[j, :][:, None], (N, F)).astype(jnp.int32)
        out_ref[:, j, :] = jnp.take_along_axis(h, ids, axis=0)

def run(src):
    return pl.pallas_call(
        gather_kernel,
        grid=(K // KB,),
        in_specs=[
            pl.BlockSpec((N, F), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, N), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, KB, F), lambda k: (0, k, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K, F), src.dtype),
    )(src, idx_t)

for nm, src in (("f32", hf), ("bf16", hb)):
    try:
        out = run(src)
        ref = src[idx]
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        print(f"pallas dyngather {nm}: max err", float(err), flush=True)
        timeit(f"pallas_dyngather_{nm}", lambda s: run(src + s.astype(src.dtype)))
    except Exception as e:
        print(f"pallas dyngather {nm} FAILED:", repr(e)[:400], flush=True)


# ======================================================================
# variant 5 (was scripts/exp_gather5.py)
# ======================================================================

"""Find the size bound of tpu.dynamic_gather."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
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


# ======================================================================
# variant 6 (was scripts/exp_gather6.py)
# ======================================================================

"""XLA gather forms: dtype, flatness, sortedness, PROMISE_IN_BOUNDS."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _grid_positions, _make_case_and_model

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

# realistic NL indices from the bench config
n, dim, isl = 8000, 3, 6
case, metadata, init_fn, apply_fn = _make_case_and_model(
    n, dim=dim, isl=isl, backend="pallas", nl_format="dense")
pos = _grid_positions(n, dim, 1.0, isl)
ptype = np.zeros(n, dtype=np.int32)
features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
idx = jnp.minimum(neighbors.idx, n - 1)  # clamp fill for PROMISE_IN_BOUNDS
K = idx.shape[1]
print("K =", K, flush=True)

F = 128
rng = np.random.default_rng(0)
hb = jnp.asarray(rng.normal(size=(n, F)), jnp.bfloat16)
hf = hb.astype(jnp.float32)
idx_rand = jnp.asarray(rng.integers(0, n, size=idx.shape), jnp.int32)

timeit("gather_real_bf16", lambda s: (hb + s.astype(jnp.bfloat16))[idx])
timeit("gather_real_f32", lambda s: (hf + s)[idx])
timeit("gather_rand_f32", lambda s: (hf + s)[idx_rand])
timeit("take_flat_real_f32", lambda s: jnp.take((hf + s), idx.reshape(-1), axis=0))

from jax import lax
dn = lax.GatherDimensionNumbers(offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
flat_idx = idx.reshape(-1, 1)
def g_promise(s):
    return lax.gather((hf + s), flat_idx, dn, slice_sizes=(1, F),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                      indices_are_sorted=False, unique_indices=False)
timeit("lax_gather_promise_f32", g_promise)

# sorted flat indices (as if edges sorted by sender): upper bound of sortedness
flat_sorted = jnp.sort(idx.reshape(-1)).reshape(-1, 1)
def g_sorted(s):
    return lax.gather((hf + s), flat_sorted, dn, slice_sizes=(1, F),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                      indices_are_sorted=True, unique_indices=False)
timeit("lax_gather_sorted_f32", g_sorted)

# wider rows per gathered element: gather 2 steps worth (256-wide)
h2 = jnp.concatenate([hf, hf], axis=1)
timeit("gather_real_f32_256wide", lambda s: (h2 + s)[idx])

# gather bf16 1024-wide (simulating 8 steps at once)
h8 = jnp.tile(hb, (1, 8))
timeit("gather_real_bf16_1024wide", lambda s: (h8 + s.astype(jnp.bfloat16))[idx])
