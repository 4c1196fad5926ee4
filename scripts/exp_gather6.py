"""XLA gather forms: dtype, flatness, sortedness, PROMISE_IN_BOUNDS."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
