"""Decompose GNS forward cost: mp-steps scaling and component ablations."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions, _make_case_and_model


def timeit(name, fn, n=10):
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


def main():
    n, dim, isl = 8000, 3, 6
    results = {}
    for mp in (1, 10):
        case, metadata, init_fn, apply_fn = _make_case_and_model(
            n, dim=dim, isl=isl, mp_steps=mp,
            nl_format="dense", compute_dtype="bfloat16",
        )
        pos = _grid_positions(n, dim, 1.0, isl)
        ptype = np.zeros(n, dtype=np.int32)
        features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
        params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))
        ptype_j = jnp.asarray(ptype)
        results[mp] = timeit(
            f"gns_forward_mp{mp}",
            lambda s: apply_fn(
                params, {},
                ({**features, "vel_hist": features["vel_hist"] + s}, ptype_j),
            )[0]["acc"],
        )
    per_step = (results[10] - results[1]) / 9
    print(f"per-mp-step: {per_step:.3f} ms; overhead: "
          f"{results[1] - per_step:.3f} ms", flush=True)

    # pure edge-MLP matmul chain at model scale for the MXU reference
    k = neighbors.idx.shape[1]
    x = jnp.ones((n, k, 384), jnp.bfloat16)
    w1 = jnp.ones((384, 128), jnp.bfloat16)
    w2 = jnp.ones((128, 128), jnp.bfloat16)

    def mlp_chain(s):
        y = (x + s.astype(jnp.bfloat16)) @ w1
        y = jax.nn.relu(y)
        return y @ w2

    timeit("edge_mlp_chain", mlp_chain)


if __name__ == "__main__":
    main()
