"""Micro-profile the internals of the dense cell-list neighbor update."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions
from lagrangebench_tpu.ops import neighbors as nb
from lagrangebench_tpu.ops import space


def timeit(name, fn, n=20):
    @jax.jit
    def loop(salt0):
        def body(salt, _):
            r = fn(salt)
            leaves = jax.tree.leaves(r)
            acc = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
            return salt + acc * 1e-30, None

        salt, _ = jax.lax.scan(body, salt0, None, length=n)
        return salt

    r = loop(jnp.float32(0.0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(jnp.float32(1e-32))
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    n, dim = 8000, 3
    box, cutoff = 1.0, 1.45 / 20
    pos = _grid_positions(n, dim, box, 1)[:, 0]
    disp_fn, _ = space.periodic(jnp.asarray([box] * dim, jnp.float32))

    grid = nb.make_grid([box] * dim, cutoff, [True] * dim)
    print("grid:", grid.cells_per_side, "num_cells:", grid.num_cells, flush=True)
    cell_cap = 8
    k_cap = 24

    position = jnp.asarray(pos, jnp.float32)

    timeit(
        "table_build",
        lambda s: nb._build_cell_table(position + s, n, grid, cell_cap)[0],
    )
    timeit(
        "candidates",
        lambda s: nb._celllist_candidates(
            position + s, n, disp_fn, cutoff, grid, cell_cap
        )[:2],
    )

    cand, mask, _ = nb._celllist_candidates(
        position, n, disp_fn, cutoff, grid, cell_cap
    )
    timeit(
        "top_k_select",
        lambda s: nb._dense_select(
            cand, mask ^ (s > 1e10), k_cap, n
        )[0],
    )
    timeit(
        "full_dense_update",
        lambda s: nb._celllist_dense(
            position + s, n, disp_fn, cutoff, k_cap, grid, cell_cap
        )[0],
    )

    # alternative selection: cumsum + one-hot matmul
    def onehot_select(cand_, mask_, s):
        m = mask_ ^ (s > 1e10)
        slot = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
        onehot = (
            (slot[..., None] == jnp.arange(k_cap)[None, None, :])
            & m[..., None]
        ).astype(jnp.float32)  # f32: exact for indices < 2^24
        senders = jnp.einsum(
            "nc,nck->nk", cand_.astype(jnp.float32), onehot
        )
        filled = jnp.sum(onehot, axis=1) > 0
        return jnp.where(filled, senders.astype(jnp.int32), n)

    timeit("onehot_select", lambda s: onehot_select(cand, mask, s))


if __name__ == "__main__":
    main()
