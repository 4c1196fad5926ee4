"""Micro-profile the pallas dense neighbor update's internals."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions
from lagrangebench_tpu.ops import neighbors as nb
from lagrangebench_tpu.ops import neighbors_pallas as nbp
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

    jax.block_until_ready(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(jnp.float32(1e-32)))
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
        "cid_compute",
        lambda s: nb._flatten_coords(
            nb._cell_coords(position + s, grid), grid
        ),
    )
    col_cap = 88
    timeit(
        "column_table_pallas (binning + table scatters)",
        lambda s: nbp.build_column_table_pallas(
            position + s, n, grid, col_cap
        )[:2],
    )

    fns = nb.neighbor_list(disp_fn, [box] * dim, cutoff, backend="pallas",
                           format="dense", capacity_multiplier=1.25)
    shell = fns.allocate_shell(position, num_particles=n)
    timeit("edges_full", lambda s: shell.update_fn(position + s, None, num_particles=n).idx)
    # correctness vs celllist backend
    nb2 = shell.update_fn(position, None, num_particles=n)
    s_new, ovf = nb2.idx, nb2.did_buffer_overflow
    s_ref = nb._celllist_dense(position, n, disp_fn, cutoff, 24, grid, cell_cap)[0]
    match = bool(jnp.all(jnp.sort(s_new, axis=1) == jnp.sort(s_ref, axis=1)))
    print("matches celllist:", match, "overflow:", bool(ovf), flush=True)




if __name__ == "__main__":
    main()
