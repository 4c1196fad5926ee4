"""Micro-profile the pallas dense neighbor update's internals."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    timeit(
        "cell_table_pallas (binning + table scatters)",
        lambda s: nbp.build_cell_table_pallas(
            position + s, n, grid, cell_cap
        )[:2],
    )

    table_idx, table_pos, _, _ = nbp.build_cell_table_pallas(
        position, n, grid, cell_cap
    )
    cps = tuple(grid.cells_per_side)
    ti = table_idx.reshape(cps + (cell_cap,))
    tp = table_pos.reshape(cps + (cell_cap, dim))
    timeit(
        "extend_table",
        lambda s: nbp._extend_table(ti, tp + s, [box] * dim, grid.pbc, n),
    )

    edges_fn = nbp.make_edges_fn(
        disp_fn, cutoff, grid, k_cap, cell_cap, box=[box] * dim
    )
    timeit("edges_full", lambda s: edges_fn(position + s, n)[0])

    # isolate the scan kernel: fixed extended tables, no binning
    ext_idx, ext_pos = nbp._extend_table(ti, tp, [box] * dim, grid.pbc, n)
    ncx, ncy, ncz = cps
    run = (ncz + 2) * cell_cap
    n_cols = (ncx + 2) * (ncy + 2)
    ext_idx_f = ext_idx.reshape(n_cols, run)
    ext_pos_f = ext_pos.reshape(n_cols, run, dim)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    off_flat = np.asarray([dx * (ncy + 2) + dy for dx, dy in offs], np.int32)
    base = np.asarray(
        [(ix + 1) * (ncy + 2) + (iy + 1) for ix in range(ncx) for iy in range(ncy)],
        np.int32,
    )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = partial(
        nbp._scan_kernel, cutoff2=cutoff * cutoff, n_particles=n, k_cap=k_cap
    )
    n_tiles = ncx * ncy

    def run_scan(s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles, len(off_flat)),
            in_specs=[
                pl.BlockSpec((1, run, dim), lambda i, st, b, o: (b[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dim, run), lambda i, st, b, o: (b[i] + o[st], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, run), lambda i, st, b, o: (b[i] + o[st], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, run, k_cap), lambda i, st, b, o: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda i, st, b, o: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((run, k_cap), jnp.float32),
                pltpu.VMEM((run, 1), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, run, k_cap), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.int32),
            ],
        )(
            jnp.asarray(base),
            jnp.asarray(off_flat),
            ext_pos_f.astype(jnp.float32) + s,
            jnp.transpose(ext_pos_f.astype(jnp.float32) + s, (0, 2, 1)),
            ext_idx_f.reshape(n_cols, 1, run),
        )

    timeit("scan_kernel_alone", lambda s: run_scan(s)[0])

    slot_senders = run_scan(jnp.float32(0.0))[0]

    def scatter_back(s):
        rows = slot_senders.reshape(ncx * ncy, ncz + 2, cell_cap, k_cap)
        rows = (rows + (s > 1e10)).astype(jnp.int32)
        rows = rows[:, 1 : 1 + ncz].reshape(-1, k_cap)
        slots = ti.reshape(-1)
        senders = jnp.full((n, k_cap), n, dtype=jnp.int32)
        return senders.at[slots].set(rows, mode="drop")

    timeit("senders_scatter_back", scatter_back)


if __name__ == "__main__":
    main()
