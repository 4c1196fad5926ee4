"""Pallas TPU kernel for the dense neighbor search.

Cell-major scan over a ghost-padded cell table:

* particles bin into a ``(ncx, ncy, ncz, C)`` table (indices + positions);
* the table is extended with ghost layers on every axis — for periodic
  dimensions ghosts replicate the opposite boundary with positions shifted
  by ±box (so the kernel needs NO minimum-image arithmetic), for free
  dimensions ghosts hold sentinels;
* the kernel grid is (xy-columns, 3^(dim-1) stencil steps): one program
  loads the full z-run of one (x, y) column (receivers) and of one
  neighboring column (senders) — both contiguous DMAs — computes all
  pairwise distances, and rank-packs the in-cutoff senders into the
  per-receiver (K) output slots via a fused cumsum + one-hot reduction.
  Rank state (accumulator + counts) lives in VMEM scratch across the
  stencil steps;
* results land in cell-slot order and scatter back to particle order with
  one (N, K) row scatter.

Falls back to interpreter mode off-TPU so the same code path is testable
on CPU.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import neighbors as nb


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _ghost_constants(cps, box, pbc, dim):
    """Static ghost-layer constants: position shifts and validity mask.

    Shapes broadcast against the wrap-padded (ncx+2, ..., C, [dim]) tables.
    """
    ext_shape = tuple(c + 2 for c in cps)
    shift = np.zeros(ext_shape + (1, dim), dtype=np.float32)
    invalid = np.zeros(ext_shape + (1,), dtype=bool)
    for axis in range(dim):
        idx_lo = [slice(None)] * dim
        idx_hi = [slice(None)] * dim
        idx_lo[axis] = slice(0, 1)
        idx_hi[axis] = slice(ext_shape[axis] - 1, ext_shape[axis])
        if pbc[axis]:
            shift[tuple(idx_lo)][..., axis] -= box[axis]
            shift[tuple(idx_hi)][..., axis] += box[axis]
        else:
            invalid[tuple(idx_lo)] = True
            invalid[tuple(idx_hi)] = True
    return shift, invalid


def _extend_table(
    table_idx: jnp.ndarray,  # (ncx, ncy, ncz, C) or (ncx, ncy, C)
    table_pos: jnp.ndarray,  # (..., C, dim)
    box: Sequence[float],
    pbc: Sequence[bool],
    n: int,
):
    """Add ghost layers on every cell axis (wrap+shift or sentinel).

    One wrap-pad per table plus adds with STATIC shift/validity constants —
    a handful of kernels instead of two concats per axis per array (kernel
    count matters on launch-overhead-heavy runtimes).
    """
    dim = table_pos.shape[-1]
    cps = table_idx.shape[:-1]
    pad_cells = tuple((1, 1) for _ in range(dim))

    ext_idx = jnp.pad(table_idx, pad_cells + ((0, 0),), mode="wrap")
    ext_pos = jnp.pad(table_pos, pad_cells + ((0, 0), (0, 0)), mode="wrap")

    shift, invalid = _ghost_constants(cps, box, pbc, dim)
    ext_pos = ext_pos + jnp.asarray(shift, ext_pos.dtype)
    if invalid.any():
        sentinel = jnp.asarray(1e9, ext_pos.dtype)
        inv = jnp.asarray(invalid)
        ext_idx = jnp.where(inv, n, ext_idx)
        ext_pos = jnp.where(inv[..., None], sentinel, ext_pos)
    return ext_idx, ext_pos


def _scan_kernel(
    base_ref,  # scalar prefetch: (n_tiles,) ext column index per tile
    *refs,
    cutoff2: float,
    n_particles: int,
    k_cap: int,
    n_steps: int,
    cell_cap: int,
):
    """One grid iteration covers one receiver column and ALL stencil steps.

    The 3^(dim-1) sender columns arrive as separate blocks (offsets baked
    into their BlockSpec index maps). Because the cell size is >= the
    cutoff, a receiver in z-cell g can only have neighbors in sender
    z-cells g-1..g+1 — so each sender column contributes a 3-cell
    *aligned window* (3C slots) per receiver cell, not its whole z-run.
    All stencil windows concatenate into one (ncz, S*3C) candidate matrix
    and the distance test + rank-pack run ONCE over it: ~5x less pack work
    than scanning full z-runs per stencil step, and grid/DMA overhead
    amortizes across the whole stencil (the per-(tile, step) grid this
    replaces measured launch-bound at ~2.2us/iteration).
    """
    recv_pos_ref = refs[0]
    send_pos_refs = refs[1 : 1 + n_steps]
    send_idx_refs = refs[1 + n_steps : 1 + 2 * n_steps]
    out_ref = refs[1 + 2 * n_steps]
    ovf_ref = refs[2 + 2 * n_steps]

    c = cell_cap
    run = recv_pos_ref.shape[1]
    ndim = recv_pos_ref.shape[2]
    nz = run // c - 2  # interior cells along the run axis
    w = 3 * c  # window width per stencil step
    cw = n_steps * w  # total candidates per receiver cell

    # receivers: interior slots only (ghost cells produce no output rows)
    rp = recv_pos_ref[0, c : (nz + 1) * c, :]  # (nz*C, dim)

    # build the aligned candidate windows: window[g] = sender cells
    # g-1, g, g+1 — three shifted slices of each sender column
    pos_windows = []
    idx_windows = []
    for j in range(n_steps):
        sp = send_pos_refs[j][0]  # (dim, run)
        si = send_idx_refs[j][0, 0]  # (run,)
        sp3 = sp.reshape(ndim, nz + 2, c)
        si3 = si.reshape(nz + 2, c)
        pos_windows.append(
            jnp.concatenate(
                [sp3[:, 0:nz], sp3[:, 1 : nz + 1], sp3[:, 2 : nz + 2]],
                axis=2,
            )  # (dim, nz, 3C)
        )
        idx_windows.append(
            jnp.concatenate(
                [si3[0:nz], si3[1 : nz + 1], si3[2 : nz + 2]], axis=1
            )  # (nz, 3C)
        )
    wpos = jnp.concatenate(pos_windows, axis=2)  # (dim, nz, CW)
    widx = jnp.concatenate(idx_windows, axis=1)  # (nz, CW)

    # distances per axis on (nz, C, CW) blocks (receivers on sublanes,
    # candidates on lanes; a (.., .., dim) layout would pad 3 -> 128 lanes)
    dist2 = None
    for dd in range(ndim):
        ra = rp[:, dd].reshape(nz, c, 1)
        wa = wpos[dd][:, None, :]  # (nz, 1, CW)
        diff = ra - wa
        dist2 = diff * diff if dist2 is None else dist2 + diff * diff
    mask = (dist2 <= cutoff2) & (widx[:, None, :] < n_particles)

    # prefix-sum along the candidate axis as an MXU matmul with an
    # upper-triangular ones matrix (mosaic has no cumsum primitive);
    # bf16 is exact here: per-row counts are bounded by CW < 256
    m2 = mask.reshape(nz * c, cw)
    tri_rows = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 0)
    tri_cols = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 1)
    tri = (tri_rows <= tri_cols).astype(jnp.bfloat16)
    csum = jnp.dot(m2.astype(jnp.bfloat16), tri,
                   preferred_element_type=jnp.float32)
    slot = jnp.where(m2, csum.astype(jnp.int32) - 1, -1)  # (nz*C, CW)

    cand_f = jnp.broadcast_to(
        widx.astype(jnp.float32)[:, None, :], (nz, c, cw)
    ).reshape(nz * c, cw)
    # per-output-slot selection, unrolled over K to keep peak VMEM at a
    # few (nz*C, CW) temporaries (a (.., CW, K) one-hot blows the budget)
    cols = []
    for k in range(k_cap):
        sel = (slot == k).astype(jnp.float32)
        cols.append(jnp.sum(sel * cand_f, axis=1, keepdims=True))
    acc = jnp.concatenate(cols, axis=1)  # (nz*C, K)
    counts = jnp.sum(m2.astype(jnp.int32), axis=1, keepdims=True)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (nz * c, k_cap), 1)
    out_ref[0] = jnp.where(k_iota < counts, acc.astype(jnp.int32), n_particles)
    ovf_ref[0] = jnp.max(counts).reshape(1, 1)


def _binning_kernel(
    cid_ref,  # (1, 1, T) int32 cell ids (invalid particles carry num_cells)
    slot_ref,  # out (1, 1, T) int32 table slots (sentinel if cell overflows)
    ovf_ref,  # out (1, 1, 1) int32 max cell occupancy (final tile)
    counters,  # VMEM scratch (num_cells_pad, 1) f32
    *,
    cell_cap: int,
    num_cells: int,
):
    """Counting-sort binning: rank of each particle within its cell.

    Sequential grid over particle tiles; per-cell counters persist in VMEM.
    Replaces the argsort + searchsorted rank computation whose bitonic
    lowering is launch-bound on high-overhead runtimes.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        counters[...] = jnp.zeros_like(counters)

    cid = cid_ref[0, 0]  # (T,)
    t = cid.shape[0]
    ncp = counters.shape[0]

    cells = jax.lax.broadcasted_iota(jnp.int32, (t, ncp), 1)
    onehot = (cid[:, None] == cells).astype(jnp.float32)  # (T, ncp)

    # rank contribution from earlier tiles: counters lookup as a matvec
    prior = jnp.dot(onehot, counters[...], preferred_element_type=jnp.float32)
    prior = prior[:, 0]  # (T,)

    # in-tile rank: strictly-earlier particles with the same cell id
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    same = (cid[:, None] == cid[None, :]) & (cols < rows)
    rank_in = jnp.sum(same.astype(jnp.float32), axis=1)

    rank = (prior + rank_in).astype(jnp.int32)
    valid = cid < num_cells
    in_cap = rank < cell_cap
    slot = jnp.where(
        valid & in_cap, cid * cell_cap + rank, num_cells * cell_cap
    )
    slot_ref[0, 0] = slot

    counters[...] += jnp.sum(onehot, axis=0)[:, None]

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        # final counters hold per-cell occupancy; report the max
        ovf_ref[0] = jnp.max(counters[...]).astype(jnp.int32).reshape(1, 1)


def build_cell_table_pallas(
    position: jnp.ndarray,
    num_particles,
    grid: "nb._Grid",
    cell_cap: int,
    tile: int = 512,
    interpret: Optional[bool] = None,
):
    """Pallas-accelerated drop-in for nb._build_cell_table."""
    if interpret is None:
        interpret = _interpret_default()
    n, dim = position.shape
    coords = nb._cell_coords(position, grid)
    cid = nb._flatten_coords(coords, grid)
    valid = jnp.arange(n, dtype=jnp.int32) < num_particles
    cid = jnp.where(valid, cid, grid.num_cells).astype(jnp.int32)

    n_pad = -n % tile
    cid_p = jnp.pad(cid, (0, n_pad), constant_values=grid.num_cells)
    n_tiles = (n + n_pad) // tile

    slots, occ = pl.pallas_call(
        partial(
            _binning_kernel, cell_cap=cell_cap, num_cells=grid.num_cells
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((1, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((grid.num_cells, 1), jnp.float32)],
        interpret=interpret,
    )(cid_p.reshape(n_tiles, 1, tile))

    slots = slots.reshape(-1)[:n]
    overflow = occ[0, 0, 0] > cell_cap

    sentinel = jnp.asarray(1e9, position.dtype)
    size = grid.num_cells * cell_cap
    table = jnp.full((size,), n, dtype=jnp.int32)
    table = table.at[slots].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    table_pos = jnp.full((size, dim), sentinel, dtype=position.dtype)
    table_pos = table_pos.at[slots].set(position, mode="drop")

    return (
        table.reshape(grid.num_cells, cell_cap),
        table_pos.reshape(grid.num_cells, cell_cap, dim),
        overflow,
        coords,
    )


def make_edges_fn(
    displacement_fn: Callable,
    cutoff: float,
    grid: "nb._Grid",
    e_cap: int,  # per-row K capacity (dense format)
    cell_cap: int,
    box: Optional[Sequence[float]] = None,
    interpret: Optional[bool] = None,
):
    """Build the dense pallas edge function for a fixed grid/capacity.

    Returns fn(position, num_particles) -> (senders (N, K), overflow).
    """
    assert grid is not None, "pallas backend needs a cell grid"
    dim = len(grid.cells_per_side)
    assert dim in (2, 3), "pallas neighbor kernel supports 2D/3D"
    k_cap = e_cap
    C = cell_cap
    if interpret is None:
        interpret = _interpret_default()

    cps = grid.cells_per_side
    if box is None:
        box = [grid.cell_size[d] * cps[d] for d in range(dim)]

    if dim == 3:
        ncx, ncy, ncz = cps
        n_tiles = ncx * ncy
        run = (ncz + 2) * C
        # stencil over (dx, dy); z covered by the full run
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        off_flat = np.asarray(
            [dx * (ncy + 2) + dy for dx, dy in offs], dtype=np.int32
        )
        base = np.asarray(
            [
                (ix + 1) * (ncy + 2) + (iy + 1)
                for ix in range(ncx)
                for iy in range(ncy)
            ],
            dtype=np.int32,
        )
    else:  # dim == 2
        ncx, ncy = cps
        n_tiles = ncx
        run = (ncy + 2) * C
        off_flat = np.asarray([-1, 0, 1], dtype=np.int32)
        base = np.asarray([ix + 1 for ix in range(ncx)], dtype=np.int32)

    n_steps = len(off_flat)
    cutoff2 = float(cutoff) ** 2

    def edges(position: jnp.ndarray, num_particles) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = position.shape[0]
        table_idx, table_pos, cell_overflow, _ = build_cell_table_pallas(
            position, num_particles, grid, C, interpret=interpret
        )
        table_idx = table_idx.reshape(tuple(cps) + (C,))
        table_pos = table_pos.reshape(tuple(cps) + (C, dim))
        ext_idx, ext_pos = _extend_table(table_idx, table_pos, box, grid.pbc, n)

        # flatten to (ext_columns, run[, dim])
        n_cols = int(np.prod(ext_idx.shape[:-2])) if dim == 3 else ext_idx.shape[0]
        ext_idx_f = ext_idx.reshape(n_cols, run)
        ext_pos_f = ext_pos.reshape(n_cols, run, dim)

        kernel = partial(
            _scan_kernel,
            cutoff2=cutoff2,
            n_particles=n,
            k_cap=k_cap,
            n_steps=n_steps,
            cell_cap=C,
        )
        nz_int = run // C - 2  # interior cells along the run axis
        interior = nz_int * C
        cw = n_steps * 3 * C
        # a few (interior, CW) temporaries + the (CW, CW) triangle
        vmem_estimate = interior * cw * 4 * 8 + cw * cw * 2
        assert vmem_estimate < 12 * 1024 * 1024, (
            f"z-run {run} too large for the pallas kernel's VMEM budget; "
            "use the celllist backend (run chunking lands later)"
        )

        def _send_pos_spec(off):
            return pl.BlockSpec(
                (1, dim, run),
                lambda i, b, off=off: (b[i] + off, 0, 0),
                memory_space=pltpu.VMEM,
            )

        def _send_idx_spec(off):
            return pl.BlockSpec(
                (1, 1, run),
                lambda i, b, off=off: (b[i] + off, 0, 0),
                memory_space=pltpu.VMEM,
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, run, dim),
                    lambda i, b: (b[i], 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + [_send_pos_spec(int(o)) for o in off_flat]
            + [_send_idx_spec(int(o)) for o in off_flat],
            out_specs=[
                pl.BlockSpec(
                    (1, interior, k_cap),
                    lambda i, b: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 1),
                    lambda i, b: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        )
        ext_pos_f32 = ext_pos_f.astype(jnp.float32)
        ext_pos_t = jnp.transpose(ext_pos_f32, (0, 2, 1))
        ext_idx_r = ext_idx_f.reshape(n_cols, 1, run)
        slot_senders, ovf = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, interior, k_cap), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.int32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(base),
            ext_pos_f32,
            *([ext_pos_t] * n_steps),
            *([ext_idx_r] * n_steps),
        )

        # kernel emits interior rows only; scatter back to particle order
        rows = slot_senders.reshape(-1, k_cap)
        slots = table_idx.reshape(-1)

        senders = jnp.full((n, k_cap), n, dtype=jnp.int32)
        senders = senders.at[slots].set(rows, mode="drop")

        overflow = (jnp.max(ovf) > k_cap) | cell_overflow
        return senders, overflow

    return edges
