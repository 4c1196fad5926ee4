"""Pallas TPU kernel for the dense neighbor search.

Column-major scan over a ghost-padded *column table*:

* particles bin by their first ``dim-1`` cell coordinates into a
  ``(ncx[, ncy], Ccol)`` column table (indices + positions) — the LAST
  spatial axis is not discretized at all; its periodicity is handled by a
  minimum-image correction inside the kernel. This keeps the candidate
  axis short (column occupancy, not ``(nc_last + 2) * cell_cap`` slots)
  and removes last-axis ghost layers entirely;
* there are NO ghost tables: the kernel grid is one program per column,
  whose 3^(dim-1) stencil neighbor columns arrive as separate blocks with
  wrapped column ids from a scalar-prefetched base table (free-axis
  out-of-range offsets point at one shared sentinel column). The senders
  concatenate into one (Ccol, S*Ccol) candidate matrix; periodic wrap on
  EVERY axis is a per-axis minimum-image correction, then all pairwise
  distances and a fused cumsum + one-hot rank-pack fill the per-receiver
  (K) output slots;
* results land in column-slot order and scatter back to particle order
  with one (N, K) row scatter.

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


def vmem_monolithic(cap: int, dim: int, emit_geometry: bool) -> int:
    """Live-VMEM estimate of the one-shot scan kernel (all stencil columns
    concatenated): a few (C, S*C) f32 temporaries (+dim geometry planes)
    plus the (S*C, S*C) bf16 prefix triangle."""
    cw = (3 ** (dim - 1)) * cap
    return cap * cw * 4 * (8 + (dim if emit_geometry else 0)) + cw * cw * 2


def vmem_streamed(
    cap: int, dim: int, k_cap: int, emit_geometry: bool
) -> int:
    """Live-VMEM estimate of the STREAMED scan kernel: one stencil column
    per grid step, so temporaries and the prefix triangle are (C, C); the
    accumulated output blocks ((C, K) senders + optional (C, K*(dim+1))
    geometry) stay resident across the stencil steps."""
    temps = cap * cap * 4 * (8 + (dim if emit_geometry else 0))
    tri = cap * cap * 2
    outs = cap * k_cap * 4 * (1 + ((dim + 1) if emit_geometry else 0))
    return temps + tri + outs


def _scan_kernel(
    base_ref,  # scalar prefetch: (n_tiles,) ext column index per tile
    *refs,
    cutoff2: float,
    n_particles: int,
    k_cap: int,
    n_steps: int,
    box: tuple,
    pbc: tuple,
    emit: str = "senders",
):
    """One grid iteration: one receiver column vs its whole stencil.

    The stencil's sender columns arrive as separate blocks (their wrapped
    column ids come from a scalar-prefetched base table) and concatenate
    into one (Ccol, S*Ccol) candidate matrix, so distance test and
    rank-pack run once per column. There are NO ghost tables: periodic
    wrap on every axis is a minimum-image correction on the per-axis
    difference (cells are >= the cutoff, so only the wrap image can
    matter), and free-axis out-of-range offsets point at a sentinel
    column whose candidates are index-masked.

    ``emit`` selects the packed payload:
        "senders" — per-slot sender PARTICLE ids (fill n_particles), the
            particle-order dense format (scattered back by the caller);
        "geometry" — sender ids PLUS one interleaved geometry plane
            (Ccol, K*(dim+1)) holding the cutoff-normalized per-axis
            displacement and distance per slot, component-minor — i.e.
            exactly the raw edge-feature layout the models consume
            (concat(rel_disp, rel_dist) reshaped flat). The caller
            scatters both back to particle order in ONE combined
            scatter, and the feature chain skips its sender-position
            gather + min-image entirely;
        "slot" — per-slot stencil-candidate index in [0, S*Ccol) (fill
            S*Ccol) PLUS the cutoff-normalized per-axis displacement and
            distance, all in column-slot order. This is the slot-space
            graph: downstream kernels re-localize a candidate id to the
            sender's slot row via the same base table, and the geometry
            outputs make the XLA-side sender-position gather + min-image
            wrap chain unnecessary.
    """
    recv_pos_ref = refs[0]
    send_pos_refs = refs[1 : 1 + n_steps]
    send_idx_refs = refs[1 + n_steps : 1 + 2 * n_steps]
    out_refs = refs[1 + 2 * n_steps :]

    rp = recv_pos_ref[0]  # (Ccol, dim)
    ndim = rp.shape[1]

    # (dim, S*Ccol) candidate positions / (1, S*Ccol) candidate indices
    # (kept 2D: mosaic has no 1D concatenate)
    wpos = jnp.concatenate([r[0] for r in send_pos_refs], axis=1)
    widx = jnp.concatenate([r[0] for r in send_idx_refs], axis=1)

    dist2 = None
    diffs = []
    for dd in range(ndim):
        diff = rp[:, dd : dd + 1] - wpos[dd : dd + 1, :]  # (Ccol, S*Ccol)
        if pbc[dd]:
            # round-to-nearest via floor(x + 0.5): jnp.round's half-even
            # lowering trips a pallas/mosaic lowering-cache bug, and the
            # half-way case is measure-zero here
            diff = diff - box[dd] * jnp.floor(diff * (1.0 / box[dd]) + 0.5)
        if emit in ("slot", "geometry"):
            diffs.append(diff)
        dist2 = diff * diff if dist2 is None else dist2 + diff * diff
    mask = (dist2 <= cutoff2) & (widx < n_particles)

    # prefix-sum along the candidate axis as an MXU matmul with an
    # upper-triangular ones matrix (mosaic has no cumsum primitive);
    # bf16 is exact here: per-row counts are bounded by the true neighbor
    # count (< 256), not by the candidate-axis length
    cw = mask.shape[1]
    tri_rows = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 0)
    tri_cols = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 1)
    tri = (tri_rows <= tri_cols).astype(jnp.bfloat16)
    csum = jnp.dot(mask.astype(jnp.bfloat16), tri,
                   preferred_element_type=jnp.float32)
    slot = jnp.where(mask, csum.astype(jnp.int32) - 1, -1)

    # the packed payloads: sender ids (or candidate indices) + geometry
    if emit in ("slot", "geometry"):
        inv_cutoff = 1.0 / float(cutoff2) ** 0.5
        geom = [d * inv_cutoff for d in diffs] + [
            jnp.sqrt(dist2) * inv_cutoff
        ]
    else:
        geom = []
    if emit == "slot":
        cand_f = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1).astype(
            jnp.float32
        )  # candidate index within the stencil
    else:
        cand_f = widx.astype(jnp.float32)  # (1, S*Ccol)
    payloads = [cand_f] + geom

    # per-output-slot selection, unrolled over K to keep peak VMEM at a few
    # (Ccol, S*Ccol) temporaries (a (.., .., K) one-hot blows the budget);
    # the per-k selection mask is shared across payloads
    cols = [[] for _ in payloads]
    for k in range(k_cap):
        sel = (slot == k).astype(jnp.float32)
        for pi, pay in enumerate(payloads):
            cols[pi].append(jnp.sum(sel * pay, axis=1, keepdims=True))
    counts = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
    # invalid receiver slots accumulate garbage min-image distances; their
    # sentinel position (1e9, far beyond any box) gates them out
    recv_valid = rp[:, 0:1] < 1e8
    counts = jnp.where(recv_valid, counts, 0)

    acc = jnp.concatenate(cols[0], axis=1)  # (Ccol, K)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (acc.shape[0], k_cap), 1)
    valid_k = k_iota < counts
    fill = cw if emit == "slot" else n_particles
    out_refs[0][0] = jnp.where(valid_k, acc.astype(jnp.int32), fill)
    if emit == "geometry":
        # ONE interleaved (Ccol, K*(dim+1)) plane, component-minor — the
        # flat raw-edge-feature layout (concat(rel_disp, rel_dist)); one
        # output keeps the caller's scatter-back a single op
        inter = [
            cols[pi][k]
            for k in range(k_cap)
            for pi in range(1, len(payloads))
        ]
        geom_packed = jnp.concatenate(inter, axis=1)
        gk = (
            jax.lax.broadcasted_iota(
                jnp.int32, (acc.shape[0], geom_packed.shape[1]), 1
            )
            // (ndim + 1)
        )
        out_refs[1][0] = jnp.where(gk < counts, geom_packed, 0.0)
        n_payload_outs = 2
    else:
        for pi in range(1, len(payloads)):
            packed = jnp.concatenate(cols[pi], axis=1)
            out_refs[pi][0] = jnp.where(valid_k, packed, 0.0)
        n_payload_outs = len(payloads)
    ovf_ref = out_refs[n_payload_outs]
    ovf_ref[0] = jnp.max(counts).reshape(1, 1)


def _scan_kernel_streamed(
    base_ref,  # scalar prefetch (unused in-body; drives the send specs)
    recv_pos_ref,
    send_pos_ref,  # ONE stencil column per grid step
    send_idx_ref,
    *out_and_scratch,
    cutoff2: float,
    n_particles: int,
    k_cap: int,
    n_steps: int,
    box: tuple,
    pbc: tuple,
    emit: str = "senders",
    step_axis: int = 2,
):
    """Streamed variant of ``_scan_kernel`` for VMEM-inadmissible columns.

    The stencil is a GRID dimension: each step loads ONE sender column
    (C candidates) instead of concatenating all S columns, so the live
    temporaries and the prefix triangle shrink from (C, S*C)/(S*C, S*C)
    to (C, C)/(C, C) — an S(=3^(dim-1))-fold cut that keeps the kernel
    admissible at large N (the monolithic kernel dies past ~27k
    particles in 3D; see docs/performance.md "Large-N streamed NL").

    Output K-slots accumulate across steps: a per-receiver committed
    count carries in VMEM scratch, each step rank-packs its candidates
    at ``carry + in-step-rank``, and slot selection sums into the
    (step-invariant) output block. Total pack work is identical to the
    monolithic kernel (K unrolled over the same S*C candidates); only
    peak VMEM changes.
    """
    counts_ref = out_and_scratch[-1]
    out_refs = out_and_scratch[:-1]
    step = pl.program_id(step_axis)  # stencil step = LAST grid axis

    rp = recv_pos_ref[0]  # (C, dim)
    ndim = rp.shape[1]
    wpos = send_pos_ref[0]  # (dim, C)
    widx = send_idx_ref[0]  # (1, C)

    n_payload_outs = 2 if emit == "geometry" else 1
    ovf_ref = out_refs[n_payload_outs]

    @pl.when(step == 0)
    def _():
        counts_ref[...] = jnp.zeros_like(counts_ref)
        for r in out_refs[:n_payload_outs]:
            r[0] = jnp.zeros_like(r[0])
        ovf_ref[0] = jnp.zeros_like(ovf_ref[0])

    dist2 = None
    diffs = []
    for dd in range(ndim):
        diff = rp[:, dd : dd + 1] - wpos[dd : dd + 1, :]  # (C, C)
        if pbc[dd]:
            diff = diff - box[dd] * jnp.floor(diff * (1.0 / box[dd]) + 0.5)
        if emit == "geometry":
            diffs.append(diff)
        dist2 = diff * diff if dist2 is None else dist2 + diff * diff
    mask = (dist2 <= cutoff2) & (widx < n_particles)

    cw = mask.shape[1]
    tri_rows = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 0)
    tri_cols = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 1)
    tri = (tri_rows <= tri_cols).astype(jnp.bfloat16)
    csum = jnp.dot(mask.astype(jnp.bfloat16), tri,
                   preferred_element_type=jnp.float32)
    carry = counts_ref[...].astype(jnp.int32)  # (C, 1) committed so far
    slot = jnp.where(mask, carry + csum.astype(jnp.int32) - 1, -1)

    if emit == "geometry":
        inv_cutoff = 1.0 / float(cutoff2) ** 0.5
        geom = [d * inv_cutoff for d in diffs] + [
            jnp.sqrt(dist2) * inv_cutoff
        ]
    else:
        geom = []
    payloads = [widx.astype(jnp.float32)] + geom

    cols = [[] for _ in payloads]
    for k in range(k_cap):
        sel = (slot == k).astype(jnp.float32)
        for pi, pay in enumerate(payloads):
            cols[pi].append(jnp.sum(sel * pay, axis=1, keepdims=True))

    # accumulate this step's contributions (each (row, k) output slot is
    # filled by exactly one stencil step — the one holding its k-th
    # neighbor — so plain addition composes the steps)
    acc = jnp.concatenate(cols[0], axis=1)  # (C, K)
    out_refs[0][0] = out_refs[0][0] + acc.astype(jnp.int32)
    if emit == "geometry":
        inter = [
            cols[pi][k]
            for k in range(k_cap)
            for pi in range(1, len(payloads))
        ]
        out_refs[1][0] = out_refs[1][0] + jnp.concatenate(inter, axis=1)

    counts_new = counts_ref[...] + jnp.sum(
        mask.astype(jnp.float32), axis=1, keepdims=True
    )
    counts_ref[...] = counts_new

    @pl.when(step == n_steps - 1)
    def _():
        counts = counts_new.astype(jnp.int32)
        recv_valid = rp[:, 0:1] < 1e8
        counts = jnp.where(recv_valid, counts, 0)
        packed = out_refs[0][0]
        k_iota = jax.lax.broadcasted_iota(
            jnp.int32, (packed.shape[0], k_cap), 1
        )
        valid_k = k_iota < counts
        out_refs[0][0] = jnp.where(valid_k, packed, n_particles)
        if emit == "geometry":
            gplane = out_refs[1][0]
            gk = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (packed.shape[0], gplane.shape[1]), 1
                )
                // (ndim + 1)
            )
            out_refs[1][0] = jnp.where(gk < counts, gplane, 0.0)
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


def _table_from_cid(
    cid: jnp.ndarray,
    position: jnp.ndarray,
    num_cells: int,
    cell_cap: int,
    tile: int,
    interpret: bool,
    values: Optional[jnp.ndarray] = None,
    fill: Optional[int] = None,
):
    """Counting-sort particles into a (num_cells, cap) table by cell id.

    ``values`` are the int32 payloads scattered into the index table
    (default: the particle's own row index); ``fill`` is the empty-slot
    sentinel (default: the particle count).
    """
    n, dim = position.shape
    if values is None:
        values = jnp.arange(n, dtype=jnp.int32)
    if fill is None:
        fill = n
    n_pad = -n % tile
    cid_p = jnp.pad(cid, (0, n_pad), constant_values=num_cells)
    n_tiles = (n + n_pad) // tile

    slots, occ = pl.pallas_call(
        partial(_binning_kernel, cell_cap=cell_cap, num_cells=num_cells),
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
        scratch_shapes=[pltpu.VMEM((num_cells, 1), jnp.float32)],
        interpret=interpret,
    )(cid_p.reshape(n_tiles, 1, tile))

    slots = slots.reshape(-1)[:n]
    overflow = occ[0, 0, 0] > cell_cap

    sentinel = jnp.asarray(1e9, position.dtype)
    size = num_cells * cell_cap
    table = jnp.full((size,), fill, dtype=jnp.int32)
    table = table.at[slots].set(values.astype(jnp.int32), mode="drop")
    table_pos = jnp.full((size, dim), sentinel, dtype=position.dtype)
    table_pos = table_pos.at[slots].set(position, mode="drop")

    return (
        table.reshape(num_cells, cell_cap),
        table_pos.reshape(num_cells, cell_cap, dim),
        overflow,
        slots,
    )


def build_cell_table_pallas(
    position: jnp.ndarray,
    num_particles,
    grid: "nb._Grid",
    cell_cap: int,
    tile: int = 512,
    interpret: Optional[bool] = None,
):
    """Pallas-accelerated drop-in for nb._build_cell_table (full-dim bins)."""
    if interpret is None:
        interpret = _interpret_default()
    n, _ = position.shape
    coords = nb._cell_coords(position, grid)
    cid = nb._flatten_coords(coords, grid)
    valid = jnp.arange(n, dtype=jnp.int32) < num_particles
    cid = jnp.where(valid, cid, grid.num_cells).astype(jnp.int32)
    table, table_pos, overflow, _ = _table_from_cid(
        cid, position, grid.num_cells, cell_cap, tile, interpret
    )
    return table, table_pos, overflow, coords


def build_column_table_pallas(
    position: jnp.ndarray,
    num_particles,
    grid: "nb._Grid",
    col_cap: int,
    tile: int = 512,
    interpret: Optional[bool] = None,
):
    """Bin particles by their first dim-1 cell coordinates (columns)."""
    if interpret is None:
        interpret = _interpret_default()
    n, _ = position.shape
    cps = grid.cells_per_side
    coords = nb._cell_coords(position, grid)
    # flatten the leading dim-1 coordinates only
    cid = coords[:, 0]
    for d in range(1, len(cps) - 1):
        cid = cid * cps[d] + coords[:, d]
    num_cols = int(np.prod(cps[:-1]))
    valid = jnp.arange(n, dtype=jnp.int32) < num_particles
    cid = jnp.where(valid, cid, num_cols).astype(jnp.int32)
    table, table_pos, overflow, _ = _table_from_cid(
        cid, position, num_cols, col_cap, tile, interpret
    )
    return table, table_pos, overflow


def make_edges_fn(
    displacement_fn: Callable,
    cutoff: float,
    grid: "nb._Grid",
    e_cap: int,  # per-row K capacity (dense format)
    cell_cap: int,  # per-COLUMN capacity for the pallas backend
    box: Optional[Sequence[float]] = None,
    interpret: Optional[bool] = None,
    emit_geometry: bool = False,
):
    """Build the dense pallas edge function for a fixed grid/capacity.

    Returns fn(position, num_particles) -> (senders (N, K), overflow), or
    with ``emit_geometry`` -> (senders, geometry (N, K, dim+1), overflow)
    where geometry is cutoff-normalized [rel_disp, rel_dist] computed
    in-kernel (the per-axis min-imaged differences already exist in VMEM
    for the distance test) and scattered back to particle order together
    with the sender ids in ONE combined scatter — the feature chain then
    skips its (N, K, dim) sender-position gather + min-image entirely.
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

    # per-(tile, stencil-step) sender column ids: wrapped on periodic axes,
    # pointing at the sentinel column (id = n_cols) when a free axis runs
    # out of range. No ghost tables, no position shifts — the kernel
    # min-images periodic axes directly.
    if dim == 3:
        ncx, ncy, _ = cps
        n_tiles = ncx * ncy
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        n_cols = ncx * ncy
        bases = np.empty((n_tiles, len(offs)), dtype=np.int32)
        for t, (ix, iy) in enumerate(
            (ix, iy) for ix in range(ncx) for iy in range(ncy)
        ):
            for j, (dx, dy) in enumerate(offs):
                jx, jy = ix + dx, iy + dy
                ok = True
                if grid.pbc[0]:
                    jx %= ncx
                elif not (0 <= jx < ncx):
                    ok = False
                if grid.pbc[1]:
                    jy %= ncy
                elif not (0 <= jy < ncy):
                    ok = False
                bases[t, j] = jx * ncy + jy if ok else n_cols
    else:  # dim == 2
        ncx = cps[0]
        n_tiles = ncx
        offs = [(-1,), (0,), (1,)]
        n_cols = ncx
        bases = np.empty((n_tiles, 3), dtype=np.int32)
        for ix in range(ncx):
            for j, (dx,) in enumerate(offs):
                jx = ix + dx
                ok = True
                if grid.pbc[0]:
                    jx %= ncx
                elif not (0 <= jx < ncx):
                    ok = False
                bases[ix, j] = jx if ok else n_cols

    n_steps = len(offs)
    cutoff2 = float(cutoff) ** 2
    box_t = tuple(float(b) for b in box)
    pbc_t = tuple(bool(p) for p in grid.pbc)

    # monolithic (one-shot stencil) when it fits; else stream the stencil
    # one column per grid step (the large-N path — same pack work, S-fold
    # smaller live VMEM)
    streamed = vmem_monolithic(C, dim, emit_geometry) >= nb._kernel_vmem_budget()
    if streamed:
        assert vmem_streamed(C, dim, k_cap, emit_geometry) < (
            nb._kernel_vmem_budget()
        ), (
            f"column capacity {C} too large even for the streamed pallas "
            "kernel; use the celllist backend"
        )

    def _edges_impl(
        position: jnp.ndarray, num_particles: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched kernel driver: position (B, N, dim), num_particles (B,).

        All samples share ONE pallas launch: their column tables concatenate
        along the leading axis — each sample owns an (n_cols + 1)-row span
        (its own sentinel column included) — and the kernel grid becomes
        (B, n_tiles), so per-sample stencil blocks come from the sample's
        span via a batch-offset base table. One launch for the whole batch
        is what makes the kernel usable under vmapped training/eval
        preprocessing (a vmapped pallas_call would lower poorly).
        """
        bsz, n, _ = position.shape

        # per-sample column ids; invalid particles park in the shared
        # out-of-range bin so the counting sort drops them
        def cid_of(pos, npart):
            coords = nb._cell_coords(pos, grid)
            cid = coords[:, 0]
            for d in range(1, dim - 1):
                cid = cid * cps[d] + coords[:, d]
            valid = jnp.arange(n, dtype=jnp.int32) < npart
            return jnp.where(valid, cid, -1).astype(jnp.int32)

        cid_local = jax.vmap(cid_of)(position, num_particles)  # (B, N)
        offs = jnp.arange(bsz, dtype=jnp.int32)[:, None] * n_cols
        cid_flat = jnp.where(
            cid_local >= 0, cid_local + offs, bsz * n_cols
        ).reshape(-1)
        # table payloads are LOCAL particle ids (senders are per-sample)
        local_ids = jnp.tile(jnp.arange(n, dtype=jnp.int32), bsz)
        table_idx, table_pos, col_overflow, _ = _table_from_cid(
            cid_flat,
            position.reshape(bsz * n, dim),
            bsz * n_cols,
            C,
            tile=512,
            interpret=interpret,
            values=local_ids,
            fill=n,
        )

        # append one sentinel column per sample (invalid idx, far positions)
        sentinel = jnp.asarray(1e9, table_pos.dtype)
        idx_f = jnp.concatenate(
            [
                table_idx.reshape(bsz, n_cols, C),
                jnp.full((bsz, 1, C), n, jnp.int32),
            ],
            axis=1,
        ).reshape(bsz * (n_cols + 1), C)
        pos_f = jnp.concatenate(
            [
                table_pos.reshape(bsz, n_cols, C, dim),
                jnp.full((bsz, 1, C, dim), sentinel, table_pos.dtype),
            ],
            axis=1,
        ).reshape(bsz * (n_cols + 1), C, dim)

        # flat-row base table: sample bb's stencil step j for tile t reads
        # row bb*(n_cols+1) + bases[t, j] (bases==n_cols -> the sentinel)
        bases_b = (
            np.arange(bsz, dtype=np.int32)[:, None, None] * (n_cols + 1)
            + bases[None, :, :]
        )

        geom_w = k_cap * (dim + 1)
        geom_shapes = (
            [jax.ShapeDtypeStruct((bsz * n_tiles, C, geom_w), jnp.float32)]
            if emit_geometry
            else []
        )
        out_shape = (
            [jax.ShapeDtypeStruct((bsz * n_tiles, C, k_cap), jnp.int32)]
            + geom_shapes
            + [jax.ShapeDtypeStruct((bsz * n_tiles, 1, 1), jnp.int32)]
        )
        pos_f32 = pos_f.astype(jnp.float32)
        pos_t = jnp.transpose(pos_f32, (0, 2, 1))
        idx_r = idx_f.reshape(bsz * (n_cols + 1), 1, C)

        if streamed:
            kernel = partial(
                _scan_kernel_streamed,
                cutoff2=cutoff2,
                n_particles=n,
                k_cap=k_cap,
                n_steps=n_steps,
                box=box_t,
                pbc=pbc_t,
                emit="geometry" if emit_geometry else "senders",
                step_axis=2,
            )
            out_map = lambda bb, t, j, b: (bb * n_tiles + t, 0, 0)  # noqa: E731
            geom_specs = (
                [
                    pl.BlockSpec(
                        (1, C, geom_w), out_map, memory_space=pltpu.VMEM
                    )
                ]
                if emit_geometry
                else []
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz, n_tiles, n_steps),
                in_specs=[
                    pl.BlockSpec(
                        (1, C, dim),
                        lambda bb, t, j, b: (bb * (n_cols + 1) + t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, dim, C),
                        lambda bb, t, j, b: (b[bb, t, j], 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, C),
                        lambda bb, t, j, b: (b[bb, t, j], 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (1, C, k_cap), out_map, memory_space=pltpu.VMEM
                    )
                ]
                + geom_specs
                + [
                    pl.BlockSpec(
                        (1, 1, 1), out_map, memory_space=pltpu.VMEM
                    ),
                ],
                scratch_shapes=[pltpu.VMEM((C, 1), jnp.float32)],
            )
            args = (jnp.asarray(bases_b), pos_f32, pos_t, idx_r)
        else:
            kernel = partial(
                _scan_kernel,
                cutoff2=cutoff2,
                n_particles=n,
                k_cap=k_cap,
                n_steps=n_steps,
                box=box_t,
                pbc=pbc_t,
                emit="geometry" if emit_geometry else "senders",
            )

            def _send_pos_spec(j):
                return pl.BlockSpec(
                    (1, dim, C),
                    lambda bb, t, b, j=j: (b[bb, t, j], 0, 0),
                    memory_space=pltpu.VMEM,
                )

            def _send_idx_spec(j):
                return pl.BlockSpec(
                    (1, 1, C),
                    lambda bb, t, b, j=j: (b[bb, t, j], 0, 0),
                    memory_space=pltpu.VMEM,
                )

            geom_specs = (
                [
                    pl.BlockSpec(
                        (1, C, geom_w),
                        lambda bb, t, b: (bb * n_tiles + t, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                if emit_geometry
                else []
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz, n_tiles),
                in_specs=[
                    pl.BlockSpec(
                        (1, C, dim),
                        lambda bb, t, b: (bb * (n_cols + 1) + t, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                + [_send_pos_spec(j) for j in range(n_steps)]
                + [_send_idx_spec(j) for j in range(n_steps)],
                out_specs=[
                    pl.BlockSpec(
                        (1, C, k_cap),
                        lambda bb, t, b: (bb * n_tiles + t, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                + geom_specs
                + [
                    pl.BlockSpec(
                        (1, 1, 1),
                        lambda bb, t, b: (bb * n_tiles + t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
            )
            args = (
                jnp.asarray(bases_b),
                pos_f32,
                *([pos_t] * n_steps),
                *([idx_r] * n_steps),
            )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
        slot_senders, ovf = outs[0], outs[-1]

        # kernel emits interior columns only; scatter rows back to
        # per-sample particle order (invalid slots land out of range)
        rows = slot_senders.reshape(-1, k_cap)
        local = table_idx.reshape(bsz, n_cols * C)
        slots = jnp.where(
            local < n,
            local + jnp.arange(bsz, dtype=jnp.int32)[:, None] * n,
            bsz * n,
        ).reshape(-1)

        geom = None
        if emit_geometry:
            # ONE combined scatter: sender ids ride bitcast-as-f32 next to
            # the geometry plane, so widening the payload adds no second
            # scatter kernel
            rows_g = outs[1].reshape(-1, geom_w)
            rows_c = jnp.concatenate(
                [jax.lax.bitcast_convert_type(rows, jnp.float32), rows_g],
                axis=1,
            )
            fill_bits = jax.lax.bitcast_convert_type(
                jnp.int32(n), jnp.float32
            )
            dest = jnp.concatenate(
                [
                    jnp.full((bsz * n, k_cap), fill_bits, jnp.float32),
                    jnp.zeros((bsz * n, geom_w), jnp.float32),
                ],
                axis=1,
            )
            dest = dest.at[slots].set(rows_c, mode="drop")
            senders = jax.lax.bitcast_convert_type(
                dest[:, :k_cap], jnp.int32
            ).reshape(bsz, n, k_cap)
            geom = dest[:, k_cap:].reshape(bsz, n, k_cap, dim + 1)
        else:
            senders = jnp.full((bsz * n, k_cap), n, dtype=jnp.int32)
            senders = senders.at[slots].set(rows, mode="drop")
            senders = senders.reshape(bsz, n, k_cap)

        max_rowcount = jnp.max(ovf.reshape(bsz, n_tiles), axis=1)
        # col_overflow comes from the SHARED counting-sort table, so one
        # sample overflowing its column capacity flags every sample in the
        # batch. Deliberately conservative: column overflow means capacity
        # was sized wrong for the whole closure (caps are per-allocation,
        # not per-sample), so the correct reaction — reallocate with a
        # bigger cap — is batch-wide anyway; a per-sample flag would
        # trigger the same rebuild.
        overflow = (max_rowcount > k_cap) | col_overflow
        if emit_geometry:
            return senders, geom, overflow
        return senders, overflow

    def _bcast_args(axis_size, in_batched, position, num_particles):
        pos_b, np_b = in_batched
        if not pos_b:
            position = jnp.broadcast_to(
                position, (axis_size,) + position.shape
            )
        npart = jnp.asarray(num_particles, jnp.int32)
        if not np_b:
            npart = jnp.broadcast_to(npart, (axis_size,))
        return position, npart

    if emit_geometry:

        @jax.custom_batching.custom_vmap
        def edges(position: jnp.ndarray, num_particles):
            npart = jnp.asarray(num_particles, jnp.int32)
            senders, geom, overflow = _edges_impl(position[None], npart[None])
            return senders[0], geom[0], overflow[0]

        @edges.def_vmap
        def _edges_vmap_rule(axis_size, in_batched, position, num_particles):
            """Batched NL updates share one pallas launch (grid over batch)."""
            position, npart = _bcast_args(
                axis_size, in_batched, position, num_particles
            )
            senders, geom, overflow = _edges_impl(position, npart)
            return (senders, geom, overflow), (True, True, True)

    else:

        @jax.custom_batching.custom_vmap
        def edges(
            position: jnp.ndarray, num_particles
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
            npart = jnp.asarray(num_particles, jnp.int32)
            senders, overflow = _edges_impl(position[None], npart[None])
            return senders[0], overflow[0]

        @edges.def_vmap
        def _edges_vmap_rule(axis_size, in_batched, position, num_particles):
            """Batched NL updates share one pallas launch (grid over batch)."""
            position, npart = _bcast_args(
                axis_size, in_batched, position, num_particles
            )
            senders, overflow = _edges_impl(position, npart)
            return (senders, overflow), (True, True)

    return edges


# ---------------------------------------------------------------------------
# slot-space graph (cell-sorted execution)
# ---------------------------------------------------------------------------


def stencil_bases(grid: "nb._Grid") -> Tuple[np.ndarray, int, int]:
    """Per-(column, stencil-step) wrapped column ids.

    Returns (bases (n_cols, S) int32, n_cols, S). Entry ``bases[t, j]`` is
    the column id feeding stencil step j of receiver column t; free-axis
    out-of-range steps point at the shared sentinel column ``n_cols``.
    Identical to the table built inline by ``make_edges_fn``.
    """
    cps = grid.cells_per_side
    dim = len(cps)
    if dim == 3:
        ncx, ncy = cps[0], cps[1]
        n_cols = ncx * ncy
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        bases = np.empty((n_cols, len(offs)), dtype=np.int32)
        for t, (ix, iy) in enumerate(
            (ix, iy) for ix in range(ncx) for iy in range(ncy)
        ):
            for j, (dx, dy) in enumerate(offs):
                jx, jy = ix + dx, iy + dy
                ok = True
                if grid.pbc[0]:
                    jx %= ncx
                elif not (0 <= jx < ncx):
                    ok = False
                if grid.pbc[1]:
                    jy %= ncy
                elif not (0 <= jy < ncy):
                    ok = False
                bases[t, j] = jx * ncy + jy if ok else n_cols
    else:
        ncx = cps[0]
        n_cols = ncx
        offs = [(-1,), (0,), (1,)]
        bases = np.empty((n_cols, 3), dtype=np.int32)
        for ix in range(ncx):
            for j, (dx,) in enumerate(offs):
                jx = ix + dx
                ok = True
                if grid.pbc[0]:
                    jx %= ncx
                elif not (0 <= jx < ncx):
                    ok = False
                bases[ix, j] = jx if ok else n_cols
    return bases, n_cols, len(offs)


def make_slot_edges_fn(
    displacement_fn: Callable,
    cutoff: float,
    grid: "nb._Grid",
    e_cap: int,  # per-row K capacity
    cell_cap: int,  # per-COLUMN capacity
    box: Optional[Sequence[float]] = None,
    interpret: Optional[bool] = None,
):
    """Slot-space variant of ``make_edges_fn`` (single-sample).

    The graph never leaves column-slot order: no scatter back to particle
    order, and the kernel emits geometry (cutoff-normalized rel_disp /
    rel_dist, min-imaged in-VMEM) alongside stencil-candidate indices, so
    the feature chain does no sender-position gather at all.

    Returns ``fn(position, num_particles) -> (aux, overflow)`` with

    * ``aux["cand"]`` (n_slots, K) int32 — stencil-candidate index in
      [0, S*C); fill S*C. Receiver of row ``r`` is slot ``r``; the sender
      of candidate ``c`` lives in slot ``bases[r // C, c // C] * C + c % C``.
    * ``aux["rel_disp"]`` (n_slots, K, dim), ``aux["rel_dist"]``
      (n_slots, K, 1) — receiver-minus-sender, cutoff-normalized, zeros in
      padded slots (the feature contract of case/features.py).
    * ``aux["slot_to_particle"]`` (n_slots + C,) int32 — fill N; the extra
      C rows are the sentinel column (so node-state arrays sized
      n_slots + C can be DMA'd per stencil step without bounds checks).
    * ``aux["particle_to_slot"]`` (N,) int32.
    * ``aux["bases"]`` (n_cols, S) int32 — static stencil table.

    n_slots = n_cols * C is static (from the column grid and capacity).
    """
    assert grid is not None, "slot-space edges need a cell grid"
    dim = len(grid.cells_per_side)
    assert dim in (2, 3), "slot-space kernel supports 2D/3D"
    k_cap = e_cap
    C = cell_cap
    if interpret is None:
        interpret = _interpret_default()

    cps = grid.cells_per_side
    if box is None:
        box = [grid.cell_size[d] * cps[d] for d in range(dim)]

    bases, n_cols, n_steps = stencil_bases(grid)
    n_tiles = n_cols
    cutoff2 = float(cutoff) ** 2
    box_t = tuple(float(b) for b in box)
    pbc_t = tuple(bool(p) for p in grid.pbc)

    cw = n_steps * C
    vmem_estimate = C * cw * 4 * 8 + cw * cw * 2
    assert vmem_estimate < nb._kernel_vmem_budget(), (
        f"column capacity {C} too large for the slot kernel's VMEM budget"
    )
    bases_j = jnp.asarray(bases)

    def edges(position: jnp.ndarray, num_particles):
        n, _ = position.shape
        npart = jnp.asarray(num_particles, jnp.int32)

        coords = nb._cell_coords(position, grid)
        cid = coords[:, 0]
        for d in range(1, dim - 1):
            cid = cid * cps[d] + coords[:, d]
        valid = jnp.arange(n, dtype=jnp.int32) < npart
        cid = jnp.where(valid, cid, n_cols).astype(jnp.int32)

        table_idx, table_pos, col_overflow, part_slot = _table_from_cid(
            cid, position, n_cols, C, tile=512, interpret=interpret
        )

        # sentinel column: invalid idx, far positions
        sentinel = jnp.asarray(1e9, table_pos.dtype)
        idx_f = jnp.concatenate(
            [table_idx, jnp.full((1, C), n, jnp.int32)], axis=0
        )
        pos_f = jnp.concatenate(
            [table_pos, jnp.full((1, C, dim), sentinel, table_pos.dtype)],
            axis=0,
        )

        kernel = partial(
            _scan_kernel,
            cutoff2=cutoff2,
            n_particles=n,
            k_cap=k_cap,
            n_steps=n_steps,
            box=box_t,
            pbc=pbc_t,
            emit="slot",
        )

        def _send_pos_spec(j):
            return pl.BlockSpec(
                (1, dim, C),
                lambda t, b, j=j: (b[t, j], 0, 0),
                memory_space=pltpu.VMEM,
            )

        def _send_idx_spec(j):
            return pl.BlockSpec(
                (1, 1, C),
                lambda t, b, j=j: (b[t, j], 0, 0),
                memory_space=pltpu.VMEM,
            )

        out_tile = pl.BlockSpec(
            (1, C, k_cap), lambda t, b: (t, 0, 0), memory_space=pltpu.VMEM
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, C, dim), lambda t, b: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + [_send_pos_spec(j) for j in range(n_steps)]
            + [_send_idx_spec(j) for j in range(n_steps)],
            out_specs=[out_tile]
            + [out_tile] * (dim + 1)
            + [
                pl.BlockSpec(
                    (1, 1, 1), lambda t, b: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
        )
        pos_f32 = pos_f.astype(jnp.float32)
        pos_t = jnp.transpose(pos_f32, (0, 2, 1))
        idx_r = idx_f.reshape(n_cols + 1, 1, C)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, C, k_cap), jnp.int32),
            ]
            + [
                jax.ShapeDtypeStruct((n_tiles, C, k_cap), jnp.float32)
                for _ in range(dim + 1)
            ]
            + [jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.int32)],
            interpret=interpret,
        )(bases_j, pos_f32, *([pos_t] * n_steps), *([idx_r] * n_steps))

        # pad one sentinel column of rows so every array is ext-sized
        # ((n_cols + 1) * C): downstream kernels then run a uniform grid
        # over n_cols + 1 tiles with no uninitialized state (the sentinel
        # tile's candidates are all-masked)
        cand = jnp.concatenate(
            [
                outs[0].reshape(n_tiles * C, k_cap),
                jnp.full((C, k_cap), cw, jnp.int32),
            ]
        )
        disp = jnp.concatenate(
            [
                jnp.stack(
                    [o.reshape(n_tiles * C, k_cap) for o in outs[1 : 1 + dim]],
                    axis=-1,
                ),
                jnp.zeros((C, k_cap, dim), jnp.float32),
            ]
        )
        dist = jnp.concatenate(
            [
                outs[1 + dim].reshape(n_tiles * C, k_cap, 1),
                jnp.zeros((C, k_cap, 1), jnp.float32),
            ]
        )
        ovf = outs[2 + dim]

        s2p = jnp.concatenate(
            [table_idx.reshape(-1), jnp.full((C,), n, jnp.int32)]
        )
        max_rowcount = jnp.max(ovf)
        overflow = (max_rowcount > k_cap) | col_overflow
        aux = {
            "cand": cand,
            "rel_disp": disp,
            "rel_dist": dist,
            "slot_to_particle": s2p,
            "particle_to_slot": part_slot,
            "bases": bases_j,
        }
        return aux, overflow

    return edges
