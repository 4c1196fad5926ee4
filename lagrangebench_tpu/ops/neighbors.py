"""Fixed-capacity radius-graph neighbor search for TPU.

Replaces the jax-md ``partition.neighbor_list`` stack used by the reference
(reference lagrangebench/case_setup/case.py:120-130) with a TPU-first design:

* **Static shapes everywhere.** The edge buffer is ``(2, E_cap)`` int32 with
  out-of-range fill value ``N`` (one past the last particle), the same
  convention the reference relies on for padded gathers. ``E_cap`` is chosen
  once at ``allocate`` time (host-side) from the actual edge count times a
  capacity multiplier, then rounded up to a lane-aligned multiple of 128.
* **Overflow as data, not shape.** ``update`` is pure and jit-able; if the
  true number of edges exceeds ``E_cap`` the ``did_buffer_overflow`` flag is
  set and the caller re-allocates on the host (same escape hatch as the
  reference's ``did_buffer_overflow`` retry loop).
* **Receiver-major edge order.** Edges come out sorted by receiver, which
  makes downstream ``segment_sum`` aggregations use the
  ``indices_are_sorted`` fast path.

Backends:
    * ``allpairs`` — dense O(N^2) masked search. Perfectly regular compute,
      surprisingly competitive on TPU for small N; also the fallback when the
      box is too small for a 3x3(x3) cell stencil.
    * ``celllist`` — O(N) binned search: bin particles into cells of side
      >= cutoff, look at the 3^dim surrounding cells.
    * ``pallas`` — hand-written TPU kernel (see ``neighbors_pallas.py``).

Self-edges are kept (``mask_self=False`` in the reference) and padded
particles (index >= num_particles) are excluded.
"""

from __future__ import annotations

import math
import warnings
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _kernel_vmem_budget() -> int:
    """Admissibility budget for the pallas scan kernel's live state: 12 MiB
    of the default 16 MiB scoped-VMEM limit (headroom for pipeline
    double-buffering), scaled if the limit is raised (ops.device)."""
    from .device import scale_budget

    return scale_budget(12 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


@struct.dataclass
class NeighborList:
    """Fixed-capacity neighbor list, sparse or dense.

    Attributes:
        idx: sparse format — ``(2, E_cap)`` int32, row 0 = receivers,
            row 1 = senders (same unpacking order as the reference feature
            builder, reference lagrangebench/case_setup/features.py:110).
            Dense format — ``(N, K_cap)`` int32 sender matrix where row i
            holds the neighbors of receiver i. Fill value is ``N`` in both.
        did_buffer_overflow: scalar bool; True if the capacity was exceeded
            and the list must be re-allocated.
        update_fn: static update closure (not a pytree leaf).
    """

    idx: jnp.ndarray
    did_buffer_overflow: jnp.ndarray
    update_fn: Callable = struct.field(pytree_node=False)
    format: str = struct.field(pytree_node=False, default="sparse")
    # slot format: the cell-sorted graph payload (rel_disp/rel_dist,
    # slot<->particle maps, stencil base table) — see
    # neighbors_pallas.make_slot_edges_fn. dense format with
    # emit_geometry: in-kernel rel_disp/rel_dist in particle order.
    aux: Optional[dict] = None

    def update(self, position: jnp.ndarray, num_particles=None, **kwargs):
        """Recompute edges at ``position`` reusing this list's capacity."""
        return self.update_fn(position, self, num_particles=num_particles)

    @property
    def capacity(self) -> int:
        return self.idx.shape[-1]


class NeighborListFns(NamedTuple):
    """allocate/update pair, mirroring the jax-md neighbor_fn interface.

    ``allocate_shell`` additionally exposes capacity sizing without device
    work, for callers that run the first update inside their own jit.
    """

    allocate: Callable
    update: Callable
    allocate_shell: Callable


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _compact_edges(
    mask: jnp.ndarray,
    receivers: jnp.ndarray,
    senders: jnp.ndarray,
    e_cap: int,
    fill: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact masked (receiver, sender) pairs into a (2, e_cap) buffer.

    Uses a cumulative-sum compaction: each true mask element computes its
    output slot; everything else scatters out of bounds and is dropped.
    Input must already be receiver-major for sorted output.

    Returns (idx, n_edges).
    """
    flat_mask = mask.reshape(-1)
    slots = jnp.cumsum(flat_mask, dtype=jnp.int32) - 1
    n_edges = jnp.sum(flat_mask, dtype=jnp.int32)
    # masked-out entries (and overflowing ones) scatter out of range -> dropped
    slots = jnp.where(flat_mask, slots, e_cap)
    out_r = jnp.full((e_cap,), fill, dtype=jnp.int32)
    out_s = jnp.full((e_cap,), fill, dtype=jnp.int32)
    out_r = out_r.at[slots].set(receivers.reshape(-1).astype(jnp.int32), mode="drop")
    out_s = out_s.at[slots].set(senders.reshape(-1).astype(jnp.int32), mode="drop")
    return jnp.stack([out_r, out_s]), n_edges


def _pair_mask(
    disp2: jnp.ndarray,
    cutoff: float,
    receivers: jnp.ndarray,
    senders: jnp.ndarray,
    num_particles,
    n_max: int,
) -> jnp.ndarray:
    """Radius + validity mask for candidate pairs."""
    mask = disp2 <= (cutoff * cutoff)
    mask &= senders < jnp.minimum(num_particles, n_max)
    mask &= receivers < jnp.minimum(num_particles, n_max)
    return mask


# ---------------------------------------------------------------------------
# all-pairs backend
# ---------------------------------------------------------------------------


def _allpairs_edges(
    position: jnp.ndarray,
    num_particles,
    displacement_fn: Callable,
    cutoff: float,
    e_cap: int,
):
    n = position.shape[0]
    disp = jax.vmap(
        jax.vmap(displacement_fn, in_axes=(None, 0)), in_axes=(0, None)
    )(position, position)
    disp2 = jnp.sum(disp * disp, axis=-1)  # (N, N)
    receivers = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    senders = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = _pair_mask(disp2, cutoff, receivers, senders, num_particles, n)
    idx, n_edges = _compact_edges(mask, receivers, senders, e_cap, fill=n)
    return idx, n_edges


# ---------------------------------------------------------------------------
# cell-list backend
# ---------------------------------------------------------------------------


class _Grid(NamedTuple):
    """Static cell-grid geometry (computed host-side at allocate)."""

    cells_per_side: Tuple[int, ...]
    cell_size: Tuple[float, ...]
    num_cells: int
    offsets: Tuple[Tuple[int, ...], ...]  # the 3^dim stencil
    pbc: Tuple[bool, ...]


def make_grid(box: Sequence[float], cutoff: float, pbc: Sequence[bool]) -> Optional[_Grid]:
    """Build grid geometry; None if the box is too small for a cell list.

    A periodic dimension needs >= 3 cells, otherwise the +/-1 stencil wraps
    onto the same cell and produces duplicate edges.
    """
    box = [float(b) for b in np.asarray(box).reshape(-1)]
    dim = len(box)
    cells_per_side = [max(int(math.floor(b / cutoff)), 1) for b in box]
    if any(c < 3 and p for c, p in zip(cells_per_side, pbc)):
        return None
    if all(c < 3 for c in cells_per_side):
        return None  # fewer candidate cells than the whole box: use allpairs
    cell_size = [b / c for b, c in zip(box, cells_per_side)]
    offsets = []
    ranges = [(-1, 0, 1)] * dim
    def rec(i, acc):
        if i == dim:
            offsets.append(tuple(acc))
            return
        for o in ranges[i]:
            rec(i + 1, acc + [o])
    rec(0, [])
    return _Grid(
        cells_per_side=tuple(cells_per_side),
        cell_size=tuple(cell_size),
        num_cells=int(np.prod(cells_per_side)),
        offsets=tuple(offsets),
        pbc=tuple(bool(p) for p in pbc),
    )


def _cell_coords(position: jnp.ndarray, grid: _Grid) -> jnp.ndarray:
    """Integer cell coordinates per particle, clipped into the grid."""
    size = jnp.asarray(grid.cell_size, dtype=position.dtype)
    cps = jnp.asarray(grid.cells_per_side, dtype=jnp.int32)
    coords = jnp.floor(position / size).astype(jnp.int32)
    return jnp.clip(coords, 0, cps - 1)


def _flatten_coords(coords: jnp.ndarray, grid: _Grid) -> jnp.ndarray:
    flat = coords[..., 0]
    for d in range(1, len(grid.cells_per_side)):
        flat = flat * grid.cells_per_side[d] + coords[..., d]
    return flat


def _build_cell_table(
    position: jnp.ndarray, num_particles, grid: _Grid, cell_cap: int
):
    """Bin particles into (num_cells, cell_cap) tables of indices AND
    positions.

    The position table lets the candidate scan gather 27 contiguous
    (cell_cap, dim) rows per particle instead of S*C random point gathers —
    much friendlier to the TPU memory system. Invalid index slots hold
    ``N``; invalid position slots hold a far-away sentinel so the distance
    filter rejects them naturally.

    Returns (table_idx, table_pos, cell_overflowed, coords).
    """
    n, dim = position.shape
    coords = _cell_coords(position, grid)
    cid = _flatten_coords(coords, grid)
    valid = jnp.arange(n, dtype=jnp.int32) < num_particles
    cid = jnp.where(valid, cid, grid.num_cells)  # dump padding past the grid

    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    # rank of each particle within its cell
    rank = jnp.arange(n, dtype=jnp.int32) - jnp.searchsorted(
        cid_sorted, cid_sorted, side="left"
    ).astype(jnp.int32)
    overflow = jnp.any((rank >= cell_cap) & (cid_sorted < grid.num_cells))

    slots = cid_sorted * cell_cap + jnp.minimum(rank, cell_cap - 1)
    slots = jnp.where(rank < cell_cap, slots, grid.num_cells * cell_cap)
    table = jnp.full((grid.num_cells * cell_cap,), n, dtype=jnp.int32)
    table = table.at[slots].set(order.astype(jnp.int32), mode="drop")

    sentinel = jnp.asarray(1e9, position.dtype)
    table_pos = jnp.full(
        (grid.num_cells * cell_cap, dim), sentinel, dtype=position.dtype
    )
    table_pos = table_pos.at[slots].set(position[order], mode="drop")

    return (
        table.reshape(grid.num_cells, cell_cap),
        table_pos.reshape(grid.num_cells, cell_cap, dim),
        overflow,
        coords,
    )


def _dense_select(
    cand: jnp.ndarray,
    mask: jnp.ndarray,
    k_cap: int,
    n: int,
):
    """Pick up to k_cap valid candidates per row via top_k (scatter-free).

    Args:
        cand: (N, C) candidate sender indices (fill = n).
        mask: (N, C) validity.
        k_cap: per-row output capacity.
        n: number of particles (fill value).

    Returns (senders (N, k_cap), row_overflow ()).
    """
    c = cand.shape[1]
    if k_cap >= c:
        # capacity covers every candidate slot: no selection needed
        senders = jnp.where(mask, cand, n)
        if k_cap > c:
            senders = jnp.pad(
                senders, ((0, 0), (0, k_cap - c)), constant_values=n
            )
        return senders.astype(jnp.int32), jnp.asarray(False)

    # rank-compaction via a one-hot matmul: each valid candidate lands in
    # output slot rank = (exclusive count of valid candidates before it).
    # On TPU this is a batched (C x K) MXU contraction — ~2x faster than
    # top_k and with deterministic in-order packing. float32 is exact for
    # indices < 2^24.
    slot = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    onehot = (
        (slot[..., None] == jnp.arange(k_cap, dtype=jnp.int32)[None, None, :])
        & mask[..., None]
    ).astype(jnp.float32)
    senders = jnp.einsum("nc,nck->nk", cand.astype(jnp.float32), onehot)
    filled = jnp.sum(onehot, axis=1) > 0
    senders = jnp.where(filled, senders.astype(jnp.int32), n)
    overflow = jnp.any(jnp.sum(mask, axis=1) > k_cap)
    return senders, overflow


def _celllist_candidates(
    position: jnp.ndarray,
    num_particles,
    displacement_fn: Callable,
    cutoff: float,
    grid: _Grid,
    cell_cap: int,
):
    """Shared cell-list candidate generation: (cand, mask, cell_overflow).

    cand: (N, S*C) candidate senders; mask: within-cutoff + validity.
    """
    n, dim = position.shape
    table, table_pos, cell_overflow, coords = _build_cell_table(
        position, num_particles, grid, cell_cap
    )

    cps = jnp.asarray(grid.cells_per_side, dtype=jnp.int32)
    offsets = jnp.asarray(grid.offsets, dtype=jnp.int32)  # (S, dim)
    pbc = jnp.asarray(grid.pbc)

    ncoords = coords[:, None, :] + offsets[None, :, :]  # (N, S, dim)
    wrapped = jnp.mod(ncoords, cps)
    in_range = jnp.all(
        pbc[None, None, :] | ((ncoords >= 0) & (ncoords < cps)), axis=-1
    )
    ncell = _flatten_coords(wrapped, grid)  # (N, S)

    cand = table[ncell]  # (N, S, C)
    cand = jnp.where(in_range[..., None], cand, n)
    # candidate positions come from the cell table: 27 contiguous
    # (C, dim) row gathers per particle instead of S*C point gathers
    cand_pos = table_pos[ncell]  # (N, S, C, dim)

    disp = jax.vmap(
        lambda ri, cj: jax.vmap(jax.vmap(displacement_fn, (None, 0)), (None, 0))(ri, cj)
    )(position, cand_pos)
    disp2 = jnp.sum(disp * disp, axis=-1)

    receivers = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    mask = _pair_mask(disp2, cutoff, receivers, cand, num_particles, n)
    # the index mask also rejects sentinel position slots
    mask &= cand < n

    s, c = cand.shape[1], cand.shape[2]
    return cand.reshape(n, s * c), mask.reshape(n, s * c), cell_overflow


def _celllist_dense(
    position: jnp.ndarray,
    num_particles,
    displacement_fn: Callable,
    cutoff: float,
    k_cap: int,
    grid: _Grid,
    cell_cap: int,
):
    """Dense (N, K) neighbor matrix from the cell list — no compaction."""
    n = position.shape[0]
    cand, mask, cell_overflow = _celllist_candidates(
        position, num_particles, displacement_fn, cutoff, grid, cell_cap
    )
    senders, row_overflow = _dense_select(cand, mask, k_cap, n)
    return senders, row_overflow | cell_overflow


def _allpairs_dense(
    position: jnp.ndarray,
    num_particles,
    displacement_fn: Callable,
    cutoff: float,
    k_cap: int,
):
    """Dense (N, K) neighbor matrix from an all-pairs scan (small systems)."""
    n = position.shape[0]
    disp = jax.vmap(
        jax.vmap(displacement_fn, in_axes=(None, 0)), in_axes=(0, None)
    )(position, position)
    disp2 = jnp.sum(disp * disp, axis=-1)
    receivers = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    senders = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = _pair_mask(disp2, cutoff, receivers, senders, num_particles, n)
    return _dense_select(senders, mask, k_cap, n)


def _celllist_edges(
    position: jnp.ndarray,
    num_particles,
    displacement_fn: Callable,
    cutoff: float,
    e_cap: int,
    grid: _Grid,
    cell_cap: int,
):
    n = position.shape[0]
    cand, mask, cell_overflow = _celllist_candidates(
        position, num_particles, displacement_fn, cutoff, grid, cell_cap
    )
    receivers = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    idx, n_edges = _compact_edges(mask, receivers, cand, e_cap, fill=n)
    n_edges = jnp.where(cell_overflow, e_cap + 1, n_edges)  # force realloc
    return idx, n_edges


# ---------------------------------------------------------------------------
# public factory
# ---------------------------------------------------------------------------


def neighbor_list(
    displacement_fn: Callable,
    box,
    r_cutoff: float,
    backend: str = "celllist",
    capacity_multiplier: float = 1.25,
    num_particles_max: Optional[int] = None,
    pbc: Optional[Sequence[bool]] = None,
    mask_self: bool = False,
    format: str = "sparse",
    emit_geometry: bool = False,
) -> NeighborListFns:
    """Create allocate/update functions for a fixed-capacity radius graph.

    API mirrors the reference's neighbor_fn (jax-md style): ``allocate`` runs
    host-side and sizes the buffers from the given sample; ``update`` is pure
    and jit-able at fixed capacity, flagging overflow instead of resizing.

    Args:
        displacement_fn: pairwise displacement respecting boundaries.
        box: box side lengths, shape (dim,).
        r_cutoff: connectivity radius.
        backend: "allpairs" | "celllist" | "pallas".
        capacity_multiplier: headroom factor on edge/cell capacities.
        num_particles_max: maximum particle count (for documentation only;
            buffers are sized from the sample's first axis).
        pbc: per-dimension periodic flags (defaults to all-periodic).
        mask_self: if True, drop i==i self edges (reference uses False).
        format: "sparse" (2, E) compacted edges — reference-compatible —
            or "dense" (N, K) per-receiver sender matrix — the TPU fast
            path: built by per-row top_k (no scatter/compaction) and
            aggregated by masked reshape-sum in the models — or "slot":
            the cell-sorted graph (pallas backend only, single-sample):
            edges, geometry and node maps stay in column-slot order so the
            fused processor reads sender state from stencil-column slabs
            instead of an (N, K, latent) HBM gather.
        emit_geometry: dense+pallas only — the NL kernel additionally
            emits cutoff-normalized edge geometry (rel_disp/rel_dist,
            min-imaged in VMEM) and the update's NeighborList carries it
            as ``aux``; the feature chain (case/features.py) then skips
            its sender-position gather. Ignored (geometry-free lists)
            when an allocation falls back to a non-pallas backend.
    """
    assert format in ("sparse", "dense", "slot"), format
    assert not mask_self, "reference semantics keep self-edges (mask_self=False)"
    if format == "slot":
        backend = "pallas"
    box = np.asarray(box, dtype=np.float64).reshape(-1)
    dim = box.shape[0]
    if pbc is None:
        pbc = [True] * dim
    pbc = list(np.asarray(pbc).reshape(-1).astype(bool))

    cutoff = float(r_cutoff)

    grid = make_grid(box, cutoff, pbc) if backend in ("celllist", "pallas") else None
    if backend in ("celllist", "pallas") and grid is None:
        if format == "slot":
            raise ValueError(
                "slot format needs a cell grid (box too small for a "
                "3-cell stencil); use dense format"
            )
        backend = "allpairs"  # box too small for a 3-cell stencil

    if backend == "pallas":
        assert format in ("dense", "slot"), (
            "the pallas neighbor kernel is dense/slot-only"
        )
        from . import neighbors_pallas  # deferred: only needed on TPU

        edges_fn_factory = partial(
            neighbors_pallas.make_edges_fn,
            displacement_fn=displacement_fn,
            cutoff=cutoff,
            box=[float(b) for b in box],
        )
    else:
        edges_fn_factory = None

    # displacement is applied all-or-nothing across dims, matching the
    # reference's space selection (periodic if ANY dim is periodic)
    periodic_all = any(pbc)

    def _count_and_caps(
        position,
        num_particles,
        capacity_boost: float = 1.0,
        backend_override: Optional[str] = None,
    ) -> Tuple[int, int, object, str]:
        """Host-side exact edge count and cell capacity for this sample.

        Host-only (no device ops): on remote-compiled TPU backends every
        eager jax op pays a compile round-trip. Uses the native C++ cell
        list when available (O(N)), else chunked numpy (O(N^2)).

        Returns the EFFECTIVE backend for this allocation as well: a
        pallas-inadmissible sample (column occupancy beyond the kernel's
        VMEM budget) falls back to celllist for THIS allocation only —
        later allocations with admissible occupancy get the fast kernel
        back.
        """
        eff_backend = backend if backend_override is None else backend_override
        # escalation retries raise the effective multiplier BEFORE the
        # pallas VMEM-admissibility search, so a boost that no longer fits
        # the kernel budget falls back to celllist instead of asserting in
        # the kernel factory
        mult = capacity_multiplier * capacity_boost
        pos = np.asarray(position, dtype=np.float64)
        n = pos.shape[0]
        npart = n if num_particles is None else int(num_particles)
        pos_valid = pos[:npart]

        from . import neighbors_host

        if neighbors_host.available():
            count = neighbors_host.count_edges(
                pos_valid, box, periodic_all, cutoff
            )
            max_k = 1
            if format in ("dense", "slot"):
                idx, _ = neighbors_host.build_edges(
                    pos_valid, box, periodic_all, cutoff, e_cap=count
                )
                per_row = np.bincount(idx[0], minlength=npart)
                max_k = int(per_row.max()) if per_row.size else 1
        else:
            # chunked numpy fallback bounding the (chunk, N, dim) temporary
            count = 0
            max_k = 1
            chunk = 1024
            cutoff2 = cutoff * cutoff
            for start in range(0, npart, chunk):
                rows = pos_valid[start : start + chunk]
                disp = rows[:, None, :] - pos_valid[None, :, :]
                if periodic_all:
                    disp = np.mod(disp + box * 0.5, box) - box * 0.5
                within = np.sum(disp * disp, axis=-1) <= cutoff2
                count += int(within.sum())
                if format in ("dense", "slot") and within.size:
                    max_k = max(max_k, int(within.sum(axis=1).max()))

        col_grid = None
        if grid is not None:
            size = np.asarray(grid.cell_size)
            cps = np.asarray(grid.cells_per_side)
            coords = np.clip(
                np.floor(pos_valid / size).astype(np.int64), 0, cps - 1
            )
            if eff_backend == "pallas":
                # the pallas kernel bins by COLUMN (first dim-1 cell axes;
                # the last axis is handled by in-kernel min-image), so its
                # capacity is the max column occupancy. Column cell size is
                # a free parameter (anything >= cutoff): search a few
                # coarsenings and keep the one minimizing the kernel's pack
                # work, n_cols * cap^2 — coarser cells smooth out max-vs-
                # mean occupancy lumps at the cost of more false candidates
                best = None
                base_nc = [
                    max(int(math.floor(float(b) / cutoff)), 1)
                    for b in box[:-1]
                ]
                for f in (1.0, 0.75, 0.6, 0.5, 0.4, 0.33):
                    ncs = [max(int(round(nc * f)), 1) for nc in base_nc]
                    if any(
                        nc < 3 and p for nc, p in zip(ncs, pbc[:-1])
                    ) or any(nc < 1 for nc in ncs):
                        continue
                    sizes = [float(b) / nc for b, nc in zip(box[:-1], ncs)]
                    if any(s < cutoff for s in sizes):
                        continue
                    cid = np.zeros(len(pos_valid), dtype=np.int64)
                    n_bins = 1
                    for d, (nc, s) in enumerate(zip(ncs, sizes)):
                        c = np.clip(
                            np.floor(pos_valid[:, d] / s).astype(np.int64),
                            0, nc - 1,
                        )
                        cid = cid * nc + c
                        n_bins *= nc
                    occ = np.bincount(cid, minlength=n_bins)
                    max_occ = int(occ.max()) if occ.size else 1
                    cap = max(_round_up(max_occ * mult, 8), 8)
                    # the scan kernel's live VMEM must fit the budget.
                    # Two kernel regimes (see neighbors_pallas): the
                    # monolithic one-shot stencil (temporaries (C, S*C) +
                    # the (S*C, S*C) pair triangle) and, for the dense
                    # format, the STREAMED stencil (one column per grid
                    # step: (C, C) temporaries + resident (C, K) output
                    # blocks) — an S-fold smaller footprint that keeps
                    # large-N systems on the pallas path. Streamed pack
                    # work is identical; its per-step accumulation adds
                    # overhead, so a monolithic-admissible grid is
                    # preferred via a modest cost penalty on streamed.
                    from . import neighbors_pallas as nlp

                    mono_ok = (
                        nlp.vmem_monolithic(cap, dim, emit_geometry)
                        < _kernel_vmem_budget()
                    )
                    if format == "dense":
                        k_probe = max(_round_up(max_k * mult, 8), 8)
                        str_ok = (
                            nlp.vmem_streamed(
                                cap, dim, k_probe, emit_geometry
                            )
                            < _kernel_vmem_budget()
                        )
                    else:
                        # the slot-format kernel has no streamed variant
                        str_ok = False
                    if not (mono_ok or str_ok):
                        continue
                    cost = n_bins * cap * cap
                    if not mono_ok:
                        cost = int(cost * 1.25)
                    if best is None or cost < best[0]:
                        best = (cost, ncs, cap)
                if best is None:
                    # no column grid fits the kernel's VMEM budget (not
                    # even the streamed dense variant): fall back to the
                    # XLA celllist backend for this allocation
                    warnings.warn(
                        "pallas neighbor backend: column occupancy too "
                        "large for the kernel's VMEM budget at this system "
                        "size; falling back to the celllist backend"
                    )
                    eff_backend = "celllist"
                    cid = coords[:, 0]
                    for d in range(1, len(grid.cells_per_side)):
                        cid = cid * grid.cells_per_side[d] + coords[:, d]
                    occ = np.bincount(cid, minlength=grid.num_cells)
                    max_occ = int(occ.max()) if occ.size else 1
                    cell_cap = max(
                        _round_up(max_occ * mult, 4), 4
                    )
                else:
                    _, ncs, cell_cap = best
                    col_sizes = [
                        float(b) / nc for b, nc in zip(box[:-1], ncs)
                    ]
                    col_grid = _Grid(
                        cells_per_side=tuple(ncs) + (1,),
                        cell_size=tuple(col_sizes) + (float(box[-1]),),
                        num_cells=int(np.prod(ncs)),
                        offsets=grid.offsets,
                        pbc=grid.pbc,
                    )
            else:
                cid = coords[:, 0]
                for d in range(1, len(grid.cells_per_side)):
                    cid = cid * grid.cells_per_side[d] + coords[:, d]
                occ = np.bincount(cid, minlength=grid.num_cells)
                max_occ = int(occ.max()) if occ.size else 1
                cell_cap = max(_round_up(max_occ * mult, 4), 4)
        else:
            cell_cap = 0

        e_cap = max(_round_up(max(count, 1) * mult, 128), 128)
        if format in ("dense", "slot"):
            # pallas (the fused-processor pairing): multiple of 8 keeps the
            # K axis sublane-aligned — the fused MP kernels reshape
            # (t, K, f) -> (t*K, f), which is free only at aligned K
            # (misaligned K forces a Mosaic relayout; measured 1.8x slower
            # whole-rollout at K=20 vs K=24 on the 2D bench). XLA backends
            # pay per slot with no alignment win, so they keep the tighter
            # rounding.
            k_align = 8 if eff_backend == "pallas" else 4
            k_cap = max(
                _round_up(max(max_k, 1) * mult, k_align),
                k_align,
            )
            return k_cap, cell_cap, col_grid, eff_backend
        return e_cap, cell_cap, col_grid, eff_backend

    def _make_update(
        e_cap: int, cell_cap: int, col_grid=None, eff_backend=None
    ) -> Callable:
        """e_cap is the per-row K capacity in dense format."""
        if eff_backend is None:
            eff_backend = backend
        if format == "slot":
            if eff_backend != "pallas" or col_grid is None:
                raise RuntimeError(
                    "slot format: no admissible column grid at this system "
                    "size (the pallas kernel's VMEM budget was exceeded); "
                    "use dense format"
                )
            from . import neighbors_pallas

            slot_edges = neighbors_pallas.make_slot_edges_fn(
                displacement_fn=displacement_fn,
                cutoff=cutoff,
                grid=col_grid,
                e_cap=e_cap,
                cell_cap=cell_cap,
                box=[float(b) for b in box],
            )

            @jax.jit
            def _update_slot_jit(position, prev_overflow, num_particles):
                aux, overflow = slot_edges(position, num_particles)
                return aux, overflow | prev_overflow

            def update(position, neighbors=None, num_particles=None, **kw):
                n = position.shape[0]
                npart = n if num_particles is None else num_particles
                prev = (
                    neighbors.did_buffer_overflow
                    if neighbors is not None
                    else jnp.asarray(False)
                )
                aux, overflow = _update_slot_jit(position, prev, npart)
                cand = aux.pop("cand")
                return NeighborList(
                    idx=cand,
                    did_buffer_overflow=overflow,
                    update_fn=update,
                    format="slot",
                    aux=aux,
                )

            return update
        if format == "dense":
            with_geometry = emit_geometry and eff_backend == "pallas"
            if eff_backend == "pallas":
                edges = edges_fn_factory(
                    e_cap=e_cap, cell_cap=cell_cap, grid=col_grid,
                    emit_geometry=emit_geometry,
                )
            elif eff_backend == "celllist":
                def edges(position, num_particles):
                    return _celllist_dense(
                        position, num_particles, displacement_fn, cutoff,
                        e_cap, grid, cell_cap,
                    )
            else:
                def edges(position, num_particles):
                    return _allpairs_dense(
                        position, num_particles, displacement_fn, cutoff, e_cap
                    )

            @jax.jit
            def _update_jit(position, prev_overflow, num_particles):
                if with_geometry:
                    idx, geom, overflow = edges(position, num_particles)
                    d = geom.shape[-1] - 1
                    aux = {
                        "rel_disp": geom[..., :d],
                        "rel_dist": geom[..., d:],
                    }
                else:
                    idx, overflow = edges(position, num_particles)
                    aux = None
                return idx, aux, overflow | prev_overflow

        else:
            if eff_backend == "allpairs":
                def edges(position, num_particles):
                    return _allpairs_edges(
                        position, num_particles, displacement_fn, cutoff, e_cap
                    )
            elif eff_backend == "celllist":
                def edges(position, num_particles):
                    return _celllist_edges(
                        position,
                        num_particles,
                        displacement_fn,
                        cutoff,
                        e_cap,
                        grid,
                        cell_cap,
                    )
            else:  # pallas
                pallas_edges = edges_fn_factory(
                    e_cap=e_cap, cell_cap=cell_cap, grid=col_grid
                )

                def edges(position, num_particles):
                    return pallas_edges(position, num_particles)

            @jax.jit
            def _update_jit(position, prev_overflow, num_particles):
                idx, n_edges = edges(position, num_particles)
                overflow = (n_edges > e_cap) | prev_overflow
                return idx, None, overflow

        def update(position, neighbors=None, num_particles=None, **kwargs):
            n = position.shape[0]
            npart = n if num_particles is None else num_particles
            prev = (
                neighbors.did_buffer_overflow
                if neighbors is not None
                else jnp.asarray(False)
            )
            idx, aux, overflow = _update_jit(position, prev, npart)
            return NeighborList(
                idx=idx,
                did_buffer_overflow=overflow,
                update_fn=update,
                format=format,
                aux=aux,
            )

        return update

    def allocate_shell(
        position,
        num_particles=None,
        capacity_boost: float = 1.0,
        backend_override: Optional[str] = None,
        **kwargs,
    ) -> NeighborList:
        """Size buffers from this sample WITHOUT building the edge list.

        Capacity sizing is pure numpy (host); the returned list carries an
        all-padding idx buffer and the jitted update closure — callers run
        ``update`` (usually inside their own jit) to fill it. This keeps TPU
        allocation free of eager device ops.

        ``capacity_boost`` scales the buffer beyond the standard multiplier —
        used by rollout retry loops to escalate after an overflow.
        """
        e_cap, cell_cap, col_grid, eff_backend = _count_and_caps(
            position, num_particles, capacity_boost, backend_override
        )
        update = _make_update(e_cap, cell_cap, col_grid, eff_backend)
        n = position.shape[0]
        aux = None
        if format == "slot":
            # placeholder with the exact shapes/dtypes the update emits, so
            # a shell can stand in for an updated list inside jit traces
            from . import neighbors_pallas

            bases, n_cols, _ = neighbors_pallas.stencil_bases(col_grid)
            n_ext = (n_cols + 1) * cell_cap
            dim_ = position.shape[-1]
            idx = jnp.full(
                (n_ext, e_cap), bases.shape[1] * cell_cap, dtype=jnp.int32
            )
            aux = {
                "rel_disp": jnp.zeros((n_ext, e_cap, dim_), jnp.float32),
                "rel_dist": jnp.zeros((n_ext, e_cap, 1), jnp.float32),
                "slot_to_particle": jnp.full((n_ext,), n, jnp.int32),
                "particle_to_slot": jnp.zeros((n,), jnp.int32),
                "bases": jnp.asarray(bases),
            }
        elif format == "dense":
            idx = jnp.full((n, e_cap), n, dtype=jnp.int32)
            if emit_geometry and eff_backend == "pallas":
                # match the update's pytree structure (see slot note above)
                dim_ = position.shape[-1]
                aux = {
                    "rel_disp": jnp.zeros((n, e_cap, dim_), jnp.float32),
                    "rel_dist": jnp.zeros((n, e_cap, 1), jnp.float32),
                }
        else:
            idx = jnp.full((2, e_cap), n, dtype=jnp.int32)
        return NeighborList(
            idx=idx,
            did_buffer_overflow=jnp.asarray(False),
            update_fn=update,
            format=format,
            aux=aux,
        )

    def allocate(
        position, num_particles=None, capacity_boost: float = 1.0, **kwargs
    ) -> NeighborList:
        """Size buffers from this sample and build the list.

        The pallas VMEM-admissibility check is a host-side ESTIMATE of the
        kernel's scoped-VMEM footprint; the compiler's own accounting can
        disagree for unusual shapes (fat cutoffs -> few, huge columns). If
        the first update compile dies with a VMEM OOM, rebuild on the XLA
        celllist backend for this allocation instead of crashing — the same
        degradation the estimator applies when it predicts inadmissibility.
        """
        shell = allocate_shell(
            position, num_particles=num_particles, capacity_boost=capacity_boost
        )
        try:
            return shell.update_fn(
                jnp.asarray(position), None, num_particles=num_particles
            )
        except Exception as e:  # noqa: BLE001 — filtered to VMEM OOM below
            msg = str(e).lower()
            if "vmem" not in msg or backend != "pallas" or format == "slot":
                raise
            warnings.warn(
                "pallas neighbor kernel exceeded the compiler's scoped-VMEM "
                "limit (the host-side admissibility estimate was "
                "optimistic); falling back to the celllist backend for "
                "this allocation"
            )
            shell = allocate_shell(
                position,
                num_particles=num_particles,
                capacity_boost=capacity_boost,
                backend_override="celllist",
            )
            return shell.update_fn(
                jnp.asarray(position), None, num_particles=num_particles
            )

    def update(position, neighbors: NeighborList, num_particles=None, **kwargs):
        return neighbors.update_fn(position, neighbors, num_particles=num_particles)

    return NeighborListFns(
        allocate=allocate, update=update, allocate_shell=allocate_shell
    )
