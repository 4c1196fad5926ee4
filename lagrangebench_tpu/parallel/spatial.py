"""Spatial (particle-axis) sharding with halo exchange.

The SP/CP analogue for particle simulations (SURVEY §2.3): the box is
split into slabs along x, each device owns the particles of one slab, and
message passing exchanges only the *projected* sender states of the two
neighboring slabs per MP step — two ring ``ppermute``s of an (N_loc, H)
block over ICI, no gather across devices. This is what scales the
workload past one chip's HBM for 100k+ particle cases: positions, edge
states (N_loc, K, H) and node states never leave their device.

Round-3 rework of the v1 proof-of-concept:

* the per-device neighbor search is a CELL-TABLE scan (bin the local +
  halo candidates into a (cells, C) table, test the 3^dim stencil) —
  O(N_loc · S·C), not the v1 dense (N_loc, 3 N_loc) matrix, so the
  >100k-particle regime this component exists for actually fits;
* the model math is NOT hand-copied: the standard flax GNS parameter tree
  is converted once with :func:`models.gns.fused_params_from_standard`
  and every MP step runs through :func:`ops.fused_mp.gns_mp_step_reference`
  — the same mirror the fused Pallas processor is parity-tested against —
  with encoder/decoder via :func:`models.utils.apply_mlp_params`;
* a full autoregressive ROLLOUT (`build_spatial_gns_rollout` +
  :func:`spatial_rollout`): chunked on-device `lax.scan` with host-side
  retries on the two in-band faults — neighbor-capacity overflow
  (escalate caps) and ownership drift (re-partition at the current
  positions when ``2·max_drift + cutoff`` approaches the slab width);
* reachable from the CLI: ``parallel.spatial: <n_devices>`` runs
  spatially-sharded inference (runner.py) for every message-passing
  family (GNS, PaiNN, SEGNN, EGNN) — the slab geometry/NL/halo machinery
  (`_SpatialBase`) is model-agnostic: GNS/PaiNN contribute functional
  forms over the shared fused-kernel mirrors, SEGNN/EGNN apply their flax
  submodules directly on their parameter subtrees (halo-extended sender
  arrays + explicit edge masks; EGNN additionally reverse-halos its
  sender-directed position scatter);
* TRAINING through the halo exchange (`build_spatial_gns_train_step`):
  per-device grads of the global masked-MSE loss — sender-state
  cotangents return home via the ``ppermute`` transpose — assembled with
  one psum over the replicated parameters; 8-device grads match the
  1-device computation exactly (tests/test_spatial.py). The full loop is
  CLI-reachable: ``mode=train parallel.spatial: N`` runs
  :func:`train_spatial` (2D ``(data, space)`` mesh when
  ``train.batch_size > 1``), writing STANDARD-layout checkpoints that
  `infer`, `infer_spatial` and the reference exporter consume unchanged.

Partitioning (``n_dev >= 3``): each device sees candidates from its own
slab plus both neighbor slabs, placed in a LOCAL frame
``rel_x = base_seg + centered_mod(x - owner·slab_w)`` (plain differences
in x — the pre-shifted copies make x effectively free — min-image on the
other axes). ``n_dev <= 2`` degenerates to the fully-periodic global
domain on each device (no self-image duplicates).
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.gns import fused_params_from_standard
from ..models.painn import painn_fused_params_from_standard
from ..ops import painn_msg
from ..models.utils import apply_dense_params, apply_mlp_params
from ..ops import fused_mp
from ..ops import neighbors as nb
from .mesh import DATA_AXIS, SPATIAL_AXIS


def _require_periodic(metadata, where: str) -> None:
    """The spatial component's domain of validity is fully periodic boxes:
    the slab partition wraps positions through the box (``spatial_partition``)
    and the local grids assume periodic images on every axis. Wall-bounded
    datasets (LDC / DAM / WaterDrop) must run the standard single-device
    path (reference boundary dispatch:
    lagrangebench/case_setup/case.py:104-108)."""
    pbc = list(metadata.get("periodic_boundary_conditions", []))
    if not (pbc and all(bool(p) for p in pbc)):
        raise ValueError(
            f"{where}: parallel.spatial requires a fully periodic box, but "
            f"the dataset has periodic_boundary_conditions={pbc}. "
            f"Wall-bounded datasets wrap through walls under the slab "
            f"partition — run them on the standard path (parallel.spatial=0)."
        )


def spatial_partition(
    pos: np.ndarray,  # (N, T, dim) position window
    ptype: np.ndarray,  # (N,)
    n_dev: int,
    box_x: float,
    pad_multiple: int = 8,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side slab partition along x by the most recent frame.

    Returns (pos_sh (n_dev, N_loc, T, dim), ptype_sh (n_dev, N_loc) with
    -1 padding, counts (n_dev,), order (N,) original indices in slab-sorted
    order) — ``order[:counts.cumsum()]`` recovers the global permutation.
    """
    pos = np.asarray(pos)
    ptype = np.asarray(ptype)
    n, t, dim = pos.shape
    x = np.mod(pos[:, -1, 0], box_x)
    slab = np.clip((x / (box_x / n_dev)).astype(np.int64), 0, n_dev - 1)
    order = np.argsort(slab, kind="stable")
    counts = np.bincount(slab, minlength=n_dev)
    n_loc = int(-(-max(int(counts.max()), 1) // pad_multiple) * pad_multiple)

    pos_sh = np.zeros((n_dev, n_loc, t, dim), pos.dtype)
    ptype_sh = np.full((n_dev, n_loc), -1, ptype.dtype)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        sel = order[start : start + c]
        pos_sh[d, :c] = pos[sel]
        ptype_sh[d, :c] = ptype[sel]
        start += c
    return pos_sh, ptype_sh, counts.astype(np.int32), order


def spatial_caps(
    pos: np.ndarray,  # (N, dim) most recent frame
    box,
    cutoff: float,
    multiplier: float = 1.25,
) -> Tuple[int, int]:
    """Host-side capacity sizing: (k_cap, cell_cap) for the slab NL."""
    pos = np.mod(np.asarray(pos, np.float64), np.asarray(box))
    box = np.asarray(box, np.float64)
    dim = pos.shape[1]
    ncs = [max(int(np.floor(b / cutoff)), 1) for b in box]
    sizes = box / np.asarray(ncs)
    coords = np.clip(
        (pos / sizes).astype(np.int64), 0, np.asarray(ncs) - 1
    )
    cid = coords[:, 0]
    for d in range(1, dim):
        cid = cid * ncs[d] + coords[:, d]
    occ = np.bincount(cid, minlength=int(np.prod(ncs)))
    max_occ = int(occ.max()) if occ.size else 1
    cell_cap = max(-(-int(max_occ * multiplier) // 8) * 8, 8)
    # neighbor count bound: particles within the cutoff sphere; estimate
    # from the densest cell (a cell is >= one cutoff wide)
    from ..ops import neighbors_host

    if neighbors_host.available() and pos.shape[0] <= 200_000:
        count = neighbors_host.build_edges(
            pos, box, True, cutoff,
            e_cap=neighbors_host.count_edges(pos, box, True, cutoff),
        )[0]
        per_row = np.bincount(count[0], minlength=pos.shape[0])
        max_k = int(per_row.max()) if per_row.size else 1
    else:
        max_k = int(max_occ * 4.2 / 3 + 1)  # sphere vs cube volume ratio
    k_cap = max(-(-int(max_k * multiplier) // 8) * 8, 8)
    return k_cap, cell_cap


def _masked_cell_table(
    position: jnp.ndarray,  # (M, dim) in the local frame
    valid: jnp.ndarray,  # (M,) bool
    grid: nb._Grid,
    cell_cap: int,
):
    """Bin valid rows into (num_cells, C) index+position tables."""
    m, dim = position.shape
    coords = nb._cell_coords(position, grid)
    cid = nb._flatten_coords(coords, grid)
    cid = jnp.where(valid, cid, grid.num_cells)

    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    rank = jnp.arange(m, dtype=jnp.int32) - jnp.searchsorted(
        cid_sorted, cid_sorted, side="left"
    ).astype(jnp.int32)
    overflow = jnp.any((rank >= cell_cap) & (cid_sorted < grid.num_cells))

    slots = cid_sorted * cell_cap + jnp.minimum(rank, cell_cap - 1)
    slots = jnp.where(rank < cell_cap, slots, grid.num_cells * cell_cap)
    table = jnp.full((grid.num_cells * cell_cap,), m, dtype=jnp.int32)
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
    )


def _local_cell_nl(
    recv_pos: jnp.ndarray,  # (N_loc, dim) local frame
    recv_valid: jnp.ndarray,  # (N_loc,)
    cand_pos: jnp.ndarray,  # (M, dim) local frame
    cand_valid: jnp.ndarray,  # (M,)
    grid: nb._Grid,
    cell_cap: int,
    k_cap: int,
    cutoff: float,
):
    """Cell-table radius search: local receivers vs local+halo candidates.

    Distance test: plain difference on every axis, min-imaged only on the
    grid's periodic axes (x is pre-shifted into the local frame).
    Returns (senders (N_loc, K) indices into cand rows, edge_valid,
    overflow).
    """
    n_loc = recv_pos.shape[0]
    m = cand_pos.shape[0]
    table, table_pos, cell_overflow = _masked_cell_table(
        cand_pos, cand_valid, grid, cell_cap
    )

    cps = jnp.asarray(grid.cells_per_side, dtype=jnp.int32)
    offsets = jnp.asarray(grid.offsets, dtype=jnp.int32)  # (S, dim)
    pbc = jnp.asarray(grid.pbc)
    box_l = jnp.asarray(
        [grid.cell_size[d] * grid.cells_per_side[d] for d in range(len(grid.pbc))],
        recv_pos.dtype,
    )

    coords = nb._cell_coords(recv_pos, grid)
    ncoords = coords[:, None, :] + offsets[None, :, :]  # (N, S, dim)
    wrapped = jnp.mod(ncoords, cps)
    in_range = jnp.all(
        pbc[None, None, :] | ((ncoords >= 0) & (ncoords < cps)), axis=-1
    )
    ncell = nb._flatten_coords(wrapped, grid)  # (N, S)

    cand = table[ncell]  # (N, S, C)
    cand = jnp.where(in_range[..., None], cand, m)
    cand_p = table_pos[ncell]  # (N, S, C, dim)

    diff = recv_pos[:, None, None, :] - cand_p
    # min-image on periodic axes only
    diff = jnp.where(
        pbc[None, None, None, :],
        diff - box_l * jnp.floor(diff / box_l + 0.5),
        diff,
    )
    dist2 = jnp.sum(diff * diff, axis=-1)
    mask = (dist2 <= cutoff * cutoff) & (cand < m) & recv_valid[:, None, None]

    s, c = cand.shape[1], cand.shape[2]
    senders, row_overflow = nb._dense_select(
        cand.reshape(n_loc, s * c), mask.reshape(n_loc, s * c), k_cap, m
    )
    edge_valid = senders < m
    return senders, edge_valid, cell_overflow | row_overflow


class _SpatialBase:
    """Slab geometry, halo collectives and the per-device cell-table NL —
    shared by every spatially-sharded model (GNS, PaiNN)."""

    def __init__(
        self, mesh, *, box, cutoff, input_seq_length,
        k_cap, cell_cap, vel_mean, vel_std, acc_mean=None, acc_std=None,
        num_particle_types=9, compute_dtype=jnp.float32,
        axis_name: str = DATA_AXIS,
    ):
        self.mesh = mesh
        self.axis = axis_name
        # the slab ring spans this axis of the (possibly multi-axis) mesh
        self.n_dev = int(dict(mesh.shape).get(axis_name, 1))
        self.cdt = jnp.dtype(compute_dtype)
        self.pos_dtype = (
            jnp.float64 if self.cdt == jnp.float64 else jnp.float32
        )
        self.box = jnp.asarray(box, self.pos_dtype)
        self.box_np = np.asarray(box, np.float64)
        self.box_x = float(self.box_np[0])
        self.slab_w = self.box_x / self.n_dev
        assert self.slab_w >= cutoff, (
            f"slab width {self.slab_w:.4f} below cutoff {cutoff}: a 1-slab "
            "halo is not enough; use fewer devices or a larger box"
        )
        self.cutoff = float(cutoff)
        self.isl = input_seq_length
        self.k_cap = int(k_cap)
        self.cell_cap = int(cell_cap)
        self.vel_mean = jnp.asarray(vel_mean, self.pos_dtype)
        self.vel_std = jnp.asarray(vel_std, self.pos_dtype)
        self.acc_mean = (
            None if acc_mean is None else jnp.asarray(acc_mean, self.pos_dtype)
        )
        self.acc_std = (
            None if acc_std is None else jnp.asarray(acc_std, self.pos_dtype)
        )
        self.num_particle_types = num_particle_types

        # local-frame grid: n_dev >= 3 -> [0, 3w] non-periodic in x;
        # n_dev <= 2 -> the full periodic box (candidates appear once)
        if self.n_dev >= 3:
            gbox = [3.0 * self.slab_w] + list(self.box_np[1:])
            pbc = [False] + [True] * (len(self.box_np) - 1)
        else:
            gbox = list(self.box_np)
            pbc = [True] * len(self.box_np)
        grid = nb.make_grid(gbox, cutoff, pbc)
        assert grid is not None, "spatial sharding needs a cell grid"
        self.grid = grid

    # ---- collectives -----------------------------------------------------
    def _left(self, x):
        return jax.lax.ppermute(
            x, self.axis, [(s, (s + 1) % self.n_dev) for s in range(self.n_dev)]
        )

    def _right(self, x):
        return jax.lax.ppermute(
            x, self.axis, [(s, (s - 1) % self.n_dev) for s in range(self.n_dev)]
        )

    # ---- geometry --------------------------------------------------------
    def _local_frame_x(self, x_global, owner_offset, d_idx):
        """x in the local candidate frame for a segment owned by
        ``d_idx + owner_offset``: base + centered-mod(x - owner*w)."""
        w = self.slab_w
        owner = (d_idx + owner_offset) % self.n_dev
        delta = x_global - owner.astype(x_global.dtype) * w
        delta = delta - self.box_x * jnp.round(delta / self.box_x)
        return (1 + owner_offset) * w + delta

    def _candidates(self, most_recent, count, d_idx):
        """Build the candidate set (local + halos) in the local frame."""
        n_loc = most_recent.shape[0]
        if self.n_dev >= 3:
            own_x = self._local_frame_x(most_recent[:, 0], 0, d_idx)
            own = most_recent.at[:, 0].set(own_x)
            gl = self._left(most_recent)
            gr = self._right(most_recent)
            gl = gl.at[:, 0].set(self._local_frame_x(gl[:, 0], -1, d_idx))
            gr = gr.at[:, 0].set(self._local_frame_x(gr[:, 0], +1, d_idx))
            cand_pos = jnp.concatenate([own, gl, gr], axis=0)
            count_l, count_r = self._left(count), self._right(count)
            slot = jnp.arange(3 * n_loc, dtype=jnp.int32)
            seg_count = jnp.where(
                slot < n_loc, count,
                jnp.where(slot < 2 * n_loc, count_l, count_r),
            )
            cand_valid = (slot % n_loc) < seg_count
            recv_pos = own
        elif self.n_dev == 2:
            other = self._left(most_recent)
            count_l = self._left(count)
            cand_pos = jnp.concatenate([most_recent, other], axis=0)
            slot = jnp.arange(2 * n_loc, dtype=jnp.int32)
            seg_count = jnp.where(slot < n_loc, count, count_l)
            cand_valid = (slot % n_loc) < seg_count
            recv_pos = most_recent
        else:
            cand_pos = most_recent
            cand_valid = jnp.arange(n_loc, dtype=jnp.int32) < count
            recv_pos = most_recent
        return recv_pos, cand_pos, cand_valid

    def _halo_concat(self, x):
        """Node-level state -> candidate-row-aligned extension
        [own, left, right] (matching ``_candidates`` layout)."""
        if self.n_dev >= 3:
            return jnp.concatenate(
                [x, self._left(x), self._right(x)], axis=0
            )
        if self.n_dev == 2:
            return jnp.concatenate([x, self._left(x)], axis=0)
        return x


class _SpatialGNS(_SpatialBase):
    """GNS math over the shared slab geometry."""

    def __init__(
        self, mesh, params, *, box, cutoff, input_seq_length, num_mp_steps,
        k_cap, cell_cap, vel_mean, vel_std, acc_mean=None, acc_std=None,
        num_particle_types=9, compute_dtype=jnp.float32,
        axis_name: str = DATA_AXIS,
    ):
        super().__init__(
            mesh, box=box, cutoff=cutoff, input_seq_length=input_seq_length,
            k_cap=k_cap, cell_cap=cell_cap, vel_mean=vel_mean,
            vel_std=vel_std, acc_mean=acc_mean, acc_std=acc_std,
            num_particle_types=num_particle_types,
            compute_dtype=compute_dtype, axis_name=axis_name,
        )
        self.num_mp_steps = num_mp_steps
        # the fused flat layout IS the parity-tested functional form of the
        # standard flax GNS tree (models/gns.py, ops/fused_mp.py);
        # checkpoint-loaded numpy leaves become device arrays here.
        # Fused-layout trees (configs with model.fused_processor: true
        # checkpoint in this naming) pass through unchanged.
        if not any(str(k).startswith("mp0_") for k in params):
            params = fused_params_from_standard(params, num_mp_steps)
        fp = jax.tree.map(jnp.asarray, params)
        self.fp = self.pack_params(fp, num_mp_steps)

    @staticmethod
    def pack_params(fp: Dict, num_mp_steps: int) -> Dict:
        """Flat fused-layout tree -> the structured tree ``_forward``
        consumes (a plain pytree, so the forward can be differentiated
        with respect to it)."""
        return {
            "enc": {k: fp[k] for k in fused_mp.ENC_PARAM_NAMES},
            "node_enc": fp["MLP_0"],
            "decoder": fp["MLP_1"],
            "embed": (
                fp["Embed_0"]["embedding"] if "Embed_0" in fp else None
            ),
            "steps": [
                {name: fp[f"mp{i}_{name}"] for name in fused_mp.PARAM_NAMES}
                for i in range(num_mp_steps)
            ],
        }

    @staticmethod
    def unpack_params(packed: Dict) -> Dict:
        """Inverse of :meth:`pack_params` down to the STANDARD flax layout
        (for interoperable checkpoints of spatially-trained parameters)."""
        from ..models.gns import standard_params_from_fused

        fp = {"MLP_0": packed["node_enc"], "MLP_1": packed["decoder"]}
        if packed["embed"] is not None:
            fp["Embed_0"] = {"embedding": packed["embed"]}
        fp.update(packed["enc"])
        for i, step in enumerate(packed["steps"]):
            for name, arr in step.items():
                fp[f"mp{i}_{name}"] = arr
        return standard_params_from_fused(fp, len(packed["steps"]))

    # ---- one forward pass ------------------------------------------------
    def _forward(self, pos, ptype, count, d_idx, fp=None):
        """pos (N_loc, T, dim) local window; returns (acc, overflow).

        ``fp`` overrides the packed parameter tree (used by the train step
        to differentiate through this forward)."""
        fp = self.fp if fp is None else fp
        n_loc = pos.shape[0]
        isl = self.isl
        most_recent = pos[:, isl - 1].astype(self.pos_dtype)
        recv_valid = jnp.arange(n_loc, dtype=jnp.int32) < count

        recv_pos, cand_pos, cand_valid = self._candidates(
            most_recent, count, d_idx
        )
        senders, edge_valid, nl_overflow = _local_cell_nl(
            recv_pos, recv_valid, cand_pos, cand_valid, self.grid,
            self.cell_cap, self.k_cap, self.cutoff,
        )
        m = cand_pos.shape[0]
        safe_senders = jnp.minimum(senders, m - 1)

        # features (contract of case/features.py, PBC branch)
        disp = lambda a, b: (lambda d: d - self.box * jnp.round(d / self.box))(a - b)
        vel = disp(pos[:, 1:isl], pos[:, : isl - 1])
        vel_n = (vel - self.vel_mean) / self.vel_std
        vel_hist = vel_n.reshape(n_loc, -1)
        # rel_disp: receiver - sender in the LOCAL frame (plain x diff,
        # min-image on periodic axes — matches the NL's distance test)
        diff = recv_pos[:, None, :] - cand_pos[safe_senders]
        pbc_l = jnp.asarray(self.grid.pbc)
        box_l = jnp.asarray(
            [self.grid.cell_size[d] * self.grid.cells_per_side[d]
             for d in range(len(self.grid.pbc))],
            diff.dtype,
        )
        diff = jnp.where(
            pbc_l[None, None, :],
            diff - box_l * jnp.floor(diff / box_l + 0.5),
            diff,
        )
        rel_disp = jnp.where(
            edge_valid[..., None], diff / self.cutoff, 0.0
        )
        rel_dist = jnp.sqrt(
            jnp.sum(rel_disp**2, axis=-1, keepdims=True)
        )

        # GNS math through the fused-mirror functional form; whether the
        # checkpoint was trained with magnitude features is read off the
        # encoder's input width (vel_hist [+ vel_mag] [+ embedding])
        nodes = vel_hist
        expected_in = fp["node_enc"]["Dense_0"]["kernel"].shape[0]
        embed_w = (
            0 if fp["embed"] is None else fp["embed"].shape[-1]
        )
        if expected_in == nodes.shape[-1] + (isl - 1) + embed_w:
            nodes = jnp.concatenate(
                [nodes, jnp.linalg.norm(vel_n, axis=-1)], axis=-1
            )
        if fp["embed"] is not None:
            emb = fp["embed"][jnp.mod(ptype, self.num_particle_types)]
            nodes = jnp.concatenate([nodes, emb], axis=-1)
        h = apply_mlp_params(fp["node_enc"], nodes.astype(self.cdt))
        raw_edges = jnp.concatenate([rel_disp, rel_dist], axis=-1).astype(
            self.cdt
        )
        e = fused_mp.encode_edges_reference(raw_edges, fp["enc"], self.cdt)

        for i, p in enumerate(fp["steps"]):
            hs_proj = apply_dense_params({"kernel": p["w_s"]}, h)
            hr_proj = apply_dense_params({"kernel": p["w_r"]}, h)
            hs_ext = self._halo_concat(hs_proj)
            hs_gath = jnp.where(
                edge_valid[..., None], hs_ext[safe_senders], 0.0
            )
            e, h = fused_mp.gns_mp_step_reference(
                e, hs_gath, hr_proj, h, edge_valid, p
            )

        acc = apply_mlp_params(fp["decoder"], h, layer_norm=False)
        return acc.astype(self.pos_dtype), nl_overflow


class _SpatialSEGNN(_SpatialBase):
    """SEGNN over the shared slab geometry.

    Unlike the GNS/PaiNN cores (functional mirrors of fused layouts), the
    steerable math is NOT re-stated: each step applies the actual flax
    submodules (`SEGNNLayer`, `O3TensorProduct[Gate]`) on their parameter
    subtrees — the layer accepts a halo-extended sender array + explicit
    edge mask (models/segnn.py), so the per-step exchange is the per-m
    parts of the node IrrepsArray (two ring ppermutes per part).
    Homogeneous-particle support optional; periodic boxes; instance norm
    is rejected (it needs global node statistics).
    """

    def __init__(
        self, mesh, params, *, model_def, box, cutoff, input_seq_length,
        k_cap, cell_cap, vel_mean, vel_std, acc_mean=None, acc_std=None,
        compute_dtype=jnp.float32, axis_name: str = DATA_AXIS,
        num_particle_types=9, num_mp_steps=None,
    ):
        from ..models.segnn import SEGNN

        super().__init__(
            mesh, box=box, cutoff=cutoff, input_seq_length=input_seq_length,
            k_cap=k_cap, cell_cap=cell_cap, vel_mean=vel_mean,
            vel_std=vel_std, acc_mean=acc_mean, acc_std=acc_std,
            num_particle_types=num_particle_types,
            compute_dtype=compute_dtype, axis_name=axis_name,
        )
        assert isinstance(model_def, SEGNN), (
            "spatial SEGNN needs the flax SEGNN module as model_def"
        )
        assert model_def.norm is None, (
            "spatial SEGNN does not support instance norm (it needs "
            "global node statistics)"
        )
        self.m = model_def
        self.fp = jax.tree.map(jnp.asarray, params)

    def _halo_extend_irreps(self, z):
        from ..models.e3 import IrrepsArray

        return IrrepsArray.from_parts(
            z.irreps,
            [[self._halo_concat(p) for p in ps] for ps in z.parts()],
        )

    def _forward(self, pos, ptype, count, d_idx, fp=None):
        from ..models.e3 import (
            Irreps,
            IrrepsArray,
            O3TensorProduct,
            O3TensorProductGate,
            from_mul_major,
            spherical_harmonics_fn,
        )
        from ..models.segnn import SEGNNLayer, weight_balanced_irreps

        m = self.m
        fp = self.fp if fp is None else fp
        n_loc = pos.shape[0]
        isl = self.isl
        dim = pos.shape[-1]
        most_recent = pos[:, isl - 1].astype(self.pos_dtype)
        recv_valid = jnp.arange(n_loc, dtype=jnp.int32) < count

        recv_pos, cand_pos, cand_valid = self._candidates(
            most_recent, count, d_idx
        )
        senders, edge_valid, nl_overflow = _local_cell_nl(
            recv_pos, recv_valid, cand_pos, cand_valid, self.grid,
            self.cell_cap, self.k_cap, self.cutoff,
        )
        n_cand = cand_pos.shape[0]
        safe_senders = jnp.minimum(senders, n_cand - 1)

        # features (contract of case/features.py, PBC branch), cdt like
        # the unsharded model's feature chain
        cdt = self.pos_dtype
        disp = lambda a, b: (lambda d: d - self.box * jnp.round(d / self.box))(a - b)
        vel = disp(pos[:, 1:isl], pos[:, : isl - 1])
        vel_n = ((vel - self.vel_mean) / self.vel_std).astype(cdt)
        diff = recv_pos[:, None, :] - cand_pos[safe_senders]
        pbc_l = jnp.asarray(self.grid.pbc)
        box_l = jnp.asarray(
            [self.grid.cell_size[d] * self.grid.cells_per_side[d]
             for d in range(len(self.grid.pbc))],
            diff.dtype,
        )
        diff = jnp.where(
            pbc_l[None, None, :],
            diff - box_l * jnp.floor(diff / box_l + 0.5),
            diff,
        )
        rel_disp = jnp.where(
            edge_valid[..., None], diff / self.cutoff, 0.0
        ).astype(cdt)
        rel_dist = jnp.sqrt(jnp.sum(rel_disp**2, axis=-1, keepdims=True))

        # 2D -> 3D lift (models/utils.features_2d_to_3d)
        n_vels = m.n_vels
        vel3 = vel_n.reshape(n_loc, n_vels, dim)
        if dim == 2:
            pad = [(0, 0)] * 2 + [(0, 1)]
            vel3 = jnp.pad(vel3, pad)
            rel_disp3 = jnp.pad(rel_disp, [(0, 0), (0, 0), (0, 1)])
        else:
            rel_disp3 = rel_disp

        # steerable attributes (models/segnn.py SEGNN._attributes)
        attribute_irreps = Irreps.spherical_harmonics(m.lmax_attributes)
        sh = spherical_harmonics_fn(m.lmax_attributes)
        if n_vels == 1:
            vel_agg = vel3[:, 0]
        elif m.velocity_aggregate == "avg":
            vel_agg = jnp.mean(vel3, axis=1)
        else:
            vel_agg = vel3[:, -1]
        edge_attr = sh(rel_disp3)
        vel_attr = sh(vel_agg)
        maskf = edge_valid[..., None].astype(edge_attr.dtype)
        scattered = jnp.sum(edge_attr * maskf, axis=1) / jnp.maximum(
            jnp.sum(maskf, axis=1), 1.0
        )
        node_attr = (vel_attr + scattered).at[:, 0].set(1.0)
        node_attributes = IrrepsArray(attribute_irreps, node_attr)
        edge_attributes = IrrepsArray(attribute_irreps, edge_attr)

        # node features in irreps order (homogeneous periodic case:
        # velocity vectors [+ magnitudes] [+ one-hot type])
        node_feats = [vel3.reshape(n_loc, n_vels * 3)]
        node_irreps = Irreps(m.node_features_irreps)
        n_scalars = node_irreps.count("0e")
        expected_scalars = (0 if m.homogeneous_particles
                            else self.num_particle_types)
        if n_scalars >= n_vels + expected_scalars:
            node_feats.append(jnp.linalg.norm(vel3, axis=-1))
        if not m.homogeneous_particles:
            node_feats.append(
                jax.nn.one_hot(ptype, self.num_particle_types, dtype=cdt)
            )
        assert node_irreps.dim == sum(f.shape[-1] for f in node_feats), (
            f"spatial SEGNN supports velocity[+magnitude][+type] node "
            f"features; model expects {node_irreps} "
            f"({node_irreps.dim} dims)"
        )
        nodes = from_mul_major(
            node_irreps, jnp.concatenate(node_feats, axis=-1)
        )
        edge_feats = IrrepsArray(
            Irreps(m.edge_features_irreps),
            jnp.concatenate([rel_disp3, rel_dist], axis=-1),
        )

        hidden_irreps = weight_balanced_irreps(
            m.scalar_units, attribute_irreps, m.lmax_hidden
        )

        # embedding
        nodes = O3TensorProduct(
            hidden_irreps, compute_dtype=m.compute_dtype
        ).apply({"params": fp["O3TensorProduct_0"]}, nodes, node_attributes)

        # message passing: halo-extend the node state per step
        layer_mod = SEGNNLayer(
            output_irreps=hidden_irreps, n_blocks=m.blocks_per_step,
            norm=m.norm, compute_dtype=m.compute_dtype,
        )
        receivers2d = jax.lax.broadcasted_iota(
            jnp.int32, safe_senders.shape, 0
        )
        for i in range(m.num_mp_steps):
            nodes_ext = self._halo_extend_irreps(nodes)
            nodes = layer_mod.apply(
                {"params": fp[f"SEGNNLayer_{i}"]},
                nodes, node_attributes, edge_attributes, edge_feats,
                safe_senders, receivers2d,
                sender_nodes=nodes_ext, edge_mask=edge_valid,
            )

        # decoder
        x = nodes
        for j in range(m.blocks_per_step):
            x = O3TensorProductGate(
                hidden_irreps, compute_dtype=m.compute_dtype
            ).apply(
                {"params": fp[f"O3TensorProductGate_{j}"]},
                x, node_attributes,
            )
        out = O3TensorProduct(
            Irreps(m.output_irreps), compute_dtype=m.compute_dtype
        ).apply({"params": fp["O3TensorProduct_1"]}, x, node_attributes)

        acc = out.array[:, :dim]
        return acc.astype(self.pos_dtype), nl_overflow


class _SpatialEGNN(_SpatialBase):
    """EGNN over the shared slab geometry.

    Like SEGNN, the math is the actual flax module: ``EGNNLayer`` runs on
    its parameter subtrees with halo-extended sender arrays. Two EGNN
    specifics: positions update per layer, so the halo carries the
    accumulated position DELTA (frame-invariant — halo x-coordinates
    come from the layer-0 candidate frame plus the neighbor's deltas);
    and the position correction scatters to SENDERS, so halo-segment
    contributions return to their owners via the reverse ring permutes
    (the transpose of the forward halo).
    """

    def __init__(
        self, mesh, params, *, model_def, box, cutoff, input_seq_length,
        k_cap, cell_cap, vel_mean, vel_std, acc_mean=None, acc_std=None,
        compute_dtype=jnp.float32, axis_name: str = DATA_AXIS,
        num_particle_types=9, num_mp_steps=None,
    ):
        from ..models.egnn import EGNN

        super().__init__(
            mesh, box=box, cutoff=cutoff, input_seq_length=input_seq_length,
            k_cap=k_cap, cell_cap=cell_cap, vel_mean=vel_mean,
            vel_std=vel_std, acc_mean=acc_mean, acc_std=acc_std,
            num_particle_types=num_particle_types,
            compute_dtype=compute_dtype, axis_name=axis_name,
        )
        assert isinstance(model_def, EGNN), (
            "spatial EGNN needs the flax EGNN module as model_def"
        )
        assert model_def.homogeneous_particles, (
            "spatial EGNN supports homogeneous particles"
        )
        self.m = model_def
        self.fp = jax.tree.map(jnp.asarray, params)

    def _reverse_halo(self, buckets, n_loc):
        """(n_cand, ...) sender-bucketed sums -> (N_loc, ...) owner sums:
        segment 1 came FROM the left neighbor (shipped by ``_left``), so
        its accumulated contributions return with ``_right``, and vice
        versa."""
        if self.n_dev >= 3:
            return (
                buckets[:n_loc]
                + self._right(buckets[n_loc : 2 * n_loc])
                + self._left(buckets[2 * n_loc :])
            )
        if self.n_dev == 2:
            return buckets[:n_loc] + self._right(buckets[n_loc:])
        return buckets

    def _forward(self, pos, ptype, count, d_idx, fp=None):
        from flax import linen as nn

        from ..models.egnn import EGNNLayer
        from ..models.utils import matmul_precision

        m = self.m
        fp = self.fp if fp is None else fp
        n_loc = pos.shape[0]
        isl = self.isl
        dim = pos.shape[-1]
        most_recent = pos[:, isl - 1].astype(self.pos_dtype)
        recv_valid = jnp.arange(n_loc, dtype=jnp.int32) < count

        recv_pos, cand_pos, cand_valid = self._candidates(
            most_recent, count, d_idx
        )
        senders, edge_valid, nl_overflow = _local_cell_nl(
            recv_pos, recv_valid, cand_pos, cand_valid, self.grid,
            self.cell_cap, self.k_cap, self.cutoff,
        )
        n_cand = cand_pos.shape[0]
        safe_senders = jnp.minimum(senders, n_cand - 1)
        receivers2d = jax.lax.broadcasted_iota(
            jnp.int32, safe_senders.shape, 0
        )

        # local-frame displacement: plain difference on x (pre-shifted
        # copies), min-image on the periodic axes — the NL's convention
        pbc_l = jnp.asarray(self.grid.pbc)
        box_l = jnp.asarray(
            [self.grid.cell_size[d] * self.grid.cells_per_side[d]
             for d in range(len(self.grid.pbc))],
            self.pos_dtype,
        )

        def disp_local(a, b):
            d = a - b
            return jnp.where(pbc_l, d - box_l * jnp.round(d / box_l), d)

        def shift_local(p, dp):
            # no wrap: deltas stay small within one forward and every
            # consumer min-images differences
            return p + dp

        # features (contract of case/features.py)
        dispg = lambda a, b: (
            lambda d: d - self.box * jnp.round(d / self.box)
        )(a - b)
        vel = dispg(pos[:, 1:isl], pos[:, : isl - 1])
        vel_n = ((vel - self.vel_mean) / self.vel_std).astype(self.pos_dtype)
        diff0 = disp_local(
            cand_pos[safe_senders], recv_pos[:, None, :]
        )
        rel_dist = jnp.where(
            edge_valid[..., None],
            jnp.sqrt(jnp.sum((diff0 / self.cutoff) ** 2, axis=-1,
                             keepdims=True)),
            0.0,
        )

        dtype = jnp.dtype(m.compute_dtype)
        node_scalars = jnp.sqrt(jnp.sum(vel_n**2, axis=-1) + 1e-16)
        h = nn.Dense(
            m.hidden_size,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dtype,
            precision=matmul_precision(dtype),
        ).apply({"params": fp["Dense_0"]}, node_scalars)

        stats = m.velocity_stats
        prev_vel = vel_n[:, -1] * stats["std"] + stats["mean"]

        layer_mod = EGNNLayer(
            hidden_size=m.hidden_size, output_size=m.hidden_size,
            displacement_fn=disp_local, shift_fn=shift_local,
            act_fn=m.act_fn, residual=m.residual, attention=m.attention,
            normalize=m.normalize, tanh=m.tanh,
            dt=m.dt / m.num_mp_steps, dtype=dtype,
        )

        def sender_scatter(trans, snd):
            flat = trans.reshape((-1,) + trans.shape[2:])
            buckets = jax.ops.segment_sum(
                flat, snd.reshape(-1), num_segments=n_cand
            )
            return self._reverse_halo(buckets, n_loc)

        dpos = jnp.zeros_like(recv_pos)
        for i in range(m.num_mp_steps):
            h_ext = self._halo_concat(h)
            pos_ext = cand_pos + self._halo_concat(dpos)
            h, new_pos = layer_mod.apply(
                {"params": fp[f"EGNNLayer_{i}"]},
                h, recv_pos + dpos, prev_vel, safe_senders, receivers2d,
                rel_dist, None,
                sender_h=h_ext, sender_pos=pos_ext,
                edge_mask=edge_valid, sender_scatter_fn=sender_scatter,
            )
            dpos = new_pos - recv_pos

        # finite differences; the shared spatial scaffolding consumes
        # NORMALIZED acceleration (rollout/integrate re-scale)
        next_vel = dpos
        acc = next_vel - prev_vel
        acc_n = (acc - self.acc_mean) / self.acc_std
        return acc_n.astype(self.pos_dtype), nl_overflow


class _SpatialPaiNN(_SpatialBase):
    """PaiNN math over the shared slab geometry.

    Functional form of the fused-variant flax model (models/painn.py,
    ``use_fused_layer`` path): per layer, the interaction context runs at
    node level, the packed [x1, x2, v*x3] state is halo-extended with two
    ring ppermutes, and the edge message + mixing block goes through
    :func:`ops.painn_msg.painn_layer_reference` — the mirror the fused
    Pallas kernel is parity-tested against. Homogeneous particles,
    periodic boxes (no ``bound``/``force`` features), like the sharded
    GNS path.
    """

    def __init__(
        self, mesh, params, *, box, cutoff, input_seq_length, num_mp_steps,
        radius, k_cap, cell_cap, vel_mean, vel_std, acc_mean=None,
        acc_std=None, compute_dtype=jnp.float32, eps: float = 1e-8,
        axis_name: str = DATA_AXIS,
    ):
        super().__init__(
            mesh, box=box, cutoff=cutoff, input_seq_length=input_seq_length,
            k_cap=k_cap, cell_cap=cell_cap, vel_mean=vel_mean,
            vel_std=vel_std, acc_mean=acc_mean, acc_std=acc_std,
            compute_dtype=compute_dtype, axis_name=axis_name,
        )
        self.num_mp_steps = num_mp_steps
        # the RBF/cutoff radius is the MODEL's (1.5x the connectivity
        # radius, applied to radius-normalized distances — build_painn)
        self.radius = float(radius)
        self.eps = float(eps)
        if "filt_w" not in params.get("PaiNNLayer_0", {}):
            params = painn_fused_params_from_standard(params, num_mp_steps)
        self.fp = self.pack_params(
            jax.tree.map(jnp.asarray, params), num_mp_steps
        )

    @staticmethod
    def pack_params(fp: Dict, num_mp_steps: int) -> Dict:
        """Fused-variant flax PaiNN tree -> plain pytree (standard trees
        are converted with painn_fused_params_from_standard first)."""

        def dense(sub):
            return {"kernel": sub["Dense_0"]["kernel"],
                    "bias": sub["Dense_0"].get("bias")}

        layers = []
        for i in range(num_mp_steps):
            lyr = fp[f"PaiNNLayer_{i}"]
            layers.append({
                "ctx1": dense(lyr["LinearXav_0"]),
                "ctx2": dense(lyr["LinearXav_1"]),
                "kernel": {k: lyr[k] for k in painn_msg.LAYER_PARAM_NAMES},
            })
        gates = []
        for i in range(2):
            blk = fp[f"GatedEquivariantBlock_{i}"]
            gates.append({
                "vmix": blk["LinearXav_0"]["Dense_0"]["kernel"],
                "g1": dense(blk["LinearXav_1"]),
                "g2": dense(blk["LinearXav_2"]),
            })
        return {
            "rbf": {"widths": fp["GaussianRBF_0"]["widths"],
                    "offset": fp["GaussianRBF_0"]["offset"]},
            "s_emb": dense(fp["LinearXav_0"]),
            "v_emb": fp["LinearXav_1"]["Dense_0"]["kernel"],
            "layers": layers,
            "gates": gates,
        }

    @staticmethod
    def unpack_params(packed: Dict) -> Dict:
        """Inverse of :meth:`pack_params` down to the STANDARD flax layout
        (for interoperable checkpoints of spatially-trained parameters)."""
        from ..models.painn import painn_standard_params_from_fused

        def lin(d):
            out = {"kernel": d["kernel"]}
            if d.get("bias") is not None:
                out["bias"] = d["bias"]
            return {"Dense_0": out}

        fp = {
            "GaussianRBF_0": {"widths": packed["rbf"]["widths"],
                              "offset": packed["rbf"]["offset"]},
            "LinearXav_0": lin(packed["s_emb"]),
            "LinearXav_1": {"Dense_0": {"kernel": packed["v_emb"]}},
        }
        for i, lyr in enumerate(packed["layers"]):
            fused = {"LinearXav_0": lin(lyr["ctx1"]),
                     "LinearXav_1": lin(lyr["ctx2"])}
            fused.update(lyr["kernel"])
            fp[f"PaiNNLayer_{i}"] = fused
        for i, g in enumerate(packed["gates"]):
            fp[f"GatedEquivariantBlock_{i}"] = {
                "LinearXav_0": {"Dense_0": {"kernel": g["vmix"]}},
                "LinearXav_1": lin(g["g1"]),
                "LinearXav_2": lin(g["g2"]),
            }
        return painn_standard_params_from_fused(fp, len(packed["layers"]))

    def _gate_block(self, s, v, gp, scalar_out: int):
        """GatedEquivariantBlock functional form (models/painn.py:59-94)."""
        vm = jnp.einsum("ndh,ho->ndo", v, gp["vmix"])
        half = vm.shape[-1] // 2
        v_l, v_r = vm[..., :half], vm[..., half:]
        v_r_norm = jnp.sqrt(jnp.sum(v_r**2, axis=-2) + self.eps)
        gating = jnp.concatenate([s, v_r_norm], axis=-1)
        gating = jax.nn.silu(
            gating @ gp["g1"]["kernel"] + gp["g1"]["bias"]
        )
        gating = gating @ gp["g2"]["kernel"] + gp["g2"]["bias"]
        s_out = gating[..., :scalar_out]
        v_out = v_l * gating[..., None, scalar_out:]
        return s_out, v_out

    def _forward(self, pos, ptype, count, d_idx, fp=None):
        """pos (N_loc, T, dim) local window; returns (acc, overflow)."""
        fp = self.fp if fp is None else fp
        n_loc = pos.shape[0]
        isl = self.isl
        cdt = self.cdt
        most_recent = pos[:, isl - 1].astype(self.pos_dtype)
        recv_valid = jnp.arange(n_loc, dtype=jnp.int32) < count

        recv_pos, cand_pos, cand_valid = self._candidates(
            most_recent, count, d_idx
        )
        senders, edge_valid, overflow = _local_cell_nl(
            recv_pos, recv_valid, cand_pos, cand_valid, self.grid,
            self.cell_cap, self.k_cap, self.cutoff,
        )
        m = cand_pos.shape[0]
        safe = jnp.minimum(senders, m - 1)

        # radius-normalized displacement in the local frame (features.py)
        diff = recv_pos[:, None, :] - cand_pos[safe]
        pbc_l = jnp.asarray(self.grid.pbc)
        box_l = jnp.asarray(
            [self.grid.cell_size[d] * self.grid.cells_per_side[d]
             for d in range(len(self.grid.pbc))],
            diff.dtype,
        )
        diff = jnp.where(
            pbc_l[None, None, :],
            diff - box_l * jnp.floor(diff / box_l + 0.5),
            diff,
        )
        rel_disp = jnp.where(edge_valid[..., None], diff / self.cutoff, 0.0)
        norm_ij = jnp.sqrt(jnp.sum(rel_disp**2, axis=-1) + self.eps)
        dir_ij = rel_disp / (norm_ij[..., None] + self.eps)

        # trainable gaussian RBF + cosine cutoff, per-edge scale column
        widths = fp["rbf"]["widths"]
        offsets = fp["rbf"]["offset"]
        coeff = -0.5 / widths**2
        phi = jnp.exp(
            coeff * (norm_ij[..., None] - offsets) ** 2
        ).astype(cdt)
        cut = 0.5 * (jnp.cos(norm_ij * jnp.pi / self.radius) + 1.0)
        cut = cut * (norm_ij < self.radius)
        scale = cut.astype(cdt) * edge_valid.astype(cdt)
        phi_ext = jnp.concatenate([phi, scale[..., None]], axis=-1)

        # node features: normalized velocity history -> scalars + vectors
        vel = pos[:, 1:isl].astype(self.pos_dtype) - pos[:, : isl - 1].astype(
            self.pos_dtype
        )
        vel = vel - self.box * jnp.round(vel / self.box)
        vel_n = (vel - self.vel_mean) / self.vel_std  # (N, n_vels, dim)
        s0 = jnp.linalg.norm(vel_n, axis=-1).astype(cdt)  # (N, n_vels)
        v0 = jnp.transpose(vel_n, (0, 2, 1)).astype(cdt)  # (N, dim, n_vels)

        h = fp["s_emb"]["kernel"].shape[-1]
        dim = v0.shape[1]
        s = s0 @ fp["s_emb"]["kernel"] + fp["s_emb"]["bias"]
        v_flat = jnp.einsum("ndc,ch->ndh", v0, fp["v_emb"]).reshape(
            n_loc, dim * h
        )
        neg_dir = (-dir_ij).astype(cdt)

        for lyr in fp["layers"]:
            x = jax.nn.silu(
                s @ lyr["ctx1"]["kernel"] + lyr["ctx1"]["bias"]
            ) @ lyr["ctx2"]["kernel"] + lyr["ctx2"]["bias"]
            x3 = x[..., 2 * h:]
            packed = jnp.concatenate(
                [x[..., : 2 * h]]
                + [v_flat[..., d * h:(d + 1) * h] * x3 for d in range(dim)],
                axis=-1,
            )
            g = self._halo_concat(packed)[safe]
            s, v_flat = painn_msg.painn_layer_reference(
                g, phi_ext, neg_dir, s, v_flat, lyr["kernel"],
                eps=self.eps,
            )

        v = v_flat.reshape(n_loc, dim, h)
        s, v = self._gate_block(s, v, fp["gates"][0], h // 2)
        s, v = self._gate_block(s, v, fp["gates"][1], 1)
        acc = jnp.squeeze(v, axis=-1)
        return acc.astype(self.pos_dtype), overflow


def build_spatial_painn_forward(
    mesh, params, *, box, cutoff, input_seq_length, num_mp_steps, radius,
    k_cap, vel_mean, vel_std, cell_cap: Optional[int] = None,
    compute_dtype=jnp.float32,
):
    """Spatially-sharded PaiNN forward over a 1D device mesh.

    Same contract as :func:`build_spatial_gns_forward`; ``params`` is a
    flax PaiNN tree in either the standard or the fused layout, and
    ``radius`` is the model's RBF/cutoff radius (1.5x the connectivity
    radius over radius-normalized distances — models/painn.py
    build_painn).
    """
    core = _SpatialPaiNN(
        mesh, params, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length, num_mp_steps=num_mp_steps,
        radius=radius, k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap,
        vel_mean=vel_mean, vel_std=vel_std, compute_dtype=compute_dtype,
    )

    def local_forward(pos, ptype, count):
        d_idx = jax.lax.axis_index(DATA_AXIS)
        acc, overflow = core._forward(pos[0], ptype[0], count[0], d_idx)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return acc[None], overflow

    batched, rep = P(DATA_AXIS), P()
    sharded = shard_map(
        local_forward, mesh=mesh,
        in_specs=(batched, batched, batched),
        out_specs=(batched, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_spatial_segnn_forward(
    mesh, params, model_def, *, box, cutoff, input_seq_length, k_cap,
    vel_mean, vel_std, cell_cap: Optional[int] = None,
    compute_dtype=jnp.float32,
):
    """Spatially-sharded SEGNN forward over a 1D device mesh.

    Same contract as :func:`build_spatial_gns_forward`; ``model_def`` is
    the flax SEGNN module (its submodules run on their parameter
    subtrees — no functional mirror).
    """
    core = _SpatialSEGNN(
        mesh, params, model_def=model_def, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length,
        k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap,
        vel_mean=vel_mean, vel_std=vel_std, compute_dtype=compute_dtype,
    )

    def local_forward(pos, ptype, count):
        d_idx = jax.lax.axis_index(DATA_AXIS)
        acc, overflow = core._forward(pos[0], ptype[0], count[0], d_idx)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return acc[None], overflow

    batched, rep = P(DATA_AXIS), P()
    sharded = shard_map(
        local_forward, mesh=mesh,
        in_specs=(batched, batched, batched),
        out_specs=(batched, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_spatial_egnn_forward(
    mesh, params, model_def, *, box, cutoff, input_seq_length, k_cap,
    vel_mean, vel_std, acc_mean, acc_std, cell_cap: Optional[int] = None,
    compute_dtype=jnp.float32,
):
    """Spatially-sharded EGNN forward over a 1D device mesh.

    Same contract as :func:`build_spatial_gns_forward` but returns the
    NORMALIZED acceleration (the flax EGNN emits physical pos/vel/acc;
    the shared spatial scaffolding re-scales)."""
    core = _SpatialEGNN(
        mesh, params, model_def=model_def, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length,
        k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap,
        vel_mean=vel_mean, vel_std=vel_std, acc_mean=acc_mean,
        acc_std=acc_std, compute_dtype=compute_dtype,
    )

    def local_forward(pos, ptype, count):
        d_idx = jax.lax.axis_index(DATA_AXIS)
        acc, overflow = core._forward(pos[0], ptype[0], count[0], d_idx)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return acc[None], overflow

    batched, rep = P(DATA_AXIS), P()
    sharded = shard_map(
        local_forward, mesh=mesh,
        in_specs=(batched, batched, batched),
        out_specs=(batched, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_spatial_gns_forward(
    mesh, params, *, box, cutoff, input_seq_length, num_mp_steps, k_cap,
    vel_mean, vel_std, cell_cap: Optional[int] = None,
    num_particle_types: int = 9, compute_dtype=jnp.float32,
):
    """Spatially-sharded GNS forward over a 1D device mesh.

    Returns fn(pos_sh, ptype_sh, counts) -> (acc (n_dev, N_loc, dim),
    overflow) where inputs are ``spatial_partition`` outputs placed on the
    mesh. ``params`` is the standard flax GNS tree.
    """
    core = _SpatialGNS(
        mesh, params, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length, num_mp_steps=num_mp_steps,
        k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap, vel_mean=vel_mean,
        vel_std=vel_std, num_particle_types=num_particle_types,
        compute_dtype=compute_dtype,
    )

    def local_forward(pos, ptype, count):
        d_idx = jax.lax.axis_index(DATA_AXIS)
        acc, overflow = core._forward(pos[0], ptype[0], count[0], d_idx)
        overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return acc[None], overflow

    batched, rep = P(DATA_AXIS), P()
    sharded = shard_map(
        local_forward, mesh=mesh,
        in_specs=(batched, batched, batched),
        out_specs=(batched, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_spatial_gns_train_step(
    mesh, params, *, box, cutoff, input_seq_length, num_mp_steps, k_cap,
    normalization_stats, cell_cap: Optional[int] = None,
    num_particle_types: int = 9, compute_dtype=jnp.float32,
    model: str = "gns", radius=None, model_def=None,
):
    """Spatially-sharded training step (loss + psum'd gradients);
    ``model`` selects gns | painn | segnn | egnn (all four families are
    8-dev-vs-1-dev gradient-parity tested, tests/test_spatial.py).

    Gradients flow through the halo exchange: ``ppermute``'s transpose
    routes sender-state cotangents back to the owning slab, so the
    per-device grad of the GLOBAL loss is exact and the final ``psum``
    over the replicated parameters yields the same gradient the
    single-device trainer computes (parity-tested on a CPU mesh,
    tests/test_spatial.py).

    Returns ``step(fp, pos_sh, ptype_sh, counts, unroll_steps=0) ->
    (loss, grads, overflow)`` plus the initial packed parameter tree
    ``fp`` (the fused-layout pytree of the standard flax tree ``params``
    — convert a trained ``fp`` back with the inverse mapping or keep
    training in this layout). ``pos_sh`` is a ``spatial_partition``
    output with ``input_seq_length + 1`` frames: the first ``isl`` feed
    the model, the last two plus frame ``isl-2`` give the normalized
    acceleration target (same second finite difference as ``case.py``).
    With pushforward (``unroll_steps > 0``, one compiled variant per
    value) the window carries extra target frames plus the raw input
    window — see ``_sample_loss_contrib``. Loss is the kinematic-masked
    MSE over acceleration, averaged over all valid non-kinematic
    particles of the GLOBAL system.
    """
    stats = normalization_stats
    core = _make_core(
        model, mesh, params, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length, num_mp_steps=num_mp_steps,
        k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap, stats=stats,
        num_particle_types=num_particle_types, compute_dtype=compute_dtype,
        radius=radius, model_def=model_def,
    )

    def make_local_step(unroll: int):
        def local_step(fp, pos, ptype, count):
            pos, ptype, count = pos[0], ptype[0], count[0]
            (contrib, overflow), grads = jax.value_and_grad(
                _sample_loss_contrib, argnums=1, has_aux=True
            )(core, fp, pos, ptype, count, unroll)
            # each device's grad covers its local contribution (halo-state
            # cotangents return home via the ppermute transpose); the psum
            # assembles the exact global-loss gradient
            loss = jax.lax.psum(contrib, DATA_AXIS)
            grads = jax.lax.psum(grads, DATA_AXIS)
            overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
            return loss, grads, overflow

        return local_step

    batched, rep = P(DATA_AXIS), P()
    cache = {}

    def step(fp, pos_sh, ptype_sh, counts, unroll_steps: int = 0):
        # one compiled variant per pushforward unroll count (at most 4
        # values — same strategy as the standard Trainer)
        u = int(unroll_steps)
        if u not in cache:
            cache[u] = jax.jit(shard_map(
                make_local_step(u), mesh=mesh,
                in_specs=(rep, batched, batched, batched),
                out_specs=(rep, rep, rep),
                check_vma=False,
            ))
        return cache[u](fp, pos_sh, ptype_sh, counts)

    return step, core.fp


def _sample_loss_contrib(core, fp, pos, ptype, count, unroll: int = 0):
    """This device's contribution to ONE sample's kinematic-masked MSE
    (summed over the sample's slab ring ``core.axis``, the contributions
    form the global per-sample loss).

    ``pos`` is the local (N_loc, T, dim) window. With ``unroll == 0``
    (no pushforward) T is isl+1: ``isl`` model frames + the target frame.
    With pushforward enabled T is isl+1+max_unroll+isl: the noised
    sequence (isl inputs + 1+max_unroll target frames) followed by the
    RAW isl-frame input window. The ``unroll`` (static) pushforward steps
    mirror the standard Trainer / reference strats.py:112-161 semantics:
    the first no-grad forward sees the NOISED features, its prediction
    integrates from the RAW window, subsequent forwards run on the pushed
    window, gradients do not flow through the unroll, and the target is
    the second finite difference of the noised sequence around frame
    ``isl - 1 + unroll``."""
    isl = core.isl
    box_j = core.box

    def disp(a, b):
        d = a - b
        return d - box_j * jnp.round(d / box_j)

    d_idx = jax.lax.axis_index(core.axis)
    n_loc = pos.shape[0]
    pos = pos.astype(core.pos_dtype)

    window = pos[:, :isl]
    overflow = jnp.asarray(False)
    if unroll > 0:
        base = pos[:, -isl:]  # raw input window: the integration base
        for _ in range(unroll):
            acc_n, ovf = core._forward(window, ptype, count, d_idx, fp=fp)
            overflow = overflow | ovf
            acc = core.acc_mean + acc_n.astype(core.pos_dtype) * core.acc_std
            most = base[:, -1]
            last_vel = disp(base[:, -1], base[:, -2])
            new_pos = jnp.mod(most + last_vel + acc, box_j)
            base = jnp.concatenate([base[:, 1:], new_pos[:, None]], axis=1)
            window = base
        window = jax.lax.stop_gradient(window)

    acc_pred, ovf = core._forward(window, ptype, count, d_idx, fp=fp)
    overflow = overflow | ovf

    # normalized target acceleration around frame isl - 1 + unroll
    cur_vel = disp(pos[:, isl - 1 + unroll], pos[:, isl - 2 + unroll])
    next_vel = disp(pos[:, isl + unroll], pos[:, isl - 1 + unroll])
    acc_t = (next_vel - cur_vel - core.acc_mean) / core.acc_std

    valid = jnp.arange(n_loc, dtype=jnp.int32) < count
    non_kin = valid & (ptype != 1) & (ptype != 2) & (ptype != -1)
    ldt = core.pos_dtype  # f32 normally, f64 in parity mode
    per_node = jnp.sum(
        (acc_pred.astype(ldt) - acc_t.astype(ldt)) ** 2, axis=-1
    )
    local_sum = jnp.sum(jnp.where(non_kin, per_node, 0.0))
    local_cnt = jnp.sum(non_kin.astype(ldt))
    # global count has no fp dependence, so this psum sits outside
    # every differentiated path (with check_vma off, psum transposes
    # to psum and differentiating THROUGH one over-counts by n_dev)
    gcnt = jnp.maximum(jax.lax.psum(local_cnt, core.axis), 1.0)
    return local_sum / gcnt, overflow


def build_spatial_loss_fn(
    mesh, params, *, box, cutoff, input_seq_length, num_mp_steps, k_cap,
    normalization_stats, cell_cap: Optional[int] = None,
    num_particle_types: int = 9, compute_dtype=jnp.float32,
    model: str = "gns", radius=None, model_def=None,
):
    """Loss-only (no gradients) spatially-sharded evaluation step.

    Same partitioned inputs and kinematic-masked acceleration MSE as
    ``build_spatial_gns_train_step`` / ``build_spatial_train_step_dp``
    but without ``value_and_grad`` — roughly half the cost, for
    in-training validation. Handles both mesh topologies: a 1D slab ring
    (inputs ``(n_space, N_loc, ...)``) and a 2D (data, space) mesh
    (inputs with a leading batch axis). Returns ``eval_fn(fp, pos_sh,
    ptype_sh, counts) -> (loss, overflow)``.
    """
    is_2d = SPATIAL_AXIS in dict(mesh.shape)
    axis_name = SPATIAL_AXIS if is_2d else DATA_AXIS
    core = _make_core(
        model, mesh, params, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length, num_mp_steps=num_mp_steps,
        k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap,
        stats=normalization_stats,
        num_particle_types=num_particle_types, compute_dtype=compute_dtype,
        radius=radius, axis_name=axis_name, model_def=model_def,
    )

    rep = P()
    if is_2d:
        n_data = int(dict(mesh.shape)[DATA_AXIS])

        def local_eval(fp, pos, ptype, count):
            pos, ptype, count = pos[:, 0], ptype[:, 0], count[:, 0]
            b_loc = pos.shape[0]
            contribs, overflows = jax.vmap(
                lambda p, t, c: _sample_loss_contrib(core, fp, p, t, c)
            )(pos, ptype, count)
            contrib = jnp.sum(contribs) / (b_loc * n_data)
            axes = (DATA_AXIS, SPATIAL_AXIS)
            loss = jax.lax.psum(contrib, axes)
            overflow = (
                jax.lax.psum(jnp.any(overflows).astype(jnp.int32), axes) > 0
            )
            return loss, overflow

        batched = P(DATA_AXIS, SPATIAL_AXIS)
    else:

        def local_eval(fp, pos, ptype, count):
            pos, ptype, count = pos[0], ptype[0], count[0]
            contrib, overflow = _sample_loss_contrib(
                core, fp, pos, ptype, count
            )
            loss = jax.lax.psum(contrib, DATA_AXIS)
            overflow = (
                jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
            )
            return loss, overflow

        batched = P(DATA_AXIS)

    sharded = shard_map(
        local_eval, mesh=mesh,
        in_specs=(rep, batched, batched, batched),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_spatial_train_step_dp(
    mesh, params, *, box, cutoff, input_seq_length, num_mp_steps, k_cap,
    normalization_stats, cell_cap: Optional[int] = None,
    num_particle_types: int = 9, compute_dtype=jnp.float32,
    model: str = "gns", radius=None, model_def=None,
):
    """Training step over a 2D ``(data, space)`` mesh (`make_mesh_2d`):
    the batch shards over ``data`` rows and every sample is spatially
    sharded over the ``space`` ring — DP and the halo exchange composed
    in one ``shard_map``.

    Per-MP-step halo ``ppermute``s run within each data row (vmapped over
    the row's local samples); the loss is the batch mean of per-sample
    global MSEs and the gradient psum spans both axes. 2x4-device results
    match the single-device computation exactly (tests/test_spatial.py).

    Returns ``step(fp, pos_sh, ptype_sh, counts) -> (loss, grads,
    overflow)`` plus the initial packed tree ``fp``; inputs carry a
    leading batch axis over per-sample ``spatial_partition`` outputs:
    ``pos_sh (B, n_space, N_loc, isl+1, dim)``, sharded
    ``P(data, space)``.
    """
    assert DATA_AXIS in mesh.shape and SPATIAL_AXIS in mesh.shape, (
        f"build_spatial_train_step_dp needs a (data, space) mesh, "
        f"got axes {tuple(mesh.shape)}"
    )
    n_data = int(dict(mesh.shape)[DATA_AXIS])
    core = _make_core(
        model, mesh, params, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length, num_mp_steps=num_mp_steps,
        k_cap=k_cap, cell_cap=cell_cap or 4 * k_cap,
        stats=normalization_stats,
        num_particle_types=num_particle_types, compute_dtype=compute_dtype,
        radius=radius, axis_name=SPATIAL_AXIS, model_def=model_def,
    )

    def make_local_step(unroll: int):
        def local_step(fp, pos, ptype, count):
            # blocks: (B_loc, 1, N_loc, ...) — drop the sharded space axis
            pos, ptype, count = pos[:, 0], ptype[:, 0], count[:, 0]
            b_loc = pos.shape[0]

            def batch_loss(fp):
                contribs, overflows = jax.vmap(
                    lambda p, t, c: _sample_loss_contrib(
                        core, fp, p, t, c, unroll
                    )
                )(pos, ptype, count)
                # batch mean over the GLOBAL batch (b_loc per data row)
                return (
                    jnp.sum(contribs) / (b_loc * n_data),
                    jnp.any(overflows),
                )

            (contrib, overflow), grads = jax.value_and_grad(
                batch_loss, has_aux=True
            )(fp)
            axes = (DATA_AXIS, SPATIAL_AXIS)
            loss = jax.lax.psum(contrib, axes)
            grads = jax.lax.psum(grads, axes)
            overflow = jax.lax.psum(overflow.astype(jnp.int32), axes) > 0
            return loss, grads, overflow

        return local_step

    batched = P(DATA_AXIS, SPATIAL_AXIS)
    rep = P()
    cache = {}

    def step(fp, pos_sh, ptype_sh, counts, unroll_steps: int = 0):
        u = int(unroll_steps)
        if u not in cache:
            cache[u] = jax.jit(shard_map(
                make_local_step(u), mesh=mesh,
                in_specs=(rep, batched, batched, batched),
                out_specs=(rep, rep, rep),
                check_vma=False,
            ))
        return cache[u](fp, pos_sh, ptype_sh, counts)

    return step, core.fp


def _make_core(
    model, mesh, params, *, box, cutoff, input_seq_length, num_mp_steps,
    k_cap, cell_cap, stats, num_particle_types, compute_dtype,
    radius=None, axis_name: str = DATA_AXIS, model_def=None,
):
    """Model dispatch for the spatial cores (gns | painn | segnn)."""
    common = dict(
        box=box, cutoff=cutoff, input_seq_length=input_seq_length,
        num_mp_steps=num_mp_steps, k_cap=k_cap, cell_cap=cell_cap,
        vel_mean=stats["velocity"]["mean"], vel_std=stats["velocity"]["std"],
        acc_mean=stats["acceleration"]["mean"],
        acc_std=stats["acceleration"]["std"], compute_dtype=compute_dtype,
        axis_name=axis_name,
    )
    if model == "gns":
        return _SpatialGNS(
            mesh, params, num_particle_types=num_particle_types, **common
        )
    if model == "painn":
        # the reference's PaiNN radius convention: 1.5x the (physical)
        # connectivity radius, applied to radius-normalized distances
        return _SpatialPaiNN(
            mesh, params, radius=radius or 1.5 * cutoff, **common
        )
    if model == "segnn":
        return _SpatialSEGNN(
            mesh, params, model_def=model_def,
            num_particle_types=num_particle_types, **common,
        )
    if model == "egnn":
        return _SpatialEGNN(
            mesh, params, model_def=model_def,
            num_particle_types=num_particle_types, **common,
        )
    raise ValueError(
        f"spatial sharding supports gns|painn|segnn|egnn, got {model}"
    )


def build_spatial_gns_rollout(
    mesh, params, *, box, cutoff, input_seq_length, num_mp_steps, k_cap,
    cell_cap, normalization_stats, num_particle_types: int = 9,
    compute_dtype=jnp.float32, model: str = "gns", radius=None,
    model_def=None,
):
    """Chunked autoregressive rollout over the spatial mesh.

    Returns fn(pos_sh (n_dev, N_loc, T, dim), ptype_sh, counts, n_steps,
    gt_sh) -> (preds (n_dev, n_steps, N_loc, dim), pos_sh', flags) running
    ``n_steps`` (static) semi-implicit-Euler steps on device. ``flags`` is
    (nl_overflow, drift) — drift means ownership staleness approached the
    halo margin and the caller must re-partition at the returned state.
    ``gt_sh`` (n_dev, n_steps, N_loc, dim) carries the ground-truth
    trajectory in slab order: kinematic particles (walls / moving walls)
    are forced onto it every step, matching the standard rollout's
    semantics (evaluate/rollout.py; reference
    lagrangebench/evaluate/rollout.py:64-69). Pass ``None`` to hold
    kinematic particles at their last position instead (extrapolation
    past the ground truth). ``model`` selects the sharded core
    (gns | painn | segnn | egnn — all cores expose ``_forward``).
    """
    stats = normalization_stats
    core = _make_core(
        model, mesh, params, box=box, cutoff=cutoff,
        input_seq_length=input_seq_length, num_mp_steps=num_mp_steps,
        k_cap=k_cap, cell_cap=cell_cap, stats=stats,
        num_particle_types=num_particle_types, compute_dtype=compute_dtype,
        radius=radius, model_def=model_def,
    )
    isl = core.isl
    box_j = core.box

    def shift(pos, dpos):
        return jnp.mod(pos + dpos, box_j)

    def make_local_rollout(n_steps: int, use_gt: bool):
        def local_rollout(fp, pos, ptype, count, x0, gt):
            pos, ptype, count, x0 = pos[0], ptype[0], count[0], x0[0]
            gt = gt[0]  # (n_steps, N_loc, dim) ground truth, slab order
            d_idx = jax.lax.axis_index(DATA_AXIS)
            n_loc = pos.shape[0]
            valid = jnp.arange(n_loc, dtype=jnp.int32) < count
            kinematic = (ptype == 1) | (ptype == 2) | ~valid
            forced = ((ptype == 1) | (ptype == 2)) & valid

            def step(carry, gt_t):
                cur, nl_ovf, drift = carry
                acc_n, ovf = core._forward(cur, ptype, count, d_idx, fp=fp)
                acc = stats["acceleration"]["mean"] + acc_n * stats[
                    "acceleration"
                ]["std"]
                most = cur[:, -1]
                last_vel = most - cur[:, -2]
                last_vel = last_vel - box_j * jnp.round(last_vel / box_j)
                new_pos = shift(most, last_vel + acc)
                new_pos = jnp.where(kinematic[:, None], most, new_pos)
                if use_gt:
                    # walls / moving walls follow the ground truth, like
                    # the standard rollout (evaluate/rollout.py)
                    new_pos = jnp.where(
                        forced[:, None], gt_t.astype(new_pos.dtype), new_pos
                    )
                cur = jnp.concatenate([cur[:, 1:], new_pos[:, None]], axis=1)
                # ownership-staleness guard: 2*max_drift + cutoff vs width
                dx = new_pos[:, 0] - x0
                dx = dx - core.box_x * jnp.round(dx / core.box_x)
                dmax = jnp.max(jnp.where(valid, jnp.abs(dx), 0.0))
                dmax = jax.lax.pmax(dmax, DATA_AXIS)
                drift = drift | (
                    2 * dmax + core.cutoff >= core.slab_w * 0.95
                )
                return (cur, nl_ovf | ovf, drift), new_pos

            (pos, nl_ovf, drift), preds = jax.lax.scan(
                step,
                (pos.astype(core.pos_dtype), jnp.asarray(False),
                 jnp.asarray(False)),
                gt if use_gt else None, length=n_steps,
            )
            nl_ovf = jax.lax.psum(nl_ovf.astype(jnp.int32), DATA_AXIS) > 0
            drift = jax.lax.psum(drift.astype(jnp.int32), DATA_AXIS) > 0
            return preds[None], pos[None], nl_ovf, drift

        return local_rollout

    batched, rep = P(DATA_AXIS), P()
    cache = {}

    def run(pos_sh, ptype_sh, counts, n_steps: int, gt_sh=None, fp=None):
        """``fp`` overrides the packed parameters captured at build time
        (same layout as ``core.fp``) — lets a training loop re-use one
        compiled rollout across parameter updates."""
        n_steps = int(n_steps)
        use_gt = gt_sh is not None
        if gt_sh is None:
            # zero-length placeholder: the no-target variant scans with
            # xs=None, so nothing is transferred or read through this slot
            gt_sh = jnp.zeros(
                (pos_sh.shape[0], 0) + pos_sh.shape[1:2]
                + (pos_sh.shape[-1],),
                jnp.asarray(pos_sh).dtype,
            )
        key = (n_steps, use_gt)
        if key not in cache:
            sharded = shard_map(
                make_local_rollout(n_steps, use_gt), mesh=mesh,
                in_specs=(rep, batched, batched, batched, batched, batched),
                out_specs=(batched, batched, rep, rep),
                check_vma=False,
            )
            cache[key] = jax.jit(sharded)
        x0 = jnp.asarray(pos_sh)[:, :, isl - 1, 0]
        preds, pos_out, nl_ovf, drift = cache[key](
            core.fp if fp is None else fp,
            jnp.asarray(pos_sh), jnp.asarray(ptype_sh),
            jnp.asarray(counts), x0, jnp.asarray(gt_sh),
        )
        return preds, pos_out, (bool(nl_ovf), bool(drift))

    return run


def spatial_rollout(
    params, pos: np.ndarray, ptype: np.ndarray, *, mesh, box, cutoff,
    input_seq_length, num_mp_steps, n_steps: int, normalization_stats,
    chunk: int = 25, multiplier: float = 1.25, compute_dtype=jnp.float32,
    num_particle_types: int = 9, max_retries: int = 8, model: str = "gns",
    model_def=None, target: Optional[np.ndarray] = None,
    fp=None, build_cache: Optional[dict] = None,
) -> np.ndarray:
    """Full spatially-sharded rollout with host-side fault handling.

    pos: (N, input_seq_length, dim) initial window (global order);
    returns predicted positions (n_steps, N, dim) in the ORIGINAL particle
    order. Re-partitions on drift, escalates capacities on NL overflow.
    ``target`` (n_steps, N, dim, global order): ground-truth trajectory —
    kinematic particles (SOLID_WALL / MOVING_WALL) are forced onto it
    each step, matching the standard rollout's semantics (reference
    lagrangebench/evaluate/rollout.py:64-69); without it they hold their
    last position.

    ``fp`` (packed-layout parameters) overrides ``params`` values at call
    time and ``build_cache`` (a caller-owned dict) re-uses compiled
    rollouts across calls keyed by capacity — together they let the
    spatial trainer run rollout-metric validation without recompiling
    per evaluation.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    n = pos.shape[0]
    box_x = float(np.asarray(box).reshape(-1)[0])
    k_cap, cell_cap = spatial_caps(
        pos[:, -1], box, cutoff, multiplier
    )

    out = np.zeros((n_steps, n, pos.shape[-1]), np.float32)
    done = 0
    cur = np.asarray(pos)
    retries = 0
    run = None
    while done < n_steps:
        if run is None:
            cache_key = (k_cap, cell_cap)
            if build_cache is not None and cache_key in build_cache:
                run = build_cache[cache_key]
            else:
                run = build_spatial_gns_rollout(
                    mesh, params, box=box, cutoff=cutoff,
                    input_seq_length=input_seq_length,
                    num_mp_steps=num_mp_steps,
                    k_cap=k_cap, cell_cap=cell_cap,
                    normalization_stats=normalization_stats,
                    compute_dtype=compute_dtype,
                    num_particle_types=num_particle_types,
                    model=model, model_def=model_def,
                )
                if build_cache is not None:
                    build_cache[cache_key] = run
        pos_sh, ptype_sh, counts, order = spatial_partition(
            cur, ptype, n_dev, box_x
        )
        steps = min(chunk, n_steps - done)
        gt_sh = None
        if target is not None:
            # ground truth for this chunk, permuted into slab order
            n_loc = pos_sh.shape[1]
            gt_sh = np.zeros(
                (n_dev, steps, n_loc, pos.shape[-1]), np.float32
            )
            start = 0
            for d in range(n_dev):
                c = int(counts[d])
                sel = order[start : start + c]
                gt_sh[d, :, :c] = target[done : done + steps, sel]
                start += c
        preds, pos_out, (nl_ovf, drift) = run(
            pos_sh, ptype_sh, counts, steps, gt_sh, fp
        )
        if nl_ovf:
            # capacity escalation: redo this chunk with bigger buffers
            retries += 1
            if retries > max_retries:
                raise RuntimeError(
                    "spatial rollout: capacity escalation failed"
                )
            k_cap = -(-int(k_cap * 1.5) // 8) * 8
            cell_cap = -(-int(cell_cap * 1.5) // 8) * 8
            run = None
            continue
        if drift and steps > 1:
            # ownership staleness approached the halo margin mid-chunk:
            # results past the flag are suspect — redo from the chunk
            # start (freshly partitioned) with a shorter chunk
            retries += 1
            if retries > max_retries:
                raise RuntimeError("spatial rollout: drift retry failed")
            chunk = max(1, steps // 2)
            continue
        retries = 0
        # unpermute into global order
        preds = np.asarray(preds)  # (n_dev, steps, N_loc, dim)
        pos_out = np.asarray(pos_out)
        cur_new = np.zeros_like(cur)
        start = 0
        for d in range(n_dev):
            c = int(counts[d])
            sel = order[start : start + c]
            out[done : done + steps, sel] = preds[d, :steps, :c]
            cur_new[sel] = pos_out[d, :c]
            start += c
        cur = cur_new
        done += steps
    return out


def _host_gns_noise(rng, pos, ptype, isl, noise_std, box):
    """Host-side random-walk noise, same math as strats.add_gns_noise
    (velocity walk with last-step std ``noise_std``, zero on kinematic
    particles, target frames shifted by the last input frame's noise).
    Host numpy because the spatial path partitions on the host anyway."""
    if noise_std <= 0:
        return pos
    n, t, dim = pos.shape
    nvel = isl - 1
    vel_noise = rng.normal(size=(n, nvel, dim)) * (noise_std / nvel**0.5)
    vel_walk = np.cumsum(vel_noise, axis=1)
    pos_noise = np.concatenate(
        [np.zeros((n, 1, dim)), np.cumsum(vel_walk, axis=1)], axis=1
    )
    kin = (ptype == 1) | (ptype == 2) | (ptype == -1)
    pos_noise[kin] = 0.0
    full = np.concatenate(
        [pos_noise, np.repeat(pos_noise[:, -1:], t - isl, axis=1)], axis=1
    )
    return np.mod(pos + full, np.asarray(box))


_UNPACKERS = {
    "gns": lambda fp: _SpatialGNS.unpack_params(fp),
    "painn": lambda fp: _SpatialPaiNN.unpack_params(fp),
    "segnn": lambda fp: fp,
    "egnn": lambda fp: fp,
}


def train_spatial(
    params,
    case,
    data_train,
    data_valid,
    *,
    n_devices: int,
    model: str,
    num_mp_steps: int,
    cfg_train,
    cfg_logging,
    input_seq_length: int,
    metadata,
    model_def=None,
    seed: int = 0,
    step_max: Optional[int] = None,
    store_ckp: Optional[str] = None,
    compute_dtype=jnp.float32,
    multiplier: float = 1.25,
    load_ckp: Optional[str] = None,
    n_rollout_steps_val: int = 20,
    n_trajs_val: int = 2,
):
    """Spatially-sharded training (the ``parallel.spatial: N`` train mode).

    Every optimizer step runs the halo-exchange train step over an
    ``N``-slab ring; with ``train.batch_size > 1`` (and enough devices)
    the batch shards over the rows of a 2D ``(data, space)`` mesh
    (`build_spatial_train_step_dp`). Standard-Trainer semantics carried
    over: mid-training resume (``load_ckp`` restores params, optimizer
    state and step count from a standard-layout checkpoint), loss-only
    validation through a separate jitted eval fn (its capacity
    escalations never touch the training buffers), and best-model
    selection by validation ROLLOUT MSE (``n_trajs_val`` rollouts of
    ``n_rollout_steps_val`` steps through one cached compiled rollout, so
    the best/ dir is picked the same way the standard path picks it),
    and the pushforward curriculum (``cfg_train.pushforward`` — the
    unroll count is sampled per step exactly like the standard Trainer,
    one compiled step variant per count, no gradients through the
    unroll). Documented delta: GNS noise is applied host-side (same
    random-walk math — the spatial path partitions on the host anyway).
    Checkpoints are
    written in the STANDARD parameter layout, so `infer`, `infer_spatial`
    and the reference-checkpoint exporter all consume them unchanged.

    Returns ``(standard_params, state, opt_state)``.
    """
    import optax

    from ..data.loader import DataLoader, cycle
    from ..train.strats import push_forward_sample_steps
    from .mesh import make_mesh, make_mesh_2d

    isl = input_seq_length
    _require_periodic(metadata, "train_spatial")
    bounds = np.asarray(metadata["bounds"], np.float64)
    box = (bounds[:, 1] - bounds[:, 0]).tolist()
    cutoff = float(metadata["default_connectivity_radius"])
    batch = int(cfg_train.batch_size)
    noise_std = float(cfg_train.noise_std)
    step_max = int(step_max if step_max is not None else cfg_train.step_max)
    lw = cfg_train.get("loss_weight", None) if hasattr(
        cfg_train, "get"
    ) else None
    if lw is not None and (
        float(lw.get("pos", 0)) != 0 or float(lw.get("vel", 0)) != 0
    ):
        print(
            "WARNING: spatial training optimizes the acceleration MSE; "
            "train.loss_weight pos/vel components are ignored."
        )
    # separate Generators: the loader shuffles in its prefetch thread,
    # noise draws happen on the main thread — sharing one Generator would
    # be thread-unsafe and scheduling-dependent
    rng_noise = np.random.default_rng(seed)
    rng_loader = np.random.default_rng(seed + 2)
    rng_push = np.random.default_rng(seed + 3)

    pushforward = cfg_train.get("pushforward", None) if hasattr(
        cfg_train, "get"
    ) else getattr(cfg_train, "pushforward", None)
    max_unroll = int(max(pushforward.unrolls)) if pushforward else 0

    n_avail = len(jax.devices())
    if batch > 1:
        # batch rows shard over the largest feasible data axis; the rest
        # of the batch vmaps within each row (b_loc = batch // n_data)
        n_data = 1
        for d in range(min(batch, n_avail // n_devices), 0, -1):
            if batch % d == 0:
                n_data = d
                break
        mesh = make_mesh_2d(n_data, n_devices)
    else:
        mesh = make_mesh(n_devices)

    step_start = 0
    if load_ckp is not None:
        # resume from a standard-layout checkpoint (spatial checkpoints
        # export standard layout, so this also chains spatial runs)
        from ..checkpoint import load_checkpoint

        params, _, opt_leaves, ckp_step = load_checkpoint(load_ckp)
        step_start = int(ckp_step) + 1
    else:
        opt_leaves = None

    pos0, _ = data_train[0]
    pos0 = np.asarray(pos0)
    k_cap, cell_cap = spatial_caps(
        pos0[:, isl - 1], box, cutoff, multiplier
    )

    def build(k_cap, cell_cap):
        builder = (
            build_spatial_train_step_dp if batch > 1
            else build_spatial_gns_train_step
        )
        return builder(
            mesh, params, box=box, cutoff=cutoff, input_seq_length=isl,
            num_mp_steps=num_mp_steps, k_cap=k_cap, cell_cap=cell_cap,
            normalization_stats=case.normalization_stats,
            compute_dtype=compute_dtype, model=model, model_def=model_def,
        )

    def build_eval(k_cap, cell_cap):
        return build_spatial_loss_fn(
            mesh, params, box=box, cutoff=cutoff, input_seq_length=isl,
            num_mp_steps=num_mp_steps, k_cap=k_cap, cell_cap=cell_cap,
            normalization_stats=case.normalization_stats,
            compute_dtype=compute_dtype, model=model, model_def=model_def,
        )

    step_fn, fp = build(k_cap, cell_cap)
    fp = jax.tree.map(jnp.asarray, fp)
    # validation runs its own loss-only fn with its own capacities, so
    # eval-side escalations never inflate the training buffers
    k_cap_e, cell_cap_e = k_cap, cell_cap
    eval_fn = build_eval(k_cap_e, cell_cap_e)

    lr_scheduler = optax.exponential_decay(
        init_value=float(cfg_train.optimizer.lr_start),
        transition_steps=int(cfg_train.optimizer.lr_decay_steps),
        decay_rate=float(cfg_train.optimizer.lr_decay_rate),
        end_value=float(cfg_train.optimizer.lr_final),
    )
    opt_init, opt_update = optax.adamw(
        learning_rate=lr_scheduler, weight_decay=1e-8
    )
    opt_state = opt_init(fp)
    if opt_leaves is not None:
        try:
            opt_state = opt_leaves.restore(opt_state)
        except AssertionError as e:
            # e.g. the checkpoint came from the standard Trainer (standard
            # parameter layout != fused layout) — fresh optimizer then
            print(f"WARNING: optimizer state not restored ({e}); starting "
                  f"the optimizer fresh at step {step_start}.")

    @jax.jit
    def apply_update(fp, opt_state, grads):
        updates, opt_state = opt_update(grads, opt_state, fp)
        return optax.apply_updates(fp, updates), opt_state

    def prepare(batch_samples, noise: float, extra: int = 0):
        """Noise + partition + pad a list of (pos, ptype) samples.

        ``extra`` target frames beyond isl+1 are kept for pushforward
        unrolls; when > 0 the RAW isl-frame input window is appended
        after the noised frames (the unroll's integration base — see
        ``_sample_loss_contrib``). Everything is partitioned in one
        array so slab order is consistent."""
        parts = []
        for pos, ptype in batch_samples:
            pos = np.asarray(pos)[:, : isl + 1 + extra]
            assert pos.shape[1] == isl + 1 + extra, (
                f"pushforward needs {isl + 1 + extra} frames per window, "
                f"got {pos.shape[1]} — was the dataset loaded with "
                f"extra_seq_length=max_unroll?"
            )
            ptype = np.asarray(ptype)
            raw_win = pos[:, :isl].copy() if extra > 0 else None
            pos = _host_gns_noise(rng_noise, pos, ptype, isl, noise, box)
            if extra > 0:
                pos = np.concatenate([pos, raw_win], axis=1)
            parts.append(spatial_partition(pos, ptype, n_devices, box[0]))
        n_loc = max(p[0].shape[1] for p in parts)

        def pad(a, fill=0):
            width = [(0, 0)] * a.ndim
            width[1] = (0, n_loc - a.shape[1])
            return np.pad(a, width, constant_values=fill)

        pos_b = np.stack([pad(p[0]) for p in parts])
        ptype_b = np.stack([pad(p[1], fill=-1) for p in parts])
        counts_b = np.stack([p[2] for p in parts])
        if batch == 1:
            return pos_b[0], ptype_b[0], counts_b[0]
        return pos_b, ptype_b, counts_b

    loader = cycle(
        DataLoader(
            data_train, batch_size=batch, shuffle=True, drop_last=True,
            rng=rng_loader,
        )
    )
    # ONE persistent validation iterator (a fresh iter() per eval would
    # leak its blocked producer thread); drop_last keeps the mesh shape
    assert len(data_valid) >= batch, (
        f"data_valid has {len(data_valid)} samples; spatial training "
        f"evaluates batches of {batch}"
    )
    loader_valid = cycle(
        DataLoader(
            data_valid, batch_size=batch, drop_last=True,
            rng=np.random.default_rng(seed + 1),
        )
    )

    def split_batch(raw):
        if batch > 1:
            return list(zip(np.asarray(raw[0]), np.asarray(raw[1])))
        return [(raw[0][0], raw[1][0])]

    # validation rollouts: one cached compiled rollout (1D slab ring) with
    # the live packed params threaded per call — best-model selection by
    # val ROLLOUT MSE, like the standard Trainer
    rollout_mesh = mesh if batch == 1 else make_mesh(n_devices)
    rollout_cache: dict = {}

    def val_rollout_mse(fp_now):
        # the live fp is committed to the (possibly 2D) TRAINING mesh;
        # the validation rollout runs on its own 1D slab mesh — rehome
        # the (replicated, small) parameters to host first
        fp_now = jax.tree.map(np.asarray, jax.device_get(fp_now))
        mses = []
        for i in range(min(n_trajs_val, len(data_valid))):
            vpos_i, vpt_i = data_valid[i]
            vpos_i = np.asarray(vpos_i)
            horizon = vpos_i.shape[1] - isl
            if n_rollout_steps_val > 0:
                horizon = min(horizon, n_rollout_steps_val)
            if horizon < 1:
                continue
            tgt = vpos_i[:, isl : isl + horizon].transpose(1, 0, 2)
            preds = spatial_rollout(
                params, vpos_i[:, :isl], np.asarray(vpt_i),
                mesh=rollout_mesh, box=box, cutoff=cutoff,
                input_seq_length=isl, num_mp_steps=num_mp_steps,
                n_steps=horizon,
                normalization_stats=case.normalization_stats,
                compute_dtype=compute_dtype, model=model,
                model_def=model_def, target=tgt, fp=fp_now,
                build_cache=rollout_cache,
            )
            # plain (unwrapped) position MSE, like MetricsComputer's "mse"
            mses.append(float(np.mean((preds - tgt) ** 2)))
        return float(np.mean(mses)) if mses else None

    log_steps = int(cfg_logging.log_steps)
    eval_steps = int(cfg_logging.eval_steps)
    state = {}
    step = step_start
    retries = 0
    while step < step_max:
        unroll = (
            push_forward_sample_steps(rng_push, step, pushforward)
            if pushforward else 0
        )
        pos_b, ptype_b, counts_b = prepare(split_batch(next(loader)),
                                           noise_std, extra=max_unroll)
        loss, grads, overflow = step_fn(
            fp, jnp.asarray(pos_b), jnp.asarray(ptype_b),
            jnp.asarray(counts_b), unroll_steps=unroll,
        )
        if bool(overflow):
            retries += 1
            assert retries <= 8, "spatial training: capacity escalation failed"
            k_cap = -(-int(k_cap * 1.5) // 8) * 8
            cell_cap = -(-int(cell_cap * 1.5) // 8) * 8
            step_fn, _ = build(k_cap, cell_cap)
            continue  # discard this update, retry the next batch
        retries = 0
        fp, opt_state = apply_update(fp, opt_state, grads)

        if step % log_steps == 0:
            print(f"{step}, train/loss: {float(loss):.5f}.")
        if (step % eval_steps == 0 and step > 0) or step == step_max - 1:
            # clean (noise-free) validation loss through the loss-only fn
            # (no gradient work); on NL overflow escalate the EVAL
            # capacities only and retry, so a truncated graph is never
            # recorded and training buffers stay at their working size
            vpos, vptype, vcounts = prepare(
                split_batch(next(loader_valid)), 0.0
            )
            for _ in range(8):
                vloss, v_overflow = eval_fn(
                    fp, jnp.asarray(vpos), jnp.asarray(vptype),
                    jnp.asarray(vcounts),
                )
                if not bool(v_overflow):
                    break
                k_cap_e = -(-int(k_cap_e * 1.5) // 8) * 8
                cell_cap_e = -(-int(cell_cap_e * 1.5) // 8) * 8
                eval_fn = build_eval(k_cap_e, cell_cap_e)
            else:
                raise RuntimeError(
                    "spatial training: validation capacity escalation failed"
                )
            vloss = float(vloss)
            vroll = val_rollout_mse(fp)
            if vroll is None:
                # no validation trajectory yields a >=1-step horizon
                # (all shorter than input_seq_length+1): fall back to the
                # one-step loss so best-model tracking keeps operating
                warnings.warn(
                    "spatial training: no validation trajectory long "
                    "enough for a rollout; best-model selection falls "
                    "back to the one-step validation loss"
                )
                vroll = vloss
            print(f"{step}, val/loss: {vloss:.6f}, "
                  f"val/rollout_mse: {vroll:.3e}.")
            if store_ckp is not None:
                from ..checkpoint import save_checkpoint

                std_params = jax.tree.map(
                    np.asarray, _UNPACKERS[model](jax.device_get(fp))
                )
                save_checkpoint(
                    store_ckp, std_params, state, opt_state,
                    {"step": step, "loss": vroll, "val_loss": vloss},
                )
        step += 1

    std_params = jax.tree.map(
        np.asarray, _UNPACKERS[model](jax.device_get(fp))
    )
    return std_params, state, opt_state


def infer_spatial(
    params,
    case,
    data_test,
    *,
    n_devices: int,
    num_mp_steps: int,
    cfg_eval_infer=None,
    n_rollout_steps: int = 20,
    compute_dtype=jnp.float32,
    model: str = "gns",
    model_def=None,
):
    """Spatially-sharded inference over a test split.

    The runner dispatches here when ``parallel.spatial > 1`` in infer
    mode. Metrics are computed on the gathered global trajectory with the
    standard MetricsComputer. Kinematic particles (walls / moving walls)
    are forced to the ground-truth trajectory each step, matching the
    standard ``infer`` semantics (reference
    lagrangebench/evaluate/rollout.py:64-69), so metrics are directly
    comparable. Requires a fully periodic box (the slab partition wraps
    positions); the runner and this function both reject non-periodic
    datasets.
    """
    from ..config import merge
    from ..defaults import defaults
    from ..evaluate.metrics import MetricsComputer
    from .mesh import make_mesh

    cfg = merge(defaults.eval.infer, cfg_eval_infer or {})
    metadata = data_test.metadata
    _require_periodic(metadata, "infer_spatial")
    isl = data_test.input_seq_length
    mesh = make_mesh(n_devices)
    bounds = np.asarray(metadata["bounds"], np.float64)
    box = bounds[:, 1] - bounds[:, 0]
    cutoff = float(metadata["default_connectivity_radius"])

    metrics_computer = MetricsComputer(
        list(cfg.metrics),
        dist_fn=case.displacement,
        metadata=metadata,
        input_seq_length=isl,
        stride=cfg.metrics_stride,
    )
    n_trajs = cfg.n_trajs if cfg.n_trajs != -1 else data_test.num_samples
    n_trajs = min(n_trajs, data_test.num_samples)

    out = {}
    for i in range(n_trajs):
        pos, ptype = data_test[i]
        pos = np.asarray(pos)
        n_steps = pos.shape[1] - isl
        if n_rollout_steps > 0:
            n_steps = min(n_steps, n_rollout_steps)
        window = pos[:, :isl]
        target = pos[:, isl : isl + n_steps]  # (N, T, dim)
        preds = spatial_rollout(
            params, window, np.asarray(ptype), mesh=mesh, box=box,
            cutoff=cutoff, input_seq_length=isl,
            num_mp_steps=num_mp_steps, n_steps=n_steps,
            normalization_stats=case.normalization_stats,
            compute_dtype=compute_dtype, model=model, model_def=model_def,
            target=target.transpose(1, 0, 2),
        )
        m = metrics_computer(
            jnp.asarray(preds), jnp.asarray(target.transpose(1, 0, 2))
        )
        out[f"rollout_{i}"] = jax.tree.map(np.asarray, m)
    return out
