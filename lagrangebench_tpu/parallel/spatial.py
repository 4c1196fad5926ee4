"""Spatial (particle-axis) sharding with halo exchange.

The SP/CP analogue for particle simulations (SURVEY §2.3): the box is
split into slabs along x, each device owns the particles of one slab, and
message passing exchanges only the *projected* sender states of the two
neighboring slabs per MP step — two ring ``ppermute``s of an (N_loc, H)
block over ICI, no gather across devices. This is what scales the
workload past one chip's HBM for 100k+ particle cases: positions, edge
states (N_loc, K, H) and node states never leave their device.

v1 scope:
* slab partition along axis 0 (x), periodic in x (ring exchange with a
  ±box shift across the wrap);
* the whole neighbor slab acts as the halo (correct whenever the slab
  width exceeds the cutoff — asserted); candidate validity is tracked by
  per-segment counts, so per-device padding never forms edges;
* a functional GNS forward that consumes the *standard* flax GNS
  parameter tree (models/gns.py) — spatially-sharded inference/eval
  reuses trained checkpoints unchanged. Verified against the unsharded
  model on an 8-device CPU mesh in tests/test_spatial.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS

LN_EPS = 1e-5  # haiku default; matches models/utils.MLP


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


def _dense(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _layernorm(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _mlp(p: Dict, x: jnp.ndarray, layer_norm: bool = True) -> jnp.ndarray:
    n_dense = len([k for k in p if k.startswith("Dense")])
    for i in range(n_dense):
        x = _dense(p[f"Dense_{i}"], x)
        if i < n_dense - 1:
            x = jax.nn.relu(x)
    if layer_norm:
        x = _layernorm(p["LayerNorm_0"], x)
    return x


def build_spatial_gns_forward(
    mesh,
    params,
    *,
    box,
    cutoff: float,
    input_seq_length: int,
    num_mp_steps: int,
    k_cap: int,
    vel_mean,
    vel_std,
    num_particle_types: int = 9,
    compute_dtype=jnp.float32,
):
    """Spatially-sharded GNS forward over a 1D device mesh.

    Returns fn(pos_sh, ptype_sh, counts) -> (acc (n_dev, N_loc, dim),
    overflow) where inputs are ``spatial_partition`` outputs placed on the
    mesh. ``params`` is the standard flax GNS tree; only {"acc"} models
    are supported (GNS).
    """
    n_dev = int(np.prod(mesh.devices.shape))
    cdt = jnp.dtype(compute_dtype)
    pos_dtype = jnp.float64 if cdt == jnp.float64 else jnp.float32
    box = jnp.asarray(box, pos_dtype)
    box_x = float(box[0])
    assert box_x / n_dev >= cutoff, (
        f"slab width {box_x / n_dev:.4f} below cutoff {cutoff}: a 1-slab "
        "halo is not enough; use fewer devices or a larger box"
    )
    vel_mean = jnp.asarray(vel_mean, pos_dtype)
    vel_std = jnp.asarray(vel_std, pos_dtype)
    isl = input_seq_length
    out_dtype = jnp.float64 if cdt == jnp.float64 else jnp.float32

    def displacement(a, b):
        d = a - b
        return d - box * jnp.round(d / box)

    def left(x):
        return jax.lax.ppermute(
            x, DATA_AXIS, [(s, (s + 1) % n_dev) for s in range(n_dev)]
        )

    def right(x):
        return jax.lax.ppermute(
            x, DATA_AXIS, [(s, (s - 1) % n_dev) for s in range(n_dev)]
        )

    def local_forward(pos, ptype, count):
        # pos (1, N_loc, T, dim) local block
        pos = pos[0]
        ptype = ptype[0]
        count = count[0]
        n_loc = pos.shape[0]
        d_idx = jax.lax.axis_index(DATA_AXIS)

        most_recent = pos[:, isl - 1]

        # ---- halo: whole neighbor slabs, x-shifted across the wrap
        ghost_l_pos = left(most_recent)
        ghost_r_pos = right(most_recent)
        shift_l = jnp.where(d_idx == 0, -box_x, 0.0)
        shift_r = jnp.where(d_idx == n_dev - 1, box_x, 0.0)
        ghost_l_pos = ghost_l_pos.at[:, 0].add(shift_l)
        ghost_r_pos = ghost_r_pos.at[:, 0].add(shift_r)
        count_l = left(count)
        count_r = right(count)

        cand_pos = jnp.concatenate(
            [most_recent, ghost_l_pos, ghost_r_pos], axis=0
        )  # (3N_loc, dim)
        slot = jnp.arange(3 * n_loc, dtype=jnp.int32)
        seg_count = jnp.where(
            slot < n_loc,
            count,
            jnp.where(slot < 2 * n_loc, count_l, count_r),
        )
        cand_valid = (slot % n_loc) < seg_count  # (3N_loc,)

        # ---- local dense NL: ghosts are pre-shifted, plain differences
        # suffice in x; y/z use min-image
        diff = most_recent[:, None, :] - cand_pos[None, :, :]
        diff = diff - box * jnp.round(diff / box)
        dist2 = jnp.sum(diff * diff, axis=-1)
        recv_valid = jnp.arange(n_loc) < count
        within = (
            (dist2 <= cutoff * cutoff)
            & cand_valid[None, :]
            & recv_valid[:, None]
        )
        n_within = within.sum(axis=1)
        overflow = jnp.any(n_within > k_cap)
        # top-k pack: the first k_cap in-range candidate slots per receiver
        neg_rank = jnp.where(within, -slot[None, :], -(3 * n_loc + 1))
        _, senders = jax.lax.top_k(neg_rank, k_cap)  # ascending slot order
        k_iota = jax.lax.broadcasted_iota(jnp.int32, senders.shape, 1)
        edge_valid = k_iota < n_within[:, None]
        senders = jnp.where(edge_valid, senders, 3 * n_loc - 1)

        # ---- features (contract of case/features.py, PBC branch)
        vel = jax.vmap(jax.vmap(displacement))(pos[:, 1:isl], pos[:, : isl - 1])
        vel_hist = ((vel - vel_mean) / vel_std).reshape(n_loc, -1)
        edge_disp = (most_recent[:, None, :] - cand_pos[senders]) * -1.0
        edge_disp = edge_disp - box * jnp.round(edge_disp / box)
        # rel_disp points sender -> receiver (displacement(recv, send))
        rel_disp = jnp.where(
            edge_valid[..., None], -edge_disp / cutoff, 0.0
        )
        rel_dist = jnp.sqrt(jnp.sum(rel_disp**2, axis=-1, keepdims=True))

        # ---- GNS math on the standard parameter tree (models/gns.py)
        embed = params["Embed_0"]["embedding"][
            jnp.mod(ptype, num_particle_types)
        ]
        nodes = jnp.concatenate([vel_hist, embed], axis=-1).astype(cdt)
        edges = jnp.concatenate([rel_disp, rel_dist], axis=-1).astype(cdt)

        h = _mlp(params["MLP_0"], nodes)
        e = _mlp(params["MLP_1"], edges)

        for i in range(num_mp_steps):
            hs_proj = _dense(params[f"Dense_{3 * i}"], h)
            hr_proj = _dense(params[f"Dense_{3 * i + 1}"], h)
            e_proj = _dense(params[f"Dense_{3 * i + 2}"], e)
            # halo exchange of the PROJECTED sender states: 2 ppermutes of
            # (N_loc, H) per MP step — the only cross-device traffic
            hs_ext = jnp.concatenate(
                [hs_proj, left(hs_proj), right(hs_proj)], axis=0
            )
            first = e_proj + hs_ext[senders] + hr_proj[:, None, :]
            messages = _mlp(params[f"MLP_{2 + 2 * i}"], jax.nn.relu(first))
            agg = jnp.sum(
                jnp.where(edge_valid[..., None], messages, 0.0), axis=1
            )
            h_new = _mlp(
                params[f"MLP_{3 + 2 * i}"],
                jnp.concatenate([h, agg], axis=-1),
            )
            h = h + h_new
            e = e + messages

        acc = _mlp(
            params[f"MLP_{2 + 2 * num_mp_steps}"], h, layer_norm=False
        )
        overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return acc[None].astype(out_dtype), overflow

    batched, rep = P(DATA_AXIS), P()
    sharded = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(batched, batched, batched),
        out_specs=(batched, rep),
        check_vma=False,
    )
    return jax.jit(sharded)
