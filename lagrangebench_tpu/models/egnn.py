"""E(n)-equivariant GNN (EGNN), Garcia Satorras et al. 2021.

TPU-native flax re-implementation with the reference's physics adaptations
(reference lagrangebench/models/egnn.py): boundary-aware shift/displacement
in all position updates, positions integrated across layers with dt divided
by the number of layers, and a finite-difference postprocessing step that
emits {"pos", "vel", "acc"} (trained with the position loss in the shipped
configs). Message aggregation uses receiver-sorted segment sums.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import aggregate_to_receivers, segment_sum
from ..utils import NodeType
from .base import BaseModel, Sample
from .utils import MLPXav, matmul_precision


def _small_uniform(scale: float):
    """Near-zero uniform init for the correction heads (scaled by dt)."""
    return nn.initializers.variance_scaling(
        scale=3.0 * scale * scale, mode="fan_in", distribution="uniform"
    )


class EGNNLayer(nn.Module):
    """One EGNN interaction layer: scalar messages + position correction."""

    hidden_size: int
    output_size: int
    displacement_fn: Callable  # vmapped over nodes/edges
    shift_fn: Callable  # vmapped over nodes
    blocks: int = 1
    act_fn: Callable = nn.silu
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    dt: float = 0.001
    eps: float = 1e-8
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        pos: jnp.ndarray,
        vel: jnp.ndarray,
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        edge_attribute: Optional[jnp.ndarray] = None,
        node_attribute: Optional[jnp.ndarray] = None,
        sender_h: Optional[jnp.ndarray] = None,
        sender_pos: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        sender_scatter_fn: Optional[Callable] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``sender_h``/``sender_pos``/``edge_mask``/``sender_scatter_fn``
        serve the spatially-sharded path (parallel/spatial.py): senders
        index halo-extended candidate arrays, edge validity comes from an
        explicit mask, and the sender-directed position scatter routes
        halo contributions back to their owners."""
        n = h.shape[0]
        h_src = h if sender_h is None else sender_h
        pos_src = pos if sender_pos is None else sender_pos

        # radial geometry at the current (intra-layer) positions; shapes are
        # (E, dim) for sparse edges or (N, K, dim) for dense
        coord_diff = self.displacement_fn(pos_src[senders], pos[receivers])
        radial = jnp.sum(coord_diff**2, axis=-1, keepdims=True)
        if self.normalize:
            coord_diff = coord_diff / (jnp.sqrt(radial) + self.eps)

        # scalar messages
        msg_in = [h_src[senders], h[receivers], radial]
        if edge_attribute is not None:
            msg_in.append(edge_attribute)
        msg = MLPXav(
            [self.hidden_size] * self.blocks + [self.hidden_size],
            activation=self.act_fn,
            activate_final=True,
            dtype=self.dtype,
        )(jnp.concatenate(msg_in, axis=-1))
        if self.attention:
            att = nn.sigmoid(
                nn.Dense(
                    self.hidden_size,
                    kernel_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype,
                    precision=matmul_precision(self.dtype),
                )(msg)
            )
            msg = msg * att

        # node update from receiver-aggregated messages
        agg = aggregate_to_receivers(msg, receivers, senders, n, mask=edge_mask)
        upd_in = [h, agg]
        if node_attribute is not None:
            upd_in.append(node_attribute)
        h_new = MLPXav(
            [self.hidden_size] * self.blocks + [self.output_size],
            activation=self.act_fn,
            activate_final=False,
            dtype=self.dtype,
        )(jnp.concatenate(upd_in, axis=-1))
        if self.residual:
            h_new = (h + h_new).astype(h.dtype)

        # position correction from per-edge vectors, aggregated over senders
        def correction_head(x, name):
            for _ in range(self.blocks):
                x = nn.Dense(
                    self.hidden_size,
                    kernel_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype,
                    precision=matmul_precision(self.dtype),
                )(x)
            x = self.act_fn(x)
            x = nn.Dense(
                1, use_bias=False, kernel_init=_small_uniform(self.dt),
                dtype=self.dtype,
                precision=matmul_precision(self.dtype),
            )(x)
            if name == "pos" and self.tanh:
                x = nn.tanh(x)
            return x

        trans = coord_diff * correction_head(msg, "pos").astype(pos.dtype)
        if edge_mask is not None:
            trans = jnp.where(edge_mask[..., None], trans, 0.0)
        scatter = sender_scatter_fn or (
            lambda t, s: segment_sum(t, s, num_segments=n)
        )
        pos_update = scatter(trans, senders)
        pos = self.shift_fn(pos, pos_update)
        # velocity integration term
        pos = self.shift_fn(
            pos, correction_head(h_new, "vel").astype(pos.dtype) * vel
        )

        return h_new, pos


class EGNN(BaseModel):
    """EGNN model over the LagrangeBench feature contract.

    Node inputs are velocity-magnitude scalars (plus one-hot types for
    heterogeneous systems), node vectors are handled implicitly through the
    position channel; outputs are absolute positions with finite-difference
    velocity/acceleration.
    """

    hidden_size: int
    output_size: int
    dt: float
    n_vels: int
    displacement_fn: Callable  # single-pair displacement
    shift_fn: Callable  # single-point shift
    velocity_stats: Dict[str, jnp.ndarray]
    act_fn: Callable = nn.silu
    num_mp_steps: int = 4
    homogeneous_particles: bool = True
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, sample: Sample) -> Dict[str, jnp.ndarray]:
        features, particle_type = sample
        n = features["vel_hist"].shape[0]

        vel_hist = features["vel_hist"].reshape(n, self.n_vels, -1)
        pos = features["abs_pos"][:, -1]
        edge_attr = features["rel_dist"]
        node_attr = None
        if "force" in features:
            node_attr = jnp.sqrt(
                jnp.sum(features["force"] ** 2, axis=-1, keepdims=True)
            )

        # scalar node features: per-step velocity magnitudes (+ types);
        # the eps keeps the sqrt gradient finite for static particles
        node_scalars = jnp.sqrt(jnp.sum(vel_hist**2, axis=-1) + 1e-16)
        if not self.homogeneous_particles:
            onehot = jax.nn.one_hot(particle_type, NodeType.SIZE)
            node_scalars = jnp.concatenate([node_scalars, onehot], axis=-1)

        dtype = jnp.dtype(self.compute_dtype)
        h = nn.Dense(
            self.hidden_size,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dtype,
            precision=matmul_precision(dtype),
        )(node_scalars)

        disp_vmap = jax.vmap(self.displacement_fn, in_axes=(0, 0))
        shift_vmap = jax.vmap(self.shift_fn, in_axes=(0, 0))

        # EGNN integrates unnormalized velocities
        stats = self.velocity_stats
        prev_vel = vel_hist[:, -1] * stats["std"] + stats["mean"]

        senders = features["senders"]
        receivers = features["receivers"]

        next_pos = pos
        for _ in range(self.num_mp_steps):
            h, next_pos = EGNNLayer(
                hidden_size=self.hidden_size,
                output_size=self.hidden_size,
                displacement_fn=disp_vmap,
                shift_fn=shift_vmap,
                act_fn=self.act_fn,
                residual=self.residual,
                attention=self.attention,
                normalize=self.normalize,
                tanh=self.tanh,
                dt=self.dt / self.num_mp_steps,
                dtype=dtype,
            )(h, next_pos, prev_vel, senders, receivers, edge_attr, node_attr)

        # finite differences back to vel/acc
        next_vel = disp_vmap(next_pos, pos)
        acc = next_vel - prev_vel
        return {"pos": next_pos, "vel": next_vel, "acc": acc}


def build_egnn(cfg_model, metadata, velocity_stats=None):
    """EGNN factory from config + metadata (reference runner.py:246-269)."""
    import numpy as np

    from ..ops import space

    bounds = np.asarray(metadata["bounds"])
    box = bounds[:, 1] - bounds[:, 0]
    if any(metadata["periodic_boundary_conditions"]):
        displacement_fn, shift_fn = space.periodic(jnp.asarray(box))
    else:
        displacement_fn, shift_fn = space.free()

    if velocity_stats is None:
        velocity_stats = {"mean": jnp.zeros(()), "std": jnp.ones(())}

    return EGNN(
        hidden_size=cfg_model.latent_dim,
        output_size=1,
        dt=metadata["dt"] * metadata.get("write_every", 1),
        n_vels=cfg_model.input_seq_length - 1,
        displacement_fn=displacement_fn,
        shift_fn=shift_fn,
        velocity_stats=velocity_stats,
        num_mp_steps=cfg_model.num_mp_steps,
        residual=True,
        compute_dtype=cfg_model.get("compute_dtype", "float32"),
    )
