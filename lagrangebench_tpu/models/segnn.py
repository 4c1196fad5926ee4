"""Steerable E(3)-equivariant GNN (SEGNN), Brandstetter et al. 2022.

TPU-native flax re-implementation of the reference SEGNN
(reference lagrangebench/models/segnn.py) on top of the in-repo steerable
engine (models/e3): fused parametrized tensor products instead of e3nn,
receiver-sorted segment aggregation instead of jraph, basis convention
(x, y, z).

Parity notes vs the reference:
* The edge-embedding branch is omitted — in the reference it computes the
  embedding and discards the result (segnn.py:209-215), and the flag
  defaults to False.
* Node feature irreps are aligned with the actual concatenation order
  (the reference's `node_irreps` composer lists bound/force vectors before
  the magnitude scalars but concatenates magnitudes first; we concatenate
  in irreps order: vectors first, scalars after).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flax import linen as nn

from ..ops.scatter import aggregate_mean_to_receivers, aggregate_to_receivers
from ..utils import NodeType
from .base import BaseModel, Sample
from .e3 import (
    Irreps,
    IrrepsArray,
    from_mul_major,
    O3TensorProduct,
    O3TensorProductGate,
    concatenate,
    spherical_harmonics_fn,
)
from .utils import features_2d_to_3d


def weight_balanced_irreps(
    scalar_units: int, irreps_right: Irreps, lmax: int
) -> Irreps:
    """Left irreps with enough tensor-product paths to match a
    scalar_units^2 dense layer (reference segnn.py:365-400)."""
    linear_weights = scalar_units**2
    n = 0
    while True:
        n += 1
        irreps_left = (Irreps.spherical_harmonics(lmax) * n).sort().simplify()
        tp_weights = sum(
            gl.mul**2 * gr.mul
            for gl in irreps_left
            for gr in irreps_right
            for g_out in irreps_left
            if g_out.ir in gl.ir * gr.ir
        )
        if tp_weights >= linear_weights:
            return irreps_left


def node_feature_irreps(
    metadata: Dict,
    input_seq_length: int,
    has_external_force: bool,
    has_magnitudes: bool,
    homogeneous_particles: bool,
) -> Irreps:
    """Irreps of the (3D-lifted) node features, in concatenation order."""
    parts = [f"{input_seq_length - 1}x1o"]
    if not any(metadata["periodic_boundary_conditions"]):
        parts.append("2x1o")
    if has_external_force:
        parts.append("1x1o")
    if has_magnitudes:
        parts.append(f"{input_seq_length - 1}x0e")
    if not homogeneous_particles:
        parts.append(f"{NodeType.SIZE}x0e")
    return Irreps("+".join(parts))


class SEGNNLayer(nn.Module):
    """One steerable message-passing step."""

    output_irreps: Irreps
    n_blocks: int = 2
    norm: Optional[str] = None
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        nodes: IrrepsArray,
        node_attributes: IrrepsArray,
        edge_attributes: IrrepsArray,
        additional_message_features: Optional[IrrepsArray],
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        sender_nodes: Optional[IrrepsArray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
    ) -> IrrepsArray:
        """``sender_nodes``/``edge_mask`` serve the spatially-sharded path
        (parallel/spatial.py): senders index a halo-extended candidate
        array instead of ``nodes``, and edge validity comes from an
        explicit mask (valid halo sender ids are >= n)."""
        n = nodes.shape[0]

        # message: phi_m steered by edge attributes (all chunk-wise: no
        # slice/concat relayout copies, and the dense-layout receiver side
        # is a broadcast, not a row-iota gather)
        if receivers.ndim == 2:
            recv_nodes = nodes.broadcast_edges(receivers.shape[1])
        else:
            recv_nodes = nodes.indexed(receivers)
        src = nodes if sender_nodes is None else sender_nodes
        gathered = [src.indexed(senders), recv_nodes]
        if additional_message_features is not None:
            gathered.append(additional_message_features)
        msg = concatenate(gathered)
        for _ in range(self.n_blocks):
            msg = O3TensorProductGate(
                self.output_irreps, compute_dtype=self.compute_dtype
            )(msg, edge_attributes)

        # aggregate to receivers (padded edges masked / dropped), part-wise
        agg = IrrepsArray.from_parts(
            msg.irreps,
            [
                [
                    aggregate_to_receivers(
                        p, receivers, senders, n, mask=edge_mask
                    )
                    for p in ps
                ]
                for ps in msg.parts()
            ],
        )

        # update: phi_f steered by node attributes, residual
        x = concatenate([nodes, agg])
        for _ in range(self.n_blocks - 1):
            x = O3TensorProductGate(
                self.output_irreps, compute_dtype=self.compute_dtype
            )(x, node_attributes)
        update = O3TensorProduct(
            self.output_irreps, compute_dtype=self.compute_dtype
        )(x, node_attributes)

        out = nodes + update
        if self.norm == "instance":
            out = _instance_norm(out)
        return out


def _instance_norm(z: IrrepsArray, eps: float = 1e-6) -> IrrepsArray:
    """RMS-normalize each irrep channel over the node axis."""
    outs = []
    for ps in z.parts():  # per-m (N, mul) parts
        # mean_N sum_m p_m^2 == sum_m mean_N p_m^2, shape (1, mul)
        norm2 = sum(jnp.mean(p**2, axis=0, keepdims=True) for p in ps)
        inv = 1.0 / jnp.sqrt(norm2 + eps)
        outs.append([p * inv for p in ps])
    return IrrepsArray.from_parts(z.irreps, outs)


class SEGNN(BaseModel):
    """SEGNN over the LagrangeBench feature contract."""

    node_features_irreps: Irreps
    edge_features_irreps: Irreps
    scalar_units: int
    lmax_hidden: int
    lmax_attributes: int
    output_irreps: Irreps
    num_mp_steps: int
    n_vels: int
    velocity_aggregate: str = "avg"
    homogeneous_particles: bool = True
    norm: Optional[str] = None
    blocks_per_step: int = 2
    compute_dtype: str = "float32"

    def _attributes(
        self, features: Dict[str, jnp.ndarray], n_nodes: int
    ) -> Tuple[IrrepsArray, IrrepsArray]:
        """Steerable node/edge attributes from geometry and velocity."""
        attribute_irreps = Irreps.spherical_harmonics(self.lmax_attributes)
        sh = spherical_harmonics_fn(self.lmax_attributes)

        vel_hist = features["vel_hist"].reshape(n_nodes, self.n_vels, 3)
        if self.n_vels == 1:
            vel = vel_hist[:, 0]
        elif self.velocity_aggregate == "avg":
            vel = jnp.mean(vel_hist, axis=1)
        else:  # "last"
            vel = vel_hist[:, -1]

        edge_attr = sh(features["rel_disp"])  # (E, attr_dim) or (N, K, attr)
        vel_attr = sh(vel)  # (N, attr_dim)
        # mean edge attributes per node ("density"); padded edges masked
        scattered = aggregate_mean_to_receivers(
            edge_attr, features["receivers"], features["senders"], n_nodes
        )
        node_attr = (vel_attr + scattered).at[:, 0].set(1.0)

        return (
            IrrepsArray(attribute_irreps, node_attr),
            IrrepsArray(attribute_irreps, edge_attr),
        )

    @nn.compact
    def __call__(self, sample: Sample) -> Dict[str, jnp.ndarray]:
        features, particle_type = sample
        n_nodes = features["vel_hist"].shape[0]
        dim = features["vel_hist"].shape[1] // self.n_vels
        assert dim in (2, 3)

        if dim == 2:
            features = features_2d_to_3d(features)

        node_attributes, edge_attributes = self._attributes(features, n_nodes)

        # node features in irreps order: vectors first, then scalars
        node_feats = [features["vel_hist"]]
        if "bound" in features:
            node_feats.append(features["bound"])
        if "force" in features:
            node_feats.append(features["force"])
        if "vel_mag" in features:
            node_feats.append(features["vel_mag"])
        if not self.homogeneous_particles:
            node_feats.append(jax.nn.one_hot(particle_type, NodeType.SIZE))
        # externally-built features are mul-major (K stacked vectors);
        # convert into the engine's m-major storage once at the boundary
        nodes = from_mul_major(
            Irreps(self.node_features_irreps),
            jnp.concatenate(node_feats, axis=-1),
        )

        edge_feats = IrrepsArray(
            Irreps(self.edge_features_irreps),
            jnp.concatenate(
                [features["rel_disp"], features["rel_dist"]], axis=-1
            ),
        )

        hidden_irreps = weight_balanced_irreps(
            self.scalar_units,
            Irreps.spherical_harmonics(self.lmax_attributes),
            self.lmax_hidden,
        )

        # embedding
        nodes = O3TensorProduct(
            hidden_irreps, compute_dtype=self.compute_dtype
        )(nodes, node_attributes)

        # message passing
        senders = features["senders"]
        receivers = features["receivers"]
        for _ in range(self.num_mp_steps):
            nodes = SEGNNLayer(
                output_irreps=hidden_irreps,
                n_blocks=self.blocks_per_step,
                norm=self.norm,
                compute_dtype=self.compute_dtype,
            )(
                nodes,
                node_attributes,
                edge_attributes,
                edge_feats,
                senders,
                receivers,
            )

        # decoder
        x = nodes
        for _ in range(self.blocks_per_step):
            x = O3TensorProductGate(
                hidden_irreps, compute_dtype=self.compute_dtype
            )(x, node_attributes)
        out = O3TensorProduct(
            Irreps(self.output_irreps), compute_dtype=self.compute_dtype
        )(x, node_attributes)

        acc = out.array
        if dim == 2:
            acc = acc[:, :2]
        return {"acc": acc}


def build_segnn(
    cfg_model,
    metadata,
    has_external_force: bool = False,
    homogeneous_particles: bool = True,
):
    """SEGNN factory (reference runner.py:217-245)."""
    node_irreps = node_feature_irreps(
        metadata,
        cfg_model.input_seq_length,
        has_external_force,
        cfg_model.magnitude_features,
        homogeneous_particles,
    )
    return SEGNN(
        node_features_irreps=node_irreps,
        edge_features_irreps=Irreps("1x1o + 1x0e"),
        scalar_units=cfg_model.latent_dim,
        lmax_hidden=cfg_model.lmax_hidden,
        lmax_attributes=cfg_model.lmax_attributes,
        output_irreps=Irreps("1x1o"),
        num_mp_steps=cfg_model.num_mp_steps,
        n_vels=cfg_model.input_seq_length - 1,
        velocity_aggregate=cfg_model.velocity_aggregate,
        homogeneous_particles=homogeneous_particles,
        norm=None if cfg_model.segnn_norm in ("none", None) else cfg_model.segnn_norm,
        blocks_per_step=cfg_model.num_mlp_layers,
        compute_dtype=cfg_model.get("compute_dtype", "float32"),
    )
