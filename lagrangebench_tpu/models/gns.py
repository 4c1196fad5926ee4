"""Graph Network-based Simulator (GNS).

TPU-first re-implementation of the encoder-processor-decoder GNS
(Sanchez-Gonzalez et al. 2020; reference lagrangebench/models/gns.py):

* no jraph — message passing is a gather / edge-MLP / sorted segment-sum /
  node-MLP sequence operating on the fixed-capacity edge buffers emitted by
  the neighbor search. Edges arrive receiver-sorted, so the scatter-add hits
  XLA's sorted-indices fast path;
* padded edges (sender/receiver == N) gather clamped node states, and their
  messages drop out of the aggregation via out-of-range segment ids;
* one unshared MLP pair per message-passing step with residual connections,
  identical widths/depths to the reference (latent 128, 10 steps, 2-layer
  MLPs with terminal LayerNorm; decoder without LayerNorm).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import aggregate_to_receivers
from ..utils import NodeType
from .base import BaseModel, Sample
from .utils import MLP, concat_edge_features, concat_node_features


class GNS(BaseModel):
    """GNS model.

    Attributes:
        particle_dimension: spatial dimensionality (2 or 3).
        latent_size: latent width of node/edge states.
        blocks_per_step: layers per MLP block.
        num_mp_steps: number of message-passing steps.
        particle_type_embedding_size: width of the type embedding.
        num_particle_types: number of particle type ids.
    """

    particle_dimension: int
    latent_size: int = 128
    blocks_per_step: int = 2
    num_mp_steps: int = 10
    particle_type_embedding_size: int = 16
    num_particle_types: int = NodeType.SIZE
    compute_dtype: str = "float32"  # "bfloat16" engages the MXU fast path

    @nn.compact
    def __call__(self, sample: Sample) -> Dict[str, jnp.ndarray]:
        features, particle_type = sample
        nodes = concat_node_features(features)
        edges = concat_edge_features(features)
        receivers = features["receivers"]
        senders = features["senders"]
        n = nodes.shape[0]

        if self.num_particle_types > 1:
            # negative (padding) types wrap to the last embedding row, the
            # same behavior as the reference's haiku Embed lookup
            embeddings = nn.Embed(
                self.num_particle_types, self.particle_type_embedding_size
            )(jnp.mod(particle_type, self.num_particle_types))
            nodes = jnp.concatenate([nodes, embeddings], axis=-1)

        dtype = jnp.dtype(self.compute_dtype)

        def mlp(out_size, layer_norm=True):
            return MLP(
                latent_size=self.latent_size,
                output_size=out_size,
                num_hidden_layers=self.blocks_per_step,
                is_layer_norm=layer_norm,
                dtype=dtype,
            )

        # encoder
        h = mlp(self.latent_size)(nodes)
        e = mlp(self.latent_size)(edges)

        dense_edges = receivers.ndim == 2

        # processor: residual message passing, fresh MLPs per step; edges
        # may be sparse (E, .) or dense (N, K, .) — aggregation dispatches.
        #
        # The edge MLP's first layer over concat(h[senders], h[receivers], e)
        # is decomposed algebraically: the h-projections run at NODE level
        # (N x latent matmuls) and are gathered/broadcast afterwards — a ~3x
        # FLOP cut on the dominant matmul, and in the dense layout the
        # receiver term is a pure broadcast instead of a gather.
        for _ in range(self.num_mp_steps):
            if self.blocks_per_step > 1:
                hs_proj = nn.Dense(self.latent_size, use_bias=False, dtype=dtype)(h)
                hr_proj = nn.Dense(self.latent_size, use_bias=False, dtype=dtype)(h)
                e_proj = nn.Dense(self.latent_size, dtype=dtype)(e)
                if dense_edges:
                    first = e_proj + hs_proj[senders] + hr_proj[:, None, :]
                else:
                    first = e_proj + hs_proj[senders] + hr_proj[receivers]
                messages = MLP(
                    latent_size=self.latent_size,
                    output_size=self.latent_size,
                    num_hidden_layers=self.blocks_per_step - 1,
                    is_layer_norm=True,
                    dtype=dtype,
                )(nn.relu(first))
            else:  # single-layer blocks cannot be decomposed
                msg_in = jnp.concatenate([h[senders], h[receivers], e], axis=-1)
                messages = mlp(self.latent_size)(msg_in)
            agg = aggregate_to_receivers(messages, receivers, senders, n)
            h_new = mlp(self.latent_size)(jnp.concatenate([h, agg], axis=-1))
            h = h + h_new
            e = e + messages

        # decoder (no LayerNorm on the output head); outputs stay float32
        acc = mlp(self.particle_dimension, layer_norm=False)(h)
        return {"acc": acc.astype(jnp.float32)}
