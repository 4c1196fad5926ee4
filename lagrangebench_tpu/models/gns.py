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

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import aggregate_to_receivers
from ..utils import NodeType
from .base import BaseModel, Sample
from .utils import (
    MLP,
    concat_edge_features,
    concat_node_features,
    matmul_precision,
)


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
    # run the processor as one fused Pallas kernel per MP step (dense edge
    # layout, blocks_per_step=2 only). Inference/bench fast path: its
    # parameter layout differs from the standard path — convert trained
    # params with `fused_params_from_standard`.
    use_fused_processor: bool = False

    @nn.compact
    def __call__(self, sample: Sample) -> Dict[str, jnp.ndarray]:
        features, particle_type = sample
        nodes = concat_node_features(features)
        edges = concat_edge_features(features)
        receivers = features["receivers"]
        senders = features["senders"]
        n = nodes.shape[0]

        # cell-sorted slot layout (neighbors format="slot"): node features
        # arrive in column-slot order; particle-level inputs are gathered
        # into slot order here and the output mapped back at the end
        slot_mode = "slot_bases" in features
        if slot_mode:
            assert self.use_fused_processor and self.blocks_per_step == 2, (
                "the slot NL layout requires the fused processor"
            )
            s2p = jnp.minimum(
                features["slot_to_particle"], particle_type.shape[0] - 1
            )
            particle_type = particle_type[s2p]

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

        # encoder (node side; the edge encoder is either a flax MLP on the
        # standard path or folded into the first fused kernel)
        h = mlp(self.latent_size)(nodes)

        dense_edges = receivers.ndim == 2

        if self.use_fused_processor:
            assert dense_edges and self.blocks_per_step == 2, (
                "fused processor requires the dense edge layout and "
                "2-layer MLP blocks"
            )
            from ..ops import fused_mp

            # edge-encoder params as flat arrays: the encoder MLP runs
            # inside the first fused MP kernel (raw features never round-trip
            # through HBM as (N, K, latent))
            enc = {
                name: self.param(
                    name,
                    (
                        nn.initializers.lecun_normal()
                        if name.startswith("enc_w")
                        else (
                            nn.initializers.ones_init()
                            if "scale" in name
                            else nn.initializers.zeros_init()
                        )
                    ),
                    (edges.shape[-1], self.latent_size)
                    if name == "enc_w1"
                    else (self.latent_size, self.latent_size)
                    if name == "enc_w2"
                    else (self.latent_size,),
                )
                for name in fused_mp.ENC_PARAM_NAMES
            }
            e = edges  # raw; encoded by the first fused step

            if slot_mode:
                return self._slot_processor(
                    features, e, h, enc, mlp, dtype
                )

            mask = senders < n
            for step in range(self.num_mp_steps):
                p = self._mp_step_params(step)
                prec = matmul_precision(dtype)
                hs_proj = jnp.dot(
                    h, p["w_s"].astype(dtype), preferred_element_type=dtype,
                    precision=prec,
                )
                hr_proj = jnp.dot(
                    h, p["w_r"].astype(dtype), preferred_element_type=dtype,
                    precision=prec,
                )
                e, h = fused_mp.gns_mp_step(
                    e, hs_proj[senders], hr_proj, h, mask, p,
                    enc=enc if step == 0 else None,
                )
            acc = mlp(self.particle_dimension, layer_norm=False)(h)
            return {"acc": acc.astype(jnp.float32)}

        e = mlp(self.latent_size)(edges)

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
                prec = matmul_precision(dtype)
                hs_proj = nn.Dense(
                    self.latent_size, use_bias=False, dtype=dtype,
                    precision=prec,
                )(h)
                hr_proj = nn.Dense(
                    self.latent_size, use_bias=False, dtype=dtype,
                    precision=prec,
                )(h)
                e_proj = nn.Dense(self.latent_size, dtype=dtype, precision=prec)(e)
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

    def _mp_step_params(self, step: int) -> Dict:
        """Flat per-step parameter dict for the fused processor variants."""
        from ..ops import fused_mp

        return {
            name: self.param(
                f"mp{step}_{name}",
                (
                    nn.initializers.lecun_normal()
                    if name.startswith("w")
                    else (
                        nn.initializers.ones_init()
                        if "scale" in name
                        else nn.initializers.zeros_init()
                    )
                ),
                (self.latent_size, self.latent_size)
                if name.startswith("w")
                else (self.latent_size,),
            )
            for name in fused_mp.PARAM_NAMES
        }

    def _slot_processor(self, features, e, h, enc, mlp, dtype):
        """Cell-sorted processor: state stays in column-slot order and the
        fused kernel selects sender projections from stencil-column slabs
        in VMEM — no (N, K, latent) HBM gather between MP steps."""
        from ..ops import fused_mp

        cand = features["senders"]
        bases = features["slot_bases"]
        prec = matmul_precision(dtype)
        for step in range(self.num_mp_steps):
            p = self._mp_step_params(step)
            hs_proj = jnp.dot(
                h, p["w_s"].astype(dtype), preferred_element_type=dtype,
                precision=prec,
            )
            hr_proj = jnp.dot(
                h, p["w_r"].astype(dtype), preferred_element_type=dtype,
                precision=prec,
            )
            e, h = fused_mp.gns_mp_step_slot(
                e, cand, bases, hs_proj, hr_proj, h, p,
                enc=enc if step == 0 else None,
            )
        acc = mlp(self.particle_dimension, layer_norm=False)(h)
        acc = acc[features["particle_to_slot"]]
        return {"acc": acc.astype(jnp.float32)}


def fused_params_from_standard(params: Dict, num_mp_steps: int) -> Dict:
    """Re-layout standard GNS parameters for the fused-processor variant.

    The standard processor declares flax Dense/MLP modules (auto-named in
    creation order); the fused processor uses flat per-step arrays. The
    mapping is purely a rename/split — the math is identical.
    """
    out = {k: params[k] for k in ("Embed_0", "MLP_0") if k in params}
    latent = params["MLP_0"]["Dense_1"]["kernel"].shape[1]
    # standard edge-encoder MLP -> flat in-kernel encoder params
    enc_mlp = params["MLP_1"]
    out.update(
        {
            "enc_w1": enc_mlp["Dense_0"]["kernel"],
            "enc_b1": enc_mlp["Dense_0"]["bias"],
            "enc_w2": enc_mlp["Dense_1"]["kernel"],
            "enc_b2": enc_mlp["Dense_1"]["bias"],
            "enc_ln_scale": enc_mlp["LayerNorm_0"]["scale"],
            "enc_ln_bias": enc_mlp["LayerNorm_0"]["bias"],
        }
    )
    for i in range(num_mp_steps):
        d_hs = params[f"Dense_{3 * i}"]
        d_hr = params[f"Dense_{3 * i + 1}"]
        d_e = params[f"Dense_{3 * i + 2}"]
        mlp_msg = params[f"MLP_{2 + 2 * i}"]
        mlp_node = params[f"MLP_{3 + 2 * i}"]
        wn = mlp_node["Dense_0"]["kernel"]  # (2*latent, latent)
        out.update(
            {
                f"mp{i}_w_s": d_hs["kernel"],
                f"mp{i}_w_r": d_hr["kernel"],
                f"mp{i}_w_e": d_e["kernel"],
                f"mp{i}_b1": d_e["bias"],
                f"mp{i}_w2": mlp_msg["Dense_0"]["kernel"],
                f"mp{i}_b2": mlp_msg["Dense_0"]["bias"],
                f"mp{i}_ln1_scale": mlp_msg["LayerNorm_0"]["scale"],
                f"mp{i}_ln1_bias": mlp_msg["LayerNorm_0"]["bias"],
                f"mp{i}_w_nh": wn[:latent],
                f"mp{i}_w_na": wn[latent:],
                f"mp{i}_bn1": mlp_node["Dense_0"]["bias"],
                f"mp{i}_wn2": mlp_node["Dense_1"]["kernel"],
                f"mp{i}_bn2": mlp_node["Dense_1"]["bias"],
                f"mp{i}_ln2_scale": mlp_node["LayerNorm_0"]["scale"],
                f"mp{i}_ln2_bias": mlp_node["LayerNorm_0"]["bias"],
            }
        )
    # decoder: the fused variant's only auto-named MLP after the node encoder
    out["MLP_1"] = params[f"MLP_{2 + 2 * num_mp_steps}"]
    return out


def standard_params_from_fused(fp: Dict, num_mp_steps: int) -> Dict:
    """Exact inverse of :func:`fused_params_from_standard` — re-layout a
    fused-variant tree back to the standard (auto-named flax) layout, e.g.
    to checkpoint spatially/fused-trained parameters interoperably."""
    out = {k: fp[k] for k in ("Embed_0", "MLP_0") if k in fp}
    latent = fp["MLP_0"]["Dense_1"]["kernel"].shape[1]
    out["MLP_1"] = {
        "Dense_0": {"kernel": fp["enc_w1"], "bias": fp["enc_b1"]},
        "Dense_1": {"kernel": fp["enc_w2"], "bias": fp["enc_b2"]},
        "LayerNorm_0": {"scale": fp["enc_ln_scale"],
                        "bias": fp["enc_ln_bias"]},
    }
    for i in range(num_mp_steps):
        out[f"Dense_{3 * i}"] = {"kernel": fp[f"mp{i}_w_s"]}
        out[f"Dense_{3 * i + 1}"] = {"kernel": fp[f"mp{i}_w_r"]}
        out[f"Dense_{3 * i + 2}"] = {
            "kernel": fp[f"mp{i}_w_e"], "bias": fp[f"mp{i}_b1"]
        }
        out[f"MLP_{2 + 2 * i}"] = {
            "Dense_0": {"kernel": fp[f"mp{i}_w2"], "bias": fp[f"mp{i}_b2"]},
            "LayerNorm_0": {"scale": fp[f"mp{i}_ln1_scale"],
                            "bias": fp[f"mp{i}_ln1_bias"]},
        }
        wn = jnp.concatenate(
            [fp[f"mp{i}_w_nh"], fp[f"mp{i}_w_na"]], axis=0
        )
        assert wn.shape[0] == 2 * latent
        out[f"MLP_{3 + 2 * i}"] = {
            "Dense_0": {"kernel": wn, "bias": fp[f"mp{i}_bn1"]},
            "Dense_1": {"kernel": fp[f"mp{i}_wn2"], "bias": fp[f"mp{i}_bn2"]},
            "LayerNorm_0": {"scale": fp[f"mp{i}_ln2_scale"],
                            "bias": fp[f"mp{i}_ln2_bias"]},
        }
    out[f"MLP_{2 + 2 * num_mp_steps}"] = fp["MLP_1"]
    return out
