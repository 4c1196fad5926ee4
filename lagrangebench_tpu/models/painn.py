"""PaiNN — polarizable interaction neural network (Schütt et al. 2021),
adapted for vectorial inputs/outputs as in the reference
(reference lagrangebench/models/painn.py): input vector channels are
initialized from the velocity history (not zeros), filters come from a
trainable Gaussian RBF of edge lengths with a cosine cutoff, and the readout
emits one vector channel used as the predicted acceleration.

Scalar node state is carried as (N, 1, H) and vector state as (N, dim, H);
all per-edge work is gather / elementwise / segment-sum — TPU-friendly with
receiver-sorted edges.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import segment_sum
from ..utils import NodeType
from .base import BaseModel, Sample
from .utils import LinearXav


class GaussianRBF(nn.Module):
    """Gaussian radial basis expansion with (optionally trainable) centers."""

    n_rbf: int
    cutoff: float
    start: float = 0.0
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        offset0 = jnp.linspace(self.start, self.cutoff, self.n_rbf)
        width0 = jnp.abs(self.cutoff - self.start) / self.n_rbf * jnp.ones(self.n_rbf)
        if self.trainable:
            widths = self.param("widths", lambda *_: width0)
            offsets = self.param("offset", lambda *_: offset0)
        else:
            widths, offsets = width0, offset0
        coeff = -0.5 / widths**2
        diff = x[..., None] - offsets
        return jnp.exp(coeff * diff**2)


def cosine_cutoff(cutoff: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Behler-style cosine cutoff: smooth decay to zero at the radius."""

    def _cutoff(x: jnp.ndarray) -> jnp.ndarray:
        cuts = 0.5 * (jnp.cos(x * jnp.pi / cutoff) + 1.0)
        return cuts * (x < cutoff)

    return _cutoff


class GatedEquivariantBlock(nn.Module):
    """Gated equivariant block mixing scalar and vector channels."""

    hidden_size: int
    scalar_out_channels: int
    vector_out_channels: int
    activation: Callable = nn.silu
    scalar_activation: Callable = None
    eps: float = 1e-8
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, s: jnp.ndarray, v: jnp.ndarray):
        v_l, v_r = jnp.split(
            LinearXav(
                2 * self.vector_out_channels, use_bias=False, dtype=self.dtype
            )(v),
            2,
            axis=-1,
        )
        v_r_norm = jnp.sqrt(jnp.sum(v_r**2, axis=-2) + self.eps)

        gating = jnp.concatenate([s, v_r_norm], axis=-1)
        gating = LinearXav(self.hidden_size, dtype=self.dtype)(gating)
        gating = self.activation(gating)
        gating = LinearXav(
            self.scalar_out_channels + self.vector_out_channels,
            dtype=self.dtype,
        )(gating)
        s_out = gating[..., : self.scalar_out_channels]
        v_gate = gating[..., self.scalar_out_channels :]

        v_out = v_l * v_gate[:, None]
        if self.scalar_activation:
            s_out = self.scalar_activation(s_out)
        return s_out, v_out


class PaiNNLayer(nn.Module):
    """PaiNN interaction + mixing block.

    With ``use_fused`` (dense edge layout only), everything after the
    interaction context-net runs as ONE Pallas launch per layer
    (ops/painn_msg.painn_layer): the model is dispatch-bound at
    LagrangeBench scales, so collapsing the ~20 node-level XLA ops
    matters more than their FLOPs. The fused variant declares the
    vector-mix / mixing-net parameters as flat arrays — convert a
    standard tree with :func:`painn_fused_params_from_standard`.
    """

    hidden_size: int
    activation: Callable = nn.silu
    blocks: int = 2
    eps: float = 1e-8
    dtype: jnp.dtype = None
    use_fused: bool = False

    def _context_net(self, x, name):
        for _ in range(self.blocks - 1):
            x = self.activation(LinearXav(self.hidden_size, dtype=self.dtype)(x))
        return LinearXav(3 * self.hidden_size, dtype=self.dtype)(x)

    @nn.compact
    def __call__(
        self,
        s: jnp.ndarray,  # (N, H) — scalars kept 2D: singleton middle axes
        #                  pad 1 -> 8 sublanes on TPU and waste 8x layout
        v: jnp.ndarray,  # (N, dim, H)
        dir_ij: jnp.ndarray,  # (E, dim) or (N, K, dim)
        Wij: jnp.ndarray,  # (E, 3H) or (N, K, 3H)
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = s.shape[0]
        h = self.hidden_size

        if self.use_fused:
            # -- fully fused layer: ``v`` is FLAT (N, dim*H) and ``Wij`` is
            # the (N, K, R+1) radial basis with the per-edge scale (cosine
            # cutoff x mask) in the last column; the filter matmul runs
            # inside the kernel (20-wide basis reads instead of the 3H-wide
            # materialized filter tensor). The gather packs [x1, x2, u]
            # where u_d = v_d * x3 is pre-multiplied at node level —
            # algebraically identical to gathering x3 and v separately
            # (the per-edge product W3*x3[s]*v[s] associates freely) but
            # (2+dim)H wide instead of (3+dim)H.
            assert self.blocks == 2 and self.activation is nn.silu, (
                "fused PaiNN layer supports blocks=2 with silu"
            )
            phi_ext = Wij
            vdim = dir_ij.shape[-1]
            r = phi_ext.shape[-1] - 1
            x = self._context_net(s, "interaction")  # (N, 3H)
            xav = nn.initializers.xavier_uniform()
            zeros = nn.initializers.zeros_init()
            p = {
                "filt_w": self.param("filt_w", xav, (r, 3 * h)),
                "filt_b": self.param("filt_b", zeros, (3 * h,)),
                "vmix_w": self.param("vmix_w", xav, (h, 2 * h)),
                "mix_w1": self.param("mix_w1", xav, (2 * h, h)),
                "mix_b1": self.param("mix_b1", zeros, (h,)),
                "mix_w2": self.param("mix_w2", xav, (h, 3 * h)),
                "mix_b2": self.param("mix_b2", zeros, (3 * h,)),
            }
            x3 = x[..., 2 * h:]
            packed = jnp.concatenate(
                [x[..., :h], x[..., h: 2 * h]]
                + [v[..., d * h:(d + 1) * h] * x3 for d in range(vdim)],
                axis=-1,
            )
            g = packed[senders]  # (N, K, (2+dim)H); padded slots masked
            from ..ops import painn_msg

            return painn_msg.painn_layer(
                g, phi_ext, -dir_ij.astype(x.dtype), s, v, p
            )

        x = self._context_net(s, "interaction")  # (N, 3H)

        if senders.ndim == 2:
            # -- dense (N, K) fast path. The radius graph is symmetric, so
            # the reference's gather-from-receivers / scatter-to-senders
            # (painn.py:272-309) is algebraically a gather-from-senders with
            # a masked in-row sum (the scatter-free GNS aggregation pattern)
            # once the stored edge direction is negated and W(i,j) = W(j,i)
            # (filters depend only on |r_ij|). The (.., dim, H) message
            # tensor is decomposed per spatial axis: (N, K, dim, H) blocks
            # pad dim -> 8 sublanes on TPU and waste ~2.7x HBM.
            vdim = v.shape[1]
            # ONE wide gather per layer: gathers are row-count-bound on TPU
            # (width nearly free), so pack x and all vector axes together
            packed = jnp.concatenate([x, v.reshape(n, vdim * h)], axis=-1)
            g = packed[senders]  # (N, K, 3H + dim*H); padded rows masked
            # pre-masking the filters zeroes every padded slot's message;
            # the fused kernel then needs no separate mask input. The
            # stored dir points sender -> receiver; the flipped (dense)
            # form needs receiver -> sender, hence the minus.
            mask = (senders < n)[..., None].astype(Wij.dtype)
            from ..ops import painn_msg

            ds, dv_flat = painn_msg.painn_message(
                g, Wij * mask, -dir_ij.astype(Wij.dtype), h
            )
            ds = ds.astype(s.dtype)
            dv = dv_flat.reshape(n, vdim, h).astype(v.dtype)
        else:
            # -- sparse reference path: gathers from receivers, scatters to
            # senders (reference painn.py:272-309)
            ds, dv1, dv2 = jnp.split(Wij * x[receivers], 3, axis=-1)
            dv = (
                dir_ij[..., :, None] * dv1[..., None, :]
                + v[receivers] * dv2[..., None, :]
            )  # (..., dim, H)
            ds = segment_sum(ds, senders, num_segments=n, indices_are_sorted=False)
            dv = segment_sum(dv, senders, num_segments=n, indices_are_sorted=False)

        s = s + jnp.clip(ds, -1e2, 1e2)
        v = v + jnp.clip(dv, -1e2, 1e2)

        # -- update (intra-particle)
        v_mix = LinearXav(2 * self.hidden_size, use_bias=False, dtype=self.dtype)(v)
        v_l, v_r = jnp.split(v_mix, 2, axis=-1)
        v_norm = jnp.sqrt(jnp.sum(v_r**2, axis=-2) + self.eps)  # (N, H)

        ts = jnp.concatenate([s, v_norm], axis=-1)
        ds, dv, dsv = jnp.split(self._context_net(ts, "mixing"), 3, axis=-1)
        dv = v_l * dv[:, None, :]
        dsv = dsv * jnp.sum(v_r * v_l, axis=-2)

        s = s + jnp.clip(ds + dsv, -1e2, 1e2)
        v = v + jnp.clip(dv, -1e2, 1e2)
        return s, v


class PaiNN(BaseModel):
    """PaiNN over the LagrangeBench feature contract."""

    hidden_size: int
    output_size: int
    num_mp_steps: int
    n_rbf: int
    radius: float
    n_vels: int
    homogeneous_particles: bool = True
    activation: Callable = nn.silu
    shared_filters: bool = False
    eps: float = 1e-8
    compute_dtype: str = "float32"
    # one Pallas launch per layer after the interaction net (dense layout;
    # flat per-layer params — see PaiNNLayer.use_fused)
    use_fused_layer: bool = False

    @nn.compact
    def __call__(self, sample: Sample) -> Dict[str, jnp.ndarray]:
        features, particle_type = sample
        assert "vel_mag" in features, "PaiNN requires magnitude_features"
        n = particle_type.shape[0]

        # vector channels: velocity history (+ force, + wall distances)
        vecs = [features["vel_hist"].reshape(n, self.n_vels, -1).transpose(0, 2, 1)]
        if "force" in features:
            vecs.append(features["force"][..., None])
        if "bound" in features:
            vecs.append(features["bound"].reshape(n, 2, -1).transpose(0, 2, 1))
        v0 = jnp.concatenate(vecs, axis=-1)  # (N, dim, C)

        scalars = [features["vel_mag"]]
        if not self.homogeneous_particles:
            scalars.append(jax.nn.one_hot(particle_type, NodeType.SIZE))
        s0 = jnp.concatenate(scalars, axis=-1)  # (N, C_s)

        senders = features["senders"]
        receivers = features["receivers"]
        rel_disp = features["rel_disp"]

        # axis=-1: rel_disp is (E, dim) sparse or (N, K, dim) dense
        norm_ij = jnp.sqrt(jnp.sum(rel_disp**2, axis=-1) + self.eps)
        dir_ij = rel_disp / (norm_ij[..., None] + self.eps)

        # rotationally-invariant filters from the radial basis
        cdt = jnp.dtype(self.compute_dtype)
        phi = GaussianRBF(n_rbf=self.n_rbf, cutoff=self.radius, trainable=True)(
            norm_ij
        ).astype(cdt)  # (..., n_rbf)
        # filters are computed lazily per layer: one (n_rbf -> 3H) matmul
        # inside the loop instead of materializing the full
        # (E, num_mp_steps * 3H) tensor up front (same parameters — the
        # per-layer weights are slices of the reference's single filter_net)
        cut = cosine_cutoff(self.radius)(norm_ij)[..., None]

        if self.use_fused_layer:
            # fused layers: filters are computed in-kernel from the raw
            # basis; phi ships once with the per-edge scale (cutoff x
            # padding mask) in its last column, and the vector state stays
            # FLAT (N, dim*H) across layers (no per-layer reshapes)
            assert senders.ndim == 2, "fused PaiNN needs the dense layout"
            assert not self.shared_filters, (
                "fused PaiNN layers declare per-layer filters"
            )
            mask = (senders < n).astype(cdt)
            phi_ext = jnp.concatenate(
                [phi, (cut.astype(cdt) * mask[..., None])], axis=-1
            )
            s = LinearXav(self.hidden_size, dtype=cdt)(s0)
            v = LinearXav(self.hidden_size, use_bias=False, dtype=cdt)(v0)
            v_flat = v.reshape(n, -1)
            dir_c = dir_ij.astype(cdt)
            for i in range(self.num_mp_steps):
                s, v_flat = PaiNNLayer(
                    hidden_size=self.hidden_size,
                    activation=self.activation, dtype=cdt, use_fused=True,
                )(s, v_flat, dir_c, phi_ext, senders, receivers)
            v = v_flat.reshape(n, -1, self.hidden_size)
        else:
            if self.shared_filters:
                shared = LinearXav(3 * self.hidden_size, name="filter_net", dtype=cdt)(phi) * cut.astype(cdt)
                filter_list = [shared] * self.num_mp_steps
            else:
                filter_list = [
                    LinearXav(3 * self.hidden_size, name=f"filter_net_{i}", dtype=cdt)(phi)
                    * cut.astype(cdt)
                    for i in range(self.num_mp_steps)
                ]

            # embeddings
            s = LinearXav(self.hidden_size, dtype=cdt)(s0)  # (N, H)
            v = LinearXav(self.hidden_size, use_bias=False, dtype=cdt)(v0)  # (N, dim, H)

            for i in range(self.num_mp_steps):
                s, v = PaiNNLayer(
                    hidden_size=self.hidden_size, activation=self.activation,
                    dtype=cdt, use_fused=False,
                )(s, v, dir_ij.astype(cdt), filter_list[i], senders, receivers)

        # gated readout, halving widths per block
        width = self.hidden_size // 2
        s, v = GatedEquivariantBlock(
            hidden_size=width * 2,
            scalar_out_channels=width,
            vector_out_channels=width,
            activation=self.activation,
            eps=self.eps,
            dtype=cdt,
        )(s, v)
        s, v = GatedEquivariantBlock(
            hidden_size=width,
            scalar_out_channels=self.output_size,
            vector_out_channels=self.output_size,
            activation=self.activation,
            eps=self.eps,
            dtype=cdt,
        )(s, v)

        return {"acc": jnp.squeeze(v, axis=-1).astype(jnp.float32)}


def build_painn(cfg_model, metadata):
    """PaiNN factory (reference runner.py:270-284): 20 trainable RBFs over
    1.5x the connectivity radius, cosine cutoff."""
    assert cfg_model.magnitude_features, "PaiNN requires magnitude_features"
    return PaiNN(
        hidden_size=cfg_model.latent_dim,
        output_size=1,
        num_mp_steps=cfg_model.num_mp_steps,
        n_rbf=20,
        radius=metadata["default_connectivity_radius"] * 1.5,
        n_vels=cfg_model.input_seq_length - 1,
        compute_dtype=cfg_model.get("compute_dtype", "float32"),
        use_fused_layer=cfg_model.get("fused_processor", False),
    )


def painn_fused_params_from_standard(params, num_mp_steps: int):
    """Re-layout standard PaiNN parameters for the fused-layer variant.

    Pure rename/split: each layer's filter net (model-level
    ``filter_net_{i}``), vector-mix (LinearXav_2) and mixing context net
    (LinearXav_3/4) become the flat per-layer arrays the fused kernel
    consumes; everything else (embeddings, RBF, interaction net, readout)
    is unchanged.
    """
    out = {
        k: v
        for k, v in params.items()
        if not k.startswith(("PaiNNLayer", "filter_net"))
    }
    for i in range(num_mp_steps):
        lyr = dict(params[f"PaiNNLayer_{i}"])
        filt = params[f"filter_net_{i}"]["Dense_0"]
        vmix = lyr.pop("LinearXav_2")["Dense_0"]
        m1 = lyr.pop("LinearXav_3")["Dense_0"]
        m2 = lyr.pop("LinearXav_4")["Dense_0"]
        lyr.update(
            {
                "filt_w": filt["kernel"],
                "filt_b": filt["bias"],
                "vmix_w": vmix["kernel"],
                "mix_w1": m1["kernel"],
                "mix_b1": m1["bias"],
                "mix_w2": m2["kernel"],
                "mix_b2": m2["bias"],
            }
        )
        out[f"PaiNNLayer_{i}"] = lyr
    return out


def painn_standard_params_from_fused(fp, num_mp_steps: int):
    """Exact inverse of :func:`painn_fused_params_from_standard`."""
    out = {k: v for k, v in fp.items() if not k.startswith("PaiNNLayer")}
    for i in range(num_mp_steps):
        lyr = dict(fp[f"PaiNNLayer_{i}"])
        out[f"filter_net_{i}"] = {
            "Dense_0": {"kernel": lyr.pop("filt_w"),
                        "bias": lyr.pop("filt_b")}
        }
        lyr["LinearXav_2"] = {"Dense_0": {"kernel": lyr.pop("vmix_w")}}
        lyr["LinearXav_3"] = {
            "Dense_0": {"kernel": lyr.pop("mix_w1"), "bias": lyr.pop("mix_b1")}
        }
        lyr["LinearXav_4"] = {
            "Dense_0": {"kernel": lyr.pop("mix_w2"), "bias": lyr.pop("mix_b2")}
        }
        out[f"PaiNNLayer_{i}"] = lyr
    return out
