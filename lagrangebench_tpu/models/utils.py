"""Model building blocks shared across architectures."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def matmul_precision(dtype) -> Optional[str]:
    """Explicit matmul precision for the given compute dtype.

    XLA's DEFAULT precision truncates float32 matmul operands to bfloat16
    on the TPU MXU (and on some CPU einsum lowerings) — measured error
    ~1e-1 on a 128-dim float32 dot. Models that advertise float32 compute
    (the parity mode for reference checkpoints) must therefore request
    "highest" explicitly; bfloat16 compute keeps the fast default.
    """
    if dtype is None or jnp.dtype(dtype) != jnp.bfloat16:
        return "highest"
    return None


class MLP(nn.Module):
    """Plain MLP, optionally LayerNorm-terminated.

    Matches the reference's `build_mlp` semantics (reference
    lagrangebench/models/utils.py:100-115): `num_hidden_layers - 1` hidden
    layers of width `latent_size`, a final linear to `output_size`, ReLU
    activations, and LayerNorm after the output unless disabled.

    ``dtype`` selects the compute precision (params stay float32): bfloat16
    engages the full-rate MXU path on TPU.
    """

    latent_size: int
    output_size: int
    num_hidden_layers: int = 2
    is_layer_norm: bool = True
    activation: Callable = nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        widths = [self.latent_size] * (self.num_hidden_layers - 1) + [self.output_size]
        for i, w in enumerate(widths):
            x = nn.Dense(
                w, dtype=self.dtype, precision=matmul_precision(self.dtype)
            )(x)
            if i < len(widths) - 1:
                x = self.activation(x)
        if self.is_layer_norm:
            # epsilon matches haiku's LayerNorm default (the reference's
            # build_mlp), so imported reference checkpoints reproduce exactly
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x


class MLPXav(nn.Module):
    """MLP with Xavier-uniform init and SiLU activations (SEGNN/EGNN/PaiNN
    family; reference lagrangebench/models/utils.py:28-53)."""

    output_sizes: Sequence[int]
    use_bias: bool = True
    activation: Callable = nn.silu
    activate_final: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, w in enumerate(self.output_sizes):
            x = nn.Dense(
                w,
                use_bias=self.use_bias,
                kernel_init=nn.initializers.xavier_uniform(),
                dtype=self.dtype,
                precision=matmul_precision(self.dtype),
            )(x)
            if i < len(self.output_sizes) - 1 or self.activate_final:
                x = self.activation(x)
        return x


class LinearXav(nn.Module):
    """Dense layer with Xavier-uniform init."""

    output_size: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.output_size,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            precision=matmul_precision(self.dtype),
        )(x)


def apply_dense_params(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Apply one flax Dense parameter subtree {"kernel"[, "bias"]}."""
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def apply_mlp_params(
    p: dict, x: jnp.ndarray, layer_norm: bool = True, eps: float = 1e-5
) -> jnp.ndarray:
    """Apply an `MLP` module's parameter subtree functionally.

    The single functional mirror of :class:`MLP` (relu-activated Dense
    chain + optional LayerNorm with haiku's epsilon) for code paths that
    consume a trained parameter tree outside flax (parallel/spatial.py).
    """
    n_dense = len([k for k in p if k.startswith("Dense")])
    for i in range(n_dense):
        x = apply_dense_params(p[f"Dense_{i}"], x)
        if i < n_dense - 1:
            x = jax.nn.relu(x)
    if layer_norm:
        ln = p["LayerNorm_0"]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + eps)
        x = x * ln["scale"].astype(x.dtype) + ln["bias"].astype(x.dtype)
    return x


def concat_node_features(features: dict) -> jnp.ndarray:
    """Concatenate available scalar node features in the canonical order."""
    keys = [k for k in ("vel_hist", "vel_mag", "bound", "force") if k in features]
    return jnp.concatenate([features[k] for k in keys], axis=-1)


def concat_edge_features(features: dict) -> jnp.ndarray:
    """Concatenate available edge features in the canonical order."""
    keys = [k for k in ("rel_disp", "rel_dist") if k in features]
    return jnp.concatenate([features[k] for k in keys], axis=-1)


def features_2d_to_3d(features: dict) -> dict:
    """Lift 2D vector features to 3D by zero-padding the z component."""
    out = dict(features)
    n_nodes = features["vel_hist"].shape[0]
    n_vels = features["vel_hist"].shape[1]
    out["vel_hist"] = jnp.concatenate(
        [
            features["vel_hist"].reshape(n_nodes, -1, 2),
            jnp.zeros((n_nodes, n_vels // 2, 1), features["vel_hist"].dtype),
        ],
        axis=-1,
    ).reshape(n_nodes, -1)
    # rel_disp is (E, 2) for sparse edges or (N, K, 2) for the dense layout
    rel_disp = features["rel_disp"]
    out["rel_disp"] = jnp.concatenate(
        [rel_disp, jnp.zeros(rel_disp.shape[:-1] + (1,), rel_disp.dtype)],
        axis=-1,
    )
    if "force" in features:
        out["force"] = jnp.concatenate(
            [features["force"], jnp.zeros((n_nodes, 1), features["force"].dtype)],
            axis=-1,
        )
    if "bound" in features:
        # (N, 2*2) lower/upper wall distances -> two zero-padded 3D vectors
        bound = features["bound"].reshape(n_nodes, 2, 2)
        bound = jnp.concatenate(
            [bound, jnp.zeros((n_nodes, 2, 1), bound.dtype)], axis=-1
        )
        out["bound"] = bound.reshape(n_nodes, 6)
    return out
