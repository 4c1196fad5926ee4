"""Model zoo and factory."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from ..config import Config
from .base import BaseModel, make_model_fns
from .egnn import EGNN
from .gns import GNS
from .linear import Linear
from .painn import PaiNN
from .segnn import SEGNN

__all__ = [
    "BaseModel",
    "GNS",
    "Linear",
    "EGNN",
    "PaiNN",
    "SEGNN",
    "make_model_fns",
    "setup_model",
    "ensure_fused_params",
]


def ensure_fused_params(params: Dict, cfg_model: Config) -> Dict:
    """Re-layout a standard-parameterization tree for the fused processor.

    Checkpoints trained with the standard processor (including imported
    reference haiku checkpoints) use auto-named flax module trees; the
    fused Pallas processors consume flat per-step arrays. When the config
    requests the fused path and ``params`` is in the standard layout,
    convert it (a pure rename/split — the math is identical); otherwise
    return ``params`` unchanged.
    """
    if not cfg_model.get("fused_processor", False):
        return params
    name = cfg_model.name.lower()
    if name == "gns" and not any(str(k).startswith("mp0_") for k in params):
        from .gns import fused_params_from_standard

        return fused_params_from_standard(
            params, int(cfg_model.num_mp_steps)
        )
    if name == "painn" and "filt_w" not in params.get("PaiNNLayer_0", {}):
        from .painn import painn_fused_params_from_standard

        return painn_fused_params_from_standard(
            params, int(cfg_model.num_mp_steps)
        )
    return params


def setup_model(
    cfg_model: Config,
    metadata: Dict,
    has_external_force: bool = False,
    normalization_stats: Optional[Dict] = None,
    homogeneous_particles: bool = True,
) -> Tuple[BaseModel, Callable, Callable]:
    """Instantiate a model from config + dataset metadata.

    Mirrors the reference's dispatch (reference lagrangebench/runner.py:192)
    and returns ``(model, init_fn, apply_fn)`` where apply_fn has the
    ``(params, state, sample) -> (output, state)`` signature the trainer and
    rollout use.
    """
    name = cfg_model.name.lower()
    dim = metadata["dim"]

    if name == "gns":
        model = GNS(
            particle_dimension=dim,
            latent_size=cfg_model.latent_dim,
            blocks_per_step=cfg_model.num_mlp_layers,
            num_mp_steps=cfg_model.num_mp_steps,
            particle_type_embedding_size=16,
            compute_dtype=cfg_model.get("compute_dtype", "float32"),
            use_fused_processor=cfg_model.get("fused_processor", False),
        )
    elif name == "linear":
        model = Linear(dimension_out=dim)
    elif name == "segnn":
        from .segnn import build_segnn

        model = build_segnn(
            cfg_model, metadata, has_external_force, homogeneous_particles
        )
    elif name == "egnn":
        from .egnn import build_egnn

        vel_stats = (
            normalization_stats["velocity"] if normalization_stats else None
        )
        model = build_egnn(cfg_model, metadata, velocity_stats=vel_stats)
    elif name == "painn":
        from .painn import build_painn

        model = build_painn(cfg_model, metadata)
    else:
        raise ValueError(f"Unknown model {name!r}")

    init_fn, apply_fn = make_model_fns(model)
    return model, init_fn, apply_fn
