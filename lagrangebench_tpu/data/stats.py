"""Dataset normalization statistics.

Parity-critical math (reference lagrangebench/data/utils.py:9-45): the GNS
training-noise std is folded into the normalization stds as
``std' = sqrt(std^2 + noise_std^2)``; isotropic normalization averages means
and RMS-averages stds across dimensions.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


def get_dataset_stats(
    metadata: Dict[str, List[float]],
    is_isotropic_norm: bool,
    noise_std: float,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Velocity/acceleration normalization stats from dataset metadata."""
    acc_mean = jnp.asarray(metadata["acc_mean"])
    acc_std = jnp.asarray(metadata["acc_std"])
    vel_mean = jnp.asarray(metadata["vel_mean"])
    vel_std = jnp.asarray(metadata["vel_std"])

    if is_isotropic_norm:
        acc_mean = jnp.full_like(acc_mean, jnp.mean(acc_mean))
        acc_std = jnp.full_like(acc_std, jnp.sqrt(jnp.mean(acc_std**2)))
        vel_mean = jnp.full_like(vel_mean, jnp.mean(vel_mean))
        vel_std = jnp.full_like(vel_std, jnp.sqrt(jnp.mean(vel_std**2)))

    return {
        "acceleration": {
            "mean": acc_mean,
            "std": jnp.sqrt(acc_std**2 + noise_std**2),
        },
        "velocity": {
            "mean": vel_mean,
            "std": jnp.sqrt(vel_std**2 + noise_std**2),
        },
    }


def numpy_collate(batch) -> np.ndarray:
    """Stack a list of samples (possibly nested tuples) into numpy arrays."""
    if isinstance(batch[0], np.ndarray):
        return np.stack(batch)
    if isinstance(batch[0], (tuple, list)):
        return type(batch[0])(numpy_collate(samples) for samples in zip(*batch))
    return np.asarray(batch)
