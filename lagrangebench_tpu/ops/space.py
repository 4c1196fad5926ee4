"""Boundary-condition-aware displacement and shift functions.

Replaces the jax-md ``space`` module used by the reference (reference
lagrangebench/case_setup/case.py:104-108). Convention (same as jax-md):
``displacement(Ra, Rb) = Ra - Rb`` under the minimum-image rule for periodic
boxes; ``shift(R, dR) = R + dR`` wrapped back into the box.

All functions operate on single points ``(dim,)`` and are meant to be
``vmap``-ed by callers, which keeps them composable with per-edge and
per-timestep mappings.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

DisplacementFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
ShiftFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def periodic(side) -> Tuple[DisplacementFn, ShiftFn]:
    """Minimum-image displacement and wrapping shift for a periodic box.

    Args:
        side: Box side length(s); scalar or per-dimension array.
    """
    side = jnp.asarray(side)

    def displacement(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
        dR = Ra - Rb
        # minimum image: fold into [-side/2, side/2)
        return jnp.mod(dR + side * 0.5, side) - side * 0.5

    def shift(R: jnp.ndarray, dR: jnp.ndarray) -> jnp.ndarray:
        return jnp.mod(R + dR, side)

    return displacement, shift


def free() -> Tuple[DisplacementFn, ShiftFn]:
    """Euclidean displacement and shift (no boundaries)."""

    def displacement(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
        return Ra - Rb

    def shift(R: jnp.ndarray, dR: jnp.ndarray) -> jnp.ndarray:
        return R + dR

    return displacement, shift


def distance(dR: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm over the last axis, safe at zero."""
    # jnp.linalg.norm has a non-differentiable point at 0; the safe form keeps
    # gradients finite for self-edges (distance 0 is common: mask_self=False).
    sq = jnp.sum(dR**2, axis=-1)
    return jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq)) * (sq != 0.0)
