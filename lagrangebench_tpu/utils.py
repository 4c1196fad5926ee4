"""Shared utilities: particle typing, masking, batching and seeding.

Feature parity with the reference implementation's shared utils
(cf. reference lagrangebench/utils.py:17-161), redesigned for a torch-free,
TPU-first stack.
"""

from __future__ import annotations

import enum
import random
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NodeType(enum.IntEnum):
    """Particle type tags used across all datasets.

    Same integer convention as the reference (lagrangebench/utils.py:17-25):
    padding particles carry ``-1`` and kinematic walls 1/2.
    """

    PAD_VALUE = -1
    FLUID = 0
    SOLID_WALL = 1
    MOVING_WALL = 2
    RIGID_BODY = 3
    SIZE = 9


def get_kinematic_mask(particle_type: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask which is True for kinematic (wall/padding) particles.

    Kinematic particles are not predicted by the model: solid walls, moving
    walls, and padding (cf. reference lagrangebench/utils.py:28-35).
    """
    return (
        (particle_type == NodeType.SOLID_WALL)
        | (particle_type == NodeType.MOVING_WALL)
        | (particle_type == NodeType.PAD_VALUE)
    )


def broadcast_to_batch(pytree, batch_size: int):
    """Replicate a pytree along a new leading batch axis."""
    assert batch_size > 0
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None, ...], (batch_size,) + x.shape), pytree
    )


def broadcast_from_batch(batch, index: int):
    """Slice one sample out of a batched pytree."""
    assert index >= 0
    return jax.tree.map(lambda x: x[index], batch)


def get_num_params(params) -> int:
    """Total number of scalars in a parameter pytree."""
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def set_seed(seed: int) -> Tuple[jax.Array, np.random.Generator]:
    """Seed jax / numpy / python RNGs; return a jax key and a numpy Generator.

    The numpy Generator drives host-side decisions (data shuffling,
    pushforward unroll sampling) without device syncs.
    """
    key = jax.random.PRNGKey(seed)
    np.random.seed(seed)
    random.seed(seed)
    return key, np.random.default_rng(seed)
