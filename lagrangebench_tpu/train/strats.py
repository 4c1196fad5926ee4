"""Training strategies: GNS random-walk noise and the pushforward trick.

Behavioral parity with the reference (reference lagrangebench/train/strats.py)
with one TPU-first delta: the pushforward unroll count is sampled with a host
numpy Generator instead of a jax key — it must be a concrete Python int
anyway (it selects how many unroll iterations run), and host RNG avoids a
device round-trip per step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import get_kinematic_mask


def random_walk_position_noise(
    key: jax.Array, position_seq_shape, noise_std_last_step: float, dtype
) -> Tuple[jax.Array, jnp.ndarray]:
    """Random-walk noise over a position sequence (N, T, dim).

    Velocity noise is a random walk whose last step has std
    ``noise_std_last_step`` (each increment has std / sqrt(T-1)); position
    noise is the cumulative sum of the velocity walk with a zero first frame.
    Cf. reference lagrangebench/train/strats.py:61-83.
    """
    n, t, dim = position_seq_shape
    n_velocities = t - 1
    key, subkey = jax.random.split(key)
    vel_noise = jax.random.normal(subkey, (n, n_velocities, dim), dtype=dtype)
    vel_noise = vel_noise * (noise_std_last_step / n_velocities**0.5)
    vel_walk = jnp.cumsum(vel_noise, axis=1)
    pos_noise = jnp.concatenate(
        [jnp.zeros((n, 1, dim), dtype=dtype), jnp.cumsum(vel_walk, axis=1)], axis=1
    )
    return key, pos_noise


def add_gns_noise(
    key: jax.Array,
    pos_input: jnp.ndarray,
    particle_type: jnp.ndarray,
    input_seq_length: int,
    noise_std: float,
    shift_fn,
) -> Tuple[jax.Array, jnp.ndarray]:
    """Apply GNS-style random-walk noise and shift targets consistently.

    Noise perturbs only the ``input_seq_length`` input frames; every
    potential target frame is shifted by the noise of the last input frame so
    target velocities/accelerations stay consistent
    (cf. reference lagrangebench/train/strats.py:12-58).
    """
    isl = input_seq_length
    key, input_noise = random_walk_position_noise(
        key, (pos_input.shape[0], isl, pos_input.shape[2]), noise_std, pos_input.dtype
    )

    kinematic = get_kinematic_mask(particle_type)
    input_noise = jnp.where(kinematic[:, None, None], 0.0, input_noise)

    n_targets = pos_input.shape[1] - isl
    target_noise = jnp.repeat(input_noise[:, -1:, :], n_targets, axis=1)
    full_noise = jnp.concatenate([input_noise, target_noise], axis=1)

    shift_tvmap = jax.vmap(shift_fn, in_axes=(0, 0))
    shift_ntvmap = jax.vmap(shift_tvmap, in_axes=(0, 0))
    return key, shift_ntvmap(pos_input, full_noise)


def push_forward_sample_steps(rng: np.random.Generator, step: int, pushforward) -> int:
    """Sample the pushforward unroll count for the current training step.

    The curriculum unlocks entry i once ``step > steps[i]``; among unlocked
    entries the unroll count is drawn with the configured probabilities
    (cf. reference lagrangebench/train/strats.py:86-109).
    """
    steps = np.asarray(pushforward.steps)
    assert (np.diff(steps) >= 0).all(), "pushforward.steps must be sorted"
    idx = int((step > steps).sum())
    unrolls = np.asarray(pushforward.unrolls[:idx])
    probs = np.asarray(pushforward.probs[:idx], dtype=np.float64)
    total = probs.sum()
    if total <= 0:  # degenerate config: all unlocked probs zero -> uniform
        probs = np.full(len(unrolls), 1.0 / len(unrolls))
    else:
        probs = probs / total
    return int(rng.choice(unrolls, p=probs))


def push_forward_build(model_apply, case):
    """One pushforward unroll step: predict, integrate, re-preprocess.

    Gradients do NOT flow through the unroll (the result feeds the next
    preprocess, whose output is treated as data) — same semantics as the
    reference (lagrangebench/train/strats.py:112-161).
    """

    def push_forward_fn(features, current_pos, particle_type, neighbors, params, state):
        pred, _ = model_apply(params, state, (features, particle_type))
        next_pos = case.integrate(pred, current_pos)
        current_pos = jnp.concatenate(
            [current_pos[:, 1:], next_pos[:, None, :]], axis=1
        )
        features, neighbors = case.preprocess_eval(
            (current_pos, particle_type), neighbors
        )
        return current_pos, neighbors, features

    return push_forward_fn


def push_forward_batched_build(model_apply, case):
    """Pushforward over a trajectory batch on the flat super-graph.

    Same semantics as ``push_forward_build`` vmapped per sample, but the
    model forward and feature rebuild run on the (B*N)-row disjoint
    super-graph (case.preprocess_eval_batched): integrate and the window
    shift are purely row-wise, so they apply to the flattened positions
    directly; only the neighbor update runs per sample (inside the batched
    preprocess).
    """

    def push_forward_fn(flat_features, current_pos, particle_type, neighbors,
                        params, state):
        b, n = particle_type.shape
        flat_ptype = particle_type.reshape(b * n)
        pred, _ = model_apply(params, state, (flat_features, flat_ptype))
        cur_flat = current_pos.reshape((b * n,) + current_pos.shape[2:])
        next_pos = case.integrate(pred, cur_flat)
        cur_flat = jnp.concatenate(
            [cur_flat[:, 1:], next_pos[:, None, :]], axis=1
        )
        current_pos = cur_flat.reshape(current_pos.shape)
        flat_features, neighbors = case.preprocess_eval_batched(
            (current_pos, particle_type), neighbors
        )
        return current_pos, neighbors, flat_features

    return push_forward_fn
