"""Model contract.

Every model is a flax.linen Module whose ``__call__`` takes
``sample = (features: FeatureDict, particle_type: (N,) int array)`` and
returns a dict with at least one of:

    - "acc" (N, dim): normalized acceleration
    - "vel" (N, dim): normalized velocity
    - "pos" (N, dim): absolute next position

This is the same input/output contract as the reference
(reference lagrangebench/models/base.py:8-41); see case/features.py for the
FeatureDict key inventory. ``case.integrate`` consumes the output.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Sample = Tuple[Dict[str, jnp.ndarray], jnp.ndarray]


class BaseModel(nn.Module):
    """Marker base class for LagrangeBench-TPU models."""

    def __call__(self, sample: Sample) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError


def make_model_fns(model: nn.Module):
    """Wrap a flax model into (init, apply) with a haiku-like signature.

    ``apply(params, state, sample) -> (output, new_state)`` where ``state``
    is the dict of non-parameter variable collections (empty for the models
    shipped here, but the plumbing keeps the trainer generic).
    """

    def init(key, sample):
        # jit: flax init otherwise dispatches op-by-op, which is extremely
        # slow on remote-compiled TPU backends
        variables = jax.jit(model.init)(key, sample)
        variables = dict(variables)
        params = variables.pop("params", {})
        return params, variables

    def apply(params, state, sample):
        variables = {"params": params, **(state or {})}
        if state:
            out, new_state = model.apply(
                variables, sample, mutable=list(state.keys())
            )
            return out, dict(new_state)
        out = model.apply(variables, sample)
        return out, {}

    return init, apply
