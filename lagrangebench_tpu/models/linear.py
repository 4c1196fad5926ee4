"""Linear baseline: per-node linear map from scalar features to acceleration.

Used as the fast CI model (reference lagrangebench/models/linear.py).
"""

from __future__ import annotations

from typing import Dict

from flax import linen as nn

from .base import BaseModel, Sample
from .utils import concat_node_features


class Linear(BaseModel):
    """Single Dense layer over concatenated node features."""

    dimension_out: int

    @nn.compact
    def __call__(self, sample: Sample) -> Dict:
        features, _ = sample
        nodes = concat_node_features(features)
        return {"acc": nn.Dense(self.dimension_out, precision="highest")(nodes)}
