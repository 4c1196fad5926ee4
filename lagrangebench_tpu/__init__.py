"""LagrangeBench-TPU: a TPU-native framework for learned Lagrangian fluid
dynamics.

A from-scratch rebuild of the LagrangeBench capability set (datasets, case
setup, GNN models, training with noise/pushforward, rollout evaluation and
physics metrics) designed for TPU: fixed-shape XLA programs, cell-list
neighbor search with fixed-capacity buffers, scan-based rollouts, Pallas
kernels on the hot paths and jax.sharding data parallelism over ICI.
"""

from .case import case_builder
from .data import DAM2D, LDC2D, LDC3D, RPF2D, RPF3D, TGV2D, TGV3D, H5Dataset
from .defaults import defaults
from .evaluate import infer
from .models import GNS, Linear
from .train import Trainer

__version__ = "0.1.0"

__all__ = [
    "Trainer",
    "infer",
    "case_builder",
    "H5Dataset",
    "TGV2D",
    "TGV3D",
    "RPF2D",
    "RPF3D",
    "LDC2D",
    "LDC3D",
    "DAM2D",
    "GNS",
    "Linear",
    "defaults",
    "__version__",
]
