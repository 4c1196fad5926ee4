"""Evaluation: rollouts, metrics, artifact export."""

from .metrics import MetricsComputer, MetricsDict, averaged_metrics
from .rollout import eval_rollout, infer
from .utils import pkl2vtk, write_vtk

__all__ = [
    "MetricsComputer",
    "MetricsDict",
    "averaged_metrics",
    "eval_rollout",
    "infer",
    "write_vtk",
    "pkl2vtk",
]
