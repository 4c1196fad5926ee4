"""Synthetic test datasets.

Thin wrapper around the package's synthetic dataset generator: a tiny
deterministic 3-particle periodic dataset in the LagrangeBench on-disk
format (same role as the reference's bundled 3-particle LJ fixture).
"""

from __future__ import annotations

from lagrangebench_tpu.data.synthetic import make_synthetic_dataset

BOX = 5.0
DIM = 3
N_PARTICLES = 3
RADIUS = 3.0


def make_dataset(
    root: str, seq_len_train: int = 60, seq_len_eval: int = 30, n_trajs: int = 2
) -> str:
    """Write the standard tiny fixture dataset; returns its path."""
    return make_synthetic_dataset(
        root,
        n_particles=N_PARTICLES,
        dim=DIM,
        box=BOX,
        radius=RADIUS,
        seq_len_train=seq_len_train,
        seq_len_eval=seq_len_eval,
        n_trajs=n_trajs,
    )
