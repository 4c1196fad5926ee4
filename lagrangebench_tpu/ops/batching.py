"""Batch flattening: a batch of graphs as one disjoint super-graph.

vmapping a GNN over trajectories makes every gather/scatter a batched-dims
gather, which lowers poorly on TPU (measured ~27x slower per step at batch
4). Because message passing never crosses graph boundaries, a batch of B
independent N-particle graphs is EXACTLY equivalent to one B*N-particle
graph whose edge indices are offset per sample — and on the flat graph all
gathers take the fast single-dimension path and the Pallas kernels grid
over B*N rows natively.

``flatten_graph_batch`` converts a batched FeatureDict; padded edge indices
(fill == N per sample) map to the flat fill B*N.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

# FeatureDict keys indexed per node vs per edge (see case/features.py)
_EDGE_KEYS = ("senders", "receivers", "rel_disp", "rel_dist")


def flatten_graph_batch(
    features: Dict[str, jnp.ndarray], particle_type: jnp.ndarray
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """(B, ...) batched features -> flat super-graph features.

    Works for both edge layouts: dense index arrays are (B, N, K) and edge
    features (B, N, K, ...); sparse index arrays are (B, E) and edge
    features (B, E, ...).
    """
    b, n = particle_type.shape

    def flat(x):
        return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

    out = {}
    for key, v in features.items():
        if key in ("senders", "receivers"):
            off = (jnp.arange(b, dtype=v.dtype) * n).reshape(
                (b,) + (1,) * (v.ndim - 1)
            )
            out[key] = flat(jnp.where(v < n, v + off, b * n))
        else:
            out[key] = flat(v)
    return out, particle_type.reshape(b * n)


def unflatten_nodes(x: jnp.ndarray, b: int, n: int) -> jnp.ndarray:
    """Flat per-node outputs (B*N, ...) back to (B, N, ...)."""
    return x.reshape((b, n) + x.shape[1:])
