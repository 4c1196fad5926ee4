"""Segment reductions tuned for receiver-sorted edge layouts.

The neighbor search (ops/neighbors.py) emits edges sorted by receiver, so
aggregations can tell XLA the indices are sorted — on TPU this lowers to a
much cheaper scatter than the general case. Replaces jraph's segment helpers
used by the reference GNS (reference lagrangebench/models/gns.py:117-119).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Sum `data` rows into `num_segments` buckets; out-of-range ids drop.

    Padded edges carry segment id == N (one past the end) and are silently
    dropped by XLA's out-of-bounds scatter semantics.
    """
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Mean-aggregation companion to segment_sum (zero-safe)."""
    totals = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones((data.shape[0],) + (1,) * (data.ndim - 1), dtype=data.dtype)
    counts = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    return totals / jnp.maximum(counts, 1)
