"""Aggregation primitives over sparse and dense edge layouts.

Two edge layouts coexist (see ops/neighbors.py):

* **sparse** — receiver-sorted ``(E,)`` index arrays (the reference's
  contract). Aggregation is an XLA scatter-add; on TPU this costs ~2.5 ms
  per 150k x 128 op.
* **dense** — ``(N, K)`` per-receiver candidate matrices where row i IS
  receiver i. Aggregation over receivers becomes a masked reshape-sum —
  a pure VPU reduction, no scatter at all. This is the TPU fast path.

``aggregate_to_receivers`` dispatches on the layout; invalid slots
(sender == N fill value) are masked out, mirroring the out-of-range-drop
semantics of the sparse scatter.
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
    """Scatter-add rows into buckets; out-of-range ids drop.

    Accepts dense (N, K) id layouts by flattening — use this for
    aggregations over arbitrary targets (e.g. EGNN's sender scatter).
    """
    if segment_ids.ndim == 2:
        data = data.reshape((-1,) + data.shape[2:])
        segment_ids = segment_ids.reshape(-1)
        indices_are_sorted = False
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
    flat_ids = segment_ids.reshape(-1)
    ones = jnp.ones((flat_ids.shape[0],) + (1,) * (data.ndim - segment_ids.ndim),
                    dtype=data.dtype)
    counts = jax.ops.segment_sum(ones, flat_ids, num_segments=num_segments)
    return totals / jnp.maximum(counts, 1)


def _dense_mask(senders: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return senders < num_segments  # fill value is N (== num_segments)


def aggregate_to_receivers(
    data: jnp.ndarray,
    receivers: jnp.ndarray,
    senders: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Sum per-edge data into receiver buckets.

    Dense layout (receivers.ndim == 2, row i == receiver i): masked
    reshape-sum, scatter-free. Sparse layout: sorted scatter-add (padded
    edges carry receiver == N and drop out of range). An explicit (N, K)
    ``mask`` overrides the sender-fill-value convention (the spatial path
    has valid sender ids >= N — halo candidates).
    """
    if receivers.ndim == 2:
        if mask is None:
            mask = _dense_mask(senders, num_segments)
        mask = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        return jnp.sum(
            jnp.where(mask, data, jnp.zeros((), data.dtype)), axis=1
        )
    return segment_sum(data, receivers, num_segments, indices_are_sorted=True)


def aggregate_mean_to_receivers(
    data: jnp.ndarray,
    receivers: jnp.ndarray,
    senders: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Mean per-edge data into receiver buckets (zero-safe)."""
    if receivers.ndim == 2:
        if mask is None:
            mask = _dense_mask(senders, num_segments)
        maskb = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        total = jnp.sum(jnp.where(maskb, data, jnp.zeros((), data.dtype)), axis=1)
        counts = jnp.sum(mask, axis=1, dtype=data.dtype)
        counts = counts.reshape(counts.shape + (1,) * (total.ndim - counts.ndim))
        return total / jnp.maximum(counts, 1)
    return segment_mean(data, receivers, num_segments, indices_are_sorted=True)
