"""TPU-native numerical primitives: spaces, neighbor search, scatter ops."""

from .batching import flatten_graph_batch, unflatten_nodes
from .neighbors import NeighborList, NeighborListFns, neighbor_list
from .scatter import (
    aggregate_mean_to_receivers,
    aggregate_to_receivers,
    segment_mean,
    segment_sum,
)
from .space import distance, free, periodic

__all__ = [
    "NeighborList",
    "NeighborListFns",
    "neighbor_list",
    "segment_sum",
    "segment_mean",
    "aggregate_to_receivers",
    "aggregate_mean_to_receivers",
    "flatten_graph_batch",
    "unflatten_nodes",
    "periodic",
    "free",
    "distance",
]
