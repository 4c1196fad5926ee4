"""TPU-native numerical primitives: spaces, neighbor search, scatter ops."""

from .neighbors import NeighborList, NeighborListFns, neighbor_list
from .scatter import segment_mean, segment_sum
from .space import distance, free, periodic

__all__ = [
    "NeighborList",
    "NeighborListFns",
    "neighbor_list",
    "segment_sum",
    "segment_mean",
    "periodic",
    "free",
    "distance",
]
