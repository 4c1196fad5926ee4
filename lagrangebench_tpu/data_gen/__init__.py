"""Offline dataset tooling: statistics, consolidation, format converters."""

from .h5_tools import compute_statistics_h5, consolidate_frames

__all__ = ["compute_statistics_h5", "consolidate_frames"]
