"""ctypes bindings for the native host-side neighbor engine.

Compiles lagrangebench_tpu/native/neighbors.cpp on first use (g++; output cached next to the source or in ~/.cache when installed read-only)
and exposes:

* ``count_edges(positions, box, periodic, cutoff, num_particles)``
* ``build_edges(...) -> (idx (2, e_cap) int32 fill=n, count)``
* ``max_occupancy(...)``

Falls back to ``available() == False`` when no compiler is present; callers
keep their numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

# the C++ source ships as package data (lagrangebench_tpu/native/)
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "neighbors.cpp",
)


def _so_path() -> str:
    """Build-output location: next to the source if writable (dev
    checkout), else a user cache dir (pip-installed, read-only
    site-packages)."""
    src_dir = os.path.dirname(_SRC)
    if os.access(src_dir, os.W_OK):
        return os.path.join(src_dir, "libneighbors.so")
    cache = os.path.join(
        os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        ),
        "lagrangebench_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libneighbors.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            so = _so_path()
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(
                _SRC
            ):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        _SRC, "-o", so,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.neighbor_edges.restype = ctypes.c_int64
            lib.neighbor_edges.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # positions
                ctypes.c_int64,  # n
                ctypes.c_int,  # dim
                ctypes.POINTER(ctypes.c_double),  # box
                ctypes.c_int,  # periodic
                ctypes.c_double,  # cutoff
                ctypes.c_int64,  # num_particles
                ctypes.POINTER(ctypes.c_int32),  # receivers
                ctypes.POINTER(ctypes.c_int32),  # senders
                ctypes.c_int64,  # e_cap
            ]
            lib.max_cell_occupancy.restype = ctypes.c_int64
            lib.max_cell_occupancy.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_double,
                ctypes.c_int64,
            ]
            _LIB = lib
        except (OSError, subprocess.CalledProcessError):
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _prep(positions, box):
    pos = np.ascontiguousarray(np.asarray(positions), dtype=np.float64)
    box_arr = np.ascontiguousarray(np.asarray(box, dtype=np.float64).reshape(-1))
    return pos, box_arr


def count_edges(positions, box, periodic: bool, cutoff: float,
                num_particles: Optional[int] = None) -> int:
    """Exact number of radius-graph edges (self-edges included)."""
    lib = _load()
    assert lib is not None, "native neighbor library unavailable"
    pos, box_arr = _prep(positions, box)
    n, dim = pos.shape
    npart = n if num_particles is None else int(num_particles)
    count = lib.neighbor_edges(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, dim,
        box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(bool(periodic)), float(cutoff), npart, None, None, 0,
    )
    assert count >= 0, "native neighbor_edges failed"
    return int(count)


def build_edges(positions, box, periodic: bool, cutoff: float, e_cap: int,
                num_particles: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """(idx (2, e_cap) int32 with fill=n, total_count). Receiver-major."""
    lib = _load()
    assert lib is not None, "native neighbor library unavailable"
    pos, box_arr = _prep(positions, box)
    n, dim = pos.shape
    npart = n if num_particles is None else int(num_particles)
    receivers = np.full(e_cap, n, dtype=np.int32)
    senders = np.full(e_cap, n, dtype=np.int32)
    count = lib.neighbor_edges(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, dim,
        box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(bool(periodic)), float(cutoff), npart,
        receivers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        senders.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        e_cap,
    )
    assert count >= 0, "native neighbor_edges failed"
    if count < e_cap:  # ensure fill beyond count (defensive)
        receivers[count:] = n
        senders[count:] = n
    return np.stack([receivers, senders]), int(count)


def max_occupancy(positions, box, cutoff: float,
                  num_particles: Optional[int] = None) -> int:
    lib = _load()
    assert lib is not None, "native neighbor library unavailable"
    pos, box_arr = _prep(positions, box)
    n, dim = pos.shape
    npart = n if num_particles is None else int(num_particles)
    occ = lib.max_cell_occupancy(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, dim,
        box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(cutoff), npart,
    )
    assert occ >= 0
    return int(occ)
