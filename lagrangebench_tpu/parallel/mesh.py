"""Mesh construction and sharding for ICI data parallelism.

The reference is strictly single-device (SURVEY.md §2.3); this module is the
new capability: a 1D ``data`` mesh over the TPU slice. The training batch
(and the per-sample RNG keys / neighbor lists) shard along ``data``;
parameters and optimizer state replicate. Gradient reduction then lowers to a
single ICI ``psum`` emitted by XLA from the sharding annotations — no
explicit collectives in user code.

Spatial (particle-axis) sharding with halo exchange is the planned follow-up
for >100k-particle scaling and will live here as well.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = -1, devices=None) -> Mesh:
    """Build a 1D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices == -1:
        n_devices = len(devices)
    assert n_devices <= len(devices), (
        f"requested {n_devices} devices, only {len(devices)} available"
    )
    return Mesh(np.asarray(devices[:n_devices]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading batch axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(pytree, mesh: Optional[Mesh]):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return pytree
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host execution (DCN across slices).

    On TPU pods the arguments are discovered from the environment; returns
    the local process index. Safe to call when already initialized or when
    running single-process (no-op).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized
    return jax.process_index()
