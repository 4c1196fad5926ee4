"""Mesh construction and sharding for ICI data parallelism.

The reference is strictly single-device (SURVEY.md §2.3); this module is the
new capability: a 1D ``data`` mesh over the TPU slice. The training batch
(and the per-sample RNG keys / neighbor lists) shard along ``data``;
parameters and optimizer state replicate. Gradient reduction then lowers to a
single ICI ``psum`` emitted by XLA from the sharding annotations — no
explicit collectives in user code.

Spatial (particle-axis) sharding with halo exchange for >100k-particle
scaling lives in ``parallel.spatial``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "space"


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


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """Build a 2D ``(data, space)`` mesh: the batch shards over ``data``
    rows and each sample's particle slabs shard over the ``space`` ring
    (``parallel.spatial``). Lay ``space`` innermost so its per-MP-step halo
    ``ppermute``s ride neighboring ICI links."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space
    assert need <= len(devices), (
        f"requested {need} devices ({n_data}x{n_space}), "
        f"only {len(devices)} available"
    )
    grid = np.asarray(devices[:need]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


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


# explicit-coordinator markers that indicate a multi-host launch
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _multihost_indicated() -> bool:
    """True when the environment describes a genuine multi-host launch.

    Single-host TPU runtimes commonly set ``TPU_WORKER_HOSTNAMES=localhost``;
    only a worker list with more than one entry (or an explicit coordinator
    address / multi-node SLURM job) counts.
    """
    import os

    if any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    try:
        return int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) > 1
    except ValueError:
        return False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: int = 300,
) -> int:
    """Initialize multi-host execution (DCN across slices).

    Idempotent and single-process-safe by construction — NOT by swallowing
    errors: if this process is already initialized or no multi-host launch
    is indicated (no explicit arguments and no cluster environment), the
    call is a deliberate no-op. If a multi-host launch IS requested,
    initialization failures propagate — a training job silently falling
    back to single-host is worse than a crash.

    Returns the local process index.
    """
    if jax.distributed.is_initialized():
        return jax.process_index()

    explicit = coordinator_address is not None or num_processes is not None
    if not explicit and not _multihost_indicated():
        return jax.process_index()  # single-process run

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
    )
    return jax.process_index()
