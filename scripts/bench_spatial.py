"""Spatially-sharded GNS forward benchmark.

Runs the particle-axis-sharded forward (parallel/spatial.py) over all
available devices (one slab per device). On a multi-chip slice this is the
>100k-particle scaling path; on one chip it degenerates to a single slab
and measures the spatial pipeline's overhead vs the standard forward.

Usage: python scripts/bench_spatial.py [n_particles] [n_devices]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions, _make_case_and_model
from lagrangebench_tpu.models import GNS, make_model_fns
from lagrangebench_tpu.parallel import make_mesh
from lagrangebench_tpu.parallel.spatial import (
    build_spatial_gns_forward,
    spatial_partition,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    dim, isl, latent, mp = 3, 6, 128, 10
    box = 1.0
    per_side = max(round(n ** (1.0 / dim)), 2)
    cutoff = 1.45 * box / per_side

    pos = _grid_positions(n, dim, box, isl)
    ptype = np.zeros(n, dtype=np.int32)

    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n, dim=dim, isl=isl, latent=latent, mp_steps=mp
    )
    features, nbrs = case.allocate_eval((pos[:, :isl], ptype))
    params, _ = init_fn(jax.random.PRNGKey(0), (features, ptype))
    k_cap = nbrs.idx.shape[1]

    mesh = make_mesh(n_dev)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos, ptype, n_dev, box_x=box
    )
    print(
        f"devices={n_dev} N_loc={pos_sh.shape[1]} k_cap={k_cap}", flush=True
    )
    fwd = build_spatial_gns_forward(
        mesh,
        params,
        box=[box] * dim,
        cutoff=cutoff,
        input_seq_length=isl,
        num_mp_steps=mp,
        k_cap=k_cap,
        vel_mean=jnp.asarray(metadata["vel_mean"]),
        vel_std=jnp.asarray(metadata["vel_std"]),
    )
    args = (
        jnp.asarray(pos_sh, jnp.float32),
        jnp.asarray(ptype_sh),
        jnp.asarray(counts)[:, None],
    )
    acc, overflow = fwd(*args)
    jax.block_until_ready(acc)
    assert not bool(overflow), "k_cap overflow"

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        acc, overflow = fwd(*args)
    jax.block_until_ready(acc)
    ms = (time.perf_counter() - t0) / n_iter * 1e3
    print(
        f"spatial forward: {ms:.3f} ms ({n} particles, {n_dev} devices, "
        f"{n / ms * 1e3:,.0f} particles/s-forward)",
        flush=True,
    )


if __name__ == "__main__":
    main()
