"""Spatial (particle-axis) sharding: sharded GNS forward == unsharded."""

import jax
import jax.numpy as jnp
import numpy as np

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.models import GNS, make_model_fns
from lagrangebench_tpu.parallel import make_mesh
from lagrangebench_tpu.parallel.spatial import (
    build_spatial_gns_forward,
    spatial_partition,
)


def test_spatial_sharded_forward_matches_unsharded():
    n, dim, isl = 2048, 3, 4
    box, cutoff = 1.0, 0.07
    mp_steps, latent = 3, 16

    rng = np.random.default_rng(0)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)

    metadata = {
        "dim": dim,
        "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim,
        "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim,
        "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim,
        metadata=metadata,
        input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0,
        dtype=jnp.float64,
    )

    model = GNS(particle_dimension=dim, latent_size=latent,
                num_mp_steps=mp_steps, compute_dtype="float64")
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, _ = init(jax.random.PRNGKey(0), (features, ptype))

    def to_f64(x):
        x = np.asarray(x)
        return jnp.asarray(x, jnp.float64) if x.dtype.kind == "f" else jnp.asarray(x)

    params64 = jax.tree.map(to_f64, params)
    features64 = jax.tree.map(to_f64, features)
    out_ref, _ = apply(params64, {}, (features64, jnp.asarray(ptype)))
    acc_ref = np.asarray(out_ref["acc"])

    # ---- spatially sharded
    n_dev = 8
    mesh = make_mesh(n_dev)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos, ptype, n_dev, box_x=box
    )
    k_cap = nbrs.idx.shape[1]
    fwd = build_spatial_gns_forward(
        mesh,
        params64,
        box=[box] * dim,
        cutoff=cutoff,
        input_seq_length=isl,
        num_mp_steps=mp_steps,
        k_cap=k_cap,
        vel_mean=jnp.zeros(dim),
        vel_std=jnp.full(dim, 1e-3),
        compute_dtype=jnp.float64,
    )
    acc_sh, overflow = fwd(
        jnp.asarray(pos_sh, jnp.float64),
        jnp.asarray(ptype_sh),
        jnp.asarray(counts)[:, None],
    )
    assert not bool(overflow)

    # gather valid rows back into global order
    acc_sh = np.asarray(acc_sh)
    got = np.zeros_like(acc_ref)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        got[order[start : start + c]] = acc_sh[d, :c]
        start += c

    np.testing.assert_allclose(got, acc_ref, rtol=1e-9, atol=1e-10)
