"""Forward-pass timings for every model family at reference scales.

Counterparts of the reference's baselines table ("Forward [ms]" on an
A6000 48GB): GNS-10-128 and SEGNN-10-64 on 8,000 3D particles, EGNN-5-128
and PaiNN-5-128 on 3,200 2D particles.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions
from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.config import Config
from lagrangebench_tpu.models import setup_model


def make_case(n, dim, isl, magnitudes, name, mp, latent, compute_dtype):
    box = 1.0
    per_side = max(round(n ** (1.0 / dim)), 2)
    dx = box / per_side
    metadata = {
        "dim": dim, "dx": dx, "dt": 0.005, "write_every": 1,
        "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": 1.45 * dx,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    cfg_model = Config({
        "name": name, "input_seq_length": isl, "num_mp_steps": mp,
        "num_mlp_layers": 2, "latent_dim": latent,
        "magnitude_features": magnitudes, "isotropic_norm": False,
        "lmax_attributes": 1, "lmax_hidden": 1, "segnn_norm": "none",
        "velocity_aggregate": "avg", "compute_dtype": compute_dtype,
    })
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.25,
                       "format": "dense"},
        cfg_model=cfg_model, noise_std=3e-4, dtype=jnp.float32,
    )
    return case, metadata, cfg_model


def bench_forward(name, n, dim, mp, latent, magnitudes=False, n_iter=None,
                  fused=False):
    if n_iter is None:
        # one blocking dispatch chain pays ~28 ms of tunnel RTT on the
        # remote-attached runtime (scripts/experiments/rtt_probe.py);
        # amortize it over enough scan iterations that fast models are
        # not overstated (20 iters adds 1.4 ms/fwd — 75% on fused PaiNN)
        n_iter = int(os.environ.get("BENCH_N", "200"))
    isl = 6
    case, metadata, cfg_model = make_case(
        n, dim, isl, magnitudes, name, mp, latent,
        "bfloat16",
    )
    if fused:
        cfg_model.fused_processor = True
    stats = {
        "velocity": {"mean": jnp.zeros(dim), "std": jnp.ones(dim)},
        "acceleration": {"mean": jnp.zeros(dim), "std": jnp.ones(dim)},
    }
    _, init, apply = setup_model(
        cfg_model, metadata, normalization_stats=stats
    )
    pos = _grid_positions(n, dim, 1.0, isl)
    ptype = np.zeros(n, dtype=np.int32)
    features, _ = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init(jax.random.PRNGKey(0), (features, ptype))
    ptype_j = jnp.asarray(ptype)

    @jax.jit
    def loop(salt0):
        def body(salt, _):
            f = {**features, "vel_hist": features["vel_hist"] + salt}
            out, _ = apply(params, {}, (f, ptype_j))
            return salt + jnp.sum(out["acc"]) * 1e-30, None

        salt, _ = jax.lax.scan(body, salt0, None, length=n_iter)
        return salt

    jax.block_until_ready(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(jnp.float32(1e-32)))
    ms = (time.perf_counter() - t0) / n_iter * 1e3
    return ms


if __name__ == "__main__":
    results = {}
    # reference A6000 forward times (docs/pages/baselines.rst; BASELINE.md)
    reference = {
        "gns_rpf3d": 30.5, "gns_rpf3d_fused": 30.5, "segnn_rpf3d": 154.3,
        "egnn_rpf2d": 60.8, "painn_rpf2d": 9.1,
        "painn_rpf2d_fused": 9.1,
    }
    results["gns_rpf3d"] = bench_forward("gns", 8000, 3, 10, 128)
    print("gns done", results, flush=True)
    results["gns_rpf3d_fused"] = bench_forward("gns", 8000, 3, 10, 128,
                                               fused=True)
    print("gns fused done", results, flush=True)
    results["segnn_rpf3d"] = bench_forward("segnn", 8000, 3, 10, 64)
    print("segnn done", results, flush=True)
    results["egnn_rpf2d"] = bench_forward("egnn", 3200, 2, 5, 128, True)
    print("egnn done", results, flush=True)
    results["painn_rpf2d"] = bench_forward("painn", 3200, 2, 5, 128, True)
    print("painn done", results, flush=True)
    results["painn_rpf2d_fused"] = bench_forward(
        "painn", 3200, 2, 5, 128, True, fused=True
    )
    out = {
        k: {"ms": round(v, 2), "a6000_ms": reference[k],
            "speedup": round(reference[k] / v, 2)}
        for k, v in results.items()
    }
    print(json.dumps(out, indent=1), flush=True)
