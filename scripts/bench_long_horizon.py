"""Long-horizon rollout bench: 400 steps at 8k/3D with on-device metrics.

The BASELINE workload named in BASELINE.json configs item 5: "400-step
rollouts with Sinkhorn + E_kin metrics, batched over ICI". This measures
the single-chip row: ONE 400-step `lax.scan` rollout (the production
`_build_rollout_fn` path — no host round trips inside the horizon) plus
the full MetricsComputer (mse + sinkhorn + e_kin, stride 10) computed
on-device, reporting ms/rollout-step with and without the metric pass.

The model is random-init, so the long horizon random-walks particles into
clusters and the max per-row neighbor count grows with the horizon (see
bench.py's docstring); the neighbor capacity here is sized by the
standard overflow-escalation retry, and the resulting capacity is part of
the reported row. RTT is amortized the same way as bench.py: repeats are
dispatched as one non-blocking chain with a single final block.

Run ON TPU:  python scripts/bench_long_horizon.py
Env knobs:   LONG_STEPS (default 400), LONG_REPEATS (default 3),
             LONG_STRIDE (metrics stride, default 10)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_trained(ckp_dir: str, data_dir: str, n_steps: int):
    """Trained-model mode (env LONG_CKP + LONG_DATA): positions, targets,
    case, and params come from a real dataset test trajectory and a
    trained checkpoint, so the horizon runs at LEARNED density — the
    random-init mode clusters particles, inflates per-row neighbor
    counts, and lands on the celllist fallback (round-4 caveat row)."""
    import jax.numpy as jnp

    from lagrangebench_tpu.case import case_builder
    from lagrangebench_tpu.checkpoint import load_checkpoint
    from lagrangebench_tpu.config import load_yaml
    from lagrangebench_tpu.data import H5Dataset
    from lagrangebench_tpu.models import setup_model

    cfg = load_yaml(os.path.join(ckp_dir, "config.yaml"))
    isl = cfg.model.input_seq_length
    # Metadata/force via H5Dataset at a 1-step horizon; the positions come
    # straight from the h5 file so a split that mixes short and long
    # trajectories (e.g. the generated TGV-3D test split: one 126-frame +
    # two 426-frame) can still serve the long-horizon window.
    data = H5Dataset(
        "test", dataset_path=data_dir,
        input_seq_length=isl, extra_seq_length=1,
    )
    metadata = data.metadata
    import h5py

    need = isl + n_steps
    with h5py.File(os.path.join(data_dir, "test.h5"), "r") as f:
        keys = sorted(f.keys())
        lengths = {k: f[f"{k}/position"].shape[0] for k in keys}
        pick = max(keys, key=lambda k: lengths[k])
        assert lengths[pick] >= need, (
            f"longest test trajectory ({lengths[pick]} frames) is shorter "
            f"than isl + LONG_STEPS = {need}"
        )
        pos_full = f[f"{pick}/position"][:need].transpose(1, 0, 2)
        ptype = f[f"{pick}/particle_type"][:]
    print(f"# trajectory {pick}: {lengths[pick]} frames, using {need}",
          file=sys.stderr)
    bounds = np.asarray(metadata["bounds"])
    box = (bounds[:, 1] - bounds[:, 0]).tolist()
    case = case_builder(
        box=box, metadata=metadata, input_seq_length=isl,
        cfg_neighbors=cfg.neighbors, cfg_model=cfg.model,
        noise_std=cfg.train.noise_std,
        external_force_fn=data.external_force_fn,
    )
    _, _, apply_fn = setup_model(
        cfg.model, metadata,
        has_external_force=data.external_force_fn is not None,
        normalization_stats=case.normalization_stats,
        homogeneous_particles=bool(ptype.max() == ptype.min()),
    )
    params, state, _, step = load_checkpoint(
        os.path.join(ckp_dir, "best")
    )
    print(f"# trained mode: {ckp_dir} (step {step}), "
          f"test traj 0 of {data_dir}", file=sys.stderr)
    return case, metadata, apply_fn, params, state, np.asarray(pos_full), \
        np.asarray(ptype), isl


def main():
    n_steps = int(os.environ.get("LONG_STEPS", "400"))
    n_repeats = int(os.environ.get("LONG_REPEATS", "3"))
    stride = int(os.environ.get("LONG_STRIDE", "10"))
    ckp_dir = os.environ.get("LONG_CKP")
    data_dir = os.environ.get("LONG_DATA")
    n, dim, isl = 8000, 3, 6

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _grid_positions, _make_case_and_model
    from lagrangebench_tpu.evaluate.metrics import MetricsComputer
    from lagrangebench_tpu.evaluate.rollout import _build_rollout_fn

    if ckp_dir and data_dir:
        (case, metadata, apply_fn, params, state, pos_full, ptype,
         isl) = _load_trained(ckp_dir, data_dir, n_steps)
        n, dim = pos_full.shape[0], pos_full.shape[2]
        pos = pos_full  # (N, isl + n_steps, dim)
        features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
    else:
        case, metadata, init_fn, apply_fn = _make_case_and_model(
            n, dim=dim, isl=isl, backend="pallas", nl_format="dense",
            compute_dtype="bfloat16", use_fused_processor=True,
        )
        pos = _grid_positions(n, dim, 1.0, isl)
        ptype = np.zeros(n, dtype=np.int32)
        features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
        params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))

    rollout_fn = _build_rollout_fn(apply_fn, case, isl)
    metrics_computer = MetricsComputer(
        ["mse", "sinkhorn", "e_kin"],
        dist_fn=case.displacement,
        metadata=metadata,
        input_seq_length=isl,
        stride=stride,
    )
    metrics_jit = jax.jit(jax.vmap(metrics_computer, in_axes=(0, 0)))

    current = jnp.asarray(pos[None, :, :isl])  # (B=1, N, T, dim)
    ptype_b = jnp.asarray(ptype[None])
    if ckp_dir and data_dir:
        # real ground truth from the test trajectory
        targets_tm = jnp.transpose(
            jnp.asarray(pos[None, :, isl : isl + n_steps]), (2, 0, 1, 3)
        )  # (T, B, N, dim)
    else:
        # synthetic ground truth: hold the initial frame (no kinematic
        # particles, so targets only feed the metrics pass)
        targets_tm = jnp.broadcast_to(
            jnp.asarray(pos[:, isl - 1])[None, None], (n_steps, 1, n, dim)
        )
    targets_bm = jnp.transpose(targets_tm, (1, 2, 0, 3))  # (B, N, T, dim)

    from lagrangebench_tpu.utils import broadcast_to_batch

    # capacity sizing: escalate until the 400-step horizon fits
    nbrs_b = broadcast_to_batch(neighbors, 1)
    boost = 1.0
    for _ in range(8):
        preds, overflow, nbrs_b = rollout_fn(
            params, state, current, ptype_b, nbrs_b, targets_tm
        )
        if not bool(overflow):
            break
        boost *= 1.5
        print(f"# overflow at horizon {n_steps}; boost -> {boost:.2f}",
              file=sys.stderr)
        _, nbrs = case.allocate_eval((pos[:, :isl], ptype),
                                     capacity_boost=boost)
        nbrs_b = broadcast_to_batch(nbrs, 1)
    else:
        raise RuntimeError("could not size the neighbor capacity")
    e_cap = int(np.prod(nbrs_b.idx.shape[1:]))

    m = metrics_jit(preds, jnp.transpose(targets_bm, (0, 2, 1, 3)))
    jax.block_until_ready(m)

    # timed: rollout-only chain
    t0 = time.perf_counter()
    outs = []
    for _ in range(n_repeats):
        p, o, _ = rollout_fn(params, state, current, ptype_b, nbrs_b,
                             targets_tm)
        outs.append(o)
    jax.block_until_ready(outs)
    dt_roll = (time.perf_counter() - t0) / (n_repeats * n_steps) * 1e3

    # timed: rollout + metrics chain
    t0 = time.perf_counter()
    outs = []
    for _ in range(n_repeats):
        p, o, _ = rollout_fn(params, state, current, ptype_b, nbrs_b,
                             targets_tm)
        outs.append(metrics_jit(p, jnp.transpose(targets_bm, (0, 2, 1, 3))))
    jax.block_until_ready(outs)
    dt_full = (time.perf_counter() - t0) / (n_repeats * n_steps) * 1e3

    pps = n / (dt_full * 1e-3)
    print(json.dumps({
        "metric": "long_horizon_rollout_particle_steps_per_sec",
        "value": round(pps, 1),
        "unit": "particle-steps/s",
        "detail": {
            "n_steps": n_steps,
            "ms_per_step_rollout_only": round(dt_roll, 3),
            "ms_per_step_with_metrics": round(dt_full, 3),
            "metrics": ["mse", "sinkhorn", "e_kin"],
            "metrics_stride": stride,
            "metrics_overhead_ms_per_step": round(dt_full - dt_roll, 3),
            "n_particles": n,
            "edges_capacity": e_cap,
            "capacity_boost": boost,
            "device": jax.devices()[0].device_kind,
            "mode": "trained" if (ckp_dir and data_dir) else "random_init",
            "checkpoint": ckp_dir,
            "dataset": data_dir,
        },
    }))


if __name__ == "__main__":
    main()
