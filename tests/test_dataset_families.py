"""Behavioral coverage for the dataset families beyond periodic fluid boxes:

* WaterDrop-style variable particle counts (padding to num_particles_max)
* RPF-style external forcing loaded from the dataset's force.py
* LDC/DAM-style wall particles (kinematic masking through train + rollout)
"""

import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.config import Config
from lagrangebench_tpu.data import DataLoader, H5Dataset
from lagrangebench_tpu.evaluate import MetricsComputer, eval_rollout
from lagrangebench_tpu.models import setup_model
from lagrangebench_tpu.train import Trainer
from lagrangebench_tpu.utils import NodeType

ISL = 3


def write_dataset(root, trajs, types, metadata, force_py=None):
    os.makedirs(root, exist_ok=True)
    for split in ("train", "valid", "test"):
        with h5py.File(os.path.join(root, f"{split}.h5"), "w") as f:
            for i, (pos, pt) in enumerate(zip(trajs, types)):
                g = f.create_group(f"{i:05d}")
                g.create_dataset("position", data=pos)
                g.create_dataset("particle_type", data=pt)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(metadata, f)
    if force_py:
        with open(os.path.join(root, "force.py"), "w") as f:
            f.write(force_py)


BASE_META = {
    "dim": 2,
    "dx": 0.1,
    "dt": 0.01,
    "write_every": 1,
    "default_connectivity_radius": 0.3,
    "bounds": [[0.0, 1.0], [0.0, 1.0]],
    "vel_mean": [0.0, 0.0],
    "vel_std": [0.01, 0.01],
    "acc_mean": [0.0, 0.0],
    "acc_std": [0.001, 0.001],
}


def drift_traj(n, steps, seed, box=1.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, box, size=(1, n, 2))
    vel = rng.normal(0, 0.005, size=(1, n, 2))
    t = np.arange(steps)[:, None, None]
    return np.mod(base + vel * t, box)


def test_variable_particle_counts(tmp_path):
    """WaterDrop-style: trajectories with different N pad to the max and
    train without padded particles leaking into the loss or the graph."""
    root = str(tmp_path / "2D_VAR_20")
    trajs = [drift_traj(12, 30, 0), drift_traj(20, 30, 1)]
    types = [np.zeros(12, np.int64), np.zeros(20, np.int64)]
    meta = dict(BASE_META)
    meta.update(
        {"num_particles_max": 20, "periodic_boundary_conditions": [True, True]}
    )
    write_dataset(root, trajs, types, meta)

    data = H5Dataset("train", root, name="var2d", input_seq_length=ISL)
    pos0, pt0 = data[0]  # from the 12-particle trajectory
    assert pos0.shape[0] == 20
    assert (pt0 == NodeType.PAD_VALUE).sum() == 8

    case = case_builder(
        box=[1.0, 1.0], metadata=meta, input_seq_length=ISL,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.5,
                       "format": "dense"},
        noise_std=1e-4, dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    _, features, _, nbrs = case.allocate(key, (pos0, pt0))
    # padded particles must have no neighbors at all
    senders = np.asarray(nbrs.idx)
    assert (senders[12:] == 20).all(), "padding rows must be empty"
    assert (senders[senders < 20] < 12).all(), "padding must not be a sender"

    cfg_model = Config({"name": "gns", "input_seq_length": ISL,
                        "num_mp_steps": 2, "num_mlp_layers": 2,
                        "latent_dim": 8, "magnitude_features": False,
                        "isotropic_norm": False})
    _, init, apply = setup_model(cfg_model, meta)
    data_valid = H5Dataset("valid", root, name="var2d",
                           input_seq_length=ISL, extra_seq_length=5)
    trainer = Trainer(
        (init, apply), case, data, data_valid,
        cfg_train={"batch_size": 2, "noise_std": 1e-4,
                   "pushforward": {"steps": [-1], "unrolls": [0], "probs": [1]}},
        cfg_eval={"n_rollout_steps": 3, "train": {"n_trajs": 1}},
        cfg_logging={"log_steps": 10, "eval_steps": 100},
        input_seq_length=ISL, seed=0,
    )
    params, _, _ = trainer.train(step_max=2)
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_external_force_fn(tmp_path):
    """RPF-style: force.py in the dataset dir loads and feeds the model."""
    root = str(tmp_path / "2D_FRC_10")
    trajs = [drift_traj(10, 30, 2)] * 2
    types = [np.zeros(10, np.int64)] * 2
    meta = dict(BASE_META)
    meta.update(
        {"num_particles_max": 10, "periodic_boundary_conditions": [True, True]}
    )
    force_py = (
        "import jax.numpy as jnp\n"
        "def force_fn(position):\n"
        "    # reverse-Poiseuille-style: +x force in the upper half\n"
        "    sign = jnp.where(position[1] > 0.5, 1.0, -1.0)\n"
        "    return jnp.array([sign, 0.0]) * 0.01\n"
    )
    write_dataset(root, trajs, types, meta, force_py=force_py)

    data = H5Dataset("train", root, name="frc2d", input_seq_length=ISL)
    assert data.external_force_fn is not None

    case = case_builder(
        box=[1.0, 1.0], metadata=meta, input_seq_length=ISL,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5,
                       "format": "dense"},
        noise_std=0.0,
        external_force_fn=data.external_force_fn,
        dtype=jnp.float64,
    )
    pos0, pt0 = data[0]
    features, _ = case.allocate_eval((pos0[:, :ISL], pt0))
    assert "force" in features
    force = np.asarray(features["force"])
    upper = np.asarray(pos0[:, ISL - 1, 1]) > 0.5
    np.testing.assert_allclose(force[upper, 0], 0.01)
    np.testing.assert_allclose(force[~upper, 0], -0.01)

    # GNS consumes the force feature (node input width grows)
    cfg_model = Config({"name": "gns", "input_seq_length": ISL,
                        "num_mp_steps": 1, "num_mlp_layers": 2,
                        "latent_dim": 8, "magnitude_features": False,
                        "isotropic_norm": False})
    _, init, apply = setup_model(cfg_model, meta, has_external_force=True)
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(pt0)))
    out, _ = apply(params, state, (features, jnp.asarray(pt0)))
    assert np.isfinite(np.asarray(out["acc"])).all()


def test_wall_particles_follow_ground_truth(tmp_path):
    """LDC/DAM-style: wall particles are never predicted — the rollout
    copies their ground-truth positions and the loss masks them."""
    root = str(tmp_path / "2D_WAL_16")
    n_fluid, n_wall, steps = 10, 6, 30
    fluid = drift_traj(n_fluid, steps, 3)
    # walls: static row at the bottom
    wall = np.tile(
        np.stack([np.linspace(0.05, 0.95, n_wall), np.full(n_wall, 0.02)], -1),
        (steps, 1, 1),
    )
    pos = np.concatenate([fluid, wall], axis=1)
    ptype = np.concatenate(
        [np.zeros(n_fluid, np.int64),
         np.full(n_wall, NodeType.SOLID_WALL, np.int64)]
    )
    meta = dict(BASE_META)
    meta.update(
        {"num_particles_max": n_fluid + n_wall,
         "periodic_boundary_conditions": [False, False]}
    )
    write_dataset(root, [pos] * 2, [ptype] * 2, meta)

    data = H5Dataset("test", root, name="wal2d", input_seq_length=ISL,
                     extra_seq_length=10)
    case = case_builder(
        box=[1.0, 1.0], metadata=meta, input_seq_length=ISL,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
    )
    # non-periodic: wall-distance features appear
    pos0, pt0 = data[0]
    features, nbrs = case.allocate_eval((pos0[:, :ISL], pt0))
    assert "bound" in features and features["bound"].shape == (16, 4)

    # a garbage model: rollout must still keep walls exactly on ground truth
    cfg_model = Config({"name": "linear", "input_seq_length": ISL,
                        "num_mp_steps": 1, "num_mlp_layers": 1,
                        "latent_dim": 4, "magnitude_features": False,
                        "isotropic_norm": False})
    _, init, apply = setup_model(cfg_model, meta)
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(pt0)))

    from lagrangebench_tpu.evaluate.rollout import _build_rollout_fn, _eval_batched_rollout

    rollout_fn = _build_rollout_fn(apply, case, ISL)
    batch = (jnp.asarray(pos0)[None], jnp.asarray(pt0)[None])
    metrics_vmap = jax.vmap(
        MetricsComputer(["mse"], case.displacement, meta, input_seq_length=ISL),
        in_axes=(0, 0),
    )
    preds, metrics, _ = _eval_batched_rollout(
        rollout_fn, case, params, state, batch, nbrs, metrics_vmap,
        n_rollout_steps=8, t_window=ISL,
    )
    preds = np.asarray(preds)[0]  # (T, N, dim)
    truth = np.asarray(pos0).transpose(1, 0, 2)[ISL : ISL + 8]
    np.testing.assert_allclose(
        preds[:, n_fluid:], truth[:, n_fluid:], atol=1e-12,
        err_msg="wall particles must follow ground truth exactly",
    )
    # fluid particles moved by the (garbage) model: NOT equal to truth
    assert not np.allclose(preds[:, :n_fluid], truth[:, :n_fluid])
