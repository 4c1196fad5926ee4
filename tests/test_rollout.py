"""Rollout correctness: a cheating model replaying ground-truth accelerations
must reproduce the exact trajectory (preprocess -> integrate -> window shift
round-trip), including extrapolation steps.

Same verification idea as the reference's CheatingModel test
(reference tests/rollout_test.py:92-116), rebuilt on the scan rollout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.data import H5Dataset, DataLoader
from lagrangebench_tpu.evaluate import MetricsComputer, averaged_metrics, eval_rollout
from lagrangebench_tpu.models import make_model_fns

from .fixtures import make_dataset

ISL = 3


class CheatingModel(nn.Module):
    """Replays precomputed normalized accelerations using a step counter in
    the model state."""

    accelerations: jnp.ndarray  # (T, N, dim)

    @nn.compact
    def __call__(self, sample):
        step = self.variable(
            "counter", "step", lambda: jnp.zeros((), jnp.int32)
        )
        acc = jax.lax.dynamic_index_in_dim(
            self.accelerations, step.value, axis=0, keepdims=False
        )
        if not self.is_initializing():
            step.value = step.value + 1
        return {"acc": acc}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    path = make_dataset(str(tmp_path_factory.mktemp("data")), seq_len_eval=30)
    data = H5Dataset("test", path, input_seq_length=ISL, extra_seq_length=25)
    metadata = data.metadata
    bounds = np.asarray(metadata["bounds"])
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=metadata,
        input_seq_length=ISL,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5},
        noise_std=0.0,
        dtype=jnp.float64,
    )
    return case, data, metadata


def normalized_accelerations(case, pos, isl):
    """(T, N, dim) normalized accs exactly as the case computes targets."""
    disp = jax.vmap(case.displacement)
    stats = case.normalization_stats["acceleration"]
    accs = []
    for t in range(pos.shape[1] - isl):
        triple = pos[:, t + isl - 2 : t + isl + 1]
        vel_c = disp(triple[:, 1], triple[:, 0])
        vel_n = disp(triple[:, 2], triple[:, 1])
        accs.append(((vel_n - vel_c) - stats["mean"]) / stats["std"])
    return jnp.stack(accs)


@pytest.mark.parametrize("n_extrap_steps", [0, 5])
def test_cheating_model_reproduces_trajectory(env, n_extrap_steps):
    case, data, metadata = env
    pos, ptype = data[0]
    pos = jnp.asarray(pos)
    n_rollout = pos.shape[1] - ISL - n_extrap_steps

    accs = normalized_accelerations(case, pos, ISL)
    model = CheatingModel(accelerations=accs)
    init, apply = make_model_fns(model)

    features_ptype = (pos[:, :ISL], jnp.asarray(ptype))
    features, neighbors = case.allocate_eval(features_ptype)
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(ptype)))

    loader = DataLoader(data, batch_size=1)
    metrics_computer = MetricsComputer(
        ["mse"], case.displacement, metadata, input_seq_length=ISL
    )
    metrics = eval_rollout(
        model_apply=apply,
        case=case,
        params=params,
        state=state,
        loader_eval=loader,
        neighbors=neighbors,
        metrics_computer=metrics_computer,
        n_rollout_steps=n_rollout,
        n_trajs=1,
        rollout_dir=None,
        n_extrap_steps=n_extrap_steps,
    )
    mse = np.asarray(metrics["rollout_0"]["mse"])
    assert mse.shape[0] == n_rollout
    assert (mse < 1e-10).all(), mse.max()


def test_eval_rollout_writes_artifacts(env, tmp_path):
    case, data, metadata = env
    pos, ptype = data[0]
    pos = jnp.asarray(pos)
    accs = normalized_accelerations(case, pos, ISL)
    model = CheatingModel(accelerations=accs)
    init, apply = make_model_fns(model)
    features, neighbors = case.allocate_eval((pos[:, :ISL], jnp.asarray(ptype)))
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(ptype)))

    out_dir = str(tmp_path / "rollouts")
    metrics = eval_rollout(
        model_apply=apply,
        case=case,
        params=params,
        state=state,
        loader_eval=DataLoader(data, batch_size=1),
        neighbors=neighbors,
        metrics_computer=MetricsComputer(
            ["mse"], case.displacement, metadata, input_seq_length=ISL
        ),
        n_rollout_steps=5,
        n_trajs=1,
        rollout_dir=out_dir,
        out_type="pkl",
    )
    import os
    import pickle

    files = os.listdir(out_dir)
    assert any(f.startswith("rollout_0") and f.endswith(".pkl") for f in files)
    assert any(f.startswith("metrics") for f in files)
    with open(os.path.join(out_dir, "rollout_0.pkl"), "rb") as f:
        rollout = pickle.load(f)
    assert rollout["predicted_rollout"].shape[0] == 5 + ISL
    avg = averaged_metrics(metrics)
    assert "val/loss" in avg and avg["val/loss"] < 1e-10


def test_long_horizon_rollout_single_scan_compiles_once():
    """A 400-step horizon is ONE `lax.scan` under one jit trace: calling
    the rollout twice (new data, same shapes) must not retrace, and the
    full-trajectory switch (n_rollout_steps=-1) reuses the same compiled
    fn. Pins the long-horizon contract of BASELINE configs item 5."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lagrangebench_tpu.case import case_builder
    from lagrangebench_tpu.evaluate.rollout import _build_rollout_fn
    from lagrangebench_tpu.models import Linear, make_model_fns
    from lagrangebench_tpu.utils import broadcast_to_batch

    n, dim, isl, t_long = 27, 2, 3, 400
    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, 1.0]] * dim,
        "default_connectivity_radius": 0.35,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[1.0] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 2.0,
                       "format": "dense"},
        noise_std=0.0,
    )
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, size=(n, isl, dim)).astype(np.float32)
    ptype = np.zeros(n, np.int32)
    model = Linear(dimension_out=dim)
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, state = init(jax.random.PRNGKey(0), (features, ptype))

    rollout_fn = _build_rollout_fn(apply, case, isl)
    targets_tm = jnp.asarray(
        rng.uniform(0, 1, size=(t_long, 1, n, dim)), jnp.float32
    )
    nbrs_b = broadcast_to_batch(nbrs, 1)
    preds, overflow, _ = rollout_fn(
        params, state, jnp.asarray(pos[None]), jnp.asarray(ptype[None]),
        nbrs_b, targets_tm,
    )
    assert preds.shape == (1, t_long, n, dim)
    assert np.isfinite(np.asarray(preds)).all()

    # second call, fresh data, same shapes: NO retrace
    pos2 = rng.uniform(0, 1, size=(1, n, isl, dim)).astype(np.float32)
    rollout_fn(
        params, state, jnp.asarray(pos2), jnp.asarray(ptype[None]),
        nbrs_b, targets_tm * 0.5,
    )
    assert rollout_fn._cache_size() == 1, (
        f"long-horizon rollout retraced: {rollout_fn._cache_size()} entries"
    )
