"""Multi-device data parallelism on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.parallel import batch_sharding, make_mesh, shard_batch

from .fixtures import make_dataset


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_and_shard_batch():
    mesh = make_mesh(8)
    x = jnp.zeros((16, 3, 4))
    xs = shard_batch(x, mesh)
    assert xs.sharding == batch_sharding(mesh)


def test_data_parallel_training_step(tmp_path):
    """Two steps of DP training across 8 devices must run and stay finite,
    and match the single-device loss on the same batch."""
    from lagrangebench_tpu.case import case_builder
    from lagrangebench_tpu.config import Config
    from lagrangebench_tpu.data import H5Dataset
    from lagrangebench_tpu.models import setup_model
    from lagrangebench_tpu.train import Trainer

    path = make_dataset(str(tmp_path))
    isl = 3
    data_train = H5Dataset("train", path, input_seq_length=isl, extra_seq_length=0)
    data_valid = H5Dataset("valid", path, input_seq_length=isl, extra_seq_length=5)
    metadata = data_train.metadata
    bounds = np.asarray(metadata["bounds"])
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=metadata,
        input_seq_length=isl,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5},
        noise_std=1e-4,
        dtype=jnp.float32,
    )
    _, init, apply = setup_model(
        Config(
            {
                "name": "gns",
                "input_seq_length": isl,
                "num_mp_steps": 1,
                "num_mlp_layers": 2,
                "latent_dim": 4,
                "magnitude_features": False,
                "isotropic_norm": False,
            }
        ),
        metadata,
    )

    def build(mesh):
        return Trainer(
            (init, apply),
            case,
            data_train,
            data_valid,
            cfg_train={
                "batch_size": 8,
                "noise_std": 1e-4,
                "pushforward": {"steps": [-1], "unrolls": [0], "probs": [1]},
            },
            cfg_eval={"n_rollout_steps": 2, "train": {"n_trajs": 1}},
            cfg_logging={"log_steps": 1, "eval_steps": 100},
            input_seq_length=isl,
            seed=0,
            mesh=mesh,
        )

    params_dp, _, _ = build(make_mesh(8)).train(step_max=2)
    params_sd, _, _ = build(None).train(step_max=2)

    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_sd)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        # same data order (same seed) -> numerically close results
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_mesh_batched_rollout_matches_single_device(tmp_path):
    """ICI-batched eval rollouts: sharded metrics == single-device metrics."""
    from lagrangebench_tpu.case import case_builder
    from lagrangebench_tpu.config import Config
    from lagrangebench_tpu.data import DataLoader, H5Dataset
    from lagrangebench_tpu.evaluate import MetricsComputer, eval_rollout
    from lagrangebench_tpu.models import setup_model

    path = make_dataset(str(tmp_path), n_trajs=8)
    isl = 3
    data_valid = H5Dataset("valid", path, input_seq_length=isl, extra_seq_length=5)
    metadata = data_valid.metadata
    bounds = np.asarray(metadata["bounds"])
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=metadata,
        input_seq_length=isl,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5},
        noise_std=1e-4,
        dtype=jnp.float32,
    )
    _, init, apply = setup_model(
        Config(
            {
                "name": "gns",
                "input_seq_length": isl,
                "num_mp_steps": 1,
                "num_mlp_layers": 2,
                "latent_dim": 4,
                "magnitude_features": False,
                "isotropic_norm": False,
            }
        ),
        metadata,
    )
    pos0, ptype0 = data_valid[0]
    feats, neighbors = case.allocate_eval(
        (jnp.asarray(pos0)[:, :isl], jnp.asarray(ptype0))
    )
    params, state = init(jax.random.PRNGKey(0), (feats, jnp.asarray(ptype0)))

    metrics_computer = MetricsComputer(
        ["mse"], dist_fn=case.displacement, metadata=metadata,
        input_seq_length=isl,
    )

    def run(mesh):
        rng = np.random.default_rng(0)
        loader = DataLoader(data_valid, batch_size=8, rng=rng)
        return eval_rollout(
            model_apply=apply,
            case=case,
            metrics_computer=metrics_computer,
            params=params,
            state=state,
            neighbors=neighbors,
            loader_eval=loader,
            n_rollout_steps=4,
            n_trajs=8,
            mesh=mesh,
        )

    m_mesh = run(make_mesh(8))
    m_single = run(None)
    assert set(m_mesh) == set(m_single) and len(m_mesh) == 8
    for k in m_mesh:
        for name in m_mesh[k]:
            np.testing.assert_allclose(
                np.asarray(m_mesh[k][name]),
                np.asarray(m_single[k][name]),
                rtol=1e-5, atol=1e-7,
            )


def test_init_distributed_single_process_noop(monkeypatch):
    """No explicit args + no cluster env -> no initialize call, index 0."""
    import jax

    from lagrangebench_tpu.parallel import init_distributed
    from lagrangebench_tpu.parallel import mesh as mesh_mod

    for var in mesh_mod._COORDINATOR_ENV_VARS + (
        "TPU_WORKER_HOSTNAMES", "SLURM_JOB_NUM_NODES",
    ):
        monkeypatch.delenv(var, raising=False)

    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw),
    )
    assert init_distributed() == jax.process_index()
    assert not called


def test_init_distributed_propagates_failures(monkeypatch):
    """Explicit multi-host args must NOT be silently swallowed."""
    import jax
    import pytest

    from lagrangebench_tpu.parallel import init_distributed

    def boom(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        init_distributed(
            coordinator_address="127.0.0.1:1",
            num_processes=2,
            process_id=1,
            initialization_timeout=1,
        )


def test_init_distributed_idempotent(monkeypatch):
    """Already-initialized processes return immediately."""
    import jax

    from lagrangebench_tpu.parallel import init_distributed

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    assert init_distributed(coordinator_address="x:1") == jax.process_index()
    assert not called


def test_init_distributed_ignores_single_host_markers(monkeypatch):
    """TPU_WORKER_HOSTNAMES=localhost (single host) must not trigger init."""
    import jax

    from lagrangebench_tpu.parallel import init_distributed

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: called.append(kw)
    )
    assert init_distributed() == jax.process_index()
    assert not called

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    def boom(**kw):
        raise RuntimeError("would initialize")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    import pytest
    with pytest.raises(RuntimeError, match="would initialize"):
        init_distributed()
