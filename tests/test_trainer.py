"""Trainer smoke tests: loss goes finite, checkpoints save/resume, the
pushforward branch compiles, overflow retry does not corrupt state."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.checkpoint import load_checkpoint
from lagrangebench_tpu.data import H5Dataset
from lagrangebench_tpu.models import setup_model
from lagrangebench_tpu.train import Trainer
from lagrangebench_tpu.config import Config

from .fixtures import make_dataset

ISL = 3


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    path = make_dataset(str(tmp_path_factory.mktemp("data")))
    data_train = H5Dataset("train", path, input_seq_length=ISL, extra_seq_length=1)
    data_valid = H5Dataset("valid", path, input_seq_length=ISL, extra_seq_length=5)
    metadata = data_train.metadata
    bounds = np.asarray(metadata["bounds"])
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=metadata,
        input_seq_length=ISL,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5},
        noise_std=1e-4,
        dtype=jnp.float32,
    )
    return case, data_train, data_valid, metadata


def make_trainer(env, tmp=None, **overrides):
    case, data_train, data_valid, metadata = env
    cfg_model = Config({"name": overrides.pop("model", "linear")})
    model, init, apply = setup_model(
        Config(
            {
                "name": cfg_model.name,
                "input_seq_length": ISL,
                "num_mp_steps": 2,
                "num_mlp_layers": 2,
                "latent_dim": 8,
                "magnitude_features": False,
                "isotropic_norm": False,
            }
        ),
        metadata,
    )
    cfg_train = {
        "batch_size": 2,
        "noise_std": 1e-4,
        "pushforward": overrides.pop(
            "pushforward", {"steps": [-1], "unrolls": [0], "probs": [1]}
        ),
    }
    cfg_train.update(overrides.pop("cfg_train_extra", {}))
    cfg_eval = {
        "n_rollout_steps": 5,
        "train": {"n_trajs": 1, "metrics": ["mse"]},
        "infer": {"batch_size": 1},
    }
    cfg_logging = {
        "log_steps": overrides.pop("log_steps", 2),
        "eval_steps": overrides.pop("eval_steps", 100),
    }
    return Trainer(
        (init, apply),
        case,
        data_train,
        data_valid,
        cfg_train=cfg_train,
        cfg_eval=cfg_eval,
        cfg_logging=cfg_logging,
        input_seq_length=ISL,
        seed=0,
        **overrides,
    )


def test_train_few_steps(env):
    trainer = make_trainer(env)
    params, state, opt_state = trainer.train(step_max=5)
    assert params is not None
    leaves = [np.asarray(x) for x in jax.tree.leaves(params)]
    assert all(np.isfinite(leaf).all() for leaf in leaves)


def test_train_with_pushforward(env):
    trainer = make_trainer(
        env, pushforward={"steps": [-1, 1], "unrolls": [0, 1], "probs": [0, 1]}
    )
    params, _, _ = trainer.train(step_max=4)
    assert params is not None


def test_checkpoint_and_resume(env, tmp_path):
    ckp = str(tmp_path / "ckp")
    trainer = make_trainer(env, eval_steps=3)
    params, state, opt_state = trainer.train(step_max=4, store_ckp=ckp)

    assert os.path.exists(os.path.join(ckp, "params.npz"))
    assert os.path.exists(os.path.join(ckp, "best", "metadata_ckp.json"))

    loaded_params, loaded_state, loaded_opt, step = load_checkpoint(ckp)
    assert step == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded_params)):
        # loaded params come from the step-3 checkpoint; shapes must match
        assert np.asarray(a).shape == np.asarray(b).shape

    # resume training from the checkpoint
    trainer2 = make_trainer(env)
    params2, _, _ = trainer2.train(step_max=5, load_ckp=ckp)
    assert params2 is not None


def test_deferred_overflow_sync_matches_per_step(env):
    """train.overflow_sync_every>1 defers READING the overflow flag; with
    no overflow occurring the training trajectory must be bit-identical to
    the per-step-sync (reference-exact) default."""
    t1 = make_trainer(env)
    p1, _, _ = t1.train(step_max=5)
    t2 = make_trainer(env, cfg_train_extra={"overflow_sync_every": 3})
    p2, _, _ = t2.train(step_max=5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_rollout_failure_does_not_kill_training(env, tmp_path, monkeypatch):
    """A diverged model can overflow the rollout neighbor list past its
    escalation cap (the reference reports EGNN 'unstable' in rollout);
    the in-training eval records val/loss=inf and training continues."""
    import lagrangebench_tpu.train.trainer as trainer_mod

    def boom(*args, **kwargs):
        raise RuntimeError("neighbor list kept overflowing during rollout")

    monkeypatch.setattr(trainer_mod, "eval_rollout", boom)
    ckp = os.path.join(str(tmp_path), "ckp")
    trainer = make_trainer(env, eval_steps=2)
    params, _, _ = trainer.train(step_max=5, store_ckp=ckp)
    # training ran to completion despite the failing evals
    assert params is not None
    leaves = [np.asarray(x) for x in jax.tree.leaves(params)]
    assert all(np.isfinite(leaf).all() for leaf in leaves)
    # checkpoints were still written, with an infinite (never-best) loss
    _, _, _, step = load_checkpoint(ckp)
    assert step >= 4
    import json

    meta = json.load(open(os.path.join(ckp, "metadata_ckp.json")))
    assert meta["loss"] == float("inf")


def test_deferred_overflow_failure_window(env, capsys):
    """Overflow mid-window (overflow_sync_every>1): the conditional commit
    + sticky flag freeze params/opt-state bit-identically for the rest of
    the window, exactly ONE reallocation happens at the next sync point,
    and training resumes afterwards (trainer.py deferred-sync docs).

    The overflow is injected by forcing the sticky ``did_buffer_overflow``
    flag on the neighbor list returned at step 2 — from there the real
    machinery runs: update() ORs the previous flag forward, the jitted
    step refuses to commit, and the step-4 sync detects + reallocates.
    """
    trainer = make_trainer(
        env,
        cfg_train_extra={"overflow_sync_every": 4},
        log_steps=100,
        eval_steps=100,
    )
    orig = None
    records = []  # (params, opt_state, capacity) per _train_step call

    def wrapped(params, state, opt_state, keys, raw_batch, neighbors_batch,
                noise_std, unroll_steps):
        out = orig(params, state, opt_state, keys, raw_batch,
                   neighbors_batch, noise_std, unroll_steps)
        loss, p, s, o, k, nbrs_b, overflow = out
        if len(records) == 2:  # step 2: inject a "buffer overflowed" event
            nbrs_b = nbrs_b.replace(
                did_buffer_overflow=jnp.ones_like(nbrs_b.did_buffer_overflow)
            )
        records.append((p, o, nbrs_b.idx.shape[-1]))
        return loss, p, s, o, k, nbrs_b, overflow

    # build the jitted step once, then interpose
    trainer._train_step  # noqa: B018 - touch to ensure attribute exists
    orig = trainer._train_step
    trainer._train_step = wrapped
    params, _, _ = trainer.train(step_max=7)
    trainer._train_step = orig

    def same(a, b):
        return all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    # calls: steps 0,1,2 commit; step 3 + step 4 (attempt 0) frozen
    # bit-identically; step 4 retry (call 5) and steps 5-7 commit again.
    assert len(records) == 9, len(records)  # 8 steps + 1 retry
    p, o = [r[0] for r in records], [r[1] for r in records]
    assert not same(p[1], p[2])  # step 2 still committed (flag set after)
    assert same(p[2], p[3]) and same(o[2], o[3])  # window: frozen
    assert same(p[2], p[4]) and same(o[2], o[4])  # detection attempt: frozen
    assert not same(p[4], p[5])  # retry after realloc: committed
    assert not same(p[5], p[6])  # training resumed
    assert all(np.isfinite(x).all() for x in map(np.asarray, jax.tree.leaves(params)))

    # exactly one reallocation, at the sync step
    out = capsys.readouterr().out
    assert out.count("Reallocate neighbors list at step 4") == 1
    assert out.count("Reallocate") == 1
