"""End-to-end training smoke test for every model family on the fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.config import Config
from lagrangebench_tpu.data import H5Dataset
from lagrangebench_tpu.models import setup_model
from lagrangebench_tpu.train import Trainer

from .fixtures import make_dataset

ISL = 3


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    return make_dataset(str(tmp_path_factory.mktemp("data")))


@pytest.mark.parametrize(
    "name,magnitudes,loss_weight",
    [
        ("gns", False, {"acc": 1.0, "vel": 0.0, "pos": 0.0}),
        ("segnn", False, {"acc": 1.0, "vel": 0.0, "pos": 0.0}),
        ("egnn", True, {"acc": 0.0, "vel": 0.0, "pos": 1.0}),
        ("painn", True, {"acc": 1.0, "vel": 0.0, "pos": 0.0}),
    ],
)
def test_two_training_steps(dataset_path, name, magnitudes, loss_weight):
    data_train = H5Dataset("train", dataset_path, input_seq_length=ISL)
    data_valid = H5Dataset(
        "valid", dataset_path, input_seq_length=ISL, extra_seq_length=5
    )
    metadata = data_train.metadata
    bounds = np.asarray(metadata["bounds"])

    cfg_model = Config(
        {
            "name": name,
            "input_seq_length": ISL,
            "num_mp_steps": 2,
            "num_mlp_layers": 2,
            "latent_dim": 8,
            "magnitude_features": magnitudes,
            "isotropic_norm": False,
            "lmax_attributes": 1,
            "lmax_hidden": 1,
            "segnn_norm": "none",
            "velocity_aggregate": "avg",
        }
    )
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=metadata,
        input_seq_length=ISL,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5},
        cfg_model=cfg_model,
        noise_std=1e-4,
        dtype=jnp.float32,
    )
    _, init, apply = setup_model(
        cfg_model,
        metadata,
        normalization_stats=case.normalization_stats,
        homogeneous_particles=True,
    )
    trainer = Trainer(
        (init, apply),
        case,
        data_train,
        data_valid,
        cfg_train={
            "batch_size": 2,
            "noise_std": 1e-4,
            "loss_weight": loss_weight,
            "pushforward": {"steps": [-1], "unrolls": [0], "probs": [1]},
        },
        cfg_eval={"n_rollout_steps": 2, "train": {"n_trajs": 1}},
        cfg_logging={"log_steps": 1, "eval_steps": 100},
        input_seq_length=ISL,
        seed=0,
    )
    params, _, _ = trainer.train(step_max=2)
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_flattened_loss_matches_per_sample_semantics(dataset_path):
    """The super-graph training loss/grads must equal the per-sample
    (vmapped) reference semantics: grads summed over the batch, each
    sample's loss normalized by its own non-kinematic count."""
    from functools import partial

    from lagrangebench_tpu.ops.batching import flatten_graph_batch
    from lagrangebench_tpu.train.trainer import flat_mse_loss, mse_loss
    from lagrangebench_tpu.utils import get_kinematic_mask

    data_train = H5Dataset("train", dataset_path, input_seq_length=ISL)
    metadata = data_train.metadata
    bounds = np.asarray(metadata["bounds"])
    cfg_model = Config(
        {
            "name": "gns",
            "input_seq_length": ISL,
            "num_mp_steps": 1,
            "num_mlp_layers": 2,
            "latent_dim": 4,
            "magnitude_features": False,
            "isotropic_norm": False,
        }
    )
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=metadata,
        input_seq_length=ISL,
        cfg_neighbors={"backend": "allpairs", "multiplier": 1.5},
        cfg_model=cfg_model,
        noise_std=0.0,
        dtype=jnp.float64,
    )
    _, init, apply = setup_model(cfg_model, metadata)

    batch = [data_train[i] for i in (0, 1)]
    raw = tuple(
        jnp.stack([jnp.asarray(b[i]) for b in batch]) for i in (0, 1)
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    _, feats0, _, nbrs0 = case.allocate(keys[0], (raw[0][0], raw[1][0]))
    from lagrangebench_tpu.utils import broadcast_to_batch

    nbrs_b = broadcast_to_batch(nbrs0, 2)
    pre = jax.vmap(case.preprocess, in_axes=(0, 0, None, 0, None))
    _, feats_b, targets_b, nbrs_b = pre(keys, raw, 0.0, nbrs_b, 0)

    params, state = init(jax.random.PRNGKey(1), (feats0, raw[1][0]))
    lw = {"acc": 1.0, "vel": 0.0, "pos": 0.0}

    # reference semantics: vmapped per-sample loss, grads summed
    vg = jax.vmap(
        jax.value_and_grad(
            partial(mse_loss, model_apply=apply, loss_weight=lw), has_aux=True
        ),
        in_axes=(None, None, 0, 0, 0),
    )
    (loss_b, _), grads_b = vg(params, state, feats_b, raw[1], targets_b)
    grads_ref = jax.tree.map(lambda x: x.sum(axis=0), grads_b)

    # super-graph semantics
    b, n = raw[1].shape
    flat_f, flat_t = flatten_graph_batch(feats_b, raw[1])
    flat_targets = {
        k: v.reshape((b * n,) + v.shape[2:]) for k, v in targets_b.items()
    }
    non_kin = jnp.logical_not(get_kinematic_mask(raw[1]))
    per_sample = non_kin.sum(axis=1).astype(flat_targets["acc"].dtype)
    node_weight = (non_kin / jnp.maximum(per_sample, 1)[:, None]).reshape(b * n)
    (loss_sum, _), grads_flat = jax.value_and_grad(
        partial(flat_mse_loss, model_apply=apply, loss_weight=lw),
        has_aux=True,
    )(params, state, flat_f, flat_t, flat_targets, node_weight)

    np.testing.assert_allclose(float(loss_sum), float(loss_b.sum()), rtol=1e-6)
    # params are float32 -> summation-order noise at the 1e-7 level
    for a, b_ in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-9)
