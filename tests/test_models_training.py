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
