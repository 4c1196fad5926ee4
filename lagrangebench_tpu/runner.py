"""High-level orchestration: config -> data -> case -> model -> train/infer.

Mirrors the reference runner's responsibilities (reference
lagrangebench/runner.py:25-292) on top of the TPU-native stack.
"""

from __future__ import annotations

import os
import os.path as osp
from datetime import datetime
from typing import Tuple

import jax
import jax.numpy as jnp

from .case import case_builder
from .checkpoint import load_checkpoint
from .compat import is_haiku_checkpoint, load_reference_checkpoint
from .config import Config, save_yaml
from .data import H5Dataset
from .defaults import check_cfg
from .evaluate import averaged_metrics, infer
from .models import ensure_fused_params, setup_model
from .parallel import make_mesh
from .train import Trainer
from .utils import get_num_params


def setup_data(cfg: Config) -> Tuple[H5Dataset, H5Dataset, H5Dataset]:
    """Instantiate train/valid/test datasets from the config."""
    data_dir = cfg.dataset.src
    name = cfg.dataset.name
    isl = cfg.model.input_seq_length

    # pushforward needs extra target frames at the end of train windows
    max_unroll = max(cfg.train.pushforward.unrolls)
    eval_n_more = max(cfg.eval.n_rollout_steps, 1)

    data_train = H5Dataset(
        "train", dataset_path=data_dir, name=name,
        input_seq_length=isl, extra_seq_length=max_unroll,
    )
    data_valid = H5Dataset(
        "valid", dataset_path=data_dir, name=name,
        input_seq_length=isl, extra_seq_length=eval_n_more,
    )
    data_test = H5Dataset(
        "test" if cfg.eval.test else "valid",
        dataset_path=data_dir, name=name,
        input_seq_length=isl, extra_seq_length=eval_n_more,
    )
    return data_train, data_valid, data_test


def train_or_infer(cfg: Config):
    """Entry point for both training and inference, driven by cfg.mode."""
    check_cfg(cfg)

    if cfg.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    mode = cfg.mode
    old_model_dir = cfg.load_ckp

    data_train, data_valid, data_test = setup_data(cfg)
    metadata = data_train.metadata

    # bounds define the box; the case is periodic iff the metadata says so
    bounds = jnp.asarray(metadata["bounds"])
    box = (bounds[:, 1] - bounds[:, 0]).tolist()

    case = case_builder(
        box=box,
        metadata=metadata,
        input_seq_length=cfg.model.input_seq_length,
        cfg_neighbors=cfg.neighbors,
        cfg_model=cfg.model,
        noise_std=cfg.train.noise_std,
        external_force_fn=data_train.external_force_fn,
        dtype=cfg.dtype,
    )

    _, particle_type = data_train[0]
    model, model_init, model_apply = setup_model(
        cfg.model, metadata,
        has_external_force=data_train.external_force_fn is not None,
        normalization_stats=case.normalization_stats,
        homogeneous_particles=bool(particle_type.max() == particle_type.min()),
    )

    mesh = None
    if cfg.parallel.data != 1:
        # multi-host (DCN) init: no-op unless a cluster launch is indicated
        from .parallel import init_distributed

        init_distributed()
    if cfg.parallel.data != 1 and len(jax.devices()) > 1:
        # mesh size must divide the batch; pick the largest divisor that fits
        n_req = len(jax.devices()) if cfg.parallel.data == -1 else cfg.parallel.data
        n_req = min(n_req, len(jax.devices()))
        bs = int(cfg.train.batch_size)
        while n_req > 1 and bs % n_req != 0:
            n_req -= 1
        if n_req > 1:
            mesh = make_mesh(n_req)

    params, state = None, None
    if mode in ("train", "all"):
        # checkpoint directory named <model>_<dataset>_<datetime>
        if cfg.logging.run_name is None:
            run_name = f"{cfg.model.name}_{data_train.name}_" + datetime.now().strftime(
                "%Y%m%d-%H%M%S"
            )
            cfg.logging.run_name = run_name
        store_ckp = os.path.join(cfg.logging.ckp_dir, cfg.logging.run_name)
        os.makedirs(store_ckp, exist_ok=True)
        save_yaml(cfg, os.path.join(store_ckp, "config.yaml"))

        n_spatial_train = int(cfg.parallel.get("spatial", 0) or 0)
        if n_spatial_train > 1:
            # spatially-sharded training over an N-slab ring (2D
            # (data, space) mesh when batch_size > 1); standard-layout
            # checkpoints, so infer/export consume them unchanged
            from .parallel.spatial import _require_periodic, train_spatial

            model_name = cfg.model.name.lower()
            assert model_name in ("gns", "painn", "segnn", "egnn"), (
                "parallel.spatial supports gns|painn|segnn|egnn"
            )
            # spatial sharding is periodic-boxes-only; fail before any work
            _require_periodic(data_train.metadata, "runner(mode=train)")
            key = jax.random.PRNGKey(cfg.seed)
            pos0, ptype0 = data_train[0]
            key, features0, _, _ = case.allocate(
                key, (jnp.asarray(pos0), jnp.asarray(ptype0))
            )
            params0, _ = model_init(key, (features0, jnp.asarray(ptype0)))
            n_trajs_val = int(cfg.eval.train.n_trajs)
            if n_trajs_val == -1:
                n_trajs_val = data_valid.num_samples
            params, state, _ = train_spatial(
                params0, case, data_train, data_valid,
                n_devices=n_spatial_train,
                model=model_name,
                num_mp_steps=cfg.model.num_mp_steps,
                cfg_train=cfg.train,
                cfg_logging=cfg.logging,
                input_seq_length=cfg.model.input_seq_length,
                metadata=data_train.metadata,
                model_def=(
                    model if model_name in ("segnn", "egnn") else None
                ),
                seed=cfg.seed, step_max=cfg.train.step_max,
                store_ckp=store_ckp,
                load_ckp=old_model_dir,
                n_rollout_steps_val=int(cfg.eval.n_rollout_steps),
                n_trajs_val=n_trajs_val,
            )
        else:
            trainer = Trainer(
                (model_init, model_apply),
                case,
                data_train,
                data_valid,
                cfg_train=cfg.train,
                cfg_eval=cfg.eval,
                cfg_logging=cfg.logging,
                input_seq_length=cfg.model.input_seq_length,
                seed=cfg.seed,
                mesh=mesh,
            )
            params, state, _ = trainer.train(
                step_max=cfg.train.step_max,
                load_ckp=old_model_dir,
                store_ckp=store_ckp,
            )
        print(f"Training done; params: {get_num_params(params)}")
        old_model_dir = store_ckp

    if mode in ("infer", "all"):
        if params is None:
            best_dir = osp.join(old_model_dir, "best")
            load_dir = best_dir if osp.exists(
                osp.join(best_dir, "metadata_ckp.json")
            ) else old_model_dir
            if is_haiku_checkpoint(load_dir):
                # published reference checkpoint (save_haiku layout)
                params, state, _ = load_reference_checkpoint(
                    load_dir, cfg.model.name, cfg.model
                )
            else:
                params, state, _, _ = load_checkpoint(load_dir)
            # standard-layout checkpoints (imported or trained with the
            # standard processor) re-layout for the fused fast path
            params = ensure_fused_params(params, cfg.model)

        n_spatial = int(cfg.parallel.get("spatial", 0) or 0)
        if n_spatial > 1:
            # spatially-sharded inference (particle-axis slabs)
            model_name = cfg.model.name.lower()
            assert model_name in ("gns", "painn", "segnn", "egnn"), (
                "parallel.spatial supports gns|painn|segnn|egnn"
            )
            from .parallel.spatial import _require_periodic, infer_spatial

            _require_periodic(data_test.metadata, "runner(mode=infer)")

            eval_metrics = infer_spatial(
                params, case, data_test,
                n_devices=n_spatial,
                num_mp_steps=cfg.model.num_mp_steps,
                cfg_eval_infer=cfg.eval.infer,
                n_rollout_steps=cfg.eval.n_rollout_steps,
                model=model_name,
                model_def=(
                    model if model_name in ("segnn", "egnn") else None
                ),
            )
            metrics = averaged_metrics(eval_metrics)
            print(metrics)
            return metrics

        rollout_dir = cfg.eval.rollout_dir
        eval_metrics = infer(
            model_apply,
            case,
            data_test,
            params=params,
            state=state,
            cfg_eval_infer=cfg.eval.infer,
            rollout_dir=rollout_dir,
            n_rollout_steps=cfg.eval.n_rollout_steps,
            seed=cfg.seed,
            mesh=mesh,
        )
        metrics = averaged_metrics(eval_metrics)
        print(metrics)
        return metrics
