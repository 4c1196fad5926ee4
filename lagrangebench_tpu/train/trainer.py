"""Training loop.

TPU-first redesign of the reference trainer (reference
lagrangebench/train/trainer.py):

* **One fused jit per step.** Preprocess (noise + neighbor update +
  features + targets), optional pushforward unrolls, batched
  value_and_grad, and the optimizer update all compile into a single
  program. Neighbor-buffer overflow is computed on device and the parameter
  update is *conditionally committed* (`jnp.where` on the overflow flag), so
  an overflowing batch never corrupts training state; the host reads the
  flag once per step and re-allocates + retries when set — the same retry
  semantics as the reference but without its mid-step host syncs.
* **Pushforward variants are compiled per unroll count** (at most 4 values),
  replacing the reference's Python-loop re-dispatch.
* **Data parallelism over ICI** via a 1D mesh: batch, keys and neighbor
  buffers shard along ``data``; gradient summation across the batch lowers
  to an XLA psum over the mesh.
* Gradients are summed over the batch (reference semantics,
  trainer.py:82-84); model state is averaged instead of summed (reference
  quirk not copied).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..checkpoint import OptStateLeaves, load_checkpoint, save_checkpoint
from ..config import Config, merge
from ..data import DataLoader, H5Dataset
from ..defaults import defaults
from ..evaluate import MetricsComputer, averaged_metrics, eval_rollout
from ..models import make_model_fns
from ..parallel import replicate_sharding, shard_batch
from ..profiling import ProfilerHook, StepTimer
from ..utils import (
    broadcast_from_batch,
    broadcast_to_batch,
    get_kinematic_mask,
    get_num_params,
    set_seed,
)
from .strats import push_forward_batched_build, push_forward_sample_steps


def mse_loss(params, state, features, particle_type, target, model_apply, loss_weight):
    """Weighted MSE over the model's output channels, kinematic-masked.

    Cf. reference lagrangebench/train/trainer.py:35-60.
    """
    pred, state = model_apply(params, state, (features, particle_type))
    non_kinematic = jnp.logical_not(get_kinematic_mask(particle_type))
    num_non_kinematic = non_kinematic.sum()
    total = 0.0
    for key in pred:
        w = loss_weight[key] if isinstance(loss_weight, dict) else getattr(loss_weight, key)
        if w == 0.0:
            continue
        total = total + (w * (pred[key] - target[key]) ** 2).sum(axis=-1)
    total = jnp.where(non_kinematic, total, 0.0)
    return total.sum() / num_non_kinematic, state


def flat_mse_loss(
    params, state, flat_features, flat_ptype, flat_target, node_weight,
    model_apply, loss_weight,
):
    """Sum of per-sample masked MSE losses on the flattened super-graph.

    ``node_weight`` carries the per-sample ``1 / num_non_kinematic``
    normalization (zero on kinematic/padding nodes), so the scalar returned
    here equals ``sum_b mse_loss(sample_b)`` and its gradient equals the
    reference's summed per-sample gradients (reference trainer.py:82-84)
    while the model itself runs un-vmapped on the disjoint super-graph
    (vmapped GNN gathers lower ~27x slower on TPU — ops/batching.py).
    """
    pred, state = model_apply(params, state, (flat_features, flat_ptype))
    total = 0.0
    for key in pred:
        w = loss_weight[key] if isinstance(loss_weight, dict) else getattr(loss_weight, key)
        if w == 0.0:
            continue
        total = total + (w * (pred[key] - flat_target[key]) ** 2).sum(axis=-1)
    return (total * node_weight).sum(), state


class Trainer:
    """Generic trainer over (case, model, datasets).

    Args:
        model: flax model instance (or an (init_fn, apply_fn) tuple).
        case: CaseSetupFn from case_builder.
        data_train / data_valid: H5Dataset splits.
        cfg_train / cfg_eval / cfg_logging: config subsets (merged with
            defaults).
        input_seq_length: model input window.
        seed: RNG seed.
        mesh: optional jax.sharding.Mesh for ICI data parallelism.
    """

    def __init__(
        self,
        model,
        case,
        data_train: H5Dataset,
        data_valid: H5Dataset,
        cfg_train: Union[Dict, Config, None] = None,
        cfg_eval: Union[Dict, Config, None] = None,
        cfg_logging: Union[Dict, Config, None] = None,
        input_seq_length: int = defaults.model.input_seq_length,
        seed: int = defaults.seed,
        mesh=None,
    ):
        self.case = case
        self.input_seq_length = input_seq_length
        self.cfg_train = merge(defaults.train, cfg_train or {})
        self.cfg_eval = merge(defaults.eval, cfg_eval or {})
        self.cfg_logging = merge(defaults.logging, cfg_logging or {})
        self.mesh = mesh

        if isinstance(model, tuple):
            self.model_init, self.model_apply = model
        else:
            self.model_init, self.model_apply = make_model_fns(model)

        available_rollout_length = data_valid.subseq_length - input_seq_length
        assert self.cfg_eval.n_rollout_steps <= available_rollout_length, (
            "eval.n_rollout_steps exceeds the available ground-truth horizon "
            f"({self.cfg_eval.n_rollout_steps} > {available_rollout_length})"
        )
        assert self.cfg_eval.train.n_trajs <= data_valid.num_samples, (
            f"eval.train.n_trajs exceeds available trajectories "
            f"({self.cfg_eval.train.n_trajs} > {data_valid.num_samples})"
        )
        if self.cfg_eval.train.n_trajs == -1:
            self.cfg_eval.train.n_trajs = data_valid.num_samples

        self.data_train = data_train
        self.data_valid = data_valid

        self.base_key, self.rng = set_seed(seed)

        # delta vs reference: the train loader uses train.batch_size
        # (the reference reads eval.train.batch_size, trainer.py:170-173)
        self.batch_size = int(self.cfg_train.batch_size)
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            assert self.batch_size % n_dev == 0, (
                f"train.batch_size ({self.batch_size}) must be divisible by "
                f"the mesh size ({n_dev})"
            )
        self.loader_train = DataLoader(
            data_train,
            batch_size=self.batch_size,
            shuffle=True,
            drop_last=True,
            rng=self.rng,
        )
        # in-training validation honors eval.train.batch_size — the config
        # tree distinguishes it from eval.infer.batch_size, which can be
        # tuned for ICI inference (mesh-multiple) independently of the
        # small in-training eval (the reference aliases both to
        # eval.infer's, reference trainer.py:170-173)
        self.loader_valid = DataLoader(
            data_valid, batch_size=int(self.cfg_eval.train.batch_size), rng=self.rng
        )

        lr_scheduler = optax.exponential_decay(
            init_value=float(self.cfg_train.optimizer.lr_start),
            transition_steps=int(self.cfg_train.optimizer.lr_decay_steps),
            decay_rate=float(self.cfg_train.optimizer.lr_decay_rate),
            end_value=float(self.cfg_train.optimizer.lr_final),
        )
        self.opt_init, self.opt_update = optax.adamw(
            learning_rate=lr_scheduler, weight_decay=1e-8
        )

        self.metrics_computer = MetricsComputer(
            list(self.cfg_eval.train.metrics),
            dist_fn=case.displacement,
            metadata=data_train.metadata,
            input_seq_length=input_seq_length,
            stride=int(self.cfg_eval.train.metrics_stride),
        )

        self._train_step = self._build_train_step()
        self._eval_neighbors = None

    # ------------------------------------------------------------------

    def _build_train_step(self):
        case = self.case
        model_apply = self.model_apply
        opt_update = self.opt_update
        loss_weight = self.cfg_train.loss_weight.to_dict()
        isl = self.input_seq_length
        mesh = self.mesh
        batch_size = self.batch_size

        flat_loss_fn = partial(
            flat_mse_loss, model_apply=model_apply, loss_weight=loss_weight
        )
        push_forward = push_forward_batched_build(model_apply, case)

        def local_step(params, state, keys, raw_batch, neighbors_batch,
                       noise_std, unroll_steps: int):
            """Loss-sum + summed grads over the (device-local) batch.

            Noise and the NL update stay per-sample (inside the batched
            preprocess), but features, targets, pushforward and the
            differentiated model forward all run on the flattened disjoint
            super-graph — vmapped gathers lower poorly on TPU
            (ops/batching.py, case._preprocess_batched).
            """
            new_keys, flat_features, flat_targets, nbrs_b = (
                case.preprocess_batched(
                    keys, raw_batch, noise_std, neighbors_batch, unroll_steps
                )
            )

            if unroll_steps > 0:
                current_pos = raw_batch[0][:, :, :isl]
                for _ in range(unroll_steps):
                    current_pos, nbrs_b, flat_features = push_forward(
                        flat_features, current_pos, raw_batch[1], nbrs_b,
                        params, state,
                    )

            overflow = jnp.any(nbrs_b.did_buffer_overflow)

            ptype_b = raw_batch[1]
            b, n = ptype_b.shape
            flat_ptype = ptype_b.reshape(b * n)
            # per-sample 1/num_non_kinematic, scattered to the sample's nodes
            non_kin = jnp.logical_not(get_kinematic_mask(ptype_b))
            per_sample = non_kin.sum(axis=1).astype(flat_targets["acc"].dtype)
            node_weight = (
                non_kin / jnp.maximum(per_sample, 1)[:, None]
            ).reshape(b * n)

            (loss_sum, new_state), grads = jax.value_and_grad(
                flat_loss_fn, has_aux=True
            )(params, state, flat_features, flat_ptype, flat_targets, node_weight)
            return loss_sum, grads, new_state, new_keys, nbrs_b, overflow

        if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
            # shard_map keeps each device's super-graph local: gathers and
            # scatters never cross shards, grads reduce with one ICI psum
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel import DATA_AXIS

            def make_sharded(unroll_steps: int):
                def shard_body(params, state, keys, raw_batch, neighbors_batch,
                               noise_std):
                    loss_sum, grads, new_state, new_keys, nbrs_b, overflow = (
                        local_step(params, state, keys, raw_batch,
                                   neighbors_batch, noise_std, unroll_steps)
                    )
                    loss_sum = jax.lax.psum(loss_sum, DATA_AXIS)
                    grads = jax.lax.psum(grads, DATA_AXIS)
                    if jax.tree.leaves(new_state):
                        new_state = jax.lax.pmean(new_state, DATA_AXIS)
                    overflow = jax.lax.psum(
                        overflow.astype(jnp.int32), DATA_AXIS
                    ) > 0
                    return loss_sum, grads, new_state, new_keys, nbrs_b, overflow

                batched = P(DATA_AXIS)
                rep = P()
                return shard_map(
                    shard_body,
                    mesh=mesh,
                    in_specs=(rep, rep, batched, batched, batched, rep),
                    out_specs=(rep, rep, rep, batched, batched, rep),
                    check_vma=False,
                )

            def run_local(params, state, keys, raw_batch, neighbors_batch,
                          noise_std, unroll_steps: int):
                return make_sharded(unroll_steps)(
                    params, state, keys, raw_batch, neighbors_batch, noise_std
                )
        else:
            run_local = local_step

        @partial(jax.jit, static_argnames=("unroll_steps",))
        def train_step(
            params, state, opt_state, keys, raw_batch, neighbors_batch,
            noise_std, unroll_steps: int,
        ):
            loss_sum, grads, new_state, new_keys, nbrs_b, overflow = run_local(
                params, state, keys, raw_batch, neighbors_batch, noise_std,
                unroll_steps,
            )
            loss = loss_sum / batch_size

            updates, new_opt_state = opt_update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)

            # commit the update only if no neighbor buffer overflowed
            def keep_old(new, old):
                return jax.tree.map(
                    lambda a, b: jnp.where(overflow, b, a), new, old
                )

            out_params = keep_old(new_params, params)
            out_state = keep_old(new_state, state)
            out_opt = keep_old(new_opt_state, opt_state)
            out_keys = keep_old(new_keys, keys)
            return loss, out_params, out_state, out_opt, out_keys, nbrs_b, overflow

        return train_step

    # ------------------------------------------------------------------

    def train(
        self,
        step_max: Optional[int] = None,
        params=None,
        state=None,
        opt_state=None,
        store_ckp: Optional[str] = None,
        load_ckp: Optional[str] = None,
        wandb_config: Optional[Dict] = None,
    ):
        """Run the training loop; returns (params, state, opt_state)."""
        if step_max is None:
            step_max = int(self.cfg_train.step_max)
        cfg_eval = self.cfg_eval
        cfg_logging = self.cfg_logging
        noise_std = float(self.cfg_train.noise_std)
        pushforward = self.cfg_train.pushforward
        overflow_sync_every = int(
            self.cfg_train.get("overflow_sync_every", 1)
        )

        # neighbor allocation + model init from the first batch
        first_batch = next(iter(self.loader_train))
        first_batch = jax.tree.map(jnp.asarray, first_batch)
        raw_sample = broadcast_from_batch(first_batch, 0)
        key, features, _, neighbors = self.case.allocate(self.base_key, raw_sample)

        step = 0
        if params is not None:
            state = state or {}
        elif load_ckp:
            params, state, opt_state, step = load_checkpoint(load_ckp)
        else:
            key, subkey = jax.random.split(key)
            params, state = self.model_init(subkey, (features, raw_sample[1]))

        if opt_state is None:
            opt_state = self.opt_init(params)
        elif isinstance(opt_state, OptStateLeaves):
            opt_state = opt_state.restore(self.opt_init(params))

        wandb_run = self._init_wandb(wandb_config, params, step)

        if store_ckp is not None:
            os.makedirs(store_ckp, exist_ok=True)
            os.makedirs(os.path.join(store_ckp, "best"), exist_ok=True)

        keys = jax.random.split(key, self.batch_size)
        neighbors_batch = broadcast_to_batch(neighbors, self.batch_size)

        timer = StepTimer()
        profiler = ProfilerHook(
            cfg_logging.get("profile_dir"),
            *list(cfg_logging.get("profile_steps", [10, 15])),
        )
        particles_per_step = first_batch[0].shape[1] * self.batch_size

        if self.mesh is not None:
            rep = replicate_sharding(self.mesh)
            params, state, opt_state = jax.device_put((params, state, opt_state), rep)
            keys = shard_batch(keys, self.mesh)
            neighbors_batch = shard_batch(neighbors_batch, self.mesh)

        while step < step_max + 1:
            for raw_batch in self.loader_train:
                raw_batch = jax.tree.map(jnp.asarray, raw_batch)
                raw_batch = shard_batch(raw_batch, self.mesh)

                unroll_steps = push_forward_sample_steps(self.rng, step, pushforward)
                profiler.maybe_start(step)

                boost, max_retries = 1.0, 5
                for attempt in range(max_retries + 1):
                    (
                        loss, params, state, opt_state, keys,
                        neighbors_batch, overflow,
                    ) = self._train_step(
                        params, state, opt_state, keys, raw_batch,
                        neighbors_batch, noise_std, unroll_steps,
                    )
                    # Deferred overflow sync (train.overflow_sync_every>1):
                    # reading the flag forces a host<->device round trip
                    # every step (~28 ms on remote-attached runtimes, and a
                    # dispatch-pipeline stall everywhere). The step's
                    # conditional commit + the sticky overflow flag make
                    # every post-overflow step a no-op, so the flag only
                    # needs to be READ periodically: on late detection the
                    # <sync_every skipped batches are lost (not corrupted)
                    # and training resumes after one reallocation. =1
                    # reproduces the reference's per-batch retry exactly.
                    need_sync = (
                        overflow_sync_every <= 1
                        or attempt > 0
                        or step % overflow_sync_every == 0
                        or step % cfg_logging.log_steps == 0
                        or (step % cfg_logging.eval_steps == 0 and step > 0)
                    )
                    if not need_sync or not bool(overflow):
                        break
                    if attempt == max_retries:
                        raise RuntimeError(
                            f"neighbor list still overflows after "
                            f"{max_retries} escalating reallocations at "
                            f"step {step}"
                        )
                    # re-allocate from the first overflowing sample with an
                    # escalating capacity boost (sizing uses the un-noised
                    # sample, so a retry without a boost could overflow on
                    # the identical re-applied noise forever)
                    boost *= 1.5
                    print(
                        f"Reallocate neighbors list at step {step} "
                        f"(boost x{boost:.2f})"
                    )
                    ind = int(jnp.argmax(neighbors_batch.did_buffer_overflow))
                    sample = broadcast_from_batch(raw_batch, index=ind)
                    _, _, _, nbrs = self.case.allocate(
                        keys[ind], sample, noise_std, capacity_boost=boost
                    )
                    print(f"From {neighbors_batch.idx[ind].shape} to {nbrs.idx.shape}")
                    neighbors_batch = shard_batch(
                        broadcast_to_batch(nbrs, self.batch_size), self.mesh
                    )

                timer.tick()
                profiler.maybe_stop(step)

                if step % cfg_logging.log_steps == 0:
                    loss.block_until_ready()
                    perf = timer.stats(particles_per_step)
                    if wandb_run is not None:
                        wandb_run.log({"train/loss": float(loss), **perf}, step)
                    else:
                        width = len(str(int(step_max)))
                        rate = perf.get("perf/ms_per_step")
                        rate_str = f" ({rate:.1f} ms/step)" if rate else ""
                        print(
                            f"{str(step).zfill(width)}, train/loss: "
                            f"{float(loss):.5f}.{rate_str}"
                        )

                if step % cfg_logging.eval_steps == 0 and step > 0:
                    timer.reset_clock()  # eval pause should not skew stats
                    # eval capacity is sized from a VALIDATION sample (a
                    # train-sized buffer can be systematically too small for
                    # denser validation trajectories and would thrash the
                    # escalation-retry loop mid-training)
                    if self._eval_neighbors is None:
                        pos_v, ptype_v = self.data_valid[0]
                        _, self._eval_neighbors = self.case.allocate_eval(
                            (
                                jnp.asarray(pos_v)[:, : self.input_seq_length],
                                jnp.asarray(ptype_v),
                            )
                        )
                    nbrs = self._eval_neighbors
                    try:
                        eval_metrics = eval_rollout(
                            case=self.case,
                            metrics_computer=self.metrics_computer,
                            model_apply=self.model_apply,
                            params=params,
                            state=state,
                            neighbors=nbrs,
                            loader_eval=self.loader_valid,
                            n_rollout_steps=int(cfg_eval.n_rollout_steps),
                            n_trajs=int(cfg_eval.train.n_trajs),
                            rollout_dir=cfg_eval.rollout_dir,
                            out_type=cfg_eval.train.out_type,
                            mesh=self.mesh,
                        )
                        metrics = averaged_metrics(eval_metrics)
                    except RuntimeError as exc:
                        # a DIVERGED model can cluster particles so densely
                        # that rollout neighbor capacity cannot escalate far
                        # enough (seen with EGNN, whose rollout instability
                        # the reference also reports: baselines.rst
                        # "unstable"). An in-training eval must not kill the
                        # run — record an infinite val loss (never becomes
                        # the best checkpoint) and keep training.
                        print(
                            f"{step}, eval rollout failed ({exc}); "
                            "recording val/loss=inf and continuing"
                        )
                        metrics = {"val/loss": float("inf")}
                    if store_ckp is not None:
                        save_checkpoint(
                            store_ckp, params, state, opt_state,
                            {"step": step, "loss": metrics.get("val/loss")},
                        )
                    if wandb_run is not None:
                        wandb_run.log(metrics, step)
                    else:
                        print(metrics)

                step += 1
                if step == step_max + 1:
                    break

        if wandb_run is not None:
            wandb_run.finish()
        return params, state, opt_state

    # ------------------------------------------------------------------

    def _init_wandb(self, wandb_config, params, step):
        if not self.cfg_logging.wandb:
            return None
        try:
            import wandb
        except ImportError:
            print("wandb requested but not installed; logging to stdout")
            return None
        if wandb_config is None:
            wandb_config = {
                "train": self.cfg_train.to_dict(),
                "eval": self.cfg_eval.to_dict(),
                "logging": self.cfg_logging.to_dict(),
                "dataset_path": self.data_train.dataset_path,
            }
        wandb_config["info"] = {
            "dataset_name": self.data_train.name,
            "len_train": len(self.data_train),
            "len_eval": len(self.data_valid),
            "num_params": get_num_params(params),
            "step_start": step,
        }
        return wandb.init(
            project=self.cfg_logging.wandb_project,
            entity=self.cfg_logging.wandb_entity,
            name=self.cfg_logging.run_name,
            config=wandb_config,
            save_code=True,
        )
