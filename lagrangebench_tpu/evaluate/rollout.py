"""Autoregressive rollouts and inference.

TPU-first redesign of the reference rollout loop (reference
lagrangebench/evaluate/rollout.py): instead of a host-driven Python while
loop with a per-step overflow sync, the entire rollout runs on device as one
``lax.scan``. Neighbor-buffer overflow is carried as a flag through the scan;
the host checks it once per batch and, on the rare overflow, re-allocates
with escalated capacity and reruns the batch. This removes T host<->device
round trips per trajectory.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Dict, Iterable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..config import Config, merge
from ..data import DataLoader, H5Dataset
from ..defaults import defaults
from ..utils import broadcast_from_batch, broadcast_to_batch, get_kinematic_mask
from .metrics import MetricsComputer, MetricsDict
from .utils import write_vtk


def _build_rollout_fn(
    model_apply: Callable, case, t_window: int, mesh=None
) -> Callable:
    """Compile-once scan rollout over a trajectory batch.

    Returns fn(params, state, pos_input_batch, particle_type_batch,
    neighbors_batch, targets_tm) -> (predictions, overflow, neighbors).
    ``targets_tm`` is time-major (T, B, N, dim).

    With a ``mesh``, the trajectory batch shards over the ``data`` axis via
    shard_map (BASELINE config: batched rollouts over ICI): each device
    rolls out its local sub-batch on its own flattened super-graph, so no
    collectives run inside the scan — only the overflow flag reduces at the
    end. Batches not divisible by the mesh fall back to the local path.
    """
    from ..ops.batching import unflatten_nodes

    integrate_vmap = jax.vmap(case.integrate, in_axes=(0, 0))

    def rollout_core(params, state, current_batch, particle_type_batch,
                     neighbors_batch, targets_tm):
        kinematic = get_kinematic_mask(particle_type_batch)  # (B, N)
        b, n = particle_type_batch.shape
        flat_ptype = particle_type_batch.reshape(b * n)

        def step(carry, target_t):
            current, nbrs, st, overflow = carry
            # flat super-graph preprocess + model: batched-dims gathers
            # under vmap lower poorly on TPU (see ops/batching.py and
            # case._preprocess_batched)
            flat_features, nbrs = case.preprocess_eval_batched(
                (current, particle_type_batch), nbrs
            )
            overflow = overflow | jnp.any(nbrs.did_buffer_overflow)
            pred_flat, st = model_apply(params, st, (flat_features, flat_ptype))
            pred = {k: unflatten_nodes(v, b, n) for k, v in pred_flat.items()}
            next_pos = integrate_vmap(pred, current)
            # kinematic particles follow the ground truth
            next_pos = jnp.where(kinematic[..., None], target_t, next_pos)
            current = jnp.concatenate(
                [current[:, :, 1:], next_pos[:, :, None]], axis=2
            )
            return (current, nbrs, st, overflow), next_pos

        init = (
            current_batch,
            neighbors_batch,
            state,
            jnp.asarray(False),
        )
        (current, nbrs, st, overflow), preds_tm = jax.lax.scan(
            step, init, targets_tm
        )
        # (T, B, N, dim) -> (B, T, N, dim)
        return jnp.transpose(preds_tm, (1, 0, 2, 3)), overflow, nbrs

    import numpy as np

    n_dev = 1 if mesh is None else int(np.prod(mesh.devices.shape))
    local_fn = jax.jit(rollout_core)
    if n_dev == 1:
        return local_fn

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import DATA_AXIS

    def shard_body(params, state, current, ptype, nbrs, targets_tm):
        preds, overflow, nbrs = rollout_core(
            params, state, current, ptype, nbrs, targets_tm
        )
        overflow = jax.lax.psum(overflow.astype(jnp.int32), DATA_AXIS) > 0
        return preds, overflow, nbrs

    batched, rep = P(DATA_AXIS), P()
    sharded_fn = jax.jit(
        shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(rep, rep, batched, batched, batched, P(None, DATA_AXIS)),
            out_specs=(batched, rep, batched),
            check_vma=False,
        )
    )

    def dispatch(params, state, current, ptype, nbrs, targets_tm):
        if current.shape[0] % n_dev == 0:
            return sharded_fn(params, state, current, ptype, nbrs, targets_tm)
        return local_fn(params, state, current, ptype, nbrs, targets_tm)

    return dispatch


def _eval_batched_rollout(
    rollout_fn: Callable,
    case,
    params,
    state,
    traj_batch: Tuple[jnp.ndarray, jnp.ndarray],
    neighbors,
    metrics_computer_vmap: Callable,
    n_rollout_steps: int,
    t_window: int,
    n_extrap_steps: int = 0,
    max_retries: int = 5,
) -> Tuple[jnp.ndarray, MetricsDict, object]:
    """Roll out one trajectory batch with overflow-escalation retries."""
    pos_input, particle_type = traj_batch
    batch_size = pos_input.shape[0]

    if n_rollout_steps == -1:
        n_rollout_steps = pos_input.shape[2] - t_window
    traj_len = n_rollout_steps + n_extrap_steps

    current = pos_input[:, :, :t_window]
    targets = pos_input[:, :, t_window : t_window + traj_len]
    # extrapolation past the ground truth: freeze kinematic particles at the
    # last known frame (matches the reference's clamped gather behavior)
    if targets.shape[2] < traj_len:
        pad = jnp.repeat(
            targets[:, :, -1:], traj_len - targets.shape[2], axis=2
        )
        targets = jnp.concatenate([targets, pad], axis=2)
    targets_tm = jnp.transpose(targets, (2, 0, 1, 3))  # (T, B, N, dim)

    neighbors_batch = broadcast_to_batch(neighbors, batch_size)

    boost = 1.0
    for attempt in range(max_retries):
        predictions, overflow, neighbors_batch = rollout_fn(
            params, state, current, particle_type, neighbors_batch, targets_tm
        )
        if not bool(overflow):
            break
        boost *= 1.5
        print(f"(eval) neighbor overflow; reallocating with boost {boost:.2f}")
        sample = broadcast_from_batch((current, particle_type), index=0)
        _, nbrs = case.allocate_eval(sample, capacity_boost=boost)
        neighbors_batch = broadcast_to_batch(nbrs, batch_size)
    else:
        raise RuntimeError("neighbor list kept overflowing during rollout")

    metrics = metrics_computer_vmap(
        predictions[:, :n_rollout_steps], jnp.transpose(targets, (0, 2, 1, 3))[:, :n_rollout_steps]
    )
    return predictions, metrics, broadcast_from_batch(neighbors_batch, 0)


def eval_rollout(
    model_apply: Callable,
    case,
    params,
    state,
    loader_eval: Iterable,
    neighbors,
    metrics_computer: MetricsComputer,
    n_rollout_steps: int,
    n_trajs: int,
    rollout_dir: Optional[str] = None,
    out_type: str = "none",
    n_extrap_steps: int = 0,
    mesh=None,
) -> Dict[str, MetricsDict]:
    """Evaluate rollouts over a loader; returns metrics per trajectory.

    Mirrors the reference's eval_rollout contract (reference
    lagrangebench/evaluate/rollout.py:181-308) including pkl/vtk artifact
    output and the timestamped metrics pickle. With ``mesh``, trajectory
    batches shard over ICI (metrics stay per-trajectory).
    """
    batch_size = loader_eval.batch_size
    t_window = loader_eval.dataset.input_seq_length
    eval_metrics: Dict[str, MetricsDict] = {}

    if rollout_dir is not None:
        os.makedirs(rollout_dir, exist_ok=True)

    rollout_fn = _build_rollout_fn(model_apply, case, t_window, mesh=mesh)
    metrics_computer_vmap = jax.vmap(metrics_computer, in_axes=(0, 0))

    for i, traj_batch in enumerate(loader_eval):
        n_traj_left = n_trajs - i * batch_size
        if n_traj_left <= 0:
            break
        if n_traj_left < traj_batch[0].shape[0]:
            traj_batch = jax.tree.map(lambda x: x[:n_traj_left], traj_batch)
        traj_batch = jax.tree.map(jnp.asarray, traj_batch)

        example_rollout_batch, metrics_batch, neighbors = _eval_batched_rollout(
            rollout_fn=rollout_fn,
            case=case,
            params=params,
            state=state,
            traj_batch=traj_batch,
            neighbors=neighbors,
            metrics_computer_vmap=metrics_computer_vmap,
            n_rollout_steps=n_rollout_steps,
            t_window=t_window,
            n_extrap_steps=n_extrap_steps,
        )

        current_batch_size = traj_batch[0].shape[0]
        for j in range(current_batch_size):
            ind = i * batch_size + j
            eval_metrics[f"rollout_{ind}"] = broadcast_from_batch(metrics_batch, j)

        if rollout_dir is not None:
            # (B, N, T, dim) -> (B, T, N, dim)
            pos_input_batch = jnp.transpose(traj_batch[0], (0, 2, 1, 3))
            for j in range(current_batch_size):
                pos_input = pos_input_batch[j]
                rollout = example_rollout_batch[j]
                initial = pos_input[:t_window]
                example = {
                    "predicted_rollout": jnp.concatenate([initial, rollout]),
                    "ground_truth_rollout": pos_input,
                    "particle_type": traj_batch[1][j],
                }
                prefix = os.path.join(rollout_dir, f"rollout_{i * batch_size + j}")
                if out_type == "vtk":
                    full = example["predicted_rollout"]
                    for k in range(full.shape[0]):
                        write_vtk(
                            {"r": full[k], "tag": example["particle_type"]},
                            f"{prefix}_{k}.vtk",
                        )
                    for k in range(pos_input.shape[0]):
                        write_vtk(
                            {"r": pos_input[k], "tag": example["particle_type"]},
                            f"{prefix}_ref_{k}.vtk",
                        )
                elif out_type == "pkl":
                    with open(f"{prefix}.pkl", "wb") as f:
                        pickle.dump(
                            jax.tree.map(lambda x: jax.device_get(x), example), f
                        )

    if rollout_dir is not None:
        t = time.strftime("%Y_%m_%d_%H_%M_%S", time.localtime())
        with open(os.path.join(rollout_dir, f"metrics{t}.pkl"), "wb") as f:
            pickle.dump(jax.device_get(eval_metrics), f)

    return eval_metrics


def infer(
    model_apply_or_model,
    case,
    data_test: H5Dataset,
    params=None,
    state=None,
    load_ckp: Optional[str] = None,
    cfg_eval_infer: Union[Dict, Config, None] = None,
    rollout_dir: Optional[str] = None,
    n_rollout_steps: int = defaults.eval.n_rollout_steps,
    seed: int = defaults.seed,
    mesh=None,
):
    """Run inference over a test dataset and compute metrics.

    Accepts either an apply function with signature
    ``(params, state, sample) -> (out, state)`` or a flax model instance.
    With ``mesh``, rollout batches shard over the device mesh (set
    ``eval.infer.batch_size`` to a multiple of the mesh size).
    """
    from ..checkpoint import load_checkpoint
    from ..models import make_model_fns
    from ..utils import set_seed

    assert params is not None or load_ckp is not None, (
        "Either params or load_ckp must be provided for inference."
    )

    cfg = merge(defaults.eval.infer, cfg_eval_infer or {})

    if callable(model_apply_or_model) and not hasattr(
        model_apply_or_model, "init"
    ):
        model_apply = model_apply_or_model
    else:
        _, model_apply = make_model_fns(model_apply_or_model)

    n_trajs = cfg.n_trajs if cfg.n_trajs != -1 else data_test.num_samples

    if params is not None:
        state = state or {}
    else:
        params, state, _, _ = load_checkpoint(load_ckp)

    _, rng = set_seed(seed)
    loader_test = DataLoader(data_test, batch_size=cfg.batch_size, rng=rng)
    metrics_computer = MetricsComputer(
        list(cfg.metrics),
        dist_fn=case.displacement,
        metadata=data_test.metadata,
        input_seq_length=data_test.input_seq_length,
        stride=cfg.metrics_stride,
    )

    # allocate the neighbor list from the first sample
    pos_input, particle_type = next(iter(loader_test))
    sample = (pos_input[0][:, : data_test.input_seq_length], particle_type[0])
    _, neighbors = case.allocate_eval(sample)

    return eval_rollout(
        model_apply=model_apply,
        case=case,
        metrics_computer=metrics_computer,
        params=params,
        state=state,
        neighbors=neighbors,
        loader_eval=loader_test,
        n_rollout_steps=n_rollout_steps,
        n_trajs=n_trajs,
        rollout_dir=rollout_dir,
        out_type=cfg.out_type,
        n_extrap_steps=cfg.n_extrap_steps,
        mesh=mesh,
    )
