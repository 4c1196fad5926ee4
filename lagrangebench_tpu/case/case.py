"""Case setup: boundary handling, neighbor search, features, targets,
integration — bundled into a pytree-free closure set.

Mirrors the reference's `case_builder -> CaseSetupFn` design (reference
lagrangebench/case_setup/case.py:32-269): the case captures box, metadata and
normalization once and returns pure functions. Train/eval loops are generic
over (case, model).

Parity-critical math reproduced here:
    * targets from a 2nd-order finite difference of three consecutive
      positions under the boundary-aware displacement (case.py:142-160);
    * semi-implicit Euler with dt = 1 folded into the normalization
      (case.py:230-259);
    * the preprocess chain noise -> neighbor update -> features -> targets.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, merge
from ..data.stats import get_dataset_stats
from ..defaults import defaults, resolve_backend
from ..ops import neighbors as nb
from ..ops import space
from ..train.strats import add_gns_noise
from .features import TargetDict, physical_feature_builder


class CaseSetupFn(NamedTuple):
    """Bundle of pure case functions.

    Attributes:
        allocate: host-side preprocess that also sizes the neighbor buffers.
        preprocess: jit-able train preprocess (noise, NL update, features,
            targets).
        allocate_eval: host-side eval preprocess (no noise, no targets).
        preprocess_eval: jit-able eval preprocess.
        preprocess_batched: train preprocess over a trajectory batch,
            emitting FLAT super-graph features/targets (see
            ``_preprocess_batched``).
        preprocess_eval_batched: eval variant of the above.
        integrate: semi-implicit Euler step inverting output normalization.
        displacement: boundary-aware displacement function.
        shift: boundary-aware shift function.
        normalization_stats: velocity/acceleration stats dict.
    """

    allocate: Callable
    preprocess: Callable
    allocate_eval: Callable
    preprocess_eval: Callable
    preprocess_batched: Callable
    preprocess_eval_batched: Callable
    integrate: Callable
    displacement: Callable
    shift: Callable
    normalization_stats: Dict


def case_builder(
    box,
    metadata: Dict,
    input_seq_length: int,
    cfg_neighbors: Union[Dict, Config, None] = None,
    cfg_model: Union[Dict, Config, None] = None,
    noise_std: float = defaults.train.noise_std,
    external_force_fn: Optional[Callable] = None,
    dtype=jnp.float32,
) -> CaseSetupFn:
    """Set up the simulation case.

    Args:
        box: box side lengths (dim,).
        metadata: dataset metadata dict.
        input_seq_length: number of input positions (velocity history + 1).
        cfg_neighbors: neighbor-search config subset (backend, multiplier).
        cfg_model: model config subset (isotropic_norm, magnitude_features).
        noise_std: GNS noise std folded into normalization stats.
        external_force_fn: per-position external force.
        dtype: preprocessing dtype (float32 on TPU).
    """
    cfg_neighbors = merge(defaults.neighbors, cfg_neighbors or {})
    cfg_model = merge(defaults.model, cfg_model or {})
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)

    normalization_stats = get_dataset_stats(
        metadata, cfg_model.isotropic_norm, noise_std
    )
    normalization_stats = jax.tree.map(
        lambda x: jnp.asarray(x, dtype=dtype), normalization_stats
    )

    pbc = list(metadata["periodic_boundary_conditions"])
    if any(pbc):
        displacement_fn, shift_fn = space.periodic(jnp.asarray(box, dtype=dtype))
    else:
        displacement_fn, shift_fn = space.free()

    disp_vmap = jax.vmap(displacement_fn, in_axes=(0, 0))

    neighbor_fn = nb.neighbor_list(
        displacement_fn,
        box,
        r_cutoff=metadata["default_connectivity_radius"],
        backend=resolve_backend(cfg_neighbors.backend),
        capacity_multiplier=float(cfg_neighbors.multiplier),
        num_particles_max=metadata["num_particles_max"],
        pbc=pbc,
        format=cfg_neighbors.get("format", "dense"),
        emit_geometry=bool(cfg_neighbors.get("emit_geometry", False)),
    )

    feature_transform = physical_feature_builder(
        bounds=metadata["bounds"],
        normalization_stats=normalization_stats,
        connectivity_radius=metadata["default_connectivity_radius"],
        displacement_fn=displacement_fn,
        pbc=pbc,
        magnitude_features=cfg_model.magnitude_features,
        external_force_fn=external_force_fn,
    )

    def _compute_target(pos_triplet: jnp.ndarray) -> TargetDict:
        """Normalized targets from three consecutive frames (N, 3, dim)."""
        current_vel = disp_vmap(pos_triplet[:, 1], pos_triplet[:, 0])
        next_vel = disp_vmap(pos_triplet[:, 2], pos_triplet[:, 1])
        acc = next_vel - current_vel

        acc_stats = normalization_stats["acceleration"]
        vel_stats = normalization_stats["velocity"]
        return {
            "acc": (acc - acc_stats["mean"]) / acc_stats["std"],
            "vel": (next_vel - vel_stats["mean"]) / vel_stats["std"],
            "pos": pos_triplet[:, -1],
        }

    def _preprocess(sample, neighbors, mode: str = "train", **kwargs):
        """Fully jit-able preprocess; neighbor buffers already sized."""
        pos_input = jnp.asarray(sample[0], dtype=dtype)
        particle_type = jnp.asarray(sample[1])

        if mode == "train":
            key = kwargs["key"]
            noise_std_ = kwargs["noise_std"]
            unroll_steps = kwargs["unroll_steps"]
            if pos_input.shape[1] > 1:
                key, pos_input = add_gns_noise(
                    key, pos_input, particle_type, input_seq_length,
                    noise_std_, shift_fn,
                )

        most_recent = pos_input[:, input_seq_length - 1]
        num_particles = (particle_type != -1).sum()
        neighbors = neighbors.update(most_recent, num_particles=num_particles)

        features = feature_transform(pos_input[:, :input_seq_length], neighbors)

        if mode == "train":
            # the target is the 2nd finite difference around frame
            # isl - 1 + unroll_steps; slice three frames starting one earlier
            slice_begin = (0, input_seq_length - 2 + unroll_steps, 0)
            slice_size = (pos_input.shape[0], 3, pos_input.shape[2])
            target_dict = _compute_target(
                jax.lax.dynamic_slice(pos_input, slice_begin, slice_size)
            )
            return key, features, target_dict, neighbors
        return features, neighbors

    def _preprocess_batched(sample, neighbors, mode: str = "train", **kwargs):
        """Batched preprocess emitting FLAT super-graph features.

        ``sample`` is ((B, N, T, dim) positions, (B, N) types); ``neighbors``
        is a batched NeighborList. Noise and the neighbor update run
        per-sample (vmapped — they are per-graph by nature), but the feature
        transform and targets run ONCE on the (B*N)-row disjoint super-graph
        with per-sample edge-index offsets: under vmap the sender-position
        gather in the feature chain lowers as a batched-dims gather, ~9x
        slower on TPU than the flat single-dimension gather (ops/batching.py
        documents the same pathology for the model's gathers).

        Returns features ready for a flat model apply (no
        ``flatten_graph_batch`` needed); the returned NeighborList stays
        BATCHED for per-sample capacity/overflow bookkeeping.
        """
        pos_input = jnp.asarray(sample[0], dtype=dtype)
        particle_type = jnp.asarray(sample[1])
        b, n = particle_type.shape

        if mode == "train":
            key = kwargs["key"]
            noise_std_ = kwargs["noise_std"]
            unroll_steps = kwargs["unroll_steps"]
            if pos_input.shape[2] > 1:
                key, pos_input = jax.vmap(
                    lambda k, p, t: add_gns_noise(
                        k, p, t, input_seq_length, noise_std_, shift_fn
                    )
                )(key, pos_input, particle_type)

        most_recent = pos_input[:, :, input_seq_length - 1]
        num_particles = (particle_type != -1).sum(axis=1)
        neighbors = jax.vmap(
            lambda p, np_, nb: nb.update(p, num_particles=np_)
        )(most_recent, num_particles, neighbors)

        pos_flat = pos_input.reshape((b * n,) + pos_input.shape[2:])
        if neighbors.format == "dense":
            # flat view of the dense (B, N, K) index matrix: sample s's
            # rows offset by s*N; padded slots (fill == N) map to B*N
            idx = neighbors.idx
            off = (jnp.arange(b, dtype=idx.dtype) * n).reshape(b, 1, 1)
            idx_flat = jnp.where(idx < n, idx + off, b * n).reshape(
                b * n, idx.shape[-1]
            )
            # in-kernel edge geometry (emit_geometry) is per-sample row
            # blocks — flatten to super-graph rows alongside the indices
            flat_aux = None
            if getattr(neighbors, "aux", None):
                flat_aux = {
                    k: v.reshape((b * n,) + v.shape[2:])
                    for k, v in neighbors.aux.items()
                }
            flat_nbrs = nb.NeighborList(
                idx=idx_flat,
                did_buffer_overflow=jnp.any(neighbors.did_buffer_overflow),
                update_fn=neighbors.update_fn,
                format="dense",
                aux=flat_aux,
            )
            features = feature_transform(
                pos_flat[:, :input_seq_length], flat_nbrs
            )
        else:
            # sparse/slot layouts: per-sample transform, then offset-flatten
            from ..ops.batching import flatten_graph_batch

            features_b = jax.vmap(
                lambda p, nb_: feature_transform(p[:, :input_seq_length], nb_)
            )(pos_input, neighbors)
            features, _ = flatten_graph_batch(features_b, particle_type)

        if mode == "train":
            slice_begin = (0, input_seq_length - 2 + unroll_steps, 0)
            slice_size = (pos_flat.shape[0], 3, pos_flat.shape[2])
            target_dict = _compute_target(
                jax.lax.dynamic_slice(pos_flat, slice_begin, slice_size)
            )
            return key, features, target_dict, neighbors
        return features, neighbors

    def preprocess_batched_fn(key, sample, noise_std_, neighbors, unroll_steps=0):
        return _preprocess_batched(
            sample, neighbors, key=key, noise_std=noise_std_,
            unroll_steps=unroll_steps,
        )

    def preprocess_eval_batched_fn(sample, neighbors):
        return _preprocess_batched(sample, neighbors, mode="eval")

    def _allocate_shell(sample, capacity_boost: float = 1.0):
        """Host-side (numpy) neighbor buffer sizing from the raw sample.

        Capacities are sized from the un-noised most recent position; the
        capacity multiplier absorbs the (tiny) training noise. This keeps
        allocation free of eager device ops.
        """
        pos_np = np.asarray(sample[0])
        ptype_np = np.asarray(sample[1])
        most_recent = pos_np[:, input_seq_length - 1]
        npart = int((ptype_np != -1).sum())
        return neighbor_fn.allocate_shell(
            most_recent, num_particles=npart, capacity_boost=capacity_boost
        )

    def preprocess_fn(key, sample, noise_std_, neighbors, unroll_steps=0):
        return _preprocess(
            sample, neighbors, key=key, noise_std=noise_std_,
            unroll_steps=unroll_steps,
        )

    def preprocess_eval_fn(sample, neighbors):
        return _preprocess(sample, neighbors, mode="eval")

    preprocess_jit = jax.jit(preprocess_fn)
    preprocess_eval_jit = jax.jit(preprocess_eval_fn)

    def allocate_fn(
        key, sample, noise_std_=noise_std, unroll_steps=0,
        capacity_boost: float = 1.0,
    ):
        shell = _allocate_shell(sample, capacity_boost)
        return preprocess_jit(key, sample, noise_std_, shell, unroll_steps)

    def allocate_eval_fn(sample, capacity_boost: float = 1.0):
        shell = _allocate_shell(sample, capacity_boost)
        return preprocess_eval_jit(sample, shell)

    def integrate_fn(normalized_in: Dict[str, jnp.ndarray], position_sequence):
        """Semi-implicit Euler step from a model output dict.

        dt = 1 by convention: the normalization stats absorb the timestep
        (reference lagrangebench/case_setup/case.py:256).
        """
        assert any(k in normalized_in for k in ("pos", "vel", "acc"))
        if "pos" in normalized_in:
            return normalized_in["pos"]

        most_recent = position_sequence[:, -1]
        if "vel" in normalized_in:
            stats = normalization_stats["velocity"]
            new_velocity = stats["mean"] + normalized_in["vel"] * stats["std"]
        else:
            stats = normalization_stats["acceleration"]
            acc = stats["mean"] + normalized_in["acc"] * stats["std"]
            last_velocity = disp_vmap(most_recent, position_sequence[:, -2])
            new_velocity = last_velocity + acc  # * dt = 1

        return shift_fn(most_recent, new_velocity)

    return CaseSetupFn(
        allocate=allocate_fn,
        preprocess=preprocess_jit,
        allocate_eval=allocate_eval_fn,
        preprocess_eval=preprocess_eval_jit,
        preprocess_batched=jax.jit(preprocess_batched_fn),
        preprocess_eval_batched=jax.jit(preprocess_eval_batched_fn),
        integrate=jax.jit(integrate_fn),
        displacement=displacement_fn,
        shift=shift_fn,
        normalization_stats=normalization_stats,
    )
