"""Dense (N, K) edge layout: parity with the sparse reference layout.

The dense layout is the TPU fast path (scatter-free neighbor build and
message aggregation); it must produce the same edge sets, the same features
and the same model outputs as the sparse layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.models import GNS, make_model_fns
from lagrangebench_tpu.ops import neighbor_list, periodic
from lagrangebench_tpu.ops.scatter import (
    aggregate_mean_to_receivers,
    aggregate_to_receivers,
)

from .test_neighbors import brute_force_edges


def dense_edge_set(nbrs, n):
    idx = np.asarray(nbrs.idx)
    out = set()
    for i in range(idx.shape[0]):
        for j in idx[i]:
            if j < n and i < n:
                out.add((i, int(j)))
    return out


@pytest.mark.parametrize("backend", ["allpairs", "celllist"])
def test_dense_matches_bruteforce(backend):
    rng = np.random.default_rng(0)
    box, cutoff, n = 2.0, 0.31, 64
    pos = rng.uniform(0, box, size=(n, 3))
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * 3, cutoff, backend=backend, format="dense"
    )
    nbrs = fns.allocate(jnp.asarray(pos))
    assert not bool(nbrs.did_buffer_overflow)
    assert nbrs.format == "dense"
    assert nbrs.idx.shape[0] == n
    assert dense_edge_set(nbrs, n) == brute_force_edges(pos, box, cutoff, True)


def test_dense_overflow_flag():
    rng = np.random.default_rng(1)
    box, cutoff, n = 4.0, 0.5, 64
    disp, _ = periodic(box)
    fns = neighbor_list(disp, [box] * 3, cutoff, format="dense")
    nbrs = fns.allocate(jnp.asarray(rng.uniform(0, box, size=(n, 3))))
    dense_pos = 2.0 + 0.01 * rng.uniform(size=(n, 3))
    nbrs1 = nbrs.update(jnp.asarray(dense_pos))
    assert bool(nbrs1.did_buffer_overflow)
    nbrs2 = fns.allocate(jnp.asarray(dense_pos))
    assert not bool(nbrs2.did_buffer_overflow)


def test_aggregate_dense_vs_sparse():
    rng = np.random.default_rng(2)
    n, k, f = 10, 4, 3
    senders = rng.integers(0, n + 1, size=(n, k)).astype(np.int32)
    data = rng.normal(size=(n, k, f)).astype(np.float32)
    receivers = np.repeat(np.arange(n, dtype=np.int32)[:, None], k, axis=1)

    dense = aggregate_to_receivers(
        jnp.asarray(data), jnp.asarray(receivers), jnp.asarray(senders), n
    )
    # sparse equivalent: flatten, mask padded (sender == n) via receiver drop
    flat_r = np.where(senders.reshape(-1) < n, receivers.reshape(-1), n)
    sparse = jax.ops.segment_sum(
        jnp.asarray(data.reshape(-1, f)), jnp.asarray(flat_r), num_segments=n
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse), atol=1e-6)

    dense_mean = aggregate_mean_to_receivers(
        jnp.asarray(data), jnp.asarray(receivers), jnp.asarray(senders), n
    )
    counts = (senders < n).sum(axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(dense_mean),
        np.asarray(sparse) / np.maximum(counts, 1),
        atol=1e-6,
    )


@pytest.fixture(scope="module")
def periodic_case_pair():
    """The same physical case in sparse and dense layouts."""
    metadata = {
        "num_particles_max": 32,
        "periodic_boundary_conditions": [True] * 3,
        "default_connectivity_radius": 0.4,
        "bounds": [[0.0, 1.5]] * 3,
        "acc_mean": [0.0] * 3,
        "acc_std": [1.0] * 3,
        "vel_mean": [0.0] * 3,
        "vel_std": [1.0] * 3,
        "dim": 3,
    }
    cases = {}
    for fmt in ("sparse", "dense"):
        cases[fmt] = case_builder(
            box=[1.5] * 3,
            metadata=metadata,
            input_seq_length=3,
            cfg_neighbors={
                "backend": "celllist", "multiplier": 1.5, "format": fmt,
            },
            noise_std=0.0,
            dtype=jnp.float64,
        )
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 1.5, size=(32, 1, 3))
    vel = rng.normal(0, 0.01, size=(32, 1, 3))
    pos = np.mod(base + vel * np.arange(4)[None, :, None], 1.5)
    ptype = np.zeros(32, dtype=np.int64)
    return cases, pos, ptype


def test_case_targets_agree_across_formats(periodic_case_pair):
    cases, pos, ptype = periodic_case_pair
    key = jax.random.PRNGKey(0)
    _, f_sparse, t_sparse, _ = cases["sparse"].allocate(key, (pos, ptype))
    _, f_dense, t_dense, _ = cases["dense"].allocate(key, (pos, ptype))
    np.testing.assert_allclose(
        np.asarray(t_sparse["acc"]), np.asarray(t_dense["acc"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f_sparse["vel_hist"]), np.asarray(f_dense["vel_hist"]),
        atol=1e-12,
    )
    assert f_dense["rel_disp"].ndim == 3  # (N, K, dim)
    assert f_sparse["rel_disp"].ndim == 2  # (E, dim)


def test_gns_output_agrees_across_formats(periodic_case_pair):
    cases, pos, ptype = periodic_case_pair
    model = GNS(particle_dimension=3, latent_size=16, blocks_per_step=2,
                num_mp_steps=2)
    init, apply = make_model_fns(model)

    def to_f64(x):
        x = np.asarray(x)
        if x.dtype.kind == "f":
            return jnp.asarray(x, jnp.float64)
        return jnp.asarray(x)

    feats = {}
    for fmt in ("sparse", "dense"):
        f, _ = cases[fmt].allocate_eval((pos[:, :3], ptype))
        feats[fmt] = jax.tree.map(to_f64, f)

    params, state = init(jax.random.PRNGKey(0), (feats["sparse"], ptype))
    out_sparse, _ = apply(params, state, (feats["sparse"], jnp.asarray(ptype)))
    out_dense, _ = apply(params, state, (feats["dense"], jnp.asarray(ptype)))
    np.testing.assert_allclose(
        np.asarray(out_sparse["acc"]), np.asarray(out_dense["acc"]), atol=1e-8
    )


@pytest.mark.parametrize("fmt", ["dense", "sparse"])
def test_batched_rollout_equals_individual(periodic_case_pair, fmt):
    """A batched rollout (disjoint super-graph execution) must reproduce
    per-trajectory rollouts exactly, in both edge layouts."""
    import jax

    from lagrangebench_tpu.evaluate import MetricsComputer
    from lagrangebench_tpu.evaluate.rollout import (
        _build_rollout_fn,
        _eval_batched_rollout,
    )

    cases, pos, ptype = periodic_case_pair
    case = cases[fmt]
    isl, n_steps = 3, 5

    # three different trajectories from shifted versions of the fixture
    rng = np.random.default_rng(7)
    trajs = [np.mod(pos + rng.uniform(0, 1.5), 1.5) for _ in range(3)]

    model = GNS(particle_dimension=3, latent_size=8, blocks_per_step=2,
                num_mp_steps=2)
    init, apply = make_model_fns(model)
    f0, nbrs = case.allocate_eval((jnp.asarray(trajs[0])[:, :isl], ptype))
    params, state = init(jax.random.PRNGKey(0), (f0, jnp.asarray(ptype)))

    rollout_fn = _build_rollout_fn(apply, case, isl)
    metrics_vmap = jax.vmap(
        MetricsComputer(["mse"], case.displacement,
                        {"dt": 1, "dx": 1, "dim": 3, "write_every": 1},
                        input_seq_length=isl),
        in_axes=(0, 0),
    )

    def run(batch_trajs, steps=n_steps):
        batch = (
            jnp.asarray(np.stack(batch_trajs)),
            jnp.asarray(np.stack([ptype] * len(batch_trajs))),
        )
        preds, _, _ = _eval_batched_rollout(
            rollout_fn, case, params, state, batch, nbrs, metrics_vmap,
            n_rollout_steps=steps, t_window=isl,
        )
        return np.asarray(preds)

    # one-step comparison stays TIGHT: reduction-order noise has not
    # amplified yet, so sub-1e-3 cross-sample contamination in the batched
    # neighbor/preprocessing path would surface here
    batched_1 = run(trajs, steps=1)
    for i, traj in enumerate(trajs):
        single_1 = run([traj], steps=1)
        np.testing.assert_allclose(
            batched_1[i], single_1[0], atol=1e-5,
            err_msg=f"trajectory {i}: one-step batched vs single",
        )

    batched = run(trajs)
    for i, traj in enumerate(trajs):
        single = run([traj])
        # B=3 vs B=1 shapes fuse differently in XLA, so f32 reduction-order
        # noise (~5e-7 after one step) amplifies ~4x/step through the
        # chaotic random-init dynamics (acc_std=1). Real batching bugs
        # (cross-sample contamination) produce O(0.1) errors.
        np.testing.assert_allclose(
            batched[i], single[0], atol=1e-3,
            err_msg=f"trajectory {i} differs between batched and single",
        )


def test_painn_output_agrees_across_formats():
    """The dense PaiNN message pass (gather + masked in-row sum on the
    symmetric NL, negated direction) must equal the sparse reference
    semantics (gather-from-receivers / scatter-to-senders)."""
    from lagrangebench_tpu.models import PaiNN

    metadata = {
        "num_particles_max": 32,
        "periodic_boundary_conditions": [True] * 3,
        "default_connectivity_radius": 0.4,
        "bounds": [[0.0, 1.5]] * 3,
        "acc_mean": [0.0] * 3,
        "acc_std": [1.0] * 3,
        "vel_mean": [0.0] * 3,
        "vel_std": [1.0] * 3,
        "dim": 3,
    }
    cases = {}
    for fmt in ("sparse", "dense"):
        cases[fmt] = case_builder(
            box=[1.5] * 3,
            metadata=metadata,
            input_seq_length=3,
            cfg_neighbors={
                "backend": "celllist", "multiplier": 1.5, "format": fmt,
            },
            cfg_model={"magnitude_features": True},
            noise_std=0.0,
            dtype=jnp.float64,
        )
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 1.5, size=(32, 1, 3))
    vel = rng.normal(0, 0.01, size=(32, 1, 3))
    pos = np.mod(base + vel * np.arange(4)[None, :, None], 1.5)
    ptype = np.zeros(32, dtype=np.int64)

    model = PaiNN(
        hidden_size=16, output_size=1, num_mp_steps=2, n_rbf=8,
        radius=0.4 * 1.5, n_vels=2,
    )
    init, apply = make_model_fns(model)

    def to_f64(x):
        x = np.asarray(x)
        if x.dtype.kind == "f":
            return jnp.asarray(x, jnp.float64)
        return jnp.asarray(x)

    feats = {}
    for fmt in ("sparse", "dense"):
        f, _ = cases[fmt].allocate_eval((pos[:, :3], ptype))
        feats[fmt] = jax.tree.map(to_f64, f)

    params, state = init(jax.random.PRNGKey(0), (feats["sparse"], ptype))
    out_sparse, _ = apply(params, state, (feats["sparse"], jnp.asarray(ptype)))
    out_dense, _ = apply(params, state, (feats["dense"], jnp.asarray(ptype)))
    np.testing.assert_allclose(
        np.asarray(out_sparse["acc"]), np.asarray(out_dense["acc"]),
        rtol=1e-8, atol=1e-10,
    )
