"""Case builder golden tests on a hand-computed 3-particle periodic system.

Same testing idea as the reference's case tests: a tiny configuration where
edges, velocities, accelerations and features can be derived by hand.

Scenario (box [0,1]^3, radius 0.3, input_seq_length=3, 5 frames):
    particle A: fixed at (0.25, 0.5, 0.5)
    particle B: x = 0.05, 0.95, 0.85, 0.75, 0.65 (constant vel -0.1, wraps
        between frames 0 and 1), y = z = 0.5
    particle C: x = 0.45, 0.45, 0.50, 0.60, 0.75 (accelerating +0.05/step),
        y = 0.6, z = 0.5
At the most recent input frame (t=2) only A and C are within the radius.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.case import case_builder

ISL = 3
R = 0.3


@pytest.fixture(scope="module")
def setup():
    metadata = {
        "num_particles_max": 3,
        "periodic_boundary_conditions": [True, True, True],
        "default_connectivity_radius": R,
        "bounds": [[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]],
        "acc_mean": [0.0, 0.0, 0.0],
        "acc_std": [1.0, 1.0, 1.0],
        "vel_mean": [0.0, 0.0, 0.0],
        "vel_std": [1.0, 1.0, 1.0],
        "dim": 3,
    }
    case = case_builder(
        box=[1.0, 1.0, 1.0],
        metadata=metadata,
        input_seq_length=ISL,
        cfg_neighbors={
            "backend": "allpairs", "multiplier": 1.25, "format": "sparse",
        },
        cfg_model={"isotropic_norm": False, "magnitude_features": False},
        noise_std=0.0,
        external_force_fn=None,
        dtype=jnp.float64,
    )

    xs_b = [0.05, 0.95, 0.85, 0.75, 0.65]
    xs_c = [0.45, 0.45, 0.50, 0.60, 0.75]
    position_data = np.zeros((3, 5, 3))
    position_data[0] = [0.25, 0.5, 0.5]
    position_data[1] = [[x, 0.5, 0.5] for x in xs_b]
    position_data[2] = [[x, 0.6, 0.5] for x in xs_c]
    particle_types = np.zeros(3, dtype=np.int64)

    key = jax.random.PRNGKey(0)
    _, _, _, neighbors = case.allocate(key, (position_data, particle_types))
    return case, position_data, particle_types, key, neighbors


def _edge_set(neighbors, n=3):
    idx = np.asarray(neighbors.idx)
    mask = (idx[0] < n) & (idx[1] < n)
    return set(zip(idx[0][mask].tolist(), idx[1][mask].tolist()))


def test_allocate_edges_and_targets(setup):
    case, pos, ptype, key, _ = setup
    new_key, features, target_dict, neighbors = case.allocate(key, (pos, ptype))

    # edges: self-loops + the A<->C pair (dist = sqrt(0.25^2 + 0.1^2) < 0.3)
    assert _edge_set(neighbors) == {(0, 0), (1, 1), (2, 2), (0, 2), (2, 0)}
    assert not np.array_equal(np.asarray(new_key), np.asarray(key))

    # target velocity = frame3 - frame2; acceleration = 2nd difference
    np.testing.assert_allclose(
        np.asarray(target_dict["vel"]),
        [[0.0, 0.0, 0.0], [-0.1, 0.0, 0.0], [0.1, 0.0, 0.0]],
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(target_dict["acc"]),
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.05, 0.0, 0.0]],
        atol=1e-12,
    )
    # "pos" target is the last frame of the target triplet (frame isl)
    np.testing.assert_allclose(np.asarray(target_dict["pos"]), pos[:, ISL])


def test_velocity_history_with_pbc_wrap(setup):
    case, pos, ptype, key, _ = setup
    _, features, _, _ = case.allocate(key, (pos, ptype))
    # B's first velocity wraps: 0.95 - 0.05 = +0.9 -> minimum image -0.1
    np.testing.assert_allclose(
        np.asarray(features["vel_hist"]),
        [
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [-0.1, 0.0, 0.0, -0.1, 0.0, 0.0],
            [0.0, 0.0, 0.0, 0.05, 0.0, 0.0],
        ],
        atol=1e-12,
    )


def test_relative_displacements(setup):
    case, pos, ptype, key, _ = setup
    _, features, _, nbrs = case.allocate(key, (pos, ptype))
    idx = np.asarray(nbrs.idx)
    rel_disp = np.asarray(features["rel_disp"])
    rel_dist = np.asarray(features["rel_dist"])

    expected = {
        (0, 0): [0.0, 0.0, 0.0],
        (1, 1): [0.0, 0.0, 0.0],
        (2, 2): [0.0, 0.0, 0.0],
        (0, 2): np.array([0.25 - 0.5, 0.5 - 0.6, 0.0]) / R,
        (2, 0): np.array([0.5 - 0.25, 0.6 - 0.5, 0.0]) / R,
    }
    for e, (r, s) in enumerate(zip(idx[0], idx[1])):
        if r >= 3 or s >= 3:
            continue
        np.testing.assert_allclose(rel_disp[e], expected[(r, s)], atol=1e-12)
        np.testing.assert_allclose(
            rel_dist[e, 0], np.linalg.norm(expected[(r, s)]), atol=1e-12
        )


def test_preprocess_matches_allocate(setup):
    case, pos, ptype, key, neighbors = setup
    _, f_alloc, t_alloc, nbrs_alloc = case.allocate(key, (pos, ptype))
    _, f_pre, t_pre, nbrs_pre = case.preprocess(key, (pos, ptype), 0.0, neighbors, 0)
    assert _edge_set(nbrs_alloc) == _edge_set(nbrs_pre)
    np.testing.assert_allclose(
        np.asarray(t_alloc["acc"]), np.asarray(t_pre["acc"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f_alloc["vel_hist"]), np.asarray(f_pre["vel_hist"]), atol=1e-12
    )


def test_preprocess_unroll_shifts_target(setup):
    case, pos, ptype, key, neighbors = setup
    _, _, target_dict, _ = case.preprocess(key, (pos, ptype), 0.0, neighbors, 1)
    # one unroll step -> targets around frame 3: acc = (0.15 - 0.10) for C
    np.testing.assert_allclose(
        np.asarray(target_dict["acc"]),
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.05, 0.0, 0.0]],
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(target_dict["vel"]),
        [[0.0, 0.0, 0.0], [-0.1, 0.0, 0.0], [0.15, 0.0, 0.0]],
        atol=1e-7,
    )


def test_noise_consistent_targets(setup):
    """With noise, targets must still be the exact second difference of the
    (noised) position sequence under the folded normalization stats."""
    case, pos, ptype, key, neighbors = setup
    noise_std = 0.01
    _, features, target_dict, _ = case.preprocess(
        key, (pos, ptype), noise_std, neighbors, 0
    )
    stats = case.normalization_stats
    vel_std = np.asarray(stats["velocity"]["std"])
    acc_std = np.asarray(stats["acceleration"]["std"])

    # noisy current velocity from the features themselves
    vel_curr = np.asarray(features["vel_hist"])[:, 3:6] * vel_std
    # target frames carry the last input-frame noise -> next velocity between
    # noised frame 2 and clean-shifted frame 3 equals the clean difference
    vel_next_clean = np.array([[0.0, 0.0, 0.0], [-0.1, 0.0, 0.0], [0.1, 0.0, 0.0]])
    expected_acc = (vel_next_clean - vel_curr) / acc_std
    np.testing.assert_allclose(
        np.asarray(target_dict["acc"]), expected_acc, atol=1e-9
    )


def test_integrate_inverts_targets(setup):
    case, pos, ptype, key, _ = setup
    acc = {"acc": jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.05, 0.0, 0.0]])}
    new_pos = case.integrate(acc, jnp.asarray(pos[:, :ISL]))
    np.testing.assert_allclose(np.asarray(new_pos), pos[:, ISL], atol=1e-9)


def test_integrate_velocity_and_position_modes(setup):
    case, pos, ptype, key, _ = setup
    vel = {"vel": jnp.asarray([[0.0, 0.0, 0.0], [-0.1, 0.0, 0.0], [0.1, 0.0, 0.0]])}
    new_pos = case.integrate(vel, jnp.asarray(pos[:, :ISL]))
    np.testing.assert_allclose(np.asarray(new_pos), pos[:, ISL], atol=1e-9)

    target_pos = {"pos": jnp.asarray(pos[:, ISL])}
    new_pos = case.integrate(target_pos, jnp.asarray(pos[:, :ISL]))
    np.testing.assert_allclose(np.asarray(new_pos), pos[:, ISL], atol=1e-12)


def test_noise_folding_in_stats(setup):
    case, *_ = setup
    stats = case.normalization_stats
    np.testing.assert_allclose(np.asarray(stats["velocity"]["std"]), 1.0)
    # rebuild with nonzero noise and check the folding formula
    from lagrangebench_tpu.data.stats import get_dataset_stats

    md = {
        "acc_mean": [0.0], "acc_std": [2.0],
        "vel_mean": [0.0], "vel_std": [3.0],
    }
    s = get_dataset_stats(md, is_isotropic_norm=False, noise_std=1.0)
    np.testing.assert_allclose(np.asarray(s["acceleration"]["std"]), np.sqrt(5.0))
    np.testing.assert_allclose(np.asarray(s["velocity"]["std"]), np.sqrt(10.0))


# ---------------------------------------------------------------------------
# in-kernel edge geometry (neighbors.emit_geometry) through the full case
# ---------------------------------------------------------------------------


def _geom_case(emit_geometry):
    n, dim, box, r = 96, 3, 2.0, 0.31
    metadata = {
        "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "default_connectivity_radius": r,
        "bounds": [[0.0, box]] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1.0] * dim,
        "vel_mean": [0.0] * dim, "vel_std": [1.0] * dim,
        "dim": dim,
    }
    return case_builder(
        box=[box] * dim,
        metadata=metadata,
        input_seq_length=ISL,
        cfg_neighbors={
            "backend": "pallas", "multiplier": 1.25, "format": "dense",
            "emit_geometry": emit_geometry,
        },
        cfg_model={"isotropic_norm": False, "magnitude_features": False},
        noise_std=0.0,
        external_force_fn=None,
        dtype=jnp.float32,
    ), n, dim, box


def test_preprocess_emit_geometry_matches_gather_path():
    """Full preprocess with the NL kernel emitting geometry == the
    sender-position-gather feature chain, single-sample and batched."""
    case_g, n, dim, box = _geom_case(True)
    case_p, *_ = _geom_case(False)
    rng = np.random.default_rng(5)
    pos = np.cumsum(
        rng.normal(0.0, 0.01, size=(n, ISL + 2, dim)), axis=1
    ) + rng.uniform(0, box, size=(n, 1, dim))
    pos = np.mod(pos, box)
    ptype = np.zeros(n, np.int64)
    key = jax.random.PRNGKey(0)

    _, feats_g, tgt_g, nbrs_g = case_g.allocate(key, (pos, ptype))
    _, feats_p, tgt_p, nbrs_p = case_p.allocate(key, (pos, ptype))
    assert not bool(nbrs_g.did_buffer_overflow)

    np.testing.assert_array_equal(
        np.asarray(feats_g["senders"]), np.asarray(feats_p["senders"])
    )
    np.testing.assert_allclose(
        np.asarray(feats_g["rel_disp"]), np.asarray(feats_p["rel_disp"]),
        rtol=3e-5, atol=3e-6,
    )
    np.testing.assert_allclose(
        np.asarray(feats_g["rel_dist"]), np.asarray(feats_p["rel_dist"]),
        rtol=3e-5, atol=3e-6,
    )
    np.testing.assert_allclose(
        np.asarray(feats_g["vel_hist"]), np.asarray(feats_p["vel_hist"]),
        rtol=1e-6,
    )
    for k in tgt_g:
        np.testing.assert_allclose(
            np.asarray(tgt_g[k]), np.asarray(tgt_p[k]), rtol=1e-6
        )

    # batched flat super-graph path carries the kernel geometry through
    from lagrangebench_tpu.utils import broadcast_to_batch

    bsz = 2
    pos_b = np.stack([pos, np.mod(pos + 0.1, box)])
    ptype_b = np.broadcast_to(ptype, (bsz, n))
    nbrs_b = broadcast_to_batch(nbrs_g, bsz)
    flat_feats, nbrs_b2 = case_g.preprocess_eval_batched(
        (pos_b[:, :, :ISL], ptype_b), nbrs_b
    )
    assert not bool(jnp.any(nbrs_b2.did_buffer_overflow))
    assert flat_feats["rel_disp"].shape == (bsz * n,) + feats_g["rel_disp"].shape[1:]
    # sample 0 of the flat batch == the single-sample features
    np.testing.assert_allclose(
        np.asarray(flat_feats["rel_disp"][:n]),
        np.asarray(feats_g["rel_disp"]), rtol=3e-5, atol=3e-6,
    )
    np.testing.assert_allclose(
        np.asarray(flat_feats["rel_dist"][:n]),
        np.asarray(feats_g["rel_dist"]), rtol=3e-5, atol=3e-6,
    )
