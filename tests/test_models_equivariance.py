"""E(3)-equivariance property tests for SEGNN / EGNN / PaiNN.

Same verification idea as the reference's models test: apply a random
rotation to all vector-valued inputs and check the outputs rotate
accordingly (free space, homogeneous particles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.config import Config
from lagrangebench_tpu.models import setup_model
from lagrangebench_tpu.models.e3.basis import wigner_d


def random_rotation(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


N, E, DIM, ISL = 40, 160, 3, 6


def dummy_sample(seed=0, magnitudes=False):
    """Random free-space sample with self-consistent positions/edges."""
    rng = np.random.default_rng(seed)
    k = ISL - 1
    pos = rng.uniform(-1, 1, size=(N, ISL, DIM)) * 0.1
    receivers = np.sort(rng.integers(0, N, size=E))
    senders = rng.integers(0, N, size=E)
    most_recent = pos[:, -1]
    rel_disp = (most_recent[receivers] - most_recent[senders]) / 0.3
    vel_hist = np.diff(pos, axis=1)  # (N, K, dim)

    features = {
        "abs_pos": pos,
        "vel_hist": vel_hist.reshape(N, k * DIM),
        "rel_disp": rel_disp,
        "rel_dist": np.linalg.norm(rel_disp, axis=-1, keepdims=True),
        "receivers": receivers.astype(np.int32),
        "senders": senders.astype(np.int32),
    }
    if magnitudes:
        features["vel_mag"] = np.linalg.norm(vel_hist, axis=-1)
    ptype = np.zeros(N, dtype=np.int32)
    return features, ptype


def rotate_features(features, R):
    out = dict(features)
    k = ISL - 1
    out["abs_pos"] = features["abs_pos"] @ R.T
    out["vel_hist"] = (
        features["vel_hist"].reshape(N, k, DIM) @ R.T
    ).reshape(N, k * DIM)
    out["rel_disp"] = features["rel_disp"] @ R.T
    return out


METADATA = {
    "dim": DIM,
    "dt": 0.01,
    "write_every": 1,
    "dx": 0.1,
    "periodic_boundary_conditions": [False] * DIM,
    "bounds": [[-2.0, 2.0]] * DIM,
    "default_connectivity_radius": 0.3,
    "num_particles_max": N,
}


def build(name, magnitudes=False, periodic=False):
    cfg = Config(
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
    # free-space metadata; identity normalization for clean equivariance
    stats = {
        "velocity": {"mean": jnp.zeros(DIM), "std": jnp.ones(DIM)},
        "acceleration": {"mean": jnp.zeros(DIM), "std": jnp.ones(DIM)},
    }
    metadata = dict(METADATA)
    if periodic:
        # periodic metadata drops the wall-distance ("bound") feature, which
        # is absent from the dummy sample; EGNN instead needs free space so
        # its absolute position updates are not wrapped by the box
        metadata["periodic_boundary_conditions"] = [True] * DIM
    _, init, apply = setup_model(
        cfg, metadata, normalization_stats=stats, homogeneous_particles=True
    )
    return init, apply


@pytest.mark.parametrize(
    "name,magnitudes,periodic,out_keys",
    [
        ("segnn", False, True, ["acc"]),
        ("egnn", False, False, ["pos", "vel", "acc"]),
        ("painn", True, True, ["acc"]),
    ],
)
def test_rotation_equivariance(name, magnitudes, periodic, out_keys):
    features, ptype = dummy_sample(magnitudes=magnitudes)
    init, apply = build(name, magnitudes, periodic)

    f32 = lambda d: {
        k: jnp.asarray(v, jnp.float32 if v.dtype.kind == "f" else None)
        for k, v in d.items()
    }
    features = f32(features)
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(ptype)))

    out0, _ = apply(params, state, (features, jnp.asarray(ptype)))

    R = random_rotation(7)
    features_rot = f32(rotate_features(jax.tree.map(np.asarray, features), R))
    out1, _ = apply(params, state, (features_rot, jnp.asarray(ptype)))

    D = wigner_d(1, R)
    assert set(out_keys).issubset(out0.keys())
    for key in out_keys:
        a = np.asarray(out0[key]) @ D.T
        b = np.asarray(out1[key])
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=f"{name}/{key}")


@pytest.mark.parametrize(
    "name,magnitudes,periodic",
    [("segnn", False, True), ("egnn", False, False), ("painn", True, True)],
)
def test_forward_shapes(name, magnitudes, periodic):
    features, ptype = dummy_sample(magnitudes=magnitudes)
    init, apply = build(name, magnitudes, periodic)
    features = {k: jnp.asarray(v) for k, v in features.items()}
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(ptype)))
    out, _ = apply(params, state, (features, jnp.asarray(ptype)))
    assert out["acc"].shape == (N, DIM)
    assert np.isfinite(np.asarray(out["acc"])).all()


def test_segnn_high_lmax_equivariance():
    """SEGNN at lmax_attributes=2 / lmax_hidden=2 (beyond the shipped
    configs' lmax=1) stays rotation-equivariant end-to-end."""
    features, ptype = dummy_sample(magnitudes=False)
    cfg = Config(
        {
            "name": "segnn",
            "input_seq_length": ISL,
            "num_mp_steps": 2,
            "num_mlp_layers": 2,
            "latent_dim": 8,
            "magnitude_features": False,
            "isotropic_norm": False,
            "lmax_attributes": 2,
            "lmax_hidden": 2,
            "segnn_norm": "none",
            "velocity_aggregate": "avg",
        }
    )
    stats = {
        "velocity": {"mean": jnp.zeros(DIM), "std": jnp.ones(DIM)},
        "acceleration": {"mean": jnp.zeros(DIM), "std": jnp.ones(DIM)},
    }
    metadata = dict(METADATA)
    metadata["periodic_boundary_conditions"] = [True] * DIM
    _, init, apply = setup_model(
        cfg, metadata, normalization_stats=stats, homogeneous_particles=True
    )

    f32 = lambda d: {
        k: jnp.asarray(v, jnp.float32 if v.dtype.kind == "f" else None)
        for k, v in d.items()
    }
    features = f32(features)
    params, state = init(jax.random.PRNGKey(0), (features, jnp.asarray(ptype)))
    out0, _ = apply(params, state, (features, jnp.asarray(ptype)))

    R = random_rotation(21)
    features_rot = f32(rotate_features(jax.tree.map(np.asarray, features), R))
    out1, _ = apply(params, state, (features_rot, jnp.asarray(ptype)))

    D = wigner_d(1, R)
    np.testing.assert_allclose(
        np.asarray(out0["acc"]) @ D.T, np.asarray(out1["acc"]), atol=5e-5
    )
