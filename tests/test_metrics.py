"""Metric math: MSE/MAE slicing, kinetic energy, Sinkhorn divergence."""

import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.evaluate import MetricsComputer, averaged_metrics
from lagrangebench_tpu.ops import free, periodic

METADATA = {"dt": 0.01, "write_every": 1, "dx": 0.1, "dim": 2}


def make_computer(metrics, stride=2):
    disp, _ = free()
    return MetricsComputer(
        metrics, dist_fn=disp, metadata=METADATA, input_seq_length=3, stride=stride
    )


def test_mse_and_horizons():
    mc = make_computer(["mse", "mae"])
    t, n, dim = 12, 5, 2
    target = jnp.zeros((t, n, dim))
    pred = jnp.full((t, n, dim), 0.1)
    out = mc(pred, target)
    # per-frame mse = mean over particles AND dims of 0.1^2 (reference
    # averages across the displacement components)
    np.testing.assert_allclose(np.asarray(out["mse"]), 0.01, rtol=1e-5)
    assert out["mse"].shape == (t,)
    assert out["mse5"].shape == (5,)
    assert out["mse10"].shape == (10,)
    assert "mse20" not in out  # horizon longer than rollout
    np.testing.assert_allclose(np.asarray(out["mae"]), 0.1, rtol=1e-5)


def test_mse_periodic_wraps():
    disp, _ = periodic(1.0)
    mc = MetricsComputer(["mse"], disp, METADATA, input_seq_length=3)
    pred = jnp.asarray([[[0.95, 0.5]]])  # (t=1, n=1, dim=2)
    target = jnp.asarray([[[0.05, 0.5]]])
    out = mc(pred, target)
    # wrapped distance 0.1 in x, 0 in y -> mean over dims = 0.005
    np.testing.assert_allclose(np.asarray(out["mse"]), 0.005, rtol=1e-5)


def test_e_kin():
    mc = make_computer(["e_kin"], stride=1)
    t, n, dim = 6, 4, 2
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(size=(t, n, dim)))
    out = mc(target, target)
    assert out["e_kin"]["mse"] < 1e-12
    # hand-check one frame: sum over particles of |v|^2 * dx^dim
    vel = (np.asarray(target[1]) - np.asarray(target[0])) / (
        METADATA["dt"] * METADATA["write_every"]
    )
    expected0 = (vel**2).sum() * METADATA["dx"] ** METADATA["dim"]
    np.testing.assert_allclose(
        np.asarray(out["e_kin"]["target"])[0], expected0, rtol=1e-5
    )


def test_sinkhorn_zero_for_identical_clouds():
    mc = make_computer(["sinkhorn"], stride=4)
    rng = np.random.default_rng(1)
    cloud = rng.uniform(size=(1, 40, 2))
    out = mc(jnp.asarray(cloud), jnp.asarray(cloud))
    assert np.abs(np.asarray(out["sinkhorn"])).max() < 1e-6


def test_sinkhorn_positive_and_monotone():
    mc = make_computer(["sinkhorn"], stride=1)
    rng = np.random.default_rng(2)
    base = rng.uniform(size=(40, 2))
    shift_small = base + np.array([0.05, 0.0])
    shift_large = base + np.array([0.5, 0.0])
    out_small = mc(jnp.asarray(shift_small[None]), jnp.asarray(base[None]))
    out_large = mc(jnp.asarray(shift_large[None]), jnp.asarray(base[None]))
    s_small = float(np.asarray(out_small["sinkhorn"])[0])
    s_large = float(np.asarray(out_large["sinkhorn"])[0])
    assert s_small > -1e-6
    assert s_large > s_small
    # divergence should be close to the squared transport distance for a
    # rigid shift: 0.5^2 = 0.25
    assert abs(s_large - 0.25) < 0.05


def test_averaged_metrics():
    metrics = {
        "rollout_0": {"mse": jnp.asarray([1.0, 3.0])},
        "rollout_1": {"mse": jnp.asarray([3.0, 5.0])},
    }
    avg = averaged_metrics(metrics)
    assert avg["val/loss"] == 3.0
    assert avg["val/stdloss"] == 1.0
