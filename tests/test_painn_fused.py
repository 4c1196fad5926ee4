"""Fused PaiNN layer kernel: parity with the standard dense path."""

import jax
import jax.numpy as jnp
import numpy as np

from lagrangebench_tpu.models.painn import (
    PaiNN,
    painn_fused_params_from_standard,
)
from lagrangebench_tpu.ops import painn_msg

N, K, DIM, H, L = 64, 8, 2, 32, 3


def dense_sample(seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, N + 1, size=(N, K)).astype(np.int32)
    n_vels = 3
    vel_hist = rng.normal(size=(N, n_vels * DIM)).astype(np.float32) * 0.1
    feats = {
        "vel_hist": jnp.asarray(vel_hist),
        "vel_mag": jnp.asarray(
            np.linalg.norm(vel_hist.reshape(N, n_vels, DIM), axis=-1)
        ),
        "rel_disp": jnp.asarray(
            rng.normal(size=(N, K, DIM)).astype(np.float32) * 0.5
        ),
        "senders": jnp.asarray(senders),
        "receivers": jnp.asarray(
            np.repeat(np.arange(N, dtype=np.int32)[:, None], K, axis=1)
        ),
    }
    return feats, jnp.zeros(N, jnp.int32), n_vels


def test_fused_layer_kernel_matches_mirror():
    rng = np.random.default_rng(1)
    r = 5
    gw = (2 + DIM) * H
    g = jnp.asarray(rng.normal(size=(N, K, gw)), jnp.float32)
    phi = jnp.asarray(
        np.concatenate(
            [
                rng.normal(size=(N, K, r)),
                rng.uniform(size=(N, K, 1)),  # scale column in [0, 1]
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    nd = jnp.asarray(rng.normal(size=(N, K, DIM)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, DIM * H)), jnp.float32)
    p = {
        "filt_w": jnp.asarray(rng.normal(size=(r, 3 * H)) * 0.1, jnp.float32),
        "filt_b": jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32),
        "vmix_w": jnp.asarray(rng.normal(size=(H, 2 * H)) * 0.1, jnp.float32),
        "mix_w1": jnp.asarray(rng.normal(size=(2 * H, H)) * 0.1, jnp.float32),
        "mix_b1": jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32),
        "mix_w2": jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.1, jnp.float32),
        "mix_b2": jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.float32),
    }
    s_ref, v_ref = painn_msg.painn_layer_reference(g, phi, nd, s, v, p)
    s_k, v_k = painn_msg._painn_layer_pallas(g, phi, nd, s, v, p,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref), atol=2e-5)


def test_fused_painn_matches_standard():
    """Standard params -> converter -> fused model == standard model."""
    feats, ptype, n_vels = dense_sample()
    kw = dict(
        hidden_size=H, output_size=1, num_mp_steps=L, n_rbf=5,
        radius=1.0, n_vels=n_vels,
    )
    std = PaiNN(**kw)
    fused = PaiNN(**kw, use_fused_layer=True)
    params = std.init(jax.random.PRNGKey(0), (feats, ptype))["params"]
    out_std = std.apply({"params": params}, (feats, ptype))
    fused_params = painn_fused_params_from_standard(params, L)
    out_fused = fused.apply({"params": fused_params}, (feats, ptype))
    np.testing.assert_allclose(
        np.asarray(out_fused["acc"]), np.asarray(out_std["acc"]),
        rtol=1e-5, atol=1e-5,
    )
    # the fused tree matches what the fused model initializes
    init_fused = fused.init(jax.random.PRNGKey(0), (feats, ptype))["params"]
    assert jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, init_fused)
    ) == jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, fused_params)
    )


def test_fused_painn_grads_flow():
    feats, ptype, n_vels = dense_sample(2)
    fused = PaiNN(
        hidden_size=H, output_size=1, num_mp_steps=2, n_rbf=5,
        radius=1.0, n_vels=n_vels, use_fused_layer=True,
    )
    params = fused.init(jax.random.PRNGKey(1), (feats, ptype))["params"]

    def loss(p):
        out = fused.apply({"params": p}, (feats, ptype))
        return jnp.sum(out["acc"] ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the layer parameters receive nonzero gradients
    g0 = grads["PaiNNLayer_0"]
    assert float(jnp.abs(g0["mix_w1"]).max()) > 0
    assert float(jnp.abs(g0["vmix_w"]).max()) > 0


def test_ensure_fused_params_painn_roundtrip():
    """The runner's auto-conversion hook recognizes a standard-layout
    PaiNN tree under a fused config (and leaves a fused tree alone)."""
    from lagrangebench_tpu.config import Config
    from lagrangebench_tpu.models import ensure_fused_params

    feats, ptype, n_vels = dense_sample()
    kw = dict(
        hidden_size=H, output_size=1, num_mp_steps=L, n_rbf=5,
        radius=1.0, n_vels=n_vels,
    )
    std_params = PaiNN(**kw).init(jax.random.PRNGKey(0), (feats, ptype))[
        "params"
    ]
    fused = PaiNN(**kw, use_fused_layer=True)
    cfg = Config({
        "name": "painn", "fused_processor": True, "num_mp_steps": L,
    })

    converted = ensure_fused_params(dict(std_params), cfg)
    out_conv = fused.apply({"params": converted}, (feats, ptype))
    out_std = PaiNN(**kw).apply({"params": std_params}, (feats, ptype))
    np.testing.assert_allclose(
        np.asarray(out_conv["acc"]), np.asarray(out_std["acc"]),
        rtol=1e-5, atol=1e-5,
    )

    # already-fused trees pass through unchanged
    again = ensure_fused_params(converted, cfg)
    assert again is converted

    # fused_processor off: no conversion
    cfg_off = Config({"name": "painn", "fused_processor": False,
                      "num_mp_steps": L})
    assert ensure_fused_params(std_params, cfg_off) is std_params
