"""Fused GNS message-passing kernel: parity with the standard processor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.models import GNS, make_model_fns
from lagrangebench_tpu.models.gns import fused_params_from_standard
from lagrangebench_tpu.ops import fused_mp

N, K, F = 64, 8, 32


def dense_sample(seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, N + 1, size=(N, K)).astype(np.int32)
    receivers = np.repeat(np.arange(N, dtype=np.int32)[:, None], K, axis=1)
    feats = {
        "vel_hist": jnp.asarray(rng.normal(size=(N, 10)), jnp.float32),
        "rel_disp": jnp.asarray(rng.normal(size=(N, K, 2)), jnp.float32),
        "rel_dist": jnp.asarray(rng.uniform(size=(N, K, 1)), jnp.float32),
        "senders": jnp.asarray(senders),
        "receivers": jnp.asarray(receivers),
    }
    return feats, jnp.zeros(N, jnp.int32)


def test_kernel_matches_reference():
    """Interpret-mode pallas == the pure-jax mirror."""
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.normal(size=(N, K, F)), jnp.float32)
    hs = jnp.asarray(rng.normal(size=(N, K, F)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(N, K)) > 0.3)
    p = fused_mp.init_step_params(jax.random.PRNGKey(0), F)

    e_ref, h_ref = fused_mp.gns_mp_step_reference(e, hs, hr, h, mask, p)
    e_k, h_k = fused_mp.gns_mp_step(
        e, hs, hr, h, mask, p, tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=1e-5)


def test_enc_kernel_matches_reference():
    """Encoder-fused pallas (interpret) == mirror on raw edge features."""
    rng = np.random.default_rng(2)
    fe = 3
    raw = jnp.asarray(rng.normal(size=(N, K, fe)), jnp.float32)
    hs = jnp.asarray(rng.normal(size=(N, K, F)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(N, K)) > 0.3)
    p = fused_mp.init_step_params(jax.random.PRNGKey(0), F)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    init = jax.nn.initializers.lecun_normal()
    enc = {
        "enc_w1": init(keys[0], (fe, F), jnp.float32),
        "enc_b1": jnp.zeros((F,)) + 0.1,
        "enc_w2": init(keys[1], (F, F), jnp.float32),
        "enc_b2": jnp.zeros((F,)) - 0.2,
        "enc_ln_scale": jnp.ones((F,)) * 1.1,
        "enc_ln_bias": jnp.zeros((F,)) + 0.05,
    }

    e_ref, h_ref = fused_mp.gns_mp_step_reference(raw, hs, hr, h, mask, p, enc)
    e_k, h_k = fused_mp.gns_mp_step(
        raw, hs, hr, h, mask, p, tile=16, interpret=True, enc=enc
    )
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=1e-5)

    def loss_via(fn):
        def loss(raw_, p_, enc_):
            e_out, h_out = fn(raw_, p_, enc_)
            return jnp.sum(e_out**2) + jnp.sum(h_out**2)
        return jax.grad(loss, argnums=(0, 1, 2))(raw, p, enc)

    g_ref = loss_via(
        lambda r, p_, en: fused_mp.gns_mp_step_reference(
            r, hs, hr, h, jnp.asarray(mask), p_, en)
    )
    g_k = loss_via(
        lambda r, p_, en: fused_mp.gns_mp_step(
            r, hs, hr, h, jnp.asarray(mask), p_, tile=16, interpret=True,
            enc=en)
    )
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-4
        )


def test_fused_gns_matches_standard():
    """Standard GNS and fused GNS with converted params agree (float32)."""
    feats, ptype = dense_sample()
    kwargs = dict(
        particle_dimension=2,
        latent_size=F,
        blocks_per_step=2,
        num_mp_steps=3,
        compute_dtype="float32",
    )
    std = GNS(**kwargs)
    fused = GNS(**kwargs, use_fused_processor=True)
    init_s, apply_s = make_model_fns(std)
    _, apply_f = make_model_fns(fused)

    params, state = init_s(jax.random.PRNGKey(0), (feats, ptype))
    out_s, _ = apply_s(params, state, (feats, ptype))

    params_fused = fused_params_from_standard(params, num_mp_steps=3)
    out_f, _ = apply_f(params_fused, {}, (feats, ptype))

    np.testing.assert_allclose(
        np.asarray(out_s["acc"]), np.asarray(out_f["acc"]), atol=2e-4
    )


def test_fused_padding_does_not_contribute():
    feats, ptype = dense_sample()
    model = GNS(
        particle_dimension=2, latent_size=F, blocks_per_step=2,
        num_mp_steps=2, use_fused_processor=True,
    )
    init, apply = make_model_fns(model)
    params, state = init(jax.random.PRNGKey(0), (feats, ptype))
    out1, _ = apply(params, state, (feats, ptype))

    f2 = dict(feats)
    pad = np.asarray(feats["senders"]) == N
    f2["rel_disp"] = jnp.where(jnp.asarray(pad)[..., None], 5.5, feats["rel_disp"])
    out2, _ = apply(params, state, (f2, ptype))
    np.testing.assert_allclose(
        np.asarray(out1["acc"]), np.asarray(out2["acc"]), atol=1e-5
    )


def test_train_standard_then_infer_fused(tmp_path):
    """The documented workflow: train the standard GNS, convert params,
    roll out with the fused processor — rollouts must agree."""
    import numpy as np

    from lagrangebench_tpu.case import case_builder
    from lagrangebench_tpu.data import DataLoader, H5Dataset
    from lagrangebench_tpu.evaluate import MetricsComputer, eval_rollout
    from lagrangebench_tpu.train import Trainer

    from .fixtures import make_dataset

    isl = 3
    path = make_dataset(str(tmp_path))
    data_train = H5Dataset("train", path, input_seq_length=isl)
    data_valid = H5Dataset("valid", path, input_seq_length=isl, extra_seq_length=6)
    md = data_train.metadata
    bounds = np.asarray(md["bounds"])
    case = case_builder(
        box=(bounds[:, 1] - bounds[:, 0]).tolist(),
        metadata=md,
        input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.5, "format": "dense"},
        noise_std=1e-4,
        dtype=jnp.float32,
    )
    kwargs = dict(particle_dimension=3, latent_size=8, blocks_per_step=2,
                  num_mp_steps=2)
    std = GNS(**kwargs)
    fused = GNS(**kwargs, use_fused_processor=True)
    init_s, apply_s = make_model_fns(std)
    _, apply_f = make_model_fns(fused)

    trainer = Trainer(
        (init_s, apply_s), case, data_train, data_valid,
        cfg_train={"batch_size": 2, "noise_std": 1e-4,
                   "pushforward": {"steps": [-1], "unrolls": [0], "probs": [1]}},
        cfg_eval={"n_rollout_steps": 4, "train": {"n_trajs": 1},
                  "infer": {"batch_size": 1}},
        cfg_logging={"log_steps": 10, "eval_steps": 100},
        input_seq_length=isl, seed=0,
    )
    params, state, _ = trainer.train(step_max=3)
    params_fused = fused_params_from_standard(params, num_mp_steps=2)

    def rollout_mse(apply, p):
        loader = DataLoader(data_valid, batch_size=1)
        pos, ptype = data_valid[0]
        _, nbrs = case.allocate_eval((pos[:, :isl], ptype))
        metrics = eval_rollout(
            model_apply=apply, case=case, params=p, state={},
            loader_eval=loader, neighbors=nbrs,
            metrics_computer=MetricsComputer(
                ["mse"], case.displacement, md, input_seq_length=isl),
            n_rollout_steps=4, n_trajs=1, rollout_dir=None,
        )
        return np.asarray(metrics["rollout_0"]["mse"])

    mse_std = rollout_mse(apply_s, params)
    mse_fused = rollout_mse(apply_f, params_fused)
    np.testing.assert_allclose(mse_std, mse_fused, rtol=1e-3, atol=1e-10)


def test_fused_kernel_gradients_match_reference():
    """custom-VJP (pallas-interpret forward, remat backward) grads equal the
    reference implementation's grads."""
    rng = np.random.default_rng(4)
    e = jnp.asarray(rng.normal(size=(32, K, F)), jnp.float32)
    hs = jnp.asarray(rng.normal(size=(32, K, F)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(32, F)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(32, F)), jnp.float32)
    mask = (rng.uniform(size=(32, K)) > 0.3)
    p = fused_mp.init_step_params(jax.random.PRNGKey(1), F)

    def loss_via(fn):
        def loss(e_, hs_, hr_, h_, p_):
            e_out, h_out = fn(e_, hs_, hr_, h_, p_)
            return jnp.sum(e_out**2) + jnp.sum(h_out**2)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(e, hs, hr, h, p)

    g_ref = loss_via(
        lambda *a: fused_mp.gns_mp_step_reference(*a[:4], jnp.asarray(mask), a[4])
    )
    g_fused = loss_via(
        lambda *a: fused_mp.gns_mp_step(
            *a[:4], jnp.asarray(mask), a[4], tile=16, interpret=True
        )
    )
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        # f32 accumulation order differs between the fused backward kernel
        # and XLA autodiff; agreement is to relative rounding noise
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=2e-4
        )


def test_fused_gns_trains():
    """End-to-end: gradients flow through the fused processor."""
    import optax

    feats, ptype = dense_sample()
    model = GNS(particle_dimension=2, latent_size=F, blocks_per_step=2,
                num_mp_steps=2, use_fused_processor=True)
    init, apply = make_model_fns(model)
    params, state = init(jax.random.PRNGKey(0), (feats, ptype))

    def loss(p):
        out, _ = apply(p, {}, (feats, ptype))
        return jnp.mean(out["acc"] ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    opt = optax.adam(1e-3)
    updates, _ = opt.update(grads, opt.init(params))
    new_params = optax.apply_updates(params, updates)
    assert np.isfinite(float(loss(new_params)))


def test_pick_tile_enc_affine_cap():
    """The enc-variant tile cap follows the MEASURED VMEM admissibility
    boundary (scripts/experiments/fused_tile_vmem_probe.py): a pure
    row-budget over-admits at large K (k=36 tile 120 compiles to 17.86M
    scoped VMEM against the 16M limit on v5e)."""
    from lagrangebench_tpu.ops.fused_mp import _pick_tile

    # k=36: row budget alone would give 120 (OOM); affine cap -> <= 104
    assert _pick_tile(150000, 36, 128, row_budget=4400) == 120
    assert (
        _pick_tile(150000, 36, 128, row_budget=4400, affine_cap=True) <= 104
    )
    # k=24: boundary measured at 176 (200 OOMs at 64k+ rows) — the affine
    # cap must not shrink the known-good pick
    t24 = _pick_tile(64000, 24, 200, row_budget=4400, affine_cap=True)
    assert t24 <= 176
    assert t24 >= 128
    # headline 8k config unchanged by the cap
    assert _pick_tile(8000, 24, 200, row_budget=4400, affine_cap=True) == (
        _pick_tile(8000, 24, 200, row_budget=4400)
    )
