"""Model forward-pass tests: shapes, padding behavior, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.models import GNS, Linear, make_model_fns
from lagrangebench_tpu.utils import NodeType


def dummy_sample(n=32, e=128, dim=2, isl=6, seed=0, pad_edges=0, dtype=jnp.float32):
    """Random FeatureDict + particle types; last `pad_edges` edges padded."""
    rng = np.random.default_rng(seed)
    k = isl - 1
    receivers = rng.integers(0, n, size=e)
    senders = rng.integers(0, n, size=e)
    receivers = np.sort(receivers)
    if pad_edges:
        receivers[-pad_edges:] = n
        senders[-pad_edges:] = n
    features = {
        "abs_pos": jnp.asarray(rng.uniform(size=(n, isl, dim)), dtype),
        "vel_hist": jnp.asarray(rng.normal(size=(n, k * dim)), dtype),
        "rel_disp": jnp.asarray(rng.normal(size=(e, dim)), dtype),
        "rel_dist": jnp.asarray(rng.uniform(size=(e, 1)), dtype),
        "receivers": jnp.asarray(receivers, jnp.int32),
        "senders": jnp.asarray(senders, jnp.int32),
    }
    ptype = jnp.zeros(n, jnp.int32)
    return features, ptype


def test_gns_forward_shapes():
    features, ptype = dummy_sample(n=24, e=96, dim=2)
    model = GNS(particle_dimension=2, latent_size=16, blocks_per_step=2, num_mp_steps=2)
    init, apply = make_model_fns(model)
    key = jax.random.PRNGKey(0)
    params, state = init(key, (features, ptype))
    out, state = apply(params, state, (features, ptype))
    assert out["acc"].shape == (24, 2)
    assert jnp.isfinite(out["acc"]).all()


def test_gns_padded_edges_do_not_contribute():
    """Replacing padded-edge junk must not change the output."""
    features, ptype = dummy_sample(n=24, e=96, dim=2, pad_edges=16)
    model = GNS(particle_dimension=2, latent_size=16, blocks_per_step=2, num_mp_steps=2)
    init, apply = make_model_fns(model)
    params, state = init(jax.random.PRNGKey(0), (features, ptype))
    out1, _ = apply(params, state, (features, ptype))

    f2 = dict(features)
    f2["rel_disp"] = f2["rel_disp"].at[-16:].set(7.7)
    f2["rel_dist"] = f2["rel_dist"].at[-16:].set(3.3)
    out2, _ = apply(params, state, (f2, ptype))
    np.testing.assert_allclose(
        np.asarray(out1["acc"]), np.asarray(out2["acc"]), atol=1e-6
    )


def test_gns_padding_particle_type_embeds():
    """PAD (-1) particle types must not produce NaNs (wrap to last row)."""
    features, ptype = dummy_sample(n=24, e=96, dim=2)
    ptype = ptype.at[-4:].set(NodeType.PAD_VALUE)
    model = GNS(particle_dimension=2, latent_size=16, blocks_per_step=2, num_mp_steps=2)
    init, apply = make_model_fns(model)
    params, state = init(jax.random.PRNGKey(0), (features, ptype))
    out, _ = apply(params, state, (features, ptype))
    assert jnp.isfinite(out["acc"]).all()


def test_gns_num_params_scale():
    """GNS-10-128 lands at ~1.2M parameters like the reference table."""
    from lagrangebench_tpu.utils import get_num_params

    features, ptype = dummy_sample(n=16, e=64, dim=3, isl=6)
    model = GNS(particle_dimension=3, latent_size=128, blocks_per_step=2, num_mp_steps=10)
    init, _ = make_model_fns(model)
    params, _ = init(jax.random.PRNGKey(0), (features, ptype))
    n = get_num_params(params)
    assert 1.0e6 < n < 1.4e6, n


def test_linear_forward():
    features, ptype = dummy_sample(n=24, e=96, dim=2)
    model = Linear(dimension_out=2)
    init, apply = make_model_fns(model)
    params, state = init(jax.random.PRNGKey(0), (features, ptype))
    out, _ = apply(params, state, (features, ptype))
    assert out["acc"].shape == (24, 2)


def test_features_2d_to_3d_dense_layout():
    """The 2D->3D lift must handle both sparse (E, 2) and dense (N, K, 2)
    rel_disp layouts (SEGNN on 2D datasets defaults to dense)."""
    import jax.numpy as jnp
    import numpy as np

    from lagrangebench_tpu.models.utils import features_2d_to_3d

    rng = np.random.default_rng(0)
    base = {
        "vel_hist": jnp.asarray(rng.normal(size=(5, 6)), jnp.float32),
        "rel_dist": jnp.asarray(rng.uniform(size=(5, 4, 1)), jnp.float32),
    }
    dense = dict(base, rel_disp=jnp.asarray(rng.normal(size=(5, 4, 2)), jnp.float32))
    out = features_2d_to_3d(dense)
    assert out["rel_disp"].shape == (5, 4, 3)
    assert np.allclose(np.asarray(out["rel_disp"][..., 2]), 0.0)

    sparse = dict(base, rel_disp=jnp.asarray(rng.normal(size=(20, 2)), jnp.float32))
    out = features_2d_to_3d(sparse)
    assert out["rel_disp"].shape == (20, 3)
    assert out["vel_hist"].shape == (5, 9)


def test_painn_message_kernel_matches_mirror():
    """Interpret-mode fused PaiNN message kernel == the pure-jax mirror,
    values and (custom-VJP) gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lagrangebench_tpu.ops.painn_msg import (
        painn_message,
        painn_message_reference,
    )

    n, k, h, dim = 48, 8, 32, 2
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(n, k, (3 + dim) * h)), jnp.float32)
    wij = jnp.asarray(rng.normal(size=(n, k, 3 * h)), jnp.float32)
    nd = jnp.asarray(rng.normal(size=(n, k, dim)), jnp.float32)

    ds_r, dv_r = painn_message_reference(g, wij, nd, h)
    ds_k, dv_k = painn_message(g, wij, nd, h, interpret=True)
    np.testing.assert_allclose(np.asarray(ds_k), np.asarray(ds_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_r), atol=1e-5)

    def loss_via(fn):
        def loss(g_, w_, n_):
            a, b = fn(g_, w_, n_)
            return jnp.sum(a**2) + jnp.sum(b**2)
        return jax.grad(loss, argnums=(0, 1, 2))(g, wij, nd)

    g_ref = loss_via(lambda *a: painn_message_reference(*a, h))
    g_k = loss_via(lambda *a: painn_message(*a, h, interpret=True))
    for a, b in zip(g_ref, g_k):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4
        )


def test_gns_fused_standard_roundtrip():
    """standard -> fused -> standard is the identity (the spatial trainer
    checkpoints through this inverse)."""
    import jax
    import numpy as np
    from lagrangebench_tpu.models import GNS, make_model_fns
    from lagrangebench_tpu.models.gns import (
        fused_params_from_standard,
        standard_params_from_fused,
    )

    n, e, dim, mp = 12, 40, 3, 3
    model = GNS(particle_dimension=dim, latent_size=16, num_mp_steps=mp)
    init, _ = make_model_fns(model)
    feats = {
        "vel_hist": jnp.zeros((n, 2 * dim)),
        "rel_disp": jnp.zeros((e, dim)),
        "rel_dist": jnp.zeros((e, 1)),
        "senders": jnp.zeros((e,), jnp.int32),
        "receivers": jnp.zeros((e,), jnp.int32),
    }
    params, _ = init(jax.random.PRNGKey(0), (feats, jnp.zeros((n,), jnp.int32)))
    back = standard_params_from_fused(
        fused_params_from_standard(params, mp), mp
    )
    fa = {str(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(params)[0]}
    fb = {str(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])


def test_painn_fused_standard_roundtrip():
    import jax
    import numpy as np
    from lagrangebench_tpu.models import make_model_fns
    from lagrangebench_tpu.models.painn import (
        PaiNN,
        painn_fused_params_from_standard,
        painn_standard_params_from_fused,
    )

    n, e, dim, mp, nv = 12, 40, 3, 2, 3
    model = PaiNN(hidden_size=16, output_size=1, num_mp_steps=mp,
                  n_rbf=5, radius=1.5, n_vels=nv)
    init, _ = make_model_fns(model)
    feats = {
        "vel_hist": jnp.zeros((n, nv * dim)),
        "vel_mag": jnp.zeros((n, nv)),
        "rel_disp": jnp.zeros((e, dim)),
        "senders": jnp.zeros((e,), jnp.int32),
        "receivers": jnp.zeros((e,), jnp.int32),
    }
    params, _ = init(jax.random.PRNGKey(1), (feats, jnp.zeros((n,), jnp.int32)))
    back = painn_standard_params_from_fused(
        painn_fused_params_from_standard(params, mp), mp
    )
    fa = {str(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(params)[0]}
    fb = {str(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
