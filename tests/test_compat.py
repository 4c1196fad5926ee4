"""Haiku-checkpoint import parity.

Builds a checkpoint in the reference's exact ``save_haiku`` on-disk layout
(reference lagrangebench/utils.py:50-110) from a *genuine haiku* model whose
module structure mirrors the reference GNS (reference
lagrangebench/models/gns.py:64-208 + build_mlp, models/utils.py:100-115 —
hk.Embed + hk.nets.MLP(name="MLP") + hk.LayerNorm in the same creation
order, jraph.GraphNetwork replaced by its explicit gather/segment-sum
algebra). The test then imports it with ``lagrangebench_tpu.compat`` and
checks the flax GNS produces identical forward outputs — proving both the
name mapping and the decomposed edge-MLP algebra.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hk = pytest.importorskip("haiku")

from lagrangebench_tpu.compat import (
    haiku_gns_to_flax,
    is_haiku_checkpoint,
    load_haiku_pytree,
    load_reference_checkpoint,
)
from lagrangebench_tpu.models import GNS, make_model_fns

LATENT = 32
MP_STEPS = 2
N, E, DIM = 40, 160, 3


def _build_mlp(latent, out, n_layers, is_layer_norm=True):
    """Reference build_mlp semantics (models/utils.py:100-115)."""
    net = hk.nets.MLP(
        [latent] * (n_layers - 1) + [out], activate_final=False, name="MLP"
    )
    if is_layer_norm:
        ln = hk.LayerNorm(axis=-1, create_scale=True, create_offset=True)
        return hk.Sequential([net, ln])
    return net


class _HaikuGNS(hk.Module):
    """Reference-structured haiku GNS: same class name, same methods
    (_encoder/_processor/_decoder), same module creation order — so haiku
    assigns the same parameter paths as the reference model
    (reference models/gns.py:64-208)."""

    def __init__(self):
        super().__init__(name="gns")
        self._embedding = hk.Embed(9, 16)

    def _encoder(self, h, e):
        return (
            _build_mlp(LATENT, LATENT, 2)(h),
            _build_mlp(LATENT, LATENT, 2)(e),
        )

    def _processor(self, h, e, senders, receivers):
        n = h.shape[0]
        for _ in range(MP_STEPS):
            # jraph.GraphNetwork semantics: edge update from old nodes,
            # segment-sum to receivers, node update, residuals
            msg_in = jnp.concatenate([h[senders], h[receivers], e], axis=-1)
            messages = _build_mlp(LATENT, LATENT, 2)(msg_in)
            agg = jax.ops.segment_sum(messages, receivers, num_segments=n)
            h_new = _build_mlp(LATENT, LATENT, 2)(
                jnp.concatenate([h, agg], axis=-1)
            )
            h = h + h_new
            e = e + messages
        return h, e

    def _decoder(self, h):
        return _build_mlp(LATENT, DIM, 2, is_layer_norm=False)(h)

    def __call__(self, nodes, edges, senders, receivers, particle_type):
        nodes = jnp.concatenate(
            [nodes, self._embedding(particle_type)], axis=-1
        )
        h, e = self._encoder(nodes, edges)
        h, e = self._processor(h, e, senders, receivers)
        return self._decoder(h)


def _save_haiku_layout(ckp_dir, params):
    """Write the reference on-disk layout (utils.py:50-68)."""
    os.makedirs(ckp_dir, exist_ok=True)
    with open(os.path.join(ckp_dir, "params_array.npy"), "wb") as f:
        for x in jax.tree.leaves(params):
            np.save(f, np.asarray(x), allow_pickle=False)
    skeleton = jax.tree.map(lambda t: 0, params)
    with open(os.path.join(ckp_dir, "params_tree.pkl"), "wb") as f:
        pickle.dump(skeleton, f)
    with open(os.path.join(ckp_dir, "state_array.npy"), "wb") as f:
        pass
    with open(os.path.join(ckp_dir, "state_tree.pkl"), "wb") as f:
        pickle.dump({}, f)
    import json

    with open(os.path.join(ckp_dir, "metadata_ckp.json"), "w") as f:
        json.dump({"step": 7, "loss": 0.1}, f)


@pytest.fixture(scope="module")
def haiku_setup():
    rng = np.random.default_rng(0)
    vel_hist = jnp.asarray(rng.normal(size=(N, 2 * DIM)), jnp.float32)
    rel_disp = jnp.asarray(rng.normal(size=(E, DIM)), jnp.float32) * 0.3
    rel_dist = jnp.linalg.norm(rel_disp, axis=-1, keepdims=True)
    senders = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    ptype = jnp.zeros((N,), jnp.int32)

    def fwd(nodes, edges, s, r, t):
        return _HaikuGNS()(nodes, edges, s, r, t)

    model = hk.without_apply_rng(hk.transform(fwd))
    nodes_in = vel_hist
    edges_in = jnp.concatenate([rel_disp, rel_dist], axis=-1)
    hk_params = model.init(
        jax.random.PRNGKey(0), nodes_in, edges_in, senders, receivers, ptype
    )
    out_ref = model.apply(hk_params, nodes_in, edges_in, senders, receivers, ptype)
    features = {
        "vel_hist": vel_hist,
        "rel_disp": rel_disp,
        "rel_dist": rel_dist,
        "senders": senders,
        "receivers": receivers,
    }
    return hk_params, features, ptype, out_ref


def test_haiku_module_names_match_expected(haiku_setup):
    """The mapping in compat.py assumes these exact module paths."""
    hk_params = haiku_setup[0]
    names = set(hk_params)
    assert "gns/~/embed" in names
    assert "gns/~_encoder/MLP/~/linear_0" in names
    assert "gns/~_encoder/layer_norm" in names
    assert "gns/~_decoder/MLP/~/linear_1" in names
    assert f"gns/~_processor/MLP_{2 * MP_STEPS - 1}/~/linear_0" in names
    # edge MLP first layer concatenates [h_s, h_r, e]
    w0 = hk_params["gns/~_processor/MLP/~/linear_0"]["w"]
    assert w0.shape == (3 * LATENT, LATENT)


def test_roundtrip_and_forward_parity(haiku_setup, tmp_path):
    hk_params, features, ptype, out_ref = haiku_setup
    ckp = str(tmp_path / "ref_ckp")
    _save_haiku_layout(ckp, hk_params)
    assert is_haiku_checkpoint(ckp)

    loaded = load_haiku_pytree(ckp, "params")
    ref_leaves = {
        str(p): np.asarray(a)
        for p, a in jax.tree_util.tree_flatten_with_path(hk_params)[0]
    }
    got_leaves = {
        str(p): np.asarray(a)
        for p, a in jax.tree_util.tree_flatten_with_path(loaded)[0]
    }
    assert set(ref_leaves) == set(got_leaves)
    for k in ref_leaves:
        np.testing.assert_array_equal(ref_leaves[k], got_leaves[k])

    params, state, step = load_reference_checkpoint(
        ckp, "gns", {"num_mp_steps": MP_STEPS}
    )
    assert step == 7

    model = GNS(particle_dimension=DIM, latent_size=LATENT,
                num_mp_steps=MP_STEPS)
    _, apply_fn = make_model_fns(model)
    out, _ = apply_fn(params, state, (features, ptype))
    np.testing.assert_allclose(
        np.asarray(out["acc"]), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )
