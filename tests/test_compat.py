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
    flax_egnn_to_haiku,
    flax_gns_to_haiku,
    flax_linear_to_haiku,
    flax_painn_to_haiku,
    haiku_gns_to_flax,
    haiku_linear_to_flax,
    is_haiku_checkpoint,
    load_haiku_pytree,
    load_reference_checkpoint,
    save_reference_checkpoint,
)
from lagrangebench_tpu.models import GNS, make_model_fns


def _assert_pytrees_equal(a, b):
    """Exact (bitwise) pytree equality, keys and arrays."""
    fa = {str(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(a)[0]}
    fb = {str(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])

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


# ---------------------------------------------------------------------------
# EGNN replica (reference models/egnn.py:25-206 structure: layer modules
# created inside EGNN.__call__, correction heads as __init__-time Sequentials)
# ---------------------------------------------------------------------------

def _xav():
    return hk.initializers.VarianceScaling(1.0, "fan_avg", "uniform")


class _HaikuEGNNLayer(hk.Module):
    def __init__(self, layer_num, hidden, act=jax.nn.silu, dt=0.001):
        super().__init__(f"layer_{layer_num}")
        self._act = act
        self._edge_mlp = hk.nets.MLP(
            [hidden, hidden], w_init=_xav(), activation=act, activate_final=True
        )
        self._node_mlp = hk.nets.MLP(
            [hidden, hidden], w_init=_xav(), activation=act, activate_final=False
        )
        self._pos_correction_mlp = hk.Sequential(
            [hk.Linear(hidden, w_init=_xav()), act,
             hk.Linear(1, with_bias=False,
                       w_init=hk.initializers.UniformScaling(dt))]
        )
        self._vel_correction_mlp = hk.Sequential(
            [hk.Linear(hidden, w_init=_xav()), act,
             hk.Linear(1, with_bias=False,
                       w_init=hk.initializers.UniformScaling(dt))]
        )


class _HaikuEGNN(hk.Module):
    """Reference EGNN forward algebra (egnn.py:119-206,371-400) with
    jraph.GraphNetwork expanded to gathers + segment sums; free space."""

    def __init__(self, hidden, n_layers):
        super().__init__("egnn")
        self._hidden, self._n_layers = hidden, n_layers

    def __call__(self, vel_hist, pos, senders, receivers, edge_attr):
        n, n_vels = vel_hist.shape[0], vel_hist.shape[1]
        node_feats = jnp.concatenate(
            [jnp.sqrt(jnp.sum(vel_hist[:, i] ** 2, -1, keepdims=True))
             for i in range(n_vels)], axis=-1
        )
        h = hk.Linear(self._hidden, w_init=_xav(), name="scalar_emb")(node_feats)
        prev_vel = vel_hist[:, -1]
        next_pos = pos
        for k in range(self._n_layers):
            lyr = _HaikuEGNNLayer(k, self._hidden)
            coord_diff = next_pos[senders] - next_pos[receivers]
            radial = jnp.sum(coord_diff**2, -1, keepdims=True)
            msg = lyr._edge_mlp(
                jnp.concatenate([h[senders], h[receivers], radial, edge_attr], -1)
            )
            agg = jax.ops.segment_sum(msg, receivers, num_segments=n)
            h = h + lyr._node_mlp(jnp.concatenate([h, agg], -1))
            trans = coord_diff * lyr._pos_correction_mlp(msg)
            next_pos = next_pos + jax.ops.segment_sum(trans, senders, num_segments=n)
            next_pos = next_pos + lyr._vel_correction_mlp(h) * prev_vel
        next_vel = next_pos - pos
        return {"pos": next_pos, "vel": next_vel, "acc": next_vel - prev_vel}


def test_egnn_import_forward_parity(tmp_path):
    from lagrangebench_tpu.models.egnn import EGNN
    from lagrangebench_tpu.ops import space

    rng = np.random.default_rng(1)
    n_vels = 2
    vel_hist = jnp.asarray(rng.normal(size=(N, n_vels, DIM)), jnp.float32) * 0.1
    pos = jnp.asarray(rng.uniform(size=(N, DIM)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    edge_attr = jnp.asarray(abs(rng.normal(size=(E, 1))), jnp.float32)

    def fwd(vh, p, s, r, ea):
        return _HaikuEGNN(LATENT, MP_STEPS)(vh, p, s, r, ea)

    model = hk.without_apply_rng(hk.transform(fwd))
    hk_params = model.init(
        jax.random.PRNGKey(1), vel_hist, pos, senders, receivers, edge_attr
    )
    out_ref = model.apply(hk_params, vel_hist, pos, senders, receivers, edge_attr)

    ckp = str(tmp_path / "egnn_ckp")
    _save_haiku_layout(ckp, hk_params)
    params, _, _ = load_reference_checkpoint(
        ckp, "egnn", {"num_mp_steps": MP_STEPS}
    )
    # export is the exact inverse of import (bitwise, against genuine haiku)
    _assert_pytrees_equal(flax_egnn_to_haiku(params, MP_STEPS), hk_params)

    disp, shift = space.free()
    flax_model = EGNN(
        hidden_size=LATENT, output_size=1, dt=0.01, n_vels=n_vels,
        displacement_fn=disp, shift_fn=shift,
        velocity_stats={"mean": jnp.zeros(()), "std": jnp.ones(())},
        num_mp_steps=MP_STEPS,
    )
    features = {
        "vel_hist": vel_hist.reshape(N, n_vels * DIM),
        "abs_pos": pos[:, None],
        "rel_dist": edge_attr,
        "senders": senders,
        "receivers": receivers,
    }
    out = flax_model.apply(
        {"params": params}, (features, jnp.zeros((N,), jnp.int32))
    )
    for k in ("pos", "vel", "acc"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_ref[k]), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# PaiNN replica (reference models/painn.py:35-522 structure: RBF params at
# the transform root, layers created in __init__, readout blocks in __call__)
# ---------------------------------------------------------------------------

def _hk_lin(o, with_bias=True, name=None):
    return hk.Linear(o, with_bias=with_bias, w_init=_xav(), name=name)


def _hk_gaussian_rbf(n_rbf, cutoff):
    """reference painn.py:106-146, trainable=True path"""
    offset = jnp.linspace(0.0, cutoff, n_rbf)
    width = jnp.abs(cutoff - 0.0) / n_rbf * jnp.ones_like(offset)
    widths = hk.get_parameter("widths", width.shape, width.dtype,
                              init=lambda *_: width)
    offsets = hk.get_parameter("offset", offset.shape, offset.dtype,
                               init=lambda *_: offset)

    def _rbf(x):
        return jnp.exp(-0.5 / widths**2 * (x[..., None] - offsets) ** 2)

    return _rbf


class _HaikuGEB(hk.Module):
    """reference painn.py:35-103"""

    def __init__(self, hidden, sout, vout, name):
        super().__init__(name)
        self._s, self._v = sout, vout
        self.vector_mix_net = _hk_lin(2 * vout, with_bias=False,
                                      name="vector_mix_net")
        self.gate_block = hk.Sequential(
            [_hk_lin(hidden), jax.nn.silu, _hk_lin(sout + vout)],
            name="scalar_gate_net",
        )

    def __call__(self, s, v):
        v_l, v_r = jnp.split(self.vector_mix_net(v), 2, axis=-1)
        v_r_norm = jnp.sqrt(jnp.sum(v_r**2, axis=-2) + 1e-8)
        gs = jnp.concatenate([s, v_r_norm], axis=-1)
        s, _, v_gate = jnp.split(self.gate_block(gs), [self._s, self._v], -1)
        return s, v_l * v_gate[:, None]


class _HaikuPaiNNLayer(hk.Module):
    """reference painn.py:223-352 (blocks=2)"""

    def __init__(self, hidden, layer_num):
        super().__init__(f"layer_{layer_num}")
        act = jax.nn.silu
        self.interaction_block = hk.Sequential(
            [_hk_lin(hidden), act, _hk_lin(3 * hidden)], name="interaction_block"
        )
        self.mixing_block = hk.Sequential(
            [_hk_lin(hidden), act, _hk_lin(3 * hidden)], name="mixing_block"
        )
        self.vector_mixing_block = _hk_lin(
            2 * hidden, with_bias=False, name="vector_mixing_block"
        )

    def __call__(self, s, v, dir_ij, Wij, senders, receivers):
        n = s.shape[0]
        x = self.interaction_block(s)
        ds, dv1, dv2 = jnp.split(Wij * x[receivers], 3, axis=-1)
        dv = dv1 * dir_ij[..., None] + dv2 * v[receivers]
        s = s + jnp.clip(jax.ops.segment_sum(ds, senders, n), -1e2, 1e2)
        v = v + jnp.clip(jax.ops.segment_sum(dv, senders, n), -1e2, 1e2)
        v_l, v_r = jnp.split(self.vector_mixing_block(v), 2, axis=-1)
        v_norm = jnp.sqrt(jnp.sum(v_r**2, axis=-2, keepdims=True) + 1e-8)
        ts = jnp.concatenate([s, v_norm], axis=-1)
        ds, dv, dsv = jnp.split(self.mixing_block(ts), 3, axis=-1)
        s = s + jnp.clip(ds + dsv * jnp.sum(v_r * v_l, axis=1, keepdims=True),
                         -1e2, 1e2)
        v = v + jnp.clip(v_l * dv, -1e2, 1e2)
        return s, v


class _HaikuPaiNN(hk.Module):
    """reference painn.py:355-522"""

    def __init__(self, hidden, n_layers, rbf, cutoff):
        super().__init__("painn")
        self._hidden, self._n_layers = hidden, n_layers
        self.radial_basis_fn, self._cutoff = rbf, cutoff
        self.scalar_emb = _hk_lin(hidden, name="scalar_embedding")
        self.vector_emb = _hk_lin(hidden, with_bias=False,
                                  name="vector_embedding")
        self.filter_net = _hk_lin(n_layers * 3 * hidden, name="filter_net")
        self.layers = [_HaikuPaiNNLayer(hidden, i) for i in range(n_layers)]

    def __call__(self, s0, v0, rel_disp, senders, receivers):
        norm_ij = jnp.sqrt(jnp.sum(rel_disp**2, axis=1, keepdims=True) + 1e-8)
        dir_ij = rel_disp / (norm_ij + 1e-8)
        phi_ij = self.radial_basis_fn(norm_ij)
        cuts = 0.5 * (jnp.cos(norm_ij * jnp.pi / self._cutoff) + 1.0)
        cut = cuts * jnp.array(norm_ij < self._cutoff, dtype=jnp.float32)
        filters = self.filter_net(phi_ij) * cut[:, None]
        filter_list = jnp.split(filters, self._n_layers, axis=-1)
        s = self.scalar_emb(s0)[:, None]
        v = self.vector_emb(v0)
        for k, layer in enumerate(self.layers):
            s, v = layer(s, v, dir_ij, filter_list[k], senders, receivers)
        s = jnp.squeeze(s)
        h2 = self._hidden // 2
        s, v = _HaikuGEB(self._hidden, h2, h2, name="readout_block_0")(s, v)
        s, v = _HaikuGEB(h2, 1, 1, name="readout_block_out")(s, v)
        return jnp.squeeze(v)


def test_painn_import_forward_parity(tmp_path):
    from lagrangebench_tpu.models.painn import PaiNN

    rng = np.random.default_rng(2)
    n_vels, n_rbf, radius = 2, 5, 0.3
    vel_hist = jnp.asarray(rng.normal(size=(N, n_vels, DIM)), jnp.float32) * 0.1
    vel_mag = jnp.sqrt(jnp.sum(vel_hist**2, axis=-1))
    rel_disp = jnp.asarray(rng.normal(size=(E, DIM)), jnp.float32) * 0.1
    senders = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    receivers = jnp.asarray(rng.integers(0, N, size=(E,)), jnp.int32)
    v0 = vel_hist.transpose(0, 2, 1)  # (N, dim, n_vels)

    def fwd(s0, v0, rd, se, re):
        rbf = _hk_gaussian_rbf(n_rbf, radius)  # root-level params, as in
        return _HaikuPaiNN(LATENT, MP_STEPS, rbf, radius)(s0, v0, rd, se, re)

    model = hk.without_apply_rng(hk.transform(fwd))
    hk_params = model.init(
        jax.random.PRNGKey(2), vel_mag, v0, rel_disp, senders, receivers
    )
    assert "~" in hk_params  # RBF params live at the transform root
    out_ref = model.apply(hk_params, vel_mag, v0, rel_disp, senders, receivers)

    ckp = str(tmp_path / "painn_ckp")
    _save_haiku_layout(ckp, hk_params)
    params, _, _ = load_reference_checkpoint(
        ckp, "painn", {"num_mp_steps": MP_STEPS}
    )
    # export is the exact inverse of import (bitwise, against genuine haiku)
    _assert_pytrees_equal(flax_painn_to_haiku(params, MP_STEPS), hk_params)

    flax_model = PaiNN(
        hidden_size=LATENT, output_size=1, num_mp_steps=MP_STEPS,
        n_rbf=n_rbf, radius=radius, n_vels=n_vels,
    )
    features = {
        "vel_hist": vel_hist.reshape(N, n_vels * DIM),
        "vel_mag": vel_mag,
        "rel_disp": rel_disp,
        "senders": senders,
        "receivers": receivers,
    }
    out = flax_model.apply(
        {"params": params}, (features, jnp.zeros((N,), jnp.int32))
    )
    np.testing.assert_allclose(
        np.asarray(out["acc"]), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )


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
    # export is the exact inverse of import (bitwise, against genuine haiku)
    _assert_pytrees_equal(flax_gns_to_haiku(params, MP_STEPS), hk_params)


def test_export_reference_checkpoint_on_disk(haiku_setup, tmp_path):
    """`save_reference_checkpoint` writes a directory the reference's
    `load_haiku` can read (params/state leaf streams + pickled skeletons +
    opt_state.pkl + metadata_ckp.json — reference utils.py:100-128), and
    re-importing it restores the flax params bit-exactly."""
    hk_params = haiku_setup[0]
    params = haiku_gns_to_flax(hk_params, MP_STEPS)

    ckp = str(tmp_path / "export_ckp")
    save_reference_checkpoint(
        ckp, "gns", params, {"num_mp_steps": MP_STEPS}, step=11, loss=0.5
    )
    for fname in ("params_array.npy", "params_tree.pkl", "state_array.npy",
                  "state_tree.pkl", "opt_state.pkl", "metadata_ckp.json"):
        assert os.path.exists(os.path.join(ckp, fname)), fname
    assert is_haiku_checkpoint(ckp)

    # the exported haiku tree matches the genuine one bitwise
    _assert_pytrees_equal(load_haiku_pytree(ckp, "params"), hk_params)
    assert load_haiku_pytree(ckp, "state") == {}

    # and re-importing restores the flax params exactly
    params2, _, step = load_reference_checkpoint(
        ckp, "gns", {"num_mp_steps": MP_STEPS}
    )
    assert step == 11
    _assert_pytrees_equal(params2, params)


def test_export_accepts_fused_layout(haiku_setup, tmp_path):
    """Checkpoints trained with model.fused_processor store fused-layout
    GNS params; the exporter re-layouts them via the exact inverse before
    the haiku mapping."""
    from lagrangebench_tpu.models.gns import fused_params_from_standard

    hk_params = haiku_setup[0]
    std = haiku_gns_to_flax(hk_params, MP_STEPS)
    fused = fused_params_from_standard(std, MP_STEPS)

    ckp = str(tmp_path / "fused_export")
    save_reference_checkpoint(
        ckp, "gns", fused, {"num_mp_steps": MP_STEPS}
    )
    _assert_pytrees_equal(load_haiku_pytree(ckp, "params"), hk_params)


def test_linear_export_roundtrip():
    flax_p = {"Dense_0": {"kernel": np.ones((7, 3), np.float32),
                          "bias": np.zeros((3,), np.float32)}}
    hk_p = flax_linear_to_haiku(flax_p)
    assert set(hk_p) == {"linear/~/linear"}
    _assert_pytrees_equal(haiku_linear_to_flax(hk_p), flax_p)


# ---------------------------------------------------------------------------
# SEGNN importer DRAFT (numerically UNVALIDATED — no e3nn-jax in this env).
# These tests pin the parts that ARE checkable here: the guard flag, the
# structural self-consistency of the encoded e3nn-layout spec (a synthetic
# checkpoint with exactly the spec's module names/shapes imports cleanly and
# populates every flax parameter), and the loud-fail on any mismatch.
# ---------------------------------------------------------------------------

SEG_ISL, SEG_N, SEG_E = 6, 12, 40


def _segnn_model_and_sample():
    from lagrangebench_tpu.models.e3 import Irreps
    from lagrangebench_tpu.models.segnn import SEGNN, node_feature_irreps

    metadata = {
        "dim": 3,
        "periodic_boundary_conditions": [True] * 3,
        "bounds": [[0.0, 1.0]] * 3,
    }
    model = SEGNN(
        node_features_irreps=node_feature_irreps(
            metadata, SEG_ISL, False, False, True
        ),
        edge_features_irreps=Irreps("1x1o + 1x0e"),
        scalar_units=8, lmax_hidden=1, lmax_attributes=1,
        output_irreps=Irreps("1x1o"), num_mp_steps=2, n_vels=SEG_ISL - 1,
    )
    rng = np.random.default_rng(3)
    k = SEG_ISL - 1
    pos = rng.uniform(0, 1, size=(SEG_N, SEG_ISL, 3)) * 0.1
    receivers = np.sort(rng.integers(0, SEG_N, size=SEG_E))
    senders = rng.integers(0, SEG_N, size=SEG_E)
    rel = (pos[:, -1][receivers] - pos[:, -1][senders]) / 0.3
    features = {
        "abs_pos": pos,
        "vel_hist": np.diff(pos, axis=1).reshape(SEG_N, k * 3),
        "rel_disp": rel,
        "rel_dist": np.linalg.norm(rel, axis=-1, keepdims=True),
        "receivers": receivers.astype(np.int32),
        "senders": senders.astype(np.int32),
    }
    return model, (features, np.zeros(SEG_N, np.int32))


def _synthetic_e3nn_checkpoint(model, sample, rng):
    """A haiku params dict with exactly the layout the draft spec expects
    (module paths + e3nn Linear names/shapes), random values."""
    from lagrangebench_tpu.compat import (
        _e3nn_out_groups,
        _e3nn_tp_output_groups,
        _segnn_haiku_stem,
        segnn_site_specs,
    )
    from lagrangebench_tpu.models.e3.irreps import Irreps

    _, specs = segnn_site_specs(model, sample)
    hk = {}
    for flax_path, (x_s, y_s, o_s) in specs.items():
        x_ir, y_ir, o_ir = Irreps(x_s), Irreps(y_s), Irreps(o_s)
        in_groups, _ = _e3nn_tp_output_groups(x_ir, y_ir)
        out_groups, _ = _e3nn_out_groups(o_ir)
        mod = {}
        for a, (mul_a, ir_a) in enumerate(in_groups):
            for b, (mul_b, ir_b) in enumerate(out_groups):
                if ir_a == ir_b:
                    mod[f"w[{a},{b}] {mul_a}x,{mul_b}x"] = rng.normal(
                        size=(mul_a, mul_b)
                    ).astype(np.float32)
        for b, (mul_b, irlp) in enumerate(out_groups):
            if irlp == (0, 1):  # e3nn biases scalar outputs only
                mod[f"b[{b}] {mul_b}x0e"] = rng.normal(size=(mul_b,)).astype(
                    np.float32
                )
        hk[f"{_segnn_haiku_stem(flax_path)}/~/linear"] = mod
    return hk


def test_segnn_importer_refuses_without_flag():
    from lagrangebench_tpu.compat import haiku_segnn_to_flax

    model, sample = _segnn_model_and_sample()
    with pytest.raises(NotImplementedError, match="UNVALIDATED"):
        haiku_segnn_to_flax({}, model, sample)


def test_segnn_importer_structural_selfcheck():
    from lagrangebench_tpu.compat import haiku_segnn_to_flax

    model, sample = _segnn_model_and_sample()
    hk = _synthetic_e3nn_checkpoint(model, sample, np.random.default_rng(0))
    out = haiku_segnn_to_flax(hk, model, sample, allow_unvalidated=True)

    # exact structure of a fresh init, every block populated (the synthetic
    # weights are iid normal — an untouched zero block would betray a
    # mapping hole)
    ref_params, _ = make_model_fns(model)[0](jax.random.PRNGKey(0), sample)
    assert jax.tree.structure(out) == jax.tree.structure(ref_params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(out):
        ref_leaf = ref_params
        for k in path:
            ref_leaf = ref_leaf[k.key]
        assert leaf.shape == np.asarray(ref_leaf).shape, path
        assert np.any(leaf != 0.0), f"unpopulated block {path}"

    # forward with imported params runs and is finite
    _, apply = make_model_fns(model)
    pred, _ = apply(jax.tree.map(jnp.asarray, out), {}, sample)
    assert np.all(np.isfinite(np.asarray(pred["acc"])))


def test_segnn_importer_fails_loudly_on_mismatch():
    from lagrangebench_tpu.compat import haiku_segnn_to_flax

    model, sample = _segnn_model_and_sample()
    hk = _synthetic_e3nn_checkpoint(model, sample, np.random.default_rng(1))

    # (a) a module the checkpoint lacks
    broken = dict(hk)
    del broken["segnn/~/embedding_nodes/~/linear"]
    with pytest.raises(ValueError, match="missing haiku module"):
        haiku_segnn_to_flax(broken, model, sample, allow_unvalidated=True)

    # (b) a module the mapping does not know
    broken = dict(hk)
    broken["segnn/~/embedding_msg_features/~/linear"] = {}
    with pytest.raises(ValueError, match="not consumed"):
        haiku_segnn_to_flax(broken, model, sample, allow_unvalidated=True)

    # (c) a weight whose shape contradicts the spec
    broken = {k: dict(v) for k, v in hk.items()}
    key = "segnn/~/output/~/linear"
    wname = next(n for n in broken[key] if n.startswith("w["))
    broken[key][wname] = np.zeros((1, 1), np.float32)
    with pytest.raises(ValueError, match="shape"):
        haiku_segnn_to_flax(broken, model, sample, allow_unvalidated=True)
