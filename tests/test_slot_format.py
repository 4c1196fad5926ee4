"""Cell-sorted (slot) neighbor format + fused slot processor parity.

The slot path (ops/neighbors_pallas.make_slot_edges_fn +
ops/fused_mp.gns_mp_step_slot + the GNS slot branch) keeps the graph in
column-slot order so the fused processor reads sender state from
stencil-column slabs instead of gathering an (N, K, latent) tensor through
HBM. These tests pin it to the particle-order dense path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.ops import fused_mp
from lagrangebench_tpu.ops import neighbors as nb
from lagrangebench_tpu.ops import space

N, DIM = 80, 2
CUTOFF = 0.25
BOX = np.array([1.0, 1.0])


@pytest.fixture(scope="module")
def slot_setup():
    rng = np.random.default_rng(0)
    pos = rng.uniform(size=(N, DIM)).astype(np.float32)
    disp, _ = space.periodic(jnp.asarray(BOX, jnp.float32))
    fns_d = nb.neighbor_list(disp, BOX, CUTOFF, backend="pallas",
                             format="dense")
    fns_s = nb.neighbor_list(disp, BOX, CUTOFF, backend="pallas",
                             format="slot")
    nl_d = fns_d.allocate(pos)
    nl_s = fns_s.allocate(pos)
    assert not bool(nl_d.did_buffer_overflow)
    assert not bool(nl_s.did_buffer_overflow)
    return pos, nl_d, nl_s


def _decode_slot_edges(nl_s):
    """Decode the slot graph back to particle-space (receiver, sender)
    pairs, also returning per-edge slot coordinates."""
    cand = np.asarray(nl_s.idx)
    aux = {k: np.asarray(v) for k, v in nl_s.aux.items()}
    s2p, bases = aux["slot_to_particle"], aux["bases"]
    n_cols, s_sten = bases.shape
    n_ext, k_cap = cand.shape
    c = n_ext // (n_cols + 1)
    edges = {}
    for row in range(n_cols * c):
        t = row // c
        for k in range(k_cap):
            cd = cand[row, k]
            if cd < s_sten * c:
                sender_slot = bases[t, cd // c] * c + cd % c
                edges[(int(s2p[row]), int(s2p[sender_slot]))] = (row, k)
    return edges, aux, c


def test_slot_edge_set_matches_dense(slot_setup):
    pos, nl_d, nl_s = slot_setup
    sd = np.asarray(nl_d.idx)
    dense_edges = {
        (r, int(s)) for r in range(N) for s in sd[r] if s < N
    }
    slot_edges, _, _ = _decode_slot_edges(nl_s)
    assert dense_edges == set(slot_edges)


def test_slot_geometry_and_maps(slot_setup):
    pos, _, nl_s = slot_setup
    slot_edges, aux, _ = _decode_slot_edges(nl_s)
    rel_disp, rel_dist = aux["rel_disp"], aux["rel_dist"]
    for (rp, sp), (row, k) in slot_edges.items():
        d = pos[rp] - pos[sp]
        d = d - BOX * np.round(d / BOX)
        np.testing.assert_allclose(rel_disp[row, k], d / CUTOFF, atol=1e-5)
        np.testing.assert_allclose(
            rel_dist[row, k, 0], np.linalg.norm(d) / CUTOFF, atol=1e-5
        )
    s2p, p2s = aux["slot_to_particle"], aux["particle_to_slot"]
    for p in range(N):
        assert s2p[p2s[p]] == p


def test_slot_kernel_matches_mirror(slot_setup):
    _, _, nl_s = slot_setup
    cand, bases = nl_s.idx, nl_s.aux["bases"]
    n_ext, k_cap = cand.shape
    f = 32
    rng = np.random.default_rng(1)
    p = fused_mp.init_step_params(jax.random.PRNGKey(0), f)
    hs = jnp.asarray(rng.normal(size=(n_ext, f)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(n_ext, f)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(n_ext, f)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(n_ext, k_cap, f)), jnp.float32)

    e_ref, h_ref = fused_mp.gns_mp_step_slot_reference(
        e, cand, bases, hs, hr, h, p
    )
    e_k, h_k = fused_mp.gns_mp_step_slot(
        e, cand, bases, hs, hr, h, p, interpret=True
    )
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=1e-5)

    # encoder-fused variant on raw features
    fe = DIM + 1
    raw = jnp.asarray(rng.normal(size=(n_ext, k_cap, fe)), jnp.float32)
    init = jax.nn.initializers.lecun_normal()
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    enc = {
        "enc_w1": init(keys[0], (fe, f), jnp.float32),
        "enc_b1": jnp.zeros((f,)) + 0.1,
        "enc_w2": init(keys[1], (f, f), jnp.float32),
        "enc_b2": jnp.zeros((f,)) - 0.2,
        "enc_ln_scale": jnp.ones((f,)) * 1.1,
        "enc_ln_bias": jnp.zeros((f,)) + 0.05,
    }
    e_ref2, h_ref2 = fused_mp.gns_mp_step_slot_reference(
        raw, cand, bases, hs, hr, h, p, enc
    )
    e_k2, h_k2 = fused_mp.gns_mp_step_slot(
        raw, cand, bases, hs, hr, h, p, enc, interpret=True
    )
    np.testing.assert_allclose(np.asarray(e_k2), np.asarray(e_ref2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_k2), np.asarray(h_ref2), atol=1e-5)


def test_slot_grad_flows(slot_setup):
    """The custom VJP (backward through the XLA mirror) produces finite
    grads matching direct differentiation of the mirror."""
    _, _, nl_s = slot_setup
    cand, bases = nl_s.idx, nl_s.aux["bases"]
    n_ext, k_cap = cand.shape
    f = 16
    rng = np.random.default_rng(2)
    p = fused_mp.init_step_params(jax.random.PRNGKey(1), f)
    hs = jnp.asarray(rng.normal(size=(n_ext, f)), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(n_ext, f)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(n_ext, f)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(n_ext, k_cap, f)), jnp.float32)

    def loss_k(e_, hs_, p_):
        eo, ho = fused_mp.gns_mp_step_slot(
            e_, cand, bases, hs_, hr, h, p_, interpret=True
        )
        return jnp.sum(eo**2) + jnp.sum(ho**2)

    def loss_m(e_, hs_, p_):
        eo, ho = fused_mp.gns_mp_step_slot_reference(
            e_, cand, bases, hs_, hr, h, p_
        )
        return jnp.sum(eo**2) + jnp.sum(ho**2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(e, hs, p)
    gm = jax.grad(loss_m, argnums=(0, 1, 2))(e, hs, p)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gm)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_gns_slot_matches_dense_end_to_end():
    """Full case+model: dense preprocessing == slot preprocessing."""
    from lagrangebench_tpu.case.case import case_builder
    from lagrangebench_tpu.models.gns import GNS

    rng = np.random.default_rng(3)
    n, dim, isl = 100, 2, 4
    metadata = {
        "bounds": [[0.0, 1.0], [0.0, 1.0]],
        "periodic_boundary_conditions": [True, True],
        "default_connectivity_radius": 0.22,
        "num_particles_max": n,
        "vel_mean": [0.0, 0.0], "vel_std": [1.0, 1.0],
        "acc_mean": [0.0, 0.0], "acc_std": [1.0, 1.0],
        "dim": dim, "dt": 0.01, "write_every": 1,
    }
    pos = rng.uniform(size=(n, isl, dim)).astype(np.float32) * 0.02
    pos += rng.uniform(size=(n, 1, dim)).astype(np.float32) * 0.95
    ptype = np.zeros(n, np.int32)

    def build(fmt):
        return case_builder(
            box=[1.0, 1.0], metadata=metadata, input_seq_length=isl,
            cfg_neighbors={
                "backend": "pallas", "format": fmt, "multiplier": 1.4
            },
        )

    feat_d, nl_d = build("dense").allocate_eval((pos, ptype))
    feat_s, nl_s = build("slot").allocate_eval((pos, ptype))
    assert not bool(nl_d.did_buffer_overflow)
    assert not bool(nl_s.did_buffer_overflow)

    model = GNS(particle_dimension=dim, latent_size=32, num_mp_steps=3,
                use_fused_processor=True)
    params = model.init(jax.random.PRNGKey(0), (feat_d, jnp.asarray(ptype)))
    out_d = model.apply(params, (feat_d, jnp.asarray(ptype)))
    out_s = model.apply(params, (feat_s, jnp.asarray(ptype)))
    np.testing.assert_allclose(
        np.asarray(out_s["acc"]), np.asarray(out_d["acc"]), atol=5e-4
    )
    # both layouts must produce the same parameter tree, so params train
    # in one layout and roll out in the other
    params_s = model.init(jax.random.PRNGKey(0), (feat_s, jnp.asarray(ptype)))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_s
    )
