"""Spatial (particle-axis) sharding: sharded GNS forward == unsharded."""

import jax
import jax.numpy as jnp
import numpy as np

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.models import GNS, make_model_fns
from lagrangebench_tpu.parallel import make_mesh
from lagrangebench_tpu.parallel.spatial import (
    build_spatial_gns_forward,
    spatial_partition,
)


def test_spatial_sharded_forward_matches_unsharded():
    n, dim, isl = 2048, 3, 4
    box, cutoff = 1.0, 0.07
    mp_steps, latent = 3, 16

    rng = np.random.default_rng(0)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)

    metadata = {
        "dim": dim,
        "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim,
        "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim,
        "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim,
        metadata=metadata,
        input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0,
        dtype=jnp.float64,
    )

    model = GNS(particle_dimension=dim, latent_size=latent,
                num_mp_steps=mp_steps, compute_dtype="float64")
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, _ = init(jax.random.PRNGKey(0), (features, ptype))

    def to_f64(x):
        x = np.asarray(x)
        return jnp.asarray(x, jnp.float64) if x.dtype.kind == "f" else jnp.asarray(x)

    params64 = jax.tree.map(to_f64, params)
    features64 = jax.tree.map(to_f64, features)
    out_ref, _ = apply(params64, {}, (features64, jnp.asarray(ptype)))
    acc_ref = np.asarray(out_ref["acc"])

    # ---- spatially sharded
    n_dev = 8
    mesh = make_mesh(n_dev)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos, ptype, n_dev, box_x=box
    )
    k_cap = nbrs.idx.shape[1]
    fwd = build_spatial_gns_forward(
        mesh,
        params64,
        box=[box] * dim,
        cutoff=cutoff,
        input_seq_length=isl,
        num_mp_steps=mp_steps,
        k_cap=k_cap,
        vel_mean=jnp.zeros(dim),
        vel_std=jnp.full(dim, 1e-3),
        compute_dtype=jnp.float64,
    )
    acc_sh, overflow = fwd(
        jnp.asarray(pos_sh, jnp.float64),
        jnp.asarray(ptype_sh),
        jnp.asarray(counts)[:, None],
    )
    assert not bool(overflow)

    # gather valid rows back into global order
    acc_sh = np.asarray(acc_sh)
    got = np.zeros_like(acc_ref)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        got[order[start : start + c]] = acc_sh[d, :c]
        start += c

    np.testing.assert_allclose(got, acc_ref, rtol=1e-9, atol=1e-10)


def _make_case_and_model(n, dim, isl, box, cutoff, mp_steps, latent, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl + 8)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)
    metadata = {
        "dim": dim,
        "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim,
        "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim,
        "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
    )
    model = GNS(particle_dimension=dim, latent_size=latent,
                num_mp_steps=mp_steps, compute_dtype="float64")
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos[:, :isl], ptype))
    params, _ = init(jax.random.PRNGKey(0), (features, ptype))

    def to_f64(x):
        x = np.asarray(x)
        return (
            jnp.asarray(x, jnp.float64)
            if x.dtype.kind == "f"
            else jnp.asarray(x)
        )

    params64 = jax.tree.map(to_f64, params)
    return case, apply, params64, pos, ptype, nbrs, metadata


def test_spatial_forward_matches_unsharded_16k():
    """VERDICT r2 #3(d): 8-virtual-device parity at >= 16k particles, with
    the cell-table per-device NL (no O(N^2) candidate matrix)."""
    n, dim, isl = 16384, 3, 3
    box, cutoff = 1.0, 0.04
    mp_steps, latent = 2, 8
    case, apply, params64, pos, ptype, nbrs, _ = _make_case_and_model(
        n, dim, isl, box, cutoff, mp_steps, latent
    )
    features, _ = case.allocate_eval((pos[:, :isl], ptype))
    features64 = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        features,
    )
    out_ref, _ = apply(params64, {}, (features64, jnp.asarray(ptype)))
    acc_ref = np.asarray(out_ref["acc"])

    n_dev = 8
    mesh = make_mesh(n_dev)
    from lagrangebench_tpu.parallel.spatial import spatial_caps

    k_cap, cell_cap = spatial_caps(pos[:, isl - 1], [box] * dim, cutoff)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos[:, :isl], ptype, n_dev, box_x=box
    )
    fwd = build_spatial_gns_forward(
        mesh, params64, box=[box] * dim, cutoff=cutoff,
        input_seq_length=isl, num_mp_steps=mp_steps, k_cap=k_cap,
        cell_cap=cell_cap, vel_mean=jnp.zeros(dim),
        vel_std=jnp.full(dim, 1e-3), compute_dtype=jnp.float64,
    )
    acc_sh, overflow = fwd(
        jnp.asarray(pos_sh, jnp.float64), jnp.asarray(ptype_sh),
        jnp.asarray(counts)[:, None],
    )
    assert not bool(overflow)
    acc_sh = np.asarray(acc_sh)
    got = np.zeros_like(acc_ref)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        got[order[start : start + c]] = acc_sh[d, :c]
        start += c
    np.testing.assert_allclose(got, acc_ref, rtol=1e-9, atol=1e-10)


def test_spatial_rollout_matches_unsharded():
    """Chunked spatial rollout == the standard eval rollout update rule."""
    from lagrangebench_tpu.parallel.spatial import spatial_rollout

    n, dim, isl = 4096, 3, 3
    box, cutoff = 1.0, 0.06
    mp_steps, latent = 2, 8
    n_steps = 5
    case, apply, params64, pos, ptype, nbrs, _ = _make_case_and_model(
        n, dim, isl, box, cutoff, mp_steps, latent, seed=3
    )

    # unsharded reference rollout (the production update rule)
    cur = jnp.asarray(pos[:, :isl], jnp.float64)
    ptype_j = jnp.asarray(ptype)
    ref = []
    nbrs_ref = nbrs
    for _ in range(n_steps):
        feats, nbrs_ref = case.preprocess_eval((cur, ptype_j), nbrs_ref)
        assert not bool(nbrs_ref.did_buffer_overflow)
        feats64 = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
            feats,
        )
        out, _ = apply(params64, {}, (feats64, ptype_j))
        next_pos = case.integrate(
            {"acc": jnp.asarray(out["acc"], jnp.float64)}, cur
        )
        ref.append(np.asarray(next_pos))
        cur = jnp.concatenate([cur[:, 1:], next_pos[:, None]], axis=1)
    ref = np.stack(ref)  # (T, N, dim)

    mesh = make_mesh(8)
    stats = case.normalization_stats
    preds = spatial_rollout(
        params64, pos[:, :isl].astype(np.float64), ptype, mesh=mesh,
        box=[box] * dim, cutoff=cutoff, input_seq_length=isl,
        num_mp_steps=mp_steps, n_steps=n_steps,
        normalization_stats=stats, chunk=2, compute_dtype=jnp.float64,
    )
    np.testing.assert_allclose(preds, ref, rtol=1e-7, atol=1e-9)


def test_spatial_rollout_fp_override_reaches_compiled_rollout():
    """spatial_rollout(params=A, fp=pack(B)) == spatial_rollout(params=B).

    Regression: train_spatial's rollout-metric validation threads the LIVE
    packed parameters through a cached compiled rollout via ``fp``; a
    dropped override silently evaluates the build-time parameters forever,
    freezing best-model selection at the first checkpoint.
    """
    from lagrangebench_tpu.parallel.spatial import (
        _SpatialGNS,
        spatial_rollout,
    )

    n, dim, isl = 4096, 3, 3
    box, cutoff = 1.0, 0.06
    mp_steps, latent = 2, 8
    n_steps = 3
    case, apply, params_a, pos, ptype, nbrs, _ = _make_case_and_model(
        n, dim, isl, box, cutoff, mp_steps, latent, seed=3
    )
    # second parameter set: same structure, different values
    params_b = jax.tree.map(
        lambda x: x * 1.5 + 0.01 if x.dtype.kind == "f" else x, params_a
    )

    mesh = make_mesh(8)
    stats = case.normalization_stats
    common = dict(
        mesh=mesh, box=[box] * dim, cutoff=cutoff, input_seq_length=isl,
        num_mp_steps=mp_steps, n_steps=n_steps,
        normalization_stats=stats, chunk=n_steps,
        compute_dtype=jnp.float64,
    )
    pos0 = pos[:, :isl].astype(np.float64)
    cache: dict = {}
    preds_a = spatial_rollout(
        params_a, pos0, ptype, build_cache=cache, **common
    )
    from lagrangebench_tpu.models.gns import fused_params_from_standard

    fp_b = _SpatialGNS.pack_params(
        jax.tree.map(
            jnp.asarray, fused_params_from_standard(params_b, mp_steps)
        ),
        mp_steps,
    )
    # same cached compiled rollout, overridden parameters
    preds_b_fp = spatial_rollout(
        params_a, pos0, ptype, fp=fp_b, build_cache=cache, **common
    )
    # ground truth: a rollout BUILT from params_b
    preds_b = spatial_rollout(params_b, pos0, ptype, **common)

    assert not np.allclose(preds_a, preds_b_fp), (
        "fp override had no effect — the live parameters never reached "
        "the compiled rollout"
    )
    np.testing.assert_allclose(preds_b_fp, preds_b, rtol=1e-7, atol=1e-9)


import pytest


@pytest.mark.parametrize("model_name", ["gns", "painn", "segnn", "egnn"])
def test_spatial_train_step_matches_single_device(model_name):
    """Training through the halo exchange: loss and psum'd grads on an
    8-device mesh equal the 1-device (global-domain) computation — the
    ppermute transpose routes sender-state cotangents back correctly
    (for all three sharded model families)."""
    from lagrangebench_tpu.models import PaiNN
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_gns_train_step,
    )

    n, dim, isl = 1024, 3, 4
    box, cutoff = 1.0, 0.09
    mp_steps, latent = 2, 16

    rng = np.random.default_rng(3)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    # isl frames for the model + 1 more for the target
    pos = np.mod(base + vel * np.arange(isl + 1)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)
    ptype[:5] = 1  # a few wall particles exercise the kinematic mask

    stats = {
        "velocity": {
            "mean": jnp.zeros(dim, jnp.float64),
            "std": jnp.full(dim, 1e-3, jnp.float64),
        },
        "acceleration": {
            "mean": jnp.zeros(dim, jnp.float64),
            "std": jnp.full(dim, 1e-4, jnp.float64),
        },
    }

    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
        cfg_model={"magnitude_features": True},
    )
    if model_name == "gns":
        model = GNS(particle_dimension=dim, latent_size=latent,
                    num_mp_steps=mp_steps, compute_dtype="float64")
    elif model_name == "segnn":
        from lagrangebench_tpu.models.e3 import Irreps
        from lagrangebench_tpu.models.segnn import (
            SEGNN,
            node_feature_irreps,
        )

        model = SEGNN(
            node_features_irreps=node_feature_irreps(
                metadata, isl, False, True, True
            ),
            edge_features_irreps=Irreps("1x1o + 1x0e"),
            scalar_units=8, lmax_hidden=1, lmax_attributes=1,
            output_irreps=Irreps("1x1o"), num_mp_steps=mp_steps,
            n_vels=isl - 1, compute_dtype="float64",
        )
    elif model_name == "egnn":
        from lagrangebench_tpu.models.egnn import EGNN
        from lagrangebench_tpu.ops import space

        disp, shift = space.periodic(jnp.full(dim, box, jnp.float64))
        model = EGNN(
            hidden_size=latent, output_size=1, dt=0.01, n_vels=isl - 1,
            displacement_fn=disp, shift_fn=shift,
            velocity_stats={"mean": jnp.zeros(dim, jnp.float64),
                            "std": jnp.full(dim, 1e-3, jnp.float64)},
            num_mp_steps=mp_steps, compute_dtype="float64",
        )
    else:
        model = PaiNN(hidden_size=latent, output_size=1,
                      num_mp_steps=mp_steps, n_rbf=5, radius=1.5,
                      n_vels=isl - 1, compute_dtype="float64",
                      use_fused_layer=True)
    init, _ = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos[:, :isl], ptype))
    params, _ = init(jax.random.PRNGKey(1), (features, ptype))
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        params,
    )
    k_cap = nbrs.idx.shape[1]

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        pos_sh, ptype_sh, counts, order = spatial_partition(
            pos, ptype, n_dev, box_x=box
        )
        step, fp = build_spatial_gns_train_step(
            mesh, params, box=[box] * dim, cutoff=cutoff,
            input_seq_length=isl, num_mp_steps=mp_steps, k_cap=k_cap,
            normalization_stats=stats, compute_dtype=jnp.float64,
            model=model_name,
            model_def=model if model_name in ("segnn", "egnn") else None,
        )
        loss, grads, overflow = step(
            jax.tree.map(jnp.asarray, fp), jnp.asarray(pos_sh),
            jnp.asarray(ptype_sh), jnp.asarray(counts),
        )
        assert not bool(overflow)
        assert np.isfinite(float(loss))
        results[n_dev] = (float(loss), jax.tree.map(np.asarray, grads))

    loss1, g1 = results[1]
    loss8, g8 = results[8]
    np.testing.assert_allclose(loss8, loss1, rtol=1e-9)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat8 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g8)
    )
    assert flat1 and len(flat1) == len(flat8)
    # the steerable stack's per-part reductions reorder f64 sums more than
    # the GNS/PaiNN mirrors (worst observed 8-dev-vs-1-dev grad deltas:
    # rel ~2e-7 on ~1e-2-scale entries, abs ~4e-12 on ~1e-7 entries; the
    # loss itself matches to 1e-16)
    rtol, atol = (1e-6, 1e-10) if model_name == "segnn" else (1e-7, 1e-12)
    some_nonzero = False
    for k, v1 in flat1:
        v8 = flat8[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            v8, v1, rtol=rtol, atol=atol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )
        some_nonzero = some_nonzero or np.abs(v1).max() > 0
    assert some_nonzero


def test_spatial_segnn_forward_matches_unsharded():
    """Spatially-sharded SEGNN == the unsharded flax model: the steerable
    stack runs on its own parameter subtrees over the slab geometry, with
    per-m-part halo exchange of the node IrrepsArray per MP step."""
    from lagrangebench_tpu.models.e3 import Irreps
    from lagrangebench_tpu.models.segnn import SEGNN, node_feature_irreps
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_segnn_forward,
    )

    n, dim, isl = 1024, 3, 4
    box, cutoff = 1.0, 0.09
    mp_steps, latent = 2, 8

    rng = np.random.default_rng(11)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)

    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
        cfg_model={"magnitude_features": True},
    )
    node_irreps = node_feature_irreps(metadata, isl, False, True, True)
    model = SEGNN(
        node_features_irreps=node_irreps,
        edge_features_irreps=Irreps("1x1o + 1x0e"),
        scalar_units=latent, lmax_hidden=1, lmax_attributes=1,
        output_irreps=Irreps("1x1o"), num_mp_steps=mp_steps,
        n_vels=isl - 1, compute_dtype="float64",
    )
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, _ = init(jax.random.PRNGKey(4), (features, ptype))

    def to_f64(x):
        x = np.asarray(x)
        return (
            jnp.asarray(x, jnp.float64)
            if x.dtype.kind == "f" else jnp.asarray(x)
        )

    params64 = jax.tree.map(to_f64, params)
    features64 = jax.tree.map(to_f64, features)
    out_ref, _ = apply(params64, {}, (features64, jnp.asarray(ptype)))
    acc_ref = np.asarray(out_ref["acc"])

    n_dev = 8
    mesh = make_mesh(n_dev)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos, ptype, n_dev, box_x=box
    )
    k_cap = nbrs.idx.shape[1]
    fwd = build_spatial_segnn_forward(
        mesh, params64, model,
        box=[box] * dim, cutoff=cutoff, input_seq_length=isl,
        k_cap=k_cap, vel_mean=jnp.zeros(dim), vel_std=jnp.full(dim, 1e-3),
        compute_dtype=jnp.float64,
    )
    acc_sh, overflow = fwd(
        jnp.asarray(pos_sh, jnp.float64), jnp.asarray(ptype_sh),
        jnp.asarray(counts)[:, None],
    )
    assert not bool(overflow)

    acc_sh = np.asarray(acc_sh)
    got = np.zeros_like(acc_ref)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        got[order[start : start + c]] = acc_sh[d, :c]
        start += c
    np.testing.assert_allclose(got, acc_ref, rtol=1e-9, atol=1e-10)


def test_spatial_egnn_forward_matches_unsharded():
    """Spatially-sharded EGNN == the unsharded flax model: per-layer halo
    of (h, position-delta) and the reverse-halo reduction of the
    sender-directed position scatter."""
    from lagrangebench_tpu.models.egnn import EGNN
    from lagrangebench_tpu.ops import space
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_egnn_forward,
    )

    n, dim, isl = 1024, 3, 4
    box, cutoff = 1.0, 0.09
    mp_steps, latent = 2, 16

    rng = np.random.default_rng(13)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)

    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
    )
    disp, shift = space.periodic(jnp.full(dim, box, jnp.float64))
    vstats = {"mean": jnp.zeros(dim, jnp.float64),
              "std": jnp.full(dim, 1e-3, jnp.float64)}
    model = EGNN(
        hidden_size=latent, output_size=1, dt=0.01, n_vels=isl - 1,
        displacement_fn=disp, shift_fn=shift, velocity_stats=vstats,
        num_mp_steps=mp_steps, compute_dtype="float64",
    )
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, _ = init(jax.random.PRNGKey(6), (features, ptype))

    def to_f64(x):
        x = np.asarray(x)
        return (
            jnp.asarray(x, jnp.float64)
            if x.dtype.kind == "f" else jnp.asarray(x)
        )

    params64 = jax.tree.map(to_f64, params)
    features64 = jax.tree.map(to_f64, features)
    out_ref, _ = apply(params64, {}, (features64, jnp.asarray(ptype)))
    # reference NORMALIZED acceleration, like the spatial core emits
    acc_ref = (np.asarray(out_ref["acc"]) - 0.0) / 1e-4

    n_dev = 8
    mesh = make_mesh(n_dev)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos, ptype, n_dev, box_x=box
    )
    k_cap = nbrs.idx.shape[1]
    fwd = build_spatial_egnn_forward(
        mesh, params64, model,
        box=[box] * dim, cutoff=cutoff, input_seq_length=isl,
        k_cap=k_cap, vel_mean=jnp.zeros(dim), vel_std=jnp.full(dim, 1e-3),
        acc_mean=jnp.zeros(dim), acc_std=jnp.full(dim, 1e-4),
        compute_dtype=jnp.float64,
    )
    acc_sh, overflow = fwd(
        jnp.asarray(pos_sh, jnp.float64), jnp.asarray(ptype_sh),
        jnp.asarray(counts)[:, None],
    )
    assert not bool(overflow)

    acc_sh = np.asarray(acc_sh)
    got = np.zeros_like(acc_ref)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        got[order[start : start + c]] = acc_sh[d, :c]
        start += c
    np.testing.assert_allclose(got, acc_ref, rtol=1e-8, atol=1e-9)


def test_spatial_dp2d_train_step_matches_single_device():
    """Batch x spatial 2D mesh: the (data=2, space=4) train step — DP rows
    of spatially-sharded samples, two samples per row — reproduces the
    single-device batch-mean loss and gradients exactly."""
    from lagrangebench_tpu.parallel import make_mesh_2d
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_gns_train_step,
        build_spatial_train_step_dp,
    )

    n, dim, isl = 384, 3, 4
    box, cutoff = 1.0, 0.12
    mp_steps, latent = 2, 16
    n_batch, n_data, n_space = 4, 2, 4

    rng = np.random.default_rng(7)
    samples = []
    for _ in range(n_batch):
        base = rng.uniform(0, box, size=(n, 1, dim))
        vel = rng.normal(0, 2e-3, size=(n, 1, dim))
        samples.append(
            np.mod(base + vel * np.arange(isl + 1)[None, :, None], box)
        )
    ptype = np.zeros(n, dtype=np.int32)
    ptype[:5] = 1

    stats = {
        "velocity": {
            "mean": jnp.zeros(dim, jnp.float64),
            "std": jnp.full(dim, 1e-3, jnp.float64),
        },
        "acceleration": {
            "mean": jnp.zeros(dim, jnp.float64),
            "std": jnp.full(dim, 1e-4, jnp.float64),
        },
    }
    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
    )
    model = GNS(particle_dimension=dim, latent_size=latent,
                num_mp_steps=mp_steps, compute_dtype="float64")
    init, _ = make_model_fns(model)
    features, nbrs = case.allocate_eval((samples[0][:, :isl], ptype))
    params, _ = init(jax.random.PRNGKey(2), (features, ptype))
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        params,
    )
    k_cap = nbrs.idx.shape[1]
    common = dict(
        box=[box] * dim, cutoff=cutoff, input_seq_length=isl,
        num_mp_steps=mp_steps, k_cap=k_cap, normalization_stats=stats,
        compute_dtype=jnp.float64,
    )

    # reference: batch mean of per-sample single-device losses/grads
    step1, fp = build_spatial_gns_train_step(make_mesh(1), params, **common)
    fp = jax.tree.map(jnp.asarray, fp)
    ref_losses, ref_grads = [], []
    for pos in samples:
        pos_sh, ptype_sh, counts, _ = spatial_partition(
            pos, ptype, 1, box_x=box
        )
        loss, grads, overflow = step1(
            fp, jnp.asarray(pos_sh), jnp.asarray(ptype_sh),
            jnp.asarray(counts),
        )
        assert not bool(overflow)
        ref_losses.append(float(loss))
        ref_grads.append(jax.tree.map(np.asarray, grads))
    loss_ref = float(np.mean(ref_losses))
    grads_ref = jax.tree.map(
        lambda *gs: np.mean(np.stack(gs), axis=0), *ref_grads
    )

    # 2D mesh: 2 data rows x 4-slab ring, 2 samples per row
    mesh2 = make_mesh_2d(n_data, n_space)
    parts = [
        spatial_partition(pos, ptype, n_space, box_x=box) for pos in samples
    ]
    n_loc = max(p[0].shape[1] for p in parts)

    def pad(arr, fill=0):
        width = [(0, 0)] * arr.ndim
        width[1] = (0, n_loc - arr.shape[1])
        return np.pad(arr, width, constant_values=fill)

    pos_b = np.stack([pad(p[0]) for p in parts])
    ptype_b = np.stack([pad(p[1], fill=-1) for p in parts])
    counts_b = np.stack([p[2] for p in parts])

    step2, fp2 = build_spatial_train_step_dp(mesh2, params, **common)
    loss2, grads2, overflow2 = step2(
        jax.tree.map(jnp.asarray, fp2), jnp.asarray(pos_b),
        jnp.asarray(ptype_b), jnp.asarray(counts_b),
    )
    assert not bool(overflow2)
    np.testing.assert_allclose(float(loss2), loss_ref, rtol=1e-9)
    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat_2d = dict(
        (jax.tree_util.keystr(k), np.asarray(v))
        for k, v in jax.tree_util.tree_leaves_with_path(grads2)
    )
    assert flat_ref and len(flat_ref) == len(flat_2d)
    for k, v_ref in flat_ref:
        np.testing.assert_allclose(
            flat_2d[jax.tree_util.keystr(k)], v_ref, rtol=1e-7, atol=1e-12,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_spatial_painn_forward_matches_unsharded():
    """Spatially-sharded PaiNN == the (fused-variant) flax model: the
    slab geometry and per-layer packed-context halo exchange generalize
    beyond GNS."""
    from lagrangebench_tpu.models import PaiNN
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_painn_forward,
    )

    n, dim, isl = 1024, 3, 4
    box, cutoff = 1.0, 0.09
    mp_steps, latent = 2, 16
    radius = 1.5  # model RBF radius over radius-normalized distances

    rng = np.random.default_rng(5)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)

    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
        cfg_model={"magnitude_features": True},
    )
    model = PaiNN(
        hidden_size=latent, output_size=1, num_mp_steps=mp_steps,
        n_rbf=5, radius=radius, n_vels=isl - 1,
        compute_dtype="float64", use_fused_layer=True,
    )
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, _ = init(jax.random.PRNGKey(2), (features, ptype))
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        params,
    )
    features64 = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        features,
    )
    out_ref, _ = apply(params, {}, (features64, jnp.asarray(ptype)))
    acc_ref = np.asarray(out_ref["acc"])

    n_dev = 8
    mesh = make_mesh(n_dev)
    pos_sh, ptype_sh, counts, order = spatial_partition(
        pos, ptype, n_dev, box_x=box
    )
    k_cap = nbrs.idx.shape[1]
    fwd = build_spatial_painn_forward(
        mesh, params, box=[box] * dim, cutoff=cutoff,
        input_seq_length=isl, num_mp_steps=mp_steps, radius=radius,
        k_cap=k_cap, vel_mean=jnp.zeros(dim, jnp.float64),
        vel_std=jnp.full(dim, 1e-3, jnp.float64),
        compute_dtype=jnp.float64,
    )
    acc_sh, overflow = fwd(
        jnp.asarray(pos_sh), jnp.asarray(ptype_sh), jnp.asarray(counts)
    )
    assert not bool(overflow)
    acc_sh = np.asarray(acc_sh)

    # regather into global order and compare
    acc_got = np.zeros_like(acc_ref)
    start = 0
    for d in range(n_dev):
        c = int(counts[d])
        acc_got[order[start : start + c]] = acc_sh[d, :c]
        start += c
    np.testing.assert_allclose(acc_got, acc_ref, rtol=1e-6, atol=1e-9)


def test_spatial_painn_rollout_8dev_matches_1dev():
    """The generalized (model="painn") spatial rollout: 8 slabs with
    per-layer halo exchange reproduce the 1-device global-domain rollout
    (whose forward is parity-tested against the flax model above)."""
    from lagrangebench_tpu.models import PaiNN
    from lagrangebench_tpu.parallel.spatial import spatial_rollout

    n, dim, isl = 1024, 3, 4
    box, cutoff = 1.0, 0.09
    mp_steps, latent = 2, 16
    radius = 1.5
    n_steps = 4

    rng = np.random.default_rng(7)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    pos = np.mod(base + vel * np.arange(isl)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)

    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
        cfg_model={"magnitude_features": True},
    )
    model = PaiNN(
        hidden_size=latent, output_size=1, num_mp_steps=mp_steps,
        n_rbf=5, radius=radius, n_vels=isl - 1,
        compute_dtype="float64", use_fused_layer=True,
    )
    init, _ = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos, ptype))
    params, _ = init(jax.random.PRNGKey(4), (features, ptype))
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        params,
    )
    # a random-init PaiNN emits astronomically large accelerations (the
    # per-layer clip allows |ds| up to 1e2 and the readout multiplies
    # them); the integrated positions then jump many box lengths per
    # step and the rollout becomes a chaos amplifier for f64 reduction
    # noise. Damp the final readout so accelerations are physical and
    # the 8-vs-1-device comparison is well-conditioned.
    params = dict(params)
    blk = jax.tree.map(lambda x: x, params["GatedEquivariantBlock_1"])
    blk["LinearXav_2"]["Dense_0"]["kernel"] = (
        blk["LinearXav_2"]["Dense_0"]["kernel"] * 1e-6
    )
    blk["LinearXav_2"]["Dense_0"]["bias"] = (
        blk["LinearXav_2"]["Dense_0"]["bias"] * 1e-6
    )
    params["GatedEquivariantBlock_1"] = blk
    stats = case.normalization_stats

    outs = {}
    for n_dev in (1, 8):
        outs[n_dev] = spatial_rollout(
            params, pos[:, :isl].astype(np.float64), ptype,
            mesh=make_mesh(n_dev), box=[box] * dim, cutoff=cutoff,
            input_seq_length=isl, num_mp_steps=mp_steps, n_steps=n_steps,
            normalization_stats=stats, chunk=2,
            compute_dtype=jnp.float64, model="painn",
        )
    np.testing.assert_allclose(outs[8], outs[1], rtol=1e-7, atol=1e-9)


def test_train_spatial_loop_smoke():
    """The CLI spatial-training loop: a few optimizer steps on a 2x4
    (data, space) mesh reduce the loss, produce standard-layout
    checkpoints (with a best/ shadow), and the returned params drive the
    standard model."""
    import os
    import tempfile

    from lagrangebench_tpu.config import Config
    from lagrangebench_tpu.data.synthetic import make_synthetic_dataset
    from lagrangebench_tpu.data import H5Dataset
    from lagrangebench_tpu.checkpoint import load_checkpoint
    from lagrangebench_tpu.parallel.spatial import train_spatial

    root = tempfile.mkdtemp()
    path = make_synthetic_dataset(
        root, n_particles=512, dim=3, box=1.0, seq_len_train=30,
        seq_len_eval=20, n_trajs=2, name="TSP",
    )
    isl = 4
    # extra frame for the pushforward unroll (max_unroll=1 below)
    data_train = H5Dataset("train", dataset_path=path, input_seq_length=isl,
                           extra_seq_length=1)
    data_valid = H5Dataset("valid", dataset_path=path, input_seq_length=isl,
                           extra_seq_length=8)
    md = data_train.metadata

    case = case_builder(
        box=[1.0] * 3, metadata=md, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=3e-4,
    )
    model = GNS(particle_dimension=3, latent_size=16, num_mp_steps=2)
    init, apply = make_model_fns(model)
    pos0, ptype0 = data_train[0]
    features, _ = case.allocate_eval(
        (np.asarray(pos0)[:, :isl], np.asarray(ptype0))
    )
    params0, _ = init(jax.random.PRNGKey(0), (features, np.asarray(ptype0)))

    cfg_train = Config()
    cfg_train.batch_size = 2
    cfg_train.noise_std = 3e-4
    cfg_train.step_max = 4
    cfg_train.optimizer = Config()
    cfg_train.optimizer.lr_start = 1e-3
    cfg_train.optimizer.lr_decay_steps = 1000
    cfg_train.optimizer.lr_decay_rate = 0.1
    cfg_train.optimizer.lr_final = 1e-6
    # pushforward: unroll 0 at step 0, unroll 1 from step 1 on — the loop
    # exercises both compiled step variants
    cfg_train.pushforward = Config()
    cfg_train.pushforward.steps = [-1, 0]
    cfg_train.pushforward.unrolls = [0, 1]
    cfg_train.pushforward.probs = [0, 1]
    cfg_logging = Config()
    cfg_logging.log_steps = 1
    cfg_logging.eval_steps = 2

    ckp = os.path.join(root, "ckp")
    std_params, state, _ = train_spatial(
        params0, case, data_train, data_valid,
        n_devices=4, model="gns", num_mp_steps=2,
        cfg_train=cfg_train, cfg_logging=cfg_logging,
        input_seq_length=isl, metadata=md, seed=0, store_ckp=ckp,
    )

    # standard layout: loadable and consumable by the standard model
    loaded, _, opt_leaves, step = load_checkpoint(ckp)
    assert step == 3
    assert os.path.exists(os.path.join(ckp, "best", "metadata_ckp.json"))
    # best-model selection now keys on the validation ROLLOUT MSE
    import json

    meta = json.load(open(os.path.join(ckp, "metadata_ckp.json")))
    assert np.isfinite(meta["loss"]) and "val_loss" in meta
    # the optimizer state is checkpointed (fused layout) for exact resume
    assert opt_leaves is not None
    out, _ = apply(std_params, {}, (features, jnp.asarray(ptype0)))
    assert np.isfinite(np.asarray(out["acc"])).all()
    # trained params differ from the init (an update actually happened)
    k0 = np.asarray(params0["MLP_0"]["Dense_0"]["kernel"])
    k1 = np.asarray(std_params["MLP_0"]["Dense_0"]["kernel"])
    assert np.abs(k1 - k0).max() > 0

    # resume: continues from the checkpointed step with restored optimizer
    cfg_train.step_max = 6
    std_params2, _, _ = train_spatial(
        params0, case, data_train, data_valid,
        n_devices=4, model="gns", num_mp_steps=2,
        cfg_train=cfg_train, cfg_logging=cfg_logging,
        input_seq_length=isl, metadata=md, seed=0, store_ckp=ckp,
        load_ckp=ckp,
    )
    _, _, _, step2 = load_checkpoint(ckp)
    assert step2 == 5  # resumed at 4, ran to step_max-1
    k2 = np.asarray(std_params2["MLP_0"]["Dense_0"]["kernel"])
    assert np.abs(k2 - k1).max() > 0  # training actually continued


def test_spatial_rollout_kinematic_forcing_matches_standard():
    """Spatial rollout with a ground-truth target forces walls / moving
    walls onto it each step — matching the standard eval rollout's
    kinematic semantics (reference lagrangebench/evaluate/rollout.py:64-69)
    on a periodic fixture that contains wall particles."""
    from lagrangebench_tpu.parallel.spatial import spatial_rollout

    n, dim, isl = 2048, 3, 3
    box, cutoff = 1.0, 0.07
    mp_steps, latent = 2, 8
    n_steps = 5
    case, apply, params64, pos, ptype, nbrs, _ = _make_case_and_model(
        n, dim, isl, box, cutoff, mp_steps, latent, seed=5
    )
    ptype = ptype.copy()
    ptype[:64] = 1  # walls (their GT drifts, so forcing is observable)
    ptype[64:128] = 2  # moving walls
    kin = (ptype == 1) | (ptype == 2)
    target = pos[:, isl : isl + n_steps]  # (N, T, dim) ground truth

    # standard-path reference: model step + kinematic forced to GT
    cur = jnp.asarray(pos[:, :isl], jnp.float64)
    ptype_j = jnp.asarray(ptype)
    kin_j = jnp.asarray(kin)
    ref = []
    nbrs_ref = nbrs
    for t in range(n_steps):
        feats, nbrs_ref = case.preprocess_eval((cur, ptype_j), nbrs_ref)
        assert not bool(nbrs_ref.did_buffer_overflow)
        feats64 = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype.kind == "f" else x,
            feats,
        )
        out, _ = apply(params64, {}, (feats64, ptype_j))
        next_pos = case.integrate(
            {"acc": jnp.asarray(out["acc"], jnp.float64)}, cur
        )
        next_pos = jnp.where(
            kin_j[:, None], jnp.asarray(target[:, t], jnp.float64), next_pos
        )
        ref.append(np.asarray(next_pos))
        cur = jnp.concatenate([cur[:, 1:], next_pos[:, None]], axis=1)
    ref = np.stack(ref)  # (T, N, dim)

    mesh = make_mesh(8)
    preds = spatial_rollout(
        params64, pos[:, :isl].astype(np.float64), ptype, mesh=mesh,
        box=[box] * dim, cutoff=cutoff, input_seq_length=isl,
        num_mp_steps=mp_steps, n_steps=n_steps,
        normalization_stats=case.normalization_stats, chunk=2,
        compute_dtype=jnp.float64, target=target.transpose(1, 0, 2),
    )
    np.testing.assert_allclose(preds, ref, rtol=1e-7, atol=1e-9)
    # the forcing actually engaged: walls track their (moving) GT, not
    # their held last-input position
    hold = pos[kin, isl - 1]
    assert np.abs(preds[-1, kin] - hold).max() > 1e-5
    np.testing.assert_allclose(preds[-1, kin], target[kin, -1], atol=1e-12)


def test_spatial_rejects_non_periodic_datasets():
    """parallel.spatial on a wall-bounded (non-periodic) dataset errors
    out instead of silently wrapping positions through walls."""
    import pytest

    from lagrangebench_tpu.parallel.spatial import (
        _require_periodic,
        infer_spatial,
        train_spatial,
    )

    bad = {"periodic_boundary_conditions": [False, True, True]}
    with pytest.raises(ValueError, match="fully periodic"):
        _require_periodic(bad, "test")
    _require_periodic({"periodic_boundary_conditions": [True] * 3}, "test")

    class _FakeData:
        metadata = {
            "periodic_boundary_conditions": [True, False],
            "bounds": [[0.0, 1.0]] * 2,
            "default_connectivity_radius": 0.05,
        }
        input_seq_length = 3

    with pytest.raises(ValueError, match="fully periodic"):
        train_spatial(
            {}, None, _FakeData(), _FakeData(), n_devices=2, model="gns",
            num_mp_steps=2, cfg_train=None, cfg_logging=None,
            input_seq_length=3, metadata=_FakeData.metadata,
        )
    with pytest.raises(ValueError, match="fully periodic"):
        infer_spatial(
            {}, None, _FakeData(), n_devices=2, num_mp_steps=2,
        )


def _pushforward_fixture(n=1024, dim=3, isl=4, box=1.0, cutoff=0.09,
                         mp_steps=2, latent=16, max_unroll=1, seed=5):
    """Positions with isl+1+max_unroll frames, a GNS in f64, and the pos
    window laid out for the spatial pushforward step: noised frames
    (noise 0 here, so == raw) followed by the raw isl-frame window."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, box, size=(n, 1, dim))
    vel = rng.normal(0, 2e-3, size=(n, 1, dim))
    t = isl + 1 + max_unroll
    pos = np.mod(base + vel * np.arange(t)[None, :, None], box)
    ptype = np.zeros(n, dtype=np.int32)
    ptype[:5] = 1

    metadata = {
        "dim": dim, "num_particles_max": n,
        "periodic_boundary_conditions": [True] * dim,
        "bounds": [[0.0, box]] * dim,
        "default_connectivity_radius": cutoff,
        "vel_mean": [0.0] * dim, "vel_std": [1e-3] * dim,
        "acc_mean": [0.0] * dim, "acc_std": [1e-4] * dim,
    }
    case = case_builder(
        box=[box] * dim, metadata=metadata, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=0.0, dtype=jnp.float64,
    )
    model = GNS(particle_dimension=dim, latent_size=latent,
                num_mp_steps=mp_steps, compute_dtype="float64")
    init, apply = make_model_fns(model)
    features, nbrs = case.allocate_eval((pos[:, :isl], ptype))
    params, _ = init(jax.random.PRNGKey(1), (features, ptype))
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        if np.asarray(x).dtype.kind == "f" else jnp.asarray(x),
        params,
    )
    stats = case.normalization_stats
    # the spatial step's window layout: noised (== raw, noise 0) + raw
    pos_full = np.concatenate([pos, pos[:, :isl]], axis=1)
    return (case, apply, params, pos, pos_full, ptype, nbrs, stats,
            metadata, box, cutoff, mp_steps)


def test_spatial_pushforward_8dev_matches_1dev():
    """Gradient parity of the unrolled (pushforward) spatial train step:
    8-slab-ring results equal the single-device computation, including
    the no-grad unroll forward and the shifted target frame."""
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_gns_train_step,
    )

    (case, apply, params, pos, pos_full, ptype, nbrs, stats, metadata,
     box, cutoff, mp_steps) = _pushforward_fixture()
    isl, dim = 4, 3
    k_cap = nbrs.idx.shape[1]

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        pos_sh, ptype_sh, counts, _ = spatial_partition(
            pos_full, ptype, n_dev, box_x=box
        )
        step, fp = build_spatial_gns_train_step(
            mesh, params, box=[box] * dim, cutoff=cutoff,
            input_seq_length=isl, num_mp_steps=mp_steps, k_cap=k_cap,
            normalization_stats=stats, compute_dtype=jnp.float64,
        )
        loss, grads, overflow = step(
            jax.tree.map(jnp.asarray, fp), jnp.asarray(pos_sh),
            jnp.asarray(ptype_sh), jnp.asarray(counts), unroll_steps=1,
        )
        assert not bool(overflow)
        results[n_dev] = (float(loss), jax.tree.map(np.asarray, grads))

    loss1, g1 = results[1]
    loss8, g8 = results[8]
    np.testing.assert_allclose(loss8, loss1, rtol=1e-9)
    for (k, v1), (_, v8) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(
            v8, v1, rtol=1e-7, atol=1e-12,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_spatial_pushforward_loss_matches_standard_semantics():
    """The spatial unrolled loss equals the standard pushforward math:
    a no-grad forward on the input window, integrate from the raw base,
    loss forward on the pushed window against the target shifted by the
    unroll count (reference strats.py:112-161 semantics)."""
    from lagrangebench_tpu.parallel.spatial import (
        build_spatial_gns_train_step,
    )
    from lagrangebench_tpu.utils import get_kinematic_mask

    (case, apply, params, pos, pos_full, ptype, nbrs, stats, metadata,
     box, cutoff, mp_steps) = _pushforward_fixture()
    isl, dim, unroll = 4, 3, 1

    # --- standard-path reference (single device, case/apply math) ---
    cur = jnp.asarray(pos[:, :isl], jnp.float64)
    ptype_j = jnp.asarray(ptype)
    nbrs_ref = nbrs
    for _ in range(unroll):
        feats, nbrs_ref = case.preprocess_eval((cur, ptype_j), nbrs_ref)
        out, _ = apply(params, {}, (feats, ptype_j))
        next_pos = case.integrate(
            {"acc": jnp.asarray(out["acc"], jnp.float64)}, cur
        )
        cur = jnp.concatenate([cur[:, 1:], next_pos[:, None]], axis=1)
    feats, nbrs_ref = case.preprocess_eval((cur, ptype_j), nbrs_ref)
    out, _ = apply(params, {}, (feats, ptype_j))
    acc_pred = jnp.asarray(out["acc"], jnp.float64)

    def disp(a, b):
        d = a - b
        return d - box * jnp.round(d / box)

    p64 = jnp.asarray(pos, jnp.float64)
    cur_vel = disp(p64[:, isl - 1 + unroll], p64[:, isl - 2 + unroll])
    next_vel = disp(p64[:, isl + unroll], p64[:, isl - 1 + unroll])
    acc_t = (
        next_vel - cur_vel - stats["acceleration"]["mean"]
    ) / stats["acceleration"]["std"]
    non_kin = ~get_kinematic_mask(ptype_j)
    per_node = jnp.sum((acc_pred - acc_t) ** 2, axis=-1)
    loss_ref = float(
        jnp.sum(jnp.where(non_kin, per_node, 0.0)) / non_kin.sum()
    )

    # --- spatial step, 1 device ---
    mesh = make_mesh(1)
    pos_sh, ptype_sh, counts, _ = spatial_partition(
        pos_full, ptype, 1, box_x=box
    )
    step, fp = build_spatial_gns_train_step(
        mesh, params, box=[box] * dim, cutoff=cutoff,
        input_seq_length=isl, num_mp_steps=mp_steps,
        k_cap=nbrs.idx.shape[1],
        normalization_stats=stats, compute_dtype=jnp.float64,
    )
    loss, _, overflow = step(
        jax.tree.map(jnp.asarray, fp), jnp.asarray(pos_sh),
        jnp.asarray(ptype_sh), jnp.asarray(counts), unroll_steps=unroll,
    )
    assert not bool(overflow)
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-9)


def test_host_gns_noise_matches_strats_semantics():
    """_host_gns_noise mirrors strats.add_gns_noise's contract: kinematic
    particles untouched, every frame from the last input on shifted by
    the SAME offset (so target velocities/accelerations stay consistent),
    and the last input step's velocity noise has std ~= noise_std."""
    from lagrangebench_tpu.parallel.spatial import _host_gns_noise

    rng = np.random.default_rng(0)
    n, isl, t, dim, box = 50000, 6, 8, 2, 1.0
    noise_std = 3e-4
    pos = rng.uniform(0.1, 0.9, size=(n, t, dim))
    ptype = np.zeros(n, np.int32)
    ptype[:100] = 1  # walls
    ptype[100:200] = 2  # moving walls

    out = _host_gns_noise(
        np.random.default_rng(1), pos, ptype, isl, noise_std, [box] * dim
    )

    # kinematic rows: bitwise unchanged (mod of untouched positions)
    np.testing.assert_array_equal(out[:200], np.mod(pos[:200], box))
    # fluid rows ARE perturbed
    assert np.abs(out[200:, :isl] - pos[200:, :isl]).max() > 0
    # frames isl-1..t-1 share one offset per particle (targets shifted by
    # the last input frame's noise)
    off = out[:, isl - 1] - pos[:, isl - 1]
    for f in range(isl, t):
        np.testing.assert_allclose(out[:, f] - pos[:, f], off, atol=1e-12)
    # last input step's velocity noise std ~= noise_std (the random-walk
    # scaling contract of strats.random_walk_position_noise)
    dvel = (out[200:, isl - 1] - out[200:, isl - 2]) - (
        pos[200:, isl - 1] - pos[200:, isl - 2]
    )
    assert abs(dvel.std() / noise_std - 1.0) < 0.05
    # frame 0 carries no noise
    np.testing.assert_allclose(out[:, 0], np.mod(pos[:, 0], box))


@pytest.mark.parametrize("model_name", ["segnn", "egnn"])
def test_train_spatial_loop_smoke_steerable(model_name):
    """Loop-level spatial-training coverage for the steerable families.

    Grad parity for segnn/egnn is covered algebraically by
    test_spatial_train_step_matches_single_device; this exercises the
    actual training LOOP (data pipeline, partitioning, optimizer,
    checkpointing) on a 4-device mesh, which previously only gns/painn
    had."""
    import os
    import tempfile

    from lagrangebench_tpu.config import Config
    from lagrangebench_tpu.data.synthetic import make_synthetic_dataset
    from lagrangebench_tpu.data import H5Dataset
    from lagrangebench_tpu.checkpoint import load_checkpoint
    from lagrangebench_tpu.parallel.spatial import train_spatial

    root = tempfile.mkdtemp()
    path = make_synthetic_dataset(
        root, n_particles=512, dim=3, box=1.0, seq_len_train=30,
        seq_len_eval=20, n_trajs=2, name="TSP",
    )
    isl = 4
    data_train = H5Dataset("train", dataset_path=path, input_seq_length=isl,
                           extra_seq_length=1)
    data_valid = H5Dataset("valid", dataset_path=path, input_seq_length=isl,
                           extra_seq_length=8)
    md = data_train.metadata

    case = case_builder(
        box=[1.0] * 3, metadata=md, input_seq_length=isl,
        cfg_neighbors={"backend": "celllist", "multiplier": 1.4,
                       "format": "dense"},
        noise_std=3e-4,
        cfg_model={"magnitude_features": True},
    )
    mp_steps = 2
    if model_name == "segnn":
        from lagrangebench_tpu.models.e3 import Irreps
        from lagrangebench_tpu.models.segnn import SEGNN, node_feature_irreps

        model = SEGNN(
            node_features_irreps=node_feature_irreps(md, isl, False, True, True),
            edge_features_irreps=Irreps("1x1o + 1x0e"),
            scalar_units=8, lmax_hidden=1, lmax_attributes=1,
            output_irreps=Irreps("1x1o"), num_mp_steps=mp_steps,
            n_vels=isl - 1,
        )
    else:
        from lagrangebench_tpu.models.egnn import EGNN
        from lagrangebench_tpu.ops import space

        disp, shift = space.periodic(jnp.full(3, 1.0))
        stats = case.normalization_stats
        model = EGNN(
            hidden_size=8, output_size=1, dt=0.01, n_vels=isl - 1,
            displacement_fn=disp, shift_fn=shift,
            velocity_stats=stats["velocity"], num_mp_steps=mp_steps,
        )
    init, apply = make_model_fns(model)
    pos0, ptype0 = data_train[0]
    features, _ = case.allocate_eval(
        (np.asarray(pos0)[:, :isl], np.asarray(ptype0))
    )
    params0, _ = init(jax.random.PRNGKey(0), (features, np.asarray(ptype0)))

    cfg_train = Config()
    cfg_train.batch_size = 2
    cfg_train.noise_std = 3e-4
    cfg_train.step_max = 3
    cfg_train.optimizer = Config()
    cfg_train.optimizer.lr_start = 1e-3
    cfg_train.optimizer.lr_decay_steps = 1000
    cfg_train.optimizer.lr_decay_rate = 0.1
    cfg_train.optimizer.lr_final = 1e-6
    cfg_train.pushforward = Config()
    cfg_train.pushforward.steps = [-1]
    cfg_train.pushforward.unrolls = [0]
    cfg_train.pushforward.probs = [1]
    cfg_logging = Config()
    cfg_logging.log_steps = 1
    cfg_logging.eval_steps = 2

    ckp = os.path.join(root, "ckp")
    std_params, state, _ = train_spatial(
        params0, case, data_train, data_valid,
        n_devices=4, model=model_name, num_mp_steps=mp_steps,
        model_def=model,
        cfg_train=cfg_train, cfg_logging=cfg_logging,
        input_seq_length=isl, metadata=md, seed=0, store_ckp=ckp,
    )
    # the loop ran, checkpointed in the standard layout, and the returned
    # params are finite, consumable by the standard model, and updated
    _, _, _, step = load_checkpoint(ckp)
    assert step == 2
    out, _ = apply(std_params, {}, (features, jnp.asarray(ptype0)))
    key = "acc" if model_name == "segnn" else "pos"
    assert np.isfinite(np.asarray(out[key])).all()
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(std_params), jax.tree.leaves(params0))
        if np.asarray(a).dtype.kind == "f"
    )
    assert moved
