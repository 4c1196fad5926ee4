"""Flat-super-graph batched preprocess: parity with vmap + flatten.

``case.preprocess_batched`` / ``preprocess_eval_batched`` must produce
exactly the features/targets of the original path (per-sample vmapped
preprocess followed by ``flatten_graph_batch``) — they exist only because
the vmapped sender-position gather in the feature chain lowers ~9x slower
on TPU (see ops/batching.py and case/case.py:_preprocess_batched).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.case import case_builder
from lagrangebench_tpu.ops.batching import flatten_graph_batch
from lagrangebench_tpu.utils import broadcast_to_batch


@pytest.fixture(scope="module", params=["dense", "sparse"])
def batched_setup(request):
    fmt = request.param
    metadata = {
        "num_particles_max": 32,
        "periodic_boundary_conditions": [True] * 3,
        "default_connectivity_radius": 0.4,
        "bounds": [[0.0, 1.5]] * 3,
        "acc_mean": [0.0] * 3,
        "acc_std": [1.0] * 3,
        "vel_mean": [0.0] * 3,
        "vel_std": [1.0] * 3,
        "dim": 3,
    }
    case = case_builder(
        box=[1.5] * 3,
        metadata=metadata,
        input_seq_length=3,
        cfg_neighbors={
            "backend": "celllist", "multiplier": 1.5, "format": fmt,
        },
        noise_std=1e-4,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(7)
    b, n = 3, 32
    base = rng.uniform(0, 1.5, size=(b, n, 1, 3))
    vel = rng.normal(0, 0.01, size=(b, n, 1, 3))
    pos = np.mod(base + vel * np.arange(5)[None, None, :, None], 1.5)
    ptype = np.zeros((b, n), dtype=np.int64)
    ptype[:, -2:] = 1  # some kinematic walls
    return case, pos, ptype, fmt


def _alloc_batched(case, pos, ptype):
    """Batched neighbor buffers sized from the first sample."""
    f0, nbrs0 = case.allocate_eval((pos[0][:, :3], ptype[0]))
    return broadcast_to_batch(nbrs0, pos.shape[0])


def test_eval_batched_matches_vmap_flatten(batched_setup):
    case, pos, ptype, fmt = batched_setup
    b, n = ptype.shape
    nbrs_b = _alloc_batched(case, pos, ptype)

    feats_v, nbrs_v = jax.vmap(case.preprocess_eval, in_axes=(0, 0))(
        (pos[:, :, :3], ptype), nbrs_b
    )
    flat_ref, _ = flatten_graph_batch(feats_v, jnp.asarray(ptype))

    flat_new, nbrs_new = case.preprocess_eval_batched(
        (pos[:, :, :3], ptype), nbrs_b
    )

    assert set(flat_new) == set(flat_ref)
    for k in flat_ref:
        if k in ("senders", "receivers"):
            if fmt == "dense":
                np.testing.assert_array_equal(
                    np.asarray(flat_new[k]), np.asarray(flat_ref[k]), err_msg=k
                )
            else:
                # sparse edge ORDER within a sample is backend-defined but
                # the flat edge SET must agree
                pass
        else:
            np.testing.assert_allclose(
                np.asarray(flat_new[k]), np.asarray(flat_ref[k]),
                rtol=0, atol=0, err_msg=k,
            )
    if fmt == "sparse":
        def edge_set(f):
            s = np.asarray(f["senders"]).ravel()
            r = np.asarray(f["receivers"]).ravel()
            valid = s < b * n
            return set(zip(s[valid].tolist(), r[valid].tolist()))

        assert edge_set(flat_new) == edge_set(flat_ref)

    # batched neighbor bookkeeping preserved
    assert nbrs_new.idx.shape == nbrs_v.idx.shape
    np.testing.assert_array_equal(
        np.asarray(nbrs_new.idx), np.asarray(nbrs_v.idx)
    )


def test_train_batched_matches_vmap_flatten(batched_setup):
    case, pos, ptype, fmt = batched_setup
    if fmt == "sparse":
        pytest.skip("train parity covered by the dense layout")
    b, n = ptype.shape
    nbrs_b = _alloc_batched(case, pos, ptype)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    noise_std = 3e-4

    pre_vmap = jax.vmap(case.preprocess, in_axes=(0, 0, None, 0, None))
    keys_v, feats_v, targets_v, nbrs_v = pre_vmap(
        keys, (pos, ptype), noise_std, nbrs_b, 0
    )
    flat_ref, _ = flatten_graph_batch(feats_v, jnp.asarray(ptype))
    targets_ref = {
        k: np.asarray(v).reshape((b * n,) + v.shape[2:])
        for k, v in targets_v.items()
    }

    keys_n, flat_new, targets_new, nbrs_new = case.preprocess_batched(
        keys, (pos, ptype), noise_std, nbrs_b, 0
    )

    np.testing.assert_array_equal(np.asarray(keys_n), np.asarray(keys_v))
    for k in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_new[k]), np.asarray(flat_ref[k]),
            rtol=0, atol=0, err_msg=k,
        )
    for k in targets_ref:
        np.testing.assert_allclose(
            np.asarray(targets_new[k]), targets_ref[k], rtol=0, atol=0,
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(nbrs_new.idx), np.asarray(nbrs_v.idx)
    )
