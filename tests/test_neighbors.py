"""Neighbor search: backends agree with a numpy brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.ops import neighbor_list, periodic, free


def brute_force_edges(pos, box, cutoff, periodic_box, num_particles=None):
    """Set of (receiver, sender) pairs within cutoff (including self)."""
    n = pos.shape[0]
    npart = n if num_particles is None else num_particles
    edges = set()
    for i in range(npart):
        for j in range(npart):
            d = pos[i] - pos[j]
            if periodic_box:
                d = np.mod(d + box / 2, box) - box / 2
            if np.sqrt((d**2).sum()) <= cutoff:
                edges.add((i, j))
    return edges


def extract_edges(nbrs, n):
    idx = np.asarray(nbrs.idx)
    mask = (idx[0] < n) & (idx[1] < n)
    return set(zip(idx[0][mask].tolist(), idx[1][mask].tolist()))


@pytest.mark.parametrize("backend", ["allpairs", "celllist"])
@pytest.mark.parametrize("periodic_box", [True, False])
def test_backends_match_bruteforce(backend, periodic_box):
    rng = np.random.default_rng(0)
    box = 2.0
    cutoff = 0.31
    n = 64
    pos = rng.uniform(0, box, size=(n, 3))

    if periodic_box:
        disp, _ = periodic(box)
    else:
        disp, _ = free()

    fns = neighbor_list(
        disp,
        [box] * 3,
        r_cutoff=cutoff,
        backend=backend,
        pbc=[periodic_box] * 3,
    )
    nbrs = fns.allocate(jnp.asarray(pos))
    assert not bool(nbrs.did_buffer_overflow)

    got = extract_edges(nbrs, n)
    want = brute_force_edges(pos, box, cutoff, periodic_box)
    assert got == want


@pytest.mark.parametrize("backend", ["allpairs", "celllist"])
def test_update_tracks_positions(backend):
    rng = np.random.default_rng(1)
    box, cutoff, n = 2.0, 0.35, 48
    disp, _ = periodic(box)
    fns = neighbor_list(disp, [box] * 3, cutoff, backend=backend)

    pos0 = rng.uniform(0, box, size=(n, 3))
    nbrs = fns.allocate(jnp.asarray(pos0))

    pos1 = np.mod(pos0 + rng.normal(0, 0.02, size=pos0.shape), box)
    nbrs1 = nbrs.update(jnp.asarray(pos1))
    assert not bool(nbrs1.did_buffer_overflow)
    assert extract_edges(nbrs1, n) == brute_force_edges(pos1, box, cutoff, True)


def test_overflow_flag():
    """Compressing the system must raise the overflow flag, not crash."""
    rng = np.random.default_rng(2)
    box, cutoff, n = 4.0, 0.5, 128
    disp, _ = periodic(box)
    fns = neighbor_list(disp, [box] * 3, cutoff, capacity_multiplier=1.05)

    pos0 = rng.uniform(0, box, size=(n, 3))
    nbrs = fns.allocate(jnp.asarray(pos0))
    # collapse everything into a tiny ball -> way more edges than capacity
    pos1 = 2.0 + 0.01 * rng.uniform(size=(n, 3))
    nbrs1 = nbrs.update(jnp.asarray(pos1))
    assert bool(nbrs1.did_buffer_overflow)

    # re-allocate at the dense configuration succeeds
    nbrs2 = fns.allocate(jnp.asarray(pos1))
    assert not bool(nbrs2.did_buffer_overflow)
    assert extract_edges(nbrs2, n) == brute_force_edges(pos1, box, cutoff, True)


def test_padded_particles_excluded():
    """Particles beyond num_particles (padding) must produce no edges."""
    box, cutoff = 2.0, 0.5
    disp, _ = periodic(box)
    fns = neighbor_list(disp, [box] * 2, cutoff, pbc=[True, True])
    # 3 real particles + 2 padded at the origin
    pos = np.array([[0.5, 0.5], [0.6, 0.5], [1.5, 1.5], [0.0, 0.0], [0.0, 0.0]])
    nbrs = fns.allocate(jnp.asarray(pos), num_particles=3)
    got = extract_edges(nbrs, 5)
    want = brute_force_edges(pos, box, cutoff, True, num_particles=3)
    assert got == want
    assert all(r < 3 and s < 3 for r, s in got)


def test_receiver_sorted_edges():
    rng = np.random.default_rng(3)
    box, cutoff, n = 2.0, 0.4, 32
    disp, _ = periodic(box)
    fns = neighbor_list(disp, [box] * 3, cutoff, backend="celllist")
    nbrs = fns.allocate(jnp.asarray(rng.uniform(0, box, size=(n, 3))))
    receivers = np.asarray(nbrs.idx[0])
    assert (np.diff(receivers) >= 0).all(), "edges must be receiver-sorted"


def test_edge_capacity_is_lane_aligned():
    rng = np.random.default_rng(4)
    box, cutoff, n = 2.0, 0.4, 32
    disp, _ = periodic(box)
    fns = neighbor_list(disp, [box] * 3, cutoff)
    nbrs = fns.allocate(jnp.asarray(rng.uniform(0, box, size=(n, 3))))
    assert nbrs.idx.shape[1] % 128 == 0


def test_pallas_compile_vmem_oom_falls_back_to_celllist(monkeypatch):
    """The host-side VMEM admissibility check is an estimate; when the
    compiler's own scoped-VMEM accounting disagrees (seen with fat SPH
    cutoffs: 35M needed vs the 16M limit), allocate() must degrade to the
    celllist backend instead of crashing (ops/neighbors.py allocate)."""
    from lagrangebench_tpu.ops import neighbors_pallas

    def exploding_factory(**kwargs):
        def edges(position, num_particles):
            raise RuntimeError(
                "Ran out of memory in memory space vmem while allocating"
            )

        return edges

    monkeypatch.setattr(neighbors_pallas, "make_edges_fn", exploding_factory)
    # force=True skips the TPU-only guard so the pallas path builds on CPU
    box = np.array([1.0, 1.0])
    disp, _ = periodic(jnp.asarray(box))
    pos = jnp.asarray(np.random.default_rng(0).uniform(size=(64, 2)), jnp.float32)
    fns = neighbor_list(
        disp, box, 0.3, backend="pallas", format="dense", pbc=[True, True]
    )
    with pytest.warns(UserWarning, match="scoped-VMEM"):
        nbrs = fns.allocate(pos)
    # the fallback result must match a native celllist build
    ref = neighbor_list(
        disp, box, 0.3, backend="celllist", format="dense", pbc=[True, True]
    ).allocate(pos)
    got = {(int(i), int(s)) for i, row in enumerate(np.asarray(nbrs.idx))
           for s in row if s < 64}
    want = {(int(i), int(s)) for i, row in enumerate(np.asarray(ref.idx))
           for s in row if s < 64}
    assert got == want
