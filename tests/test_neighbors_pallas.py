"""Pallas neighbor kernel: parity with the XLA dense cell-list backend.

Runs in interpreter mode on CPU (the same code path compiles on TPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.ops import neighbor_list, periodic, free

from .test_dense_format import dense_edge_set
from .test_neighbors import brute_force_edges


@pytest.mark.parametrize("periodic_box", [True, False])
@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_matches_bruteforce(periodic_box, dim):
    rng = np.random.default_rng(0)
    box, cutoff, n = 2.0, 0.31, 96
    pos = rng.uniform(0, box, size=(n, dim))

    disp, _ = periodic(box) if periodic_box else free()
    fns = neighbor_list(
        disp,
        [box] * dim,
        cutoff,
        backend="pallas",
        format="dense",
        pbc=[periodic_box] * dim,
    )
    nbrs = fns.allocate(jnp.asarray(pos))
    assert not bool(nbrs.did_buffer_overflow)

    got = dense_edge_set(nbrs, n)
    want = brute_force_edges(pos, box, cutoff, periodic_box)
    assert got == want


def test_pallas_update_and_overflow():
    rng = np.random.default_rng(1)
    box, cutoff, n = 3.0, 0.4, 128
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    pos0 = rng.uniform(0, box, size=(n, 3))
    nbrs = fns.allocate(jnp.asarray(pos0))

    pos1 = np.mod(pos0 + rng.normal(0, 0.02, size=pos0.shape), box)
    nbrs1 = nbrs.update(jnp.asarray(pos1))
    assert not bool(nbrs1.did_buffer_overflow)
    assert dense_edge_set(nbrs1, n) == brute_force_edges(pos1, box, cutoff, True)

    # collapse -> overflow flag
    dense_pos = 1.5 + 0.01 * rng.uniform(size=(n, 3))
    nbrs2 = nbrs.update(jnp.asarray(dense_pos))
    assert bool(nbrs2.did_buffer_overflow)


def test_pallas_padding_excluded():
    box, cutoff = 2.0, 0.5
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, box, size=(64, 3))
    pos[50:] = 0.0  # padded particles parked at the origin
    nbrs = fns.allocate(jnp.asarray(pos), num_particles=50)
    got = dense_edge_set(nbrs, 64)
    want = brute_force_edges(pos, box, cutoff, True, num_particles=50)
    assert got == want


def test_binning_kernel_matches_xla_table():
    import jax
    import jax.numpy as jnp

    from lagrangebench_tpu.ops import neighbors as nb
    from lagrangebench_tpu.ops.neighbors_pallas import build_cell_table_pallas

    rng = np.random.default_rng(5)
    n, box, cutoff = 200, 2.0, 0.31
    pos = jnp.asarray(rng.uniform(0, box, size=(n, 3)), jnp.float32)
    grid = nb.make_grid([box] * 3, cutoff, [True] * 3)

    t_ref, p_ref, ovf_ref, _ = nb._build_cell_table(pos, n, grid, 8)
    t_pal, p_pal, ovf_pal, _ = build_cell_table_pallas(
        pos, n, grid, 8, tile=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_pal))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_pal))
    assert bool(ovf_ref) == bool(ovf_pal) == False  # noqa: E712

    # padding excluded
    t_pad, _, _, _ = build_cell_table_pallas(
        pos, 100, grid, 8, tile=64, interpret=True
    )
    assert (np.asarray(t_pad) < 100).sum() == 100


def test_binning_kernel_overflow_flag():
    import jax.numpy as jnp

    from lagrangebench_tpu.ops import neighbors as nb
    from lagrangebench_tpu.ops.neighbors_pallas import build_cell_table_pallas

    # all particles in one cell -> occupancy 32 > cap 8
    pos = jnp.full((32, 3), 0.1, jnp.float32)
    grid = nb.make_grid([2.0] * 3, 0.31, [True] * 3)
    _, _, ovf, _ = build_cell_table_pallas(pos, 32, grid, 8, tile=16, interpret=True)
    assert bool(ovf)


def test_pallas_batched_vmap_matches_single():
    """vmapped updates hit the custom batching rule (one shared launch)."""
    import jax

    rng = np.random.default_rng(7)
    box, cutoff, n, b = 2.0, 0.31, 96, 3
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    pos_b = rng.uniform(0, box, size=(b, n, 3))
    npart = np.array([n, n - 20, n], np.int32)

    shell = fns.allocate_shell(pos_b[0], num_particles=int(npart[0]))
    upd = jax.vmap(
        lambda p, m: shell.update_fn(p, None, num_particles=m),
        in_axes=(0, 0),
    )
    nl_b = upd(jnp.asarray(pos_b), jnp.asarray(npart))
    assert nl_b.idx.shape[0] == b
    assert not bool(jnp.any(nl_b.did_buffer_overflow))

    for i in range(b):
        single = shell.update_fn(
            jnp.asarray(pos_b[i]), None, num_particles=int(npart[i])
        )
        got = {
            (r, int(s))
            for r in range(n)
            for s in np.asarray(nl_b.idx[i][r])
            if s < n
        }
        want = dense_edge_set(single, n)
        assert got == want
        assert want == brute_force_edges(
            pos_b[i], box, cutoff, True, num_particles=int(npart[i])
        )


def test_pallas_batched_overflow_per_sample():
    """A collapsed sample flags overflow; vmapped flag is conservative."""
    import jax

    rng = np.random.default_rng(8)
    box, cutoff, n, b = 3.0, 0.4, 128, 2
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    pos0 = rng.uniform(0, box, size=(n, 3))
    shell = fns.allocate_shell(pos0)

    collapsed = 1.5 + 0.01 * rng.uniform(size=(n, 3))
    pos_b = np.stack([pos0, collapsed])
    upd = jax.vmap(lambda p: shell.update_fn(p, None), in_axes=0)
    nl_b = upd(jnp.asarray(pos_b))
    ovf = np.asarray(nl_b.did_buffer_overflow)
    assert ovf.shape == (b,)
    assert ovf.any()


def test_pallas_vmem_fallback_to_celllist(monkeypatch):
    """When even the STREAMED kernel estimate exceeds the VMEM budget the
    allocation falls back to the XLA celllist backend with a warning (and
    still produces the right edges). Forced with a tiny budget — at real
    budgets the streamed kernel covers every size we can host."""
    import warnings as _w

    from lagrangebench_tpu.ops import neighbors as nb

    rng = np.random.default_rng(0)
    n, dim = 512, 3
    box = [1.0, 1.0, 1.0]
    cutoff = 0.25
    pos = jnp.asarray(rng.uniform(0, 1, (n, dim)), jnp.float32)
    disp, _ = periodic(jnp.asarray(box))

    monkeypatch.setattr(nb, "_kernel_vmem_budget", lambda: 20_000)
    fns = neighbor_list(disp, box, cutoff, backend="pallas",
                        capacity_multiplier=1.25, format="dense",
                        pbc=[True] * dim)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        nbrs = fns.allocate(pos)
        assert any("VMEM budget" in str(r.message) for r in rec)
    assert not bool(nbrs.did_buffer_overflow)
    assert dense_edge_set(nbrs, n) == brute_force_edges(
        np.asarray(pos), 1.0, cutoff, True
    )


def test_pallas_boost_beyond_vmem_falls_back(monkeypatch):
    """Escalation retries can push the boosted column capacity past the
    pallas kernel's VMEM budget: the allocation must fall back to celllist
    for that retry (it used to assert inside the kernel factory — hit by
    long rollouts whose overflow retry escalates capacity_boost)."""
    import warnings as _w

    from lagrangebench_tpu.ops import neighbors as nb

    # budget that admits the boost-1 monolithic kernel but not the
    # boost-8 streamed one (at real budgets the streamed kernel absorbs
    # this boost; the celllist safety net must still exist behind it)
    monkeypatch.setattr(nb, "_kernel_vmem_budget", lambda: 1_000_000)

    rng = np.random.default_rng(1)
    n, dim = 512, 3
    box = [1.0, 1.0, 1.0]
    cutoff = 0.25
    pos = jnp.asarray(rng.uniform(0, 1, (n, dim)), jnp.float32)
    disp, _ = periodic(jnp.asarray(box))
    fns = neighbor_list(disp, box, cutoff, backend="pallas",
                        capacity_multiplier=1.25, format="dense",
                        pbc=[True] * dim)

    # admissible at boost 1 (pallas), inadmissible at a huge boost
    base = fns.allocate_shell(np.asarray(pos))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        boosted = fns.allocate_shell(np.asarray(pos), capacity_boost=8.0)
        assert any("VMEM budget" in str(r.message) for r in rec)

    # the boosted (celllist) list still produces the right edge set
    got = boosted.update(pos)
    ref = base.update(pos)
    assert not bool(got.did_buffer_overflow)
    assert dense_edge_set(got, n) == dense_edge_set(ref, n)

# ---------------------------------------------------------------------------
# in-kernel edge geometry (emit_geometry)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("periodic_box", [True, False])
@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_emit_geometry_matches_gather(periodic_box, dim):
    """The kernel-emitted rel_disp/rel_dist equal the feature chain's
    sender-position gather + min-image computation, slot for slot, and the
    sender matrix is bit-identical to the geometry-free kernel's."""
    rng = np.random.default_rng(7)
    box, cutoff, n = 2.0, 0.31, 96
    pos = rng.uniform(0, box, size=(n, dim))

    disp, _ = periodic(box) if periodic_box else free()
    kw = dict(backend="pallas", format="dense", pbc=[periodic_box] * dim)
    fns_g = neighbor_list(disp, [box] * dim, cutoff, emit_geometry=True, **kw)
    fns_p = neighbor_list(disp, [box] * dim, cutoff, **kw)

    nbrs_g = fns_g.allocate(jnp.asarray(pos))
    nbrs_p = fns_p.allocate(jnp.asarray(pos))
    assert not bool(nbrs_g.did_buffer_overflow)
    np.testing.assert_array_equal(
        np.asarray(nbrs_g.idx), np.asarray(nbrs_p.idx)
    )

    senders = np.asarray(nbrs_g.idx)
    got_disp = np.asarray(nbrs_g.aux["rel_disp"])
    got_dist = np.asarray(nbrs_g.aux["rel_dist"])
    assert got_disp.shape == senders.shape + (dim,)
    assert got_dist.shape == senders.shape + (1,)

    # the gather-path reference (case/features.py dense branch)
    import jax

    disp_vv = jax.vmap(jax.vmap(disp, in_axes=(0, 0)), in_axes=(0, 0))
    recv = np.broadcast_to(pos[:, None, :], senders.shape + (dim,))
    send = pos[np.minimum(senders, n - 1)]
    want_disp = np.asarray(disp_vv(jnp.asarray(recv), jnp.asarray(send)))
    valid = (senders < n)[..., None]
    want_disp = np.where(valid, want_disp / cutoff, 0.0)
    want_dist = np.linalg.norm(want_disp, axis=-1, keepdims=True)

    np.testing.assert_allclose(got_disp, want_disp, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got_dist, want_dist, rtol=2e-5, atol=2e-6)


def test_pallas_emit_geometry_batched_and_padded():
    """Geometry survives the custom-vmap batched launch and padded rows
    stay exactly zero."""
    import jax

    rng = np.random.default_rng(8)
    box, cutoff, n, bsz = 2.0, 0.4, 80, 3
    dim = 3
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * dim, cutoff, backend="pallas", format="dense",
        emit_geometry=True,
    )
    pos_b = rng.uniform(0, box, size=(bsz, n, dim))
    pos_b[:, 70:] = 0.0  # padded tail
    npart = np.full((bsz,), 70, np.int32)

    nbrs0 = fns.allocate(jnp.asarray(pos_b[0]), num_particles=70)
    nbrs_b = jax.vmap(
        lambda p, k: nbrs0.update(p, num_particles=k)
    )(jnp.asarray(pos_b), jnp.asarray(npart))

    for s in range(bsz):
        single = nbrs0.update(jnp.asarray(pos_b[s]), num_particles=70)
        np.testing.assert_array_equal(
            np.asarray(nbrs_b.idx[s]), np.asarray(single.idx)
        )
        np.testing.assert_allclose(
            np.asarray(nbrs_b.aux["rel_disp"][s]),
            np.asarray(single.aux["rel_disp"]),
            rtol=1e-6,
        )
        # padded receiver rows: zero geometry
        assert np.all(np.asarray(nbrs_b.aux["rel_disp"][s][70:]) == 0.0)
        assert np.all(np.asarray(nbrs_b.aux["rel_dist"][s][70:]) == 0.0)

# ---------------------------------------------------------------------------
# streamed (large-N) scan kernel
# ---------------------------------------------------------------------------


def _shrunk_budget(monkeypatch, value):
    from lagrangebench_tpu.ops import neighbors as nb

    monkeypatch.setattr(nb, "_kernel_vmem_budget", lambda: value)


@pytest.mark.parametrize("emit_geometry", [False, True])
@pytest.mark.parametrize("dim", [2, 3])
def test_streamed_kernel_matches_bruteforce(monkeypatch, dim, emit_geometry):
    """The streamed scan kernel (stencil as the innermost grid axis, one
    sender column per step, K-slot accumulation across steps) must be
    edge-set identical to brute force — forced onto the streamed path by
    shrinking the VMEM budget below the monolithic estimate."""
    rng = np.random.default_rng(11)
    box, cutoff, n = 2.0, 0.31, 96
    pos = rng.uniform(0, box, size=(n, dim))

    # below each dim's monolithic estimate, above its streamed one
    _shrunk_budget(monkeypatch, 150_000 if dim == 3 else 60_000)

    disp, _ = periodic(box)
    fns = neighbor_list(
        disp,
        [box] * dim,
        cutoff,
        backend="pallas",
        format="dense",
        pbc=[True] * dim,
        emit_geometry=emit_geometry,
    )
    nbrs = fns.allocate(jnp.asarray(pos))
    assert not bool(nbrs.did_buffer_overflow)
    assert dense_edge_set(nbrs, n) == brute_force_edges(pos, box, cutoff, True)

    # update path reuses the streamed kernel at fixed capacity
    pos1 = np.mod(pos + rng.normal(0, 0.02, size=pos.shape), box)
    nbrs1 = nbrs.update(jnp.asarray(pos1))
    assert not bool(nbrs1.did_buffer_overflow)
    assert dense_edge_set(nbrs1, n) == brute_force_edges(
        pos1, box, cutoff, True
    )

    if emit_geometry:
        import jax

        senders = np.asarray(nbrs1.idx)
        got_disp = np.asarray(nbrs1.aux["rel_disp"])
        got_dist = np.asarray(nbrs1.aux["rel_dist"])
        disp_vv = jax.vmap(jax.vmap(disp, in_axes=(0, 0)), in_axes=(0, 0))
        recv = np.broadcast_to(pos1[:, None, :], senders.shape + (dim,))
        send = pos1[np.minimum(senders, n - 1)]
        want_disp = np.asarray(disp_vv(jnp.asarray(recv), jnp.asarray(send)))
        valid = (senders < n)[..., None]
        want_disp = np.where(valid, want_disp / cutoff, 0.0)
        want_dist = np.linalg.norm(want_disp, axis=-1, keepdims=True)
        np.testing.assert_allclose(got_disp, want_disp, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(got_dist, want_dist, rtol=2e-5, atol=2e-6)


def test_streamed_vs_monolithic_same_edges(monkeypatch):
    """Direct A/B: identical positions through both kernel regimes give
    the identical sender matrix (not just the same edge set)."""
    rng = np.random.default_rng(13)
    box, cutoff, n = 2.0, 0.31, 128
    pos = rng.uniform(0, box, size=(n, 3))
    disp, _ = periodic(box)

    fns_mono = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    nbrs_mono = fns_mono.allocate(jnp.asarray(pos))

    _shrunk_budget(monkeypatch, 200_000)
    fns_str = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    nbrs_str = fns_str.allocate(jnp.asarray(pos))
    assert dense_edge_set(nbrs_mono, n) == dense_edge_set(nbrs_str, n)


def test_streamed_overflow_flag(monkeypatch):
    """Row overflow (counts beyond K capacity) is detected on the
    streamed path just like the monolithic one."""
    rng = np.random.default_rng(17)
    box, cutoff, n = 3.0, 0.4, 128
    _shrunk_budget(monkeypatch, 200_000)
    disp, _ = periodic(box)
    fns = neighbor_list(
        disp, [box] * 3, cutoff, backend="pallas", format="dense"
    )
    pos0 = rng.uniform(0, box, size=(n, 3))
    nbrs = fns.allocate(jnp.asarray(pos0))
    assert not bool(nbrs.did_buffer_overflow)
    dense_pos = 1.5 + 0.01 * rng.uniform(size=(n, 3))
    nbrs2 = nbrs.update(jnp.asarray(dense_pos))
    assert bool(nbrs2.did_buffer_overflow)


def test_tall_box_streams_instead_of_celllist_fallback():
    """A column-dense system that used to exceed the monolithic kernel's
    VMEM budget (and fell back to celllist) now stays on pallas via the
    streamed kernel — no fallback warning — and matches the celllist
    edge set."""
    import warnings as _w

    rng = np.random.default_rng(0)
    n, dim = 1400, 3
    box = [1.0, 1.0, 8.0]
    cutoff = 0.33  # 9 (x, y) columns, ~155 particles each
    pos = np.stack([
        rng.uniform(0, 1, n), rng.uniform(0, 1, n), rng.uniform(0, 8, n)
    ], axis=1)
    pos = jnp.asarray(pos, jnp.float32)
    disp, _ = periodic(jnp.asarray(box))
    fns = neighbor_list(disp, box, cutoff, backend="pallas",
                        capacity_multiplier=1.25, format="dense",
                        pbc=[True] * dim)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        nbrs = fns.allocate(pos)
        assert not any("VMEM budget" in str(r.message) for r in rec)
    assert not bool(nbrs.did_buffer_overflow)

    ref_fns = neighbor_list(disp, box, cutoff, backend="celllist",
                            capacity_multiplier=1.25, format="dense",
                            pbc=[True] * dim)
    ref = ref_fns.allocate(pos)
    a = np.asarray(nbrs.idx)
    b = np.asarray(ref.idx)
    for row in range(0, n, 101):
        sa = set(a[row][a[row] < n])
        sb = set(b[row][b[row] < n])
        assert sa == sb, f"row {row} differs"
