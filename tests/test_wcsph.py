"""WCSPH dataset-generation solver: dense-layout pair math is correct.

One solver substep must match a brute-force O(N^2) numpy evaluation of the
same scheme (density summation w/ self-edge once, linear EOS, symmetric
pressure gradient, Morris viscosity, symplectic Euler), and a short TGV
run must behave physically (KE decays, density stays near rho0, momentum
is conserved).
"""

import numpy as np
import jax.numpy as jnp

from lagrangebench_tpu.data_gen.wcsph import make_sph, tgv_initial_state


def _brute_force_step(r, v, dx, box, rho0=1.0, c0=10.0, visc=0.01):
    dim = r.shape[1]
    h = 1.5 * dx
    m = rho0 * dx**dim
    dt = 0.2 * h / c0
    sigma = 10.0 / (7.0 * np.pi * h * h) if dim == 2 else 1.0 / (np.pi * h**3)
    box = np.asarray(box)

    def w(q):
        return sigma * np.where(
            q < 1, 1 - 1.5 * q**2 + 0.75 * q**3,
            np.where(q < 2, 0.25 * (2 - q) ** 3, 0.0),
        )

    def dw(q):
        return sigma * np.where(
            q < 1, -3 * q + 2.25 * q**2,
            np.where(q < 2, -0.75 * (2 - q) ** 2, 0.0),
        )

    dr = r[:, None, :] - r[None, :, :]
    dr -= box * np.round(dr / box)
    d = np.sqrt((dr**2).sum(-1) + 1e-16)
    q = d / h
    within = d <= 2.0 * h  # the neighbor list radius (incl. self)
    rho = m * (w(q) * within).sum(1)
    p = c0**2 * (rho - rho0)
    gradw = (np.where(within, dw(q) / (h * d), 0.0))[..., None] * dr
    pij = (p / rho**2)[:, None] + (p / rho**2)[None, :]
    acc = -m * (pij[..., None] * gradw).sum(1)
    vij = v[:, None, :] - v[None, :, :]
    lam = (2 * visc * m / rho0) * (dr * gradw).sum(-1) / (d**2 + 0.01 * h * h)
    lam = np.where(within, lam, 0.0)
    acc += (lam[..., None] * vij / rho0).sum(1)
    v2 = v + dt * acc
    r2 = np.mod(r + dt * v2, box)
    return r2, v2, rho


def test_wcsph_substep_matches_brute_force():
    n_side = 12
    dx, box = 1.0 / n_side, [1.0, 1.0]
    r, v = tgv_initial_state(n_side, np.random.default_rng(0))
    nl_fns, advance, dt = make_sph(dx, box, backend="celllist")
    nbrs = nl_fns.allocate(jnp.asarray(r, jnp.float64))
    r1, v1, nbrs = advance(
        jnp.asarray(r, jnp.float64), jnp.asarray(v, jnp.float64), nbrs, 1
    )
    assert not bool(nbrs.did_buffer_overflow)
    r_ref, v_ref, rho_ref = _brute_force_step(r, v, dx, box)
    np.testing.assert_allclose(np.asarray(v1), v_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1), r_ref, rtol=1e-9, atol=1e-12)
    # density summation on a (jittered) lattice lands near rho0
    assert abs(rho_ref.mean() - 1.0) < 0.1


def test_wcsph_tgv_run_is_physical():
    n_side = 16
    dx, box = 1.0 / n_side, [1.0, 1.0]
    r, v = tgv_initial_state(n_side, np.random.default_rng(1))
    nl_fns, advance, dt = make_sph(dx, box, backend="celllist")
    r = jnp.asarray(r, jnp.float64)
    v = jnp.asarray(v, jnp.float64)
    ke0 = float(0.5 * jnp.mean(jnp.sum(v**2, -1)))
    mom0 = np.asarray(jnp.sum(v, axis=0))
    nbrs = nl_fns.allocate(r)
    r, v, nbrs = advance(r, v, nbrs, 200)
    assert not bool(nbrs.did_buffer_overflow)
    ke = float(0.5 * jnp.mean(jnp.sum(v**2, -1)))
    mom = np.asarray(jnp.sum(v, axis=0))
    assert 0.0 < ke < ke0  # viscous decay, no blow-up
    # pairwise-antisymmetric forces conserve momentum
    np.testing.assert_allclose(mom, mom0, atol=1e-8)
    assert np.all(np.asarray(r) >= 0) and np.all(np.asarray(r) < 1.0)


# -- wall-bounded / forced cases ---------------------------------------------


def test_wcsph_hydrostatic_tank_stays_put():
    """Still water in a walled tank under gravity stays (nearly) still.

    The Adami wall pressure extrapolation must balance gravity: after a
    few hundred substeps the fluid's kinetic energy stays tiny relative
    to the hydrostatic scale (g * H = 1 * 0.5 here) and no particle
    leaks through the 3 wall layers.
    """
    from lagrangebench_tpu.data_gen.wcsph import dam_initial_state, make_sph

    dx = 0.05
    # a "dam" whose column spans the full tank width = a resting pool
    r, v, tag, box, wall = dam_initial_state(
        dx,
        np.random.default_rng(3),
        tank=(1.0, 1.0),
        column=(1.0, 0.5),
        jitter=0.01,
    )
    nl_fns, advance, dt = make_sph(
        dx, box, visc=0.05, c0=15.0, pbc=[False, False],
        g_ext=[0.0, -1.0], wall_mask=wall, free_surface=True,
    )
    r = jnp.asarray(r, jnp.float64)
    v = jnp.asarray(v, jnp.float64)
    nbrs = nl_fns.allocate(r)
    r, v, nbrs = advance(r, v, nbrs, 400)
    assert not bool(nbrs.did_buffer_overflow)
    vf = np.asarray(v)[~wall]
    rf = np.asarray(r)[~wall]
    # residual velocities small vs the free-fall scale sqrt(2 g H) ~ 1
    assert np.abs(vf).max() < 0.25, np.abs(vf).max()
    # no fluid particle left the tank (walls at [0, 3dx] margins)
    assert rf[:, 0].min() > 2 * dx and rf[:, 0].max() < box[0] - 2 * dx
    assert rf[:, 1].min() > 2 * dx
    # walls never moved
    rw0 = dam_initial_state(
        dx, np.random.default_rng(3), tank=(1.0, 1.0), column=(1.0, 0.5),
        jitter=0.01,
    )[0][wall]
    np.testing.assert_allclose(np.asarray(r)[wall], rw0, atol=1e-12)


def test_wcsph_rpf_force_accelerates_bands():
    """The band force drives +x flow in the lower half, -x in the upper."""
    from lagrangebench_tpu.data_gen.wcsph import (
        make_sph, rpf_force_fn, rpf_initial_state,
    )

    dx = 1.0 / 16.0
    box = [1.0, 2.0]
    r, v, tag = rpf_initial_state(dx, np.random.default_rng(0), box=box)
    nl_fns, advance, dt = make_sph(
        dx, box, visc=0.1, c0=10.0, pbc=[True, True], force_fn=rpf_force_fn
    )
    rj = jnp.asarray(r, jnp.float64)
    vj = jnp.asarray(v, jnp.float64)
    nbrs = nl_fns.allocate(rj)
    r2, v2, nbrs = advance(rj, vj, nbrs, 100)
    assert not bool(nbrs.did_buffer_overflow)
    v2 = np.asarray(v2)
    r2 = np.asarray(r2)
    lower = r2[:, 1] < 1.0
    assert v2[lower, 0].mean() > 0.01
    assert v2[~lower, 0].mean() < -0.01


def test_wcsph_ldc_lid_drags_fluid():
    """The moving lid (tag 2) drags nearby fluid in +x; walls never move."""
    from lagrangebench_tpu.data_gen.wcsph import ldc_initial_state, make_sph

    dx = 1.0 / 16.0
    r, v, tag, box, wall = ldc_initial_state(
        dx, np.random.default_rng(0), u_lid=1.0
    )
    assert (tag == 2).sum() > 0 and (tag == 1).sum() > 0
    nl_fns, advance, dt = make_sph(
        dx, box, visc=0.05, c0=10.0, pbc=[False, False],
        wall_mask=wall, free_surface=True,
    )
    rj = jnp.asarray(r, jnp.float64)
    vj = jnp.asarray(v, jnp.float64)
    nbrs = nl_fns.allocate(rj)
    r2, v2, nbrs = advance(rj, vj, nbrs, 300)
    assert not bool(nbrs.did_buffer_overflow)
    r2n, v2n = np.asarray(r2), np.asarray(v2)
    # lid kept its prescribed velocity and did not move in y
    np.testing.assert_allclose(v2n[tag == 2, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(r2n[wall], r[wall], atol=1e-12)
    # fluid in the top band picked up positive x-velocity
    fluid = tag == 0
    top = fluid & (r[:, 1] > box[1] - 6 * dx)
    assert v2n[top, 0].mean() > 0.02


def test_wcsph_verlet_skin_matches_exact():
    """Skin-built lists rebuild every nl_every substeps with a padded
    cutoff; every pair term vanishes for q >= 2, so the trajectory must
    match the rebuild-every-substep solver to float tolerance as long as
    no pair closes by more than the skin between rebuilds."""
    import jax.numpy as jnp

    dx, box = 1.0 / 8, [1.0, 1.0]
    rng = np.random.default_rng(3)
    nl0, adv0, dt0 = make_sph(dx, box, backend="celllist")
    nl1, adv1, dt1 = make_sph(
        dx, box, backend="celllist", nl_skin_h=0.25, capacity_multiplier=1.5
    )
    assert dt0 == dt1  # the skin must not touch the CFL step
    r, v = tgv_initial_state(8, rng, dim=2)
    r, v = jnp.asarray(r, jnp.float64), jnp.asarray(v, jnp.float64)
    ra, va, _ = adv0(r, v, nl0.allocate(r), 15)
    rb, vb, nbrs = adv1(r, v, nl1.allocate(r), 15)
    assert not bool(nbrs.did_buffer_overflow)
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb), atol=1e-9)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-8)
