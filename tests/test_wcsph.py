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
