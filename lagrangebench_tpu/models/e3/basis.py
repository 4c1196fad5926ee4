"""Numerically-constructed O(3) representation machinery.

Everything here runs once at model-build time in numpy (cached), so no
tables of Clebsch-Gordan coefficients are hardcoded:

* real spherical-harmonic basis polynomials up to l=3 in the (x, y, z)
  convention (orthonormal on the unit sphere),
* Wigner-D rotation matrices per l, obtained by least-squares projection of
  rotated basis polynomials onto the basis,
* Clebsch-Gordan intertwiners C[l1, l2 -> l3] as the (1-dimensional) null
  space of the rotation-equivariance constraints over a set of random
  rotations — exact to machine precision and self-consistent with the
  basis convention by construction.

Component normalization: each CG tensor is scaled so that
sum(C^2) = 2*l3 + 1, which keeps unit-variance inputs at unit variance.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, List

import numpy as np

MAX_L = 3


def _basis_polynomials(l: int) -> List[Callable[[np.ndarray], np.ndarray]]:
    """Real orthonormal spherical harmonics (as functions of unit vectors).

    Conventions: l=1 ordered (x, y, z); l=2 ordered
    [xy, yz, (3z^2-1), xz, (x^2-y^2)]; l=3 in an analogous real basis.
    """
    c = 1.0 / np.sqrt(4 * np.pi)
    if l == 0:
        return [lambda v: c * np.ones(v.shape[:-1])]
    x = lambda v: v[..., 0]
    y = lambda v: v[..., 1]
    z = lambda v: v[..., 2]
    if l == 1:
        k = np.sqrt(3) * c
        return [lambda v: k * x(v), lambda v: k * y(v), lambda v: k * z(v)]
    if l == 2:
        k1 = np.sqrt(15) * c
        k2 = np.sqrt(5) / 2 * c
        k3 = np.sqrt(15) / 2 * c
        return [
            lambda v: k1 * x(v) * y(v),
            lambda v: k1 * y(v) * z(v),
            lambda v: k2 * (3 * z(v) ** 2 - 1),
            lambda v: k1 * x(v) * z(v),
            lambda v: k3 * (x(v) ** 2 - y(v) ** 2),
        ]
    if l == 3:
        k = c
        return [
            lambda v: k * np.sqrt(35 / 8) * y(v) * (3 * x(v) ** 2 - y(v) ** 2),
            lambda v: k * np.sqrt(105) * x(v) * y(v) * z(v),
            lambda v: k * np.sqrt(21 / 8) * y(v) * (5 * z(v) ** 2 - 1),
            lambda v: k * np.sqrt(7) / 2 * z(v) * (5 * z(v) ** 2 - 3),
            lambda v: k * np.sqrt(21 / 8) * x(v) * (5 * z(v) ** 2 - 1),
            lambda v: k * np.sqrt(105) / 2 * z(v) * (x(v) ** 2 - y(v) ** 2),
            lambda v: k * np.sqrt(35 / 8) * x(v) * (x(v) ** 2 - 3 * y(v) ** 2),
        ]
    raise NotImplementedError(f"l={l} > MAX_L={MAX_L}")


@lru_cache(maxsize=None)
def _sample_points(n: int = 512, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _eval_basis(l: int, v: np.ndarray) -> np.ndarray:
    """(n_points, 2l+1) basis evaluations."""
    return np.stack([f(v) for f in _basis_polynomials(l)], axis=-1)


def _random_rotations(n: int, seed: int = 3) -> List[np.ndarray]:
    rng = np.random.default_rng(seed)
    rots = []
    for _ in range(n):
        a = rng.normal(size=(3, 3))
        q, r = np.linalg.qr(a)
        q = q * np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        rots.append(q)
    return rots


@lru_cache(maxsize=None)
def wigner_d_cached(l: int, rot_key: int) -> np.ndarray:
    """Wigner D for one of the cached random rotations (by index)."""
    return wigner_d(l, _random_rotations(16)[rot_key])


def wigner_d(l: int, R: np.ndarray) -> np.ndarray:
    """Representation matrix of rotation R on the degree-l basis.

    D satisfies Y(R v) = D(R) Y(v) (as column vectors of basis values).
    """
    if l == 0:
        return np.ones((1, 1))
    if l == 1:
        # our l=1 basis IS (x, y, z): Y(Rv) = R Y(v)
        return np.asarray(R, dtype=np.float64)
    v = _sample_points()
    A = _eval_basis(l, v)  # (n, d)
    B = _eval_basis(l, v @ np.asarray(R).T)  # Y_k(R v_i)
    # solve B = A @ D^T  ->  D^T = lstsq(A, B)
    Dt, *_ = np.linalg.lstsq(A, B, rcond=None)
    D = Dt.T
    err = np.abs(D @ D.T - np.eye(2 * l + 1)).max()
    assert err < 1e-8, f"non-orthogonal Wigner D at l={l}: {err}"
    return D


@lru_cache(maxsize=None)
def clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """Intertwiner C of shape (2l1+1, 2l2+1, 2l3+1) in our basis.

    Defined (up to sign) by equivariance:
        C contracted with (D_l1 x, D_l2 y) = D_l3 (C contracted with (x, y))
    and normalized so sum(C^2) = 2*l3 + 1.
    """
    if not abs(l1 - l2) <= l3 <= l1 + l2:
        raise ValueError(f"({l1},{l2},{l3}) violates the triangle rule")
    if l1 == l2 == l3 == 0:
        return np.ones((1, 1, 1))
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    dim = d1 * d2 * d3

    # constraints: for each rotation, (D1 (x) D2 (x) I - I (x) I (x) D3) vec(C) = 0
    # using C[a,b,c]: sum_{a'b'} D1[a',a] D2[b',b] C[a',b',c]
    #                = sum_{c'} D3[c,c'] C[a,b,c']   for all a,b,c
    K = np.zeros((dim, dim))
    for R in _random_rotations(8):
        D1, D2, D3 = wigner_d(l1, R), wigner_d(l2, R), wigner_d(l3, R)
        # LHS operator: C -> einsum('pa,qb,pqc->abc', D1, D2, C)
        L = np.einsum("pa,qb->abpq", D1, D2).reshape(d1 * d2, d1 * d2)
        L = np.kron(L, np.eye(d3))
        # RHS operator: C -> einsum('cd,abd->abc', D3, C)
        Rop = np.kron(np.eye(d1 * d2), D3)
        M = L - Rop
        K += M.T @ M

    w, vecs = np.linalg.eigh(K)
    assert w[0] < 1e-8, f"no intertwiner found for ({l1},{l2},{l3}): {w[0]}"
    # the SO(3) intertwiner space is 1-dimensional
    assert w[1] > 1e-6, f"degenerate intertwiner space for ({l1},{l2},{l3})"
    C = vecs[:, 0].reshape(d1, d2, d3)
    C = C * np.sqrt(d3) / np.linalg.norm(C)
    # canonical sign: first element with the largest magnitude is positive
    flat = C.reshape(-1)
    idx = np.argmax(np.abs(flat) > 1e-6)
    if flat[idx] < 0:
        C = -C
    return C


def spherical_harmonics_fn(lmax: int):
    """Return fn(x: (..., 3)) -> (..., sum(2l+1)) evaluating Y_0..Y_lmax.

    Inputs are normalized first (e3nn `normalize=True`); normalization is
    "integral" (orthonormal on the sphere). Returns a jax-traceable closure.
    """
    import jax.numpy as jnp

    c = 1.0 / np.sqrt(4 * np.pi)

    def sh(x):
        sq = jnp.sum(x**2, axis=-1, keepdims=True)
        n = x / jnp.sqrt(jnp.where(sq == 0.0, 1.0, sq))
        xx, yy, zz = n[..., 0], n[..., 1], n[..., 2]
        comps = [c * jnp.ones_like(xx)]
        if lmax >= 1:
            k = np.sqrt(3) * c
            comps += [k * xx, k * yy, k * zz]
        if lmax >= 2:
            k1 = np.sqrt(15) * c
            k2 = np.sqrt(5) / 2 * c
            k3 = np.sqrt(15) / 2 * c
            comps += [
                k1 * xx * yy,
                k1 * yy * zz,
                k2 * (3 * zz**2 - 1),
                k1 * xx * zz,
                k3 * (xx**2 - yy**2),
            ]
        if lmax >= 3:
            raise NotImplementedError("spherical harmonics beyond l=2")
        return jnp.stack(comps, axis=-1)

    return sh
