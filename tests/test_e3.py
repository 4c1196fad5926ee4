"""Steerable engine: CG intertwiners, spherical harmonics, tensor products."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lagrangebench_tpu.models.e3 import (
    Irrep,
    Irreps,
    IrrepsArray,
    O3TensorProduct,
    O3TensorProductGate,
    clebsch_gordan,
    spherical_harmonics_fn,
    wigner_d,
)


def random_rotation(seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def test_irreps_parsing():
    ir = Irreps("2x1o + 1x0e")
    assert ir.dim == 7
    assert ir.num_irreps == 3
    assert ir.lmax == 1
    assert ir.count("0e") == 1
    assert str(Irreps.spherical_harmonics(2)) == "1x0e+1x1o+1x2e"
    assert (Irreps("1x0e+1x1o") * 3).simplify().dim == 12


def test_cg_known_values():
    # 1 x 1 -> 0 is the dot product (up to scale)
    C = clebsch_gordan(1, 1, 0)
    C = C[:, :, 0]
    np.testing.assert_allclose(C / C[0, 0], np.eye(3), atol=1e-8)
    # 1 x 1 -> 1 is the cross product (up to scale and sign)
    C = clebsch_gordan(1, 1, 1)
    x, y = np.array([1.0, 0, 0]), np.array([0, 1.0, 0])
    z = np.einsum("a,b,abc->c", x, y, C)
    np.testing.assert_allclose(
        np.abs(z / np.linalg.norm(z)), [0, 0, 1], atol=1e-8
    )


@pytest.mark.parametrize("l1,l2,l3", [(1, 1, 2), (1, 2, 1), (2, 2, 2), (1, 2, 3)])
def test_cg_equivariance(l1, l2, l3):
    C = clebsch_gordan(l1, l2, l3)
    R = random_rotation(5)
    D1, D2, D3 = wigner_d(l1, R), wigner_d(l2, R), wigner_d(l3, R)
    lhs = np.einsum("pa,qb,pqc->abc", D1, D2, C)
    rhs = np.einsum("cd,abd->abc", D3, C)
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_spherical_harmonics_equivariance():
    sh = spherical_harmonics_fn(2)
    R = random_rotation(1)
    v = np.random.default_rng(2).normal(size=(10, 3))
    y1 = np.asarray(sh(jnp.asarray(v @ R.T)))
    y0 = np.asarray(sh(jnp.asarray(v)))
    for l in (0, 1, 2):
        D = wigner_d(l, R)
        sl = slice(l * l, (l + 1) * (l + 1))
        np.testing.assert_allclose(y1[:, sl], y0[:, sl] @ D.T, atol=1e-6)


def _rotate(irreps: Irreps, x: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Rotate an irreps array in the engine's m-major layout (rotation only)."""
    out = np.array(x)
    for g, sl in zip(irreps, irreps.slices()):
        D = wigner_d(g.ir.l, R)
        chunk = x[..., sl].reshape(x.shape[:-1] + (g.ir.dim, g.mul))
        rotated = np.einsum("pq,...qu->...pu", D, chunk)
        out[..., sl] = rotated.reshape(x.shape[:-1] + (g.dim,))
    return out


@pytest.mark.parametrize("module", ["tp", "gate"])
def test_tensor_product_equivariance(module):
    irreps_x = Irreps("2x0e + 2x1o")
    irreps_y = Irreps.spherical_harmonics(1)
    irreps_out = Irreps("3x0e + 2x1o")

    cls = O3TensorProduct if module == "tp" else O3TensorProductGate
    mod = cls(irreps_out)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, irreps_x.dim)).astype(np.float32)
    y = rng.normal(size=(5, irreps_y.dim)).astype(np.float32)

    params = mod.init(
        jax.random.PRNGKey(0),
        IrrepsArray(irreps_x, jnp.asarray(x)),
        IrrepsArray(irreps_y, jnp.asarray(y)),
    )

    def apply(xa, ya):
        return np.asarray(
            mod.apply(
                params,
                IrrepsArray(irreps_x, jnp.asarray(xa)),
                IrrepsArray(irreps_y, jnp.asarray(ya)),
            ).array
        )

    R = random_rotation(3)
    out_then_rot = _rotate(irreps_out, apply(x, y), R)
    rot_then_out = apply(_rotate(irreps_x, x, R), _rotate(irreps_y, y, R))
    np.testing.assert_allclose(rot_then_out, out_then_rot, atol=2e-5)


def test_tensor_product_linear_mode():
    """With y=None the TP acts as an equivariant linear layer."""
    irreps = Irreps("2x0e + 1x1o")
    mod = O3TensorProduct(irreps)
    x = IrrepsArray(irreps, jnp.asarray(np.random.default_rng(1).normal(size=(4, 5))))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.array.shape == (4, 5)
    assert np.isfinite(np.asarray(out.array)).all()


def test_general_basis_matches_legacy_l2_l3():
    """The associated-Legendre construction reproduces the original
    hand-written l=2 / l=3 polynomial lists bit-for-bit in convention."""
    from lagrangebench_tpu.models.e3.basis import _basis_polynomials

    c = 1.0 / np.sqrt(4 * np.pi)
    v = np.random.default_rng(11).normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]

    legacy_l2 = [
        np.sqrt(15) * c * x * y,
        np.sqrt(15) * c * y * z,
        np.sqrt(5) / 2 * c * (3 * z**2 - 1),
        np.sqrt(15) * c * x * z,
        np.sqrt(15) / 2 * c * (x**2 - y**2),
    ]
    legacy_l3 = [
        c * np.sqrt(35 / 8) * y * (3 * x**2 - y**2),
        c * np.sqrt(105) * x * y * z,
        c * np.sqrt(21 / 8) * y * (5 * z**2 - 1),
        c * np.sqrt(7) / 2 * z * (5 * z**2 - 3),
        c * np.sqrt(21 / 8) * x * (5 * z**2 - 1),
        c * np.sqrt(105) / 2 * z * (x**2 - y**2),
        c * np.sqrt(35 / 8) * x * (x**2 - 3 * y**2),
    ]
    for l, legacy in ((2, legacy_l2), (3, legacy_l3)):
        got = [f(v) for f in _basis_polynomials(l)]
        for g, want in zip(got, legacy):
            np.testing.assert_allclose(g, want, atol=1e-12)


@pytest.mark.parametrize("l", [4, 5])
def test_high_l_basis_orthonormal_and_equivariant(l):
    """Degree-l harmonics: orthonormal on the sphere, rotation-covariant."""
    from lagrangebench_tpu.models.e3.basis import _eval_basis

    # Gram matrix over many uniform sphere points -> (4 pi / n) A^T A = I
    rng = np.random.default_rng(13)
    v = rng.normal(size=(200_000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    A = _eval_basis(l, v)
    gram = 4 * np.pi / v.shape[0] * (A.T @ A)
    np.testing.assert_allclose(gram, np.eye(2 * l + 1), atol=2e-2)

    # wigner_d asserts D orthogonal internally (exact equivariance check)
    D = wigner_d(l, random_rotation(3))
    assert D.shape == (2 * l + 1, 2 * l + 1)


@pytest.mark.parametrize("l1,l2,l3", [(3, 1, 4), (4, 1, 4), (3, 2, 5)])
def test_high_l_cg_equivariance(l1, l2, l3):
    C = clebsch_gordan(l1, l2, l3)
    R = random_rotation(9)
    D1, D2, D3 = wigner_d(l1, R), wigner_d(l2, R), wigner_d(l3, R)
    lhs = np.einsum("pa,qb,pqc->abc", D1, D2, C)
    rhs = np.einsum("cd,abd->abc", D3, C)
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_jax_spherical_harmonics_high_l_matches_numpy():
    sh = spherical_harmonics_fn(5)
    rng = np.random.default_rng(17)
    v = rng.normal(size=(32, 3))
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    got = np.asarray(sh(jnp.asarray(v)))
    from lagrangebench_tpu.models.e3.basis import _eval_basis

    for l in range(6):
        sl = slice(l * l, (l + 1) * (l + 1))
        np.testing.assert_allclose(
            got[:, sl], _eval_basis(l, vn), atol=1e-5
        )


def test_tensor_product_general_y_equivariance():
    """The stacked-einsum fallback (right operand with mul > 1) and the
    lmax=2 unrolled path are both equivariant."""
    irreps_x = Irreps("2x0e + 2x1o + 1x2e")
    irreps_y = Irreps("2x0e + 2x1o")  # mul > 1: general fallback
    irreps_out = Irreps("2x0e + 2x1o + 1x2e")

    mod = O3TensorProduct(irreps_out)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, irreps_x.dim)).astype(np.float32)
    y = rng.normal(size=(4, irreps_y.dim)).astype(np.float32)
    params = mod.init(
        jax.random.PRNGKey(0),
        IrrepsArray(irreps_x, jnp.asarray(x)),
        IrrepsArray(irreps_y, jnp.asarray(y)),
    )

    def apply(xa, ya):
        return np.asarray(
            mod.apply(
                params,
                IrrepsArray(irreps_x, jnp.asarray(xa)),
                IrrepsArray(irreps_y, jnp.asarray(ya)),
            ).array
        )

    R = random_rotation(4)
    out_then_rot = _rotate(irreps_out, apply(x, y), R)
    rot_then_out = apply(_rotate(irreps_x, x, R), _rotate(irreps_y, y, R))
    np.testing.assert_allclose(rot_then_out, out_then_rot, atol=3e-5)


def test_tensor_product_attrs_lmax2_equivariance():
    """lmax=2 attributes exercise the unrolled CG path at higher degree."""
    irreps_x = Irreps("3x0e + 2x1o + 2x2e")
    irreps_y = Irreps.spherical_harmonics(2)
    irreps_out = Irreps("2x0e + 2x1o + 1x2e")

    mod = O3TensorProduct(irreps_out)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(6, irreps_x.dim)).astype(np.float32)
    y = rng.normal(size=(6, irreps_y.dim)).astype(np.float32)
    params = mod.init(
        jax.random.PRNGKey(1),
        IrrepsArray(irreps_x, jnp.asarray(x)),
        IrrepsArray(irreps_y, jnp.asarray(y)),
    )

    def apply(xa, ya):
        return np.asarray(
            mod.apply(
                params,
                IrrepsArray(irreps_x, jnp.asarray(xa)),
                IrrepsArray(irreps_y, jnp.asarray(ya)),
            ).array
        )

    R = random_rotation(6)
    out_then_rot = _rotate(irreps_out, apply(x, y), R)
    rot_then_out = apply(_rotate(irreps_x, x, R), _rotate(irreps_y, y, R))
    np.testing.assert_allclose(rot_then_out, out_then_rot, atol=3e-5)


def test_tensor_product_attrs_lmax3_equivariance():
    """lmax=3 attributes and l=3 outputs: the general-lmax claim holds one
    degree past every shipped config (SEGNN presets use lmax<=2)."""
    irreps_x = Irreps("2x0e + 2x1o + 1x2e + 1x3o")
    irreps_y = Irreps.spherical_harmonics(3)
    irreps_out = Irreps("2x0e + 2x1o + 1x2e + 1x3o")

    mod = O3TensorProduct(irreps_out)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(5, irreps_x.dim)).astype(np.float32)
    y = rng.normal(size=(5, irreps_y.dim)).astype(np.float32)
    params = mod.init(
        jax.random.PRNGKey(2),
        IrrepsArray(irreps_x, jnp.asarray(x)),
        IrrepsArray(irreps_y, jnp.asarray(y)),
    )

    def apply(xa, ya):
        return np.asarray(
            mod.apply(
                params,
                IrrepsArray(irreps_x, jnp.asarray(xa)),
                IrrepsArray(irreps_y, jnp.asarray(ya)),
            ).array
        )

    R = random_rotation(5)
    out_then_rot = _rotate(irreps_out, apply(x, y), R)
    rot_then_out = apply(_rotate(irreps_x, x, R), _rotate(irreps_y, y, R))
    np.testing.assert_allclose(rot_then_out, out_then_rot, atol=5e-5)
