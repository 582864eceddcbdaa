"""SE(3) steerable basis (ops/se3_basis.py) — reconstruction of the
reference's unimportable get_basis (Geom3D/models/utils.py:10-45).

The reference copy cannot run (its ``from_se3cnn`` import is absent from the
repo), so these tests check the DEFINING mathematical identities instead of
code parity: orthonormality of the harmonics on the sphere, the equivariance
laws Y_l(Rx) = D^l(R) Y_l(x) and K_J(Rx) = D^out K_J D^in^T, the Wigner
homomorphism, and the reference's documented output contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.ops import se3_basis as s3


def _random_rotation(seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _sphere_quadrature(n_theta=40, n_phi=80):
    """Gauss-Legendre in cos(theta) x trapezoid in phi: exact for the
    polynomial degrees involved here."""
    x, w = np.polynomial.legendre.leggauss(n_theta)
    phi = np.linspace(0.0, 2 * np.pi, n_phi, endpoint=False)
    ct, ph = np.meshgrid(x, phi, indexing="ij")
    st = np.sqrt(1 - ct**2)
    pts = np.stack([st * np.cos(ph), st * np.sin(ph), ct], -1).reshape(-1, 3)
    wq = np.broadcast_to(w[:, None] * (2 * np.pi / n_phi), ct.shape).reshape(-1)
    return pts, wq


def test_sh_orthonormal_on_sphere():
    pts, w = _sphere_quadrature()
    sh = s3.precompute_sh(jnp.asarray(pts), 4)
    flat = np.concatenate([np.asarray(sh[l]) for l in range(5)], axis=1)
    gram = (flat * w[:, None]).T @ flat
    np.testing.assert_allclose(gram, np.eye(flat.shape[1]), atol=5e-5)


def test_sh_addition_theorem_pointwise():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(32, 3))
    sh = s3.precompute_sh(jnp.asarray(v), 6)
    for l in range(7):
        np.testing.assert_allclose(
            np.sum(np.asarray(sh[l]) ** 2, axis=1),
            (2 * l + 1) / (4 * np.pi), rtol=1e-4)


def test_sh_scale_invariant_and_zero_safe():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(8, 3))
    a = s3.precompute_sh(jnp.asarray(v), 3)
    b = s3.precompute_sh(jnp.asarray(7.3 * v), 3)
    for l in range(4):
        np.testing.assert_allclose(np.asarray(a[l]), np.asarray(b[l]),
                                   atol=1e-5)
    z = s3.precompute_sh(jnp.zeros((2, 3)), 3)
    assert np.allclose(np.asarray(z[0]), np.sqrt(1 / (4 * np.pi)))
    for l in range(1, 4):
        assert np.all(np.asarray(z[l]) == 0)
    # gradients stay finite through the zero guard
    g = jax.grad(lambda x: sum(jnp.sum(y) for y in
                               s3.precompute_sh(x, 2).values()))(
        jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("seed", [3, 4])
def test_sh_equivariance(seed):
    rot = _random_rotation(seed)
    rng = np.random.default_rng(seed + 100)
    v = rng.normal(size=(16, 3))
    sh = s3.precompute_sh(jnp.asarray(v), 5)
    sh_r = s3.precompute_sh(jnp.asarray(v @ rot.T), 5)
    for l in range(6):
        d = s3.wigner_d(l, rot)
        np.testing.assert_allclose(
            np.asarray(sh_r[l]), np.asarray(sh[l]) @ d.T, atol=1e-4)


def test_wigner_homomorphism_and_orthogonality():
    r1, r2 = _random_rotation(7), _random_rotation(8)
    for l in range(5):
        d1, d2 = s3.wigner_d(l, r1), s3.wigner_d(l, r2)
        np.testing.assert_allclose(d1 @ d1.T, np.eye(2 * l + 1), atol=1e-10)
        np.testing.assert_allclose(
            s3.wigner_d(l, r1 @ r2), d1 @ d2, atol=1e-10)


def test_intertwiner_rows_orthonormal_and_equivariant():
    for (j, a, b) in [(0, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 2), (3, 1, 2)]:
        q = s3.basis_intertwiner(j, a, b)
        np.testing.assert_allclose(q @ q.T, np.eye(2 * j + 1), atol=1e-10)
        rot = _random_rotation(j * 7 + a)
        dj, da, db = (s3.wigner_d(j, rot), s3.wigner_d(a, rot),
                      s3.wigner_d(b, rot))
        np.testing.assert_allclose(q @ np.kron(da, db), dj @ q, atol=1e-9)


def test_get_basis_contract_shapes():
    """The reference's documented output contract (models/utils.py:16-19):
    keys 'd_in,d_out', shape [E, 1, 2*d_out+1, 1, 2*d_in+1, 2*min+1]."""
    v = jnp.asarray(np.random.default_rng(2).normal(size=(10, 3)))
    basis = s3.get_basis(v, 2)
    assert set(basis) == {f"{i},{o}" for i in range(3) for o in range(3)}
    for d_in in range(3):
        for d_out in range(3):
            k = basis[f"{d_in},{d_out}"]
            assert k.shape == (10, 1, 2 * d_out + 1, 1, 2 * d_in + 1,
                               2 * min(d_in, d_out) + 1)
            assert np.isfinite(np.asarray(k)).all()


@pytest.mark.parametrize("d_in,d_out", [(1, 1), (2, 1), (1, 2), (2, 2)])
def test_basis_kernel_equivariance(d_in, d_out):
    """K_J(Rx) = D^{d_out}(R) K_J(x) D^{d_in}(R)^T — the property that makes
    contracting type-d_in features against the basis yield type-d_out
    features."""
    rot = _random_rotation(42 + d_in + 10 * d_out)
    rng = np.random.default_rng(5)
    v = rng.normal(size=(6, 3))
    b0 = s3.get_basis(jnp.asarray(v), 2)[f"{d_in},{d_out}"]
    br = s3.get_basis(jnp.asarray(v @ rot.T), 2)[f"{d_in},{d_out}"]
    do, di = s3.wigner_d(d_out, rot), s3.wigner_d(d_in, rot)
    k0 = np.asarray(b0)[:, 0, :, 0, :, :]  # [E, 2do+1, 2di+1, nJ]
    kr = np.asarray(br)[:, 0, :, 0, :, :]
    np.testing.assert_allclose(
        kr, np.einsum("pm,emnj,qn->epqj", do, k0, di), atol=1e-4)


def test_get_basis_jit_and_grad():
    v = jnp.asarray(np.random.default_rng(9).normal(size=(4, 3)),
                    jnp.float32)

    @jax.jit
    def f(x):
        b = s3.get_basis(x, 1)
        return sum(jnp.sum(k**2) for k in b.values())

    g = jax.grad(f)(v)
    assert g.shape == v.shape and np.isfinite(np.asarray(g)).all()
