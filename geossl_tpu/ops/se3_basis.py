"""SE(3)-equivariant weight basis — TPU-native reconstruction of the
reference's dead ``get_basis`` (``Geom3D/models/utils.py:10-45``).

The reference file credits the SE(3)-Transformer and imports
``.from_se3cnn.utils_steerable`` — a package that does not exist anywhere in
its repo, so the original is unimportable dead code and there is no runnable
convention to match. This module rebuilds the same mathematical object from
first principles, keeping the reference's OUTPUT CONTRACT: a dict keyed
``"{d_in},{d_out}"`` of arrays shaped ``[..., 1, 2*d_out+1, 1, 2*d_in+1,
2*min(d_in,d_out)+1]`` (the trailing axis enumerates J = |d_in-d_out| ..
d_in+d_out), where broadcasting the 1-axes against channel counts turns each
slice into the equivariant kernel basis K_J(x).

Design (TPU-first): all group theory happens ONCE on the host in float64
numpy (cached), producing small constant matrices; the runtime path
(`precompute_sh`, `get_basis`) is pure jnp — static unrolled einsums over
those constants, jit/vmap/grad-safe, no trig beyond the input normalization,
no data-dependent control flow.

Construction, fully self-consistent (no external tables, no Condon-Shortley
convention risk):

- The degree-1 irrep is the vector rep in the (y, z, x) ordering with
  Y_1 = sqrt(3/4pi) * (y, z, x) — the standard real-SH l=1 row.
- Degree-l irreps are carved out of 1 x (l-1) product reps via the Casimir
  operator: the eigenspace of C = -sum_k G_k^2 with eigenvalue l(l+1) IS the
  spin-l subspace; an orthonormal basis of its projector (deterministic SVD)
  fixes the irrep basis, and restricted generators come with it.
- Real spherical harmonics follow the same recursion, Y_l proportional to
  V_l^T (Y_1 x Y_{l-1}), normalized by the addition theorem
  (sum_m Y_lm(n)^2 = (2l+1)/4pi pointwise — exact on the whole sphere since
  the construction is equivariant).
- Intertwiners Q_J : spin-J -> spin-a x spin-b solve the commutation
  constraint Q G_prod = G_J Q (nullspace by SVD; multiplicity is 1 in any
  SO(3) product, so Q is unique up to the sign this module fixes).
- Wigner matrices D^l(R) (exported for tests/users) ride the same recursion:
  D^1 = P R P^T, D^l = V_l^T (D^1 x D^{l-1}) V_l.

Everything downstream (tests, kernels) checks the defining identities:
Y_l(R x) = D^l(R) Y_l(x) and K_J(R x) = D^{d_out}(R) K_J(x) D^{d_in}(R)^T.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["precompute_sh", "get_basis", "wigner_d", "basis_intertwiner"]

# (x, y, z) -> (y, z, x): the real-SH ordering of the l=1 row (m = -1, 0, 1).
_P_YZX = np.array([[0.0, 1.0, 0.0],
                   [0.0, 0.0, 1.0],
                   [1.0, 0.0, 0.0]])

# so(3) generators in the Cartesian (x, y, z) basis: (A_k)_ij = -eps_kij.
_EPS = np.zeros((3, 3, 3))
for _i, _j, _k, _s in [(0, 1, 2, 1.0), (1, 2, 0, 1.0), (2, 0, 1, 1.0),
                       (2, 1, 0, -1.0), (0, 2, 1, -1.0), (1, 0, 2, -1.0)]:
    _EPS[_i, _j, _k] = _s
_A_XYZ = -_EPS  # [3 (axis k), 3, 3]


def _projector_basis(proj: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic orthonormal basis [n, dim] of a rank-``dim`` symmetric
    projector: SVD columns with singular value ~1, each sign-fixed so its
    largest-magnitude entry is positive."""
    u, s, _ = np.linalg.svd(proj)
    cols = u[:, s > 0.5]
    if cols.shape[1] != dim:
        raise AssertionError(
            f"projector rank {cols.shape[1]} != expected {dim}")
    for c in range(dim):
        i = np.argmax(np.abs(cols[:, c]))
        if cols[i, c] < 0:
            cols[:, c] = -cols[:, c]
    return cols


@lru_cache(maxsize=None)
def _irrep(l: int) -> Tuple[np.ndarray, np.ndarray]:
    """(generators [3, 2l+1, 2l+1], extractor V [3(2l-1), 2l+1]) for the
    spin-l real irrep. V maps the 1 x (l-1) product rep (1-major flatten)
    onto the spin-l subspace; it is the change of basis every recursion
    (harmonics, Wigner matrices) shares. l=0 and l=1 are the bases."""
    if l == 0:
        return np.zeros((3, 1, 1)), np.zeros((3, 1))
    if l == 1:
        g = np.einsum("ri,kij,cj->krc", _P_YZX, _A_XYZ, _P_YZX)
        return g, np.zeros((3, 3))
    g1, _ = _irrep(1)
    gp, _ = _irrep(l - 1)
    n = 3 * (2 * l - 1)
    eye1, eyep = np.eye(3), np.eye(2 * l - 1)
    gprod = np.stack([np.kron(g1[k], eyep) + np.kron(eye1, gp[k])
                      for k in range(3)])
    casimir = -sum(gprod[k] @ gprod[k] for k in range(3))
    w, u = np.linalg.eigh(casimir)
    sel = np.abs(w - l * (l + 1)) < 0.5
    if int(sel.sum()) != 2 * l + 1:
        raise AssertionError(f"spin-{l} eigenspace has dim {int(sel.sum())}")
    proj = (u[:, sel] @ u[:, sel].T)
    v = _projector_basis(proj, 2 * l + 1)  # [n, 2l+1]
    g = np.einsum("pr,kpq,qc->krc", v, gprod, v)
    return g, v


@lru_cache(maxsize=None)
def _sh_coeffs(lmax: int) -> Tuple[np.ndarray, ...]:
    """Per-degree constants for the runtime recursion: index l holds
    c_l * V_l^T, the [2l+1, 3(2l-1)] map from Y_1 x Y_{l-1} to Y_l
    (normalized by the addition theorem at a generic probe point — exact
    everywhere because the construction is equivariant)."""
    coeffs: List[np.ndarray] = [np.zeros((1, 1)), np.zeros((3, 3))]
    n0 = np.array([0.31, -0.52, 0.71])
    n0 /= np.linalg.norm(n0)
    y = [np.array([np.sqrt(1.0 / (4.0 * np.pi))]),
         np.sqrt(3.0 / (4.0 * np.pi)) * (_P_YZX @ n0)]
    for l in range(2, lmax + 1):
        _, v = _irrep(l)
        u = v.T @ np.kron(y[1], y[l - 1])
        c = np.sqrt((2 * l + 1) / (4.0 * np.pi)) / np.linalg.norm(u)
        coeffs.append(c * v.T)
        y.append(c * u)
    return tuple(coeffs[: lmax + 1])


@lru_cache(maxsize=None)
def basis_intertwiner(j: int, d_out: int, d_in: int) -> np.ndarray:
    """Orthonormal intertwiner Q [2J+1, (2*d_out+1)*(2*d_in+1)] with the
    d_out-major flatten: Q (D_out x D_in) = D_J Q. Solved as the nullspace
    of the generator commutation constraints (SVD); SO(3) products are
    multiplicity-free so the solution is unique up to the sign fixed here."""
    if not abs(d_out - d_in) <= j <= d_out + d_in:
        raise ValueError(f"J={j} outside |{d_out}-{d_in}| .. {d_out}+{d_in}")
    ga, _ = _irrep(d_out)
    gb, _ = _irrep(d_in)
    gj, _ = _irrep(j)
    na, nb, nj = 2 * d_out + 1, 2 * d_in + 1, 2 * j + 1
    n = na * nb
    gprod = np.stack([np.kron(ga[k], np.eye(nb)) + np.kron(np.eye(na), gb[k])
                      for k in range(3)])
    # vec_rowmajor(Q G) = (I x G^T) vec(Q); vec_rowmajor(G_J Q) = (G_J x I) vec(Q)
    m = np.concatenate([np.kron(np.eye(nj), gprod[k].T)
                        - np.kron(gj[k], np.eye(n)) for k in range(3)])
    _, s, vt = np.linalg.svd(m)
    if int(np.sum(s < 1e-8)) != 1:
        raise AssertionError(
            f"intertwiner ({j};{d_out},{d_in}) nullspace not 1-dim: "
            f"singular values {s}")
    q = vt[-1].reshape(nj, n)
    q /= np.sqrt(np.trace(q @ q.T) / nj)  # rows orthonormal: Q Q^T = I
    i = np.unravel_index(np.argmax(np.abs(q)), q.shape)
    return q if q[i] > 0 else -q


def wigner_d(l: int, rot: np.ndarray) -> np.ndarray:
    """Real Wigner matrix D^l(R) [2l+1, 2l+1] in this module's irrep bases
    (numpy, host-side — used by tests and by anyone rotating features).
    D^1 = P R P^T; higher degrees ride the shared extractor recursion."""
    if l == 0:
        return np.ones((1, 1))
    d1 = _P_YZX @ np.asarray(rot, np.float64) @ _P_YZX.T
    d = d1
    for ll in range(2, l + 1):
        _, v = _irrep(ll)
        d = v.T @ np.kron(d1, d) @ v
    return d


def precompute_sh(vectors: jnp.ndarray, lmax: int) -> Dict[int, jnp.ndarray]:
    """Real spherical harmonics of ``vectors`` [..., 3] (need not be unit:
    only the direction is used), degrees 0..lmax: dict l -> [..., 2l+1].
    Matches the role of the reference's ``utils_steerable.precompute_sh``
    (``models/utils.py:25``). Zero vectors (padding / self-pairs) yield
    Y_0's constant and 0 for every l >= 1 — finite, with zero gradient
    contribution there (the 1/r is guarded)."""
    coeffs = _sh_coeffs(lmax)
    v = jnp.asarray(vectors)
    # Zero guard must wrap the norm INPUT too (not just the quotient), or the
    # sqrt-at-0 NaN rides the chain rule into otherwise-masked gradients.
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    good = sq > 0
    r = jnp.sqrt(jnp.where(good, sq, 1.0))
    n = jnp.where(good, v, 0.0) / r
    out: Dict[int, jnp.ndarray] = {
        0: jnp.full(v.shape[:-1] + (1,), float(np.sqrt(1.0 / (4.0 * np.pi))),
                    v.dtype)}
    if lmax == 0:
        return out
    gate = good.astype(v.dtype)
    y1 = float(np.sqrt(3.0 / (4.0 * np.pi))) * (
        n @ jnp.asarray(_P_YZX.T, v.dtype)) * gate
    out[1] = y1
    yp = y1
    for l in range(2, lmax + 1):
        prod = (y1[..., :, None] * yp[..., None, :]).reshape(
            v.shape[:-1] + (3 * (2 * l - 1),))
        yp = prod @ jnp.asarray(coeffs[l].T, v.dtype)
        out[l] = yp
    return out


def get_basis(d: jnp.ndarray, max_degree: int) -> Dict[str, jnp.ndarray]:
    """Equivariant weight basis over edge vectors ``d`` [..., 3] — the
    reference's ``get_basis`` contract (``models/utils.py:10-45``): dict
    ``"{d_in},{d_out}"`` -> [..., 1, 2*d_out+1, 1, 2*d_in+1, n_J] with
    n_J = 2*min(d_in,d_out)+1, J ascending from |d_in-d_out|. Each J-slice
    K_J satisfies K_J(R x) = D^{d_out}(R) K_J(x) D^{d_in}(R)^T, so
    contracting type-d_in features against it yields type-d_out features.
    jit/vmap-safe; gradients flow to ``d``."""
    sh = precompute_sh(d, 2 * max_degree)
    lead = d.shape[:-1]
    basis: Dict[str, jnp.ndarray] = {}
    for d_in in range(max_degree + 1):
        for d_out in range(max_degree + 1):
            ks = []
            for j in range(abs(d_in - d_out), d_in + d_out + 1):
                q = jnp.asarray(basis_intertwiner(j, d_out, d_in), d.dtype)
                ks.append(sh[j] @ q)  # [..., (2do+1)*(2di+1)]
            basis[f"{d_in},{d_out}"] = jnp.stack(ks, axis=-1).reshape(
                lead + (1, 2 * d_out + 1, 1, 2 * d_in + 1, len(ks)))
    return basis
