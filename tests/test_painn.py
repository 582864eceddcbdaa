import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.models.painn import PaiNN
from tests import reference_impls as ref


def _random_mol(rng, n, node_class=9, scale=1.5):
    z = rng.integers(0, node_class, size=(n,)).astype(np.int32)
    pos = (rng.normal(size=(n, 3)) * scale).astype(np.float32)
    return z, pos


def _pad(z, pos, n_max):
    n = len(z)
    zp = np.zeros((n_max,), np.int32)
    zp[:n] = z
    pp = np.zeros((n_max, 3), np.float32)
    pp[:n] = pos
    m = np.zeros((n_max,), bool)
    m[:n] = True
    return zp, pp, m


CUTOFF = 4.0


@pytest.fixture(scope="module")
def painn_setup():
    model = PaiNN(
        n_atom_basis=16, n_interactions=2, n_rbf=9, cutoff=CUTOFF,
        readout="add", max_z=9,
    )
    rng = np.random.default_rng(0)
    z, pos = _random_mol(rng, 6)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(z)[None], jnp.asarray(pos)[None], jnp.ones((1, 6), bool),
    )["params"]
    return model, params


def _apply(model, params, z, pos, m, pair_mask=None):
    return model.apply(
        {"params": params},
        jnp.asarray(z)[None], jnp.asarray(pos)[None], jnp.asarray(m)[None],
        pair_mask if pair_mask is None else jnp.asarray(pair_mask)[None],
    )


def test_dense_matches_edge_list_reference(painn_setup):
    model, params = painn_setup
    rng = np.random.default_rng(1)
    for n, n_max in [(5, 8), (7, 16)]:
        z, pos = _random_mol(rng, n)
        edges = ref.radius_edges(pos, CUTOFF)
        zp, pp, m = _pad(z, pos, n_max)
        out, node = _apply(model, params, zp, pp, m)
        r_out, r_node = ref.painn_forward(
            params, z, pos.astype(np.float64), edges, CUTOFF,
            n_interactions=2, readout="add",
        )
        np.testing.assert_allclose(np.asarray(out)[0], r_out, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(node)[0, :n], r_node, rtol=2e-4, atol=1e-5
        )


def test_padding_invariance(painn_setup):
    model, params = painn_setup
    rng = np.random.default_rng(2)
    z, pos = _random_mol(rng, 6)
    outs = []
    for n_max in (8, 16):
        zp, pp, m = _pad(z, pos, n_max)
        out, _ = _apply(model, params, zp, pp, m)
        outs.append(np.asarray(out)[0])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_scalar_invariance_vector_equivariance(painn_setup):
    """q is SE(3)-invariant; internal mu rotates covariantly (checked via
    invariance of the pooled scalar output under rotation+translation)."""
    model, params = painn_setup
    rng = np.random.default_rng(3)
    z, pos = _random_mol(rng, 7)
    q_rot, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q_rot) < 0:
        q_rot[:, 0] *= -1
    pos2 = (pos @ q_rot.T + np.float32(0.5)).astype(np.float32)
    zp, pp, m = _pad(z, pos, 8)
    _, pp2, _ = _pad(z, pos2, 8)
    out1, node1 = _apply(model, params, zp, pp, m)
    out2, node2 = _apply(model, params, zp, pp2, m)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(node1), np.asarray(node2), rtol=1e-4, atol=1e-5
    )


def test_clean_geometry_pair_mask():
    """GeoSSL parity: with a cached clean-geometry pair_mask, perturbed views
    keep the clean edge set (pretrain_GeoSSL.py:88-89) while distances come
    from the live positions."""
    model = PaiNN(n_atom_basis=8, n_interactions=2, n_rbf=5, cutoff=CUTOFF, max_z=9)
    rng = np.random.default_rng(4)
    z, pos = _random_mol(rng, 6)
    zp, pp, m = _pad(z, pos, 8)
    params = model.init(
        jax.random.PRNGKey(1), jnp.asarray(zp)[None], jnp.asarray(pp)[None],
        jnp.asarray(m)[None],
    )["params"]
    # clean adjacency
    from geossl_tpu.ops import geometry

    dist, pmask = geometry.pairwise_distances(jnp.asarray(pp)[None], jnp.asarray(m)[None])
    clean_adj = geometry.radius_adjacency(dist, pmask, CUTOFF)
    pos_perturbed = pp + rng.normal(size=pp.shape).astype(np.float32) * 0.3
    out_cached, _ = model.apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pos_perturbed)[None],
        jnp.asarray(m)[None], clean_adj,
    )
    out_live, _ = model.apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pos_perturbed)[None],
        jnp.asarray(m)[None],
    )
    assert np.all(np.isfinite(np.asarray(out_cached)))
    # the two edge policies genuinely differ for noisy geometry
    assert not np.allclose(np.asarray(out_cached), np.asarray(out_live))


def test_hydrogen_embedding_frozen(painn_setup):
    """padding_idx=0: row 0 of the embedding gets zero gradient."""
    model, params = painn_setup
    rng = np.random.default_rng(5)
    z, pos = _random_mol(rng, 6)
    z[:3] = 0  # hydrogens
    zp, pp, m = _pad(z, pos, 8)

    def loss(p):
        out, _ = model.apply(
            {"params": p}, jnp.asarray(zp)[None], jnp.asarray(pp)[None],
            jnp.asarray(m)[None],
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    emb_grad = np.asarray(g["embedding"])
    assert np.all(emb_grad[0] == 0.0)
    assert np.any(emb_grad[1:] != 0.0)
