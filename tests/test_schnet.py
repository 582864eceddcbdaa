import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.models.schnet import SchNet
from tests import reference_impls as ref


def _random_mol(rng, n, node_class=9, scale=2.0):
    z = rng.integers(0, node_class, size=(n,))
    pos = (rng.normal(size=(n, 3)) * scale).astype(np.float32)
    return z.astype(np.int32), pos


def _pad(z, pos, n_max):
    n = len(z)
    zp = np.zeros((n_max,), np.int32)
    zp[:n] = z
    pp = np.zeros((n_max, 3), np.float32)
    pp[:n] = pos
    m = np.zeros((n_max,), bool)
    m[:n] = True
    return zp, pp, m


@pytest.fixture(scope="module")
def schnet_setup():
    model = SchNet(
        hidden_channels=32,
        num_filters=32,
        num_interactions=3,
        num_gaussians=17,
        cutoff=4.0,
        node_class=9,
        readout="mean",
    )
    rng = np.random.default_rng(0)
    z, pos = _random_mol(rng, 6)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(z)[None],
        jnp.asarray(pos)[None],
        jnp.ones((1, 6), bool),
    )["params"]
    return model, params


def test_dense_matches_edge_list_reference(schnet_setup):
    """Dense padded forward == independent NumPy edge-list implementation."""
    model, params = schnet_setup
    rng = np.random.default_rng(1)
    for n, n_max in [(5, 8), (7, 16), (3, 8)]:
        z, pos = _random_mol(rng, n)
        zp, pp, m = _pad(z, pos, n_max)
        out, node = model.apply(
            {"params": params},
            jnp.asarray(zp)[None],
            jnp.asarray(pp)[None],
            jnp.asarray(m)[None],
        )
        ref_out, ref_node = ref.schnet_forward(
            params, z, pos, cutoff=4.0, num_interactions=3, readout="mean"
        )
        np.testing.assert_allclose(np.asarray(out)[0], ref_out, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(node)[0, :n], ref_node, rtol=2e-4, atol=1e-5
        )


def test_padding_invariance(schnet_setup):
    """Same molecule in different bucket sizes -> identical outputs."""
    model, params = schnet_setup
    rng = np.random.default_rng(2)
    z, pos = _random_mol(rng, 6)
    outs = []
    for n_max in (8, 16, 32):
        zp, pp, m = _pad(z, pos, n_max)
        out, _ = model.apply(
            {"params": params},
            jnp.asarray(zp)[None],
            jnp.asarray(pp)[None],
            jnp.asarray(m)[None],
        )
        outs.append(np.asarray(out)[0])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-6)


def test_rotation_translation_invariance(schnet_setup):
    """SchNet output depends only on distances -> SE(3) invariant."""
    model, params = schnet_setup
    rng = np.random.default_rng(3)
    z, pos = _random_mol(rng, 7)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pos2 = pos @ q.T.astype(np.float32) + np.float32(1.7)
    zp, pp, m = _pad(z, pos, 8)
    _, pp2, _ = _pad(z, pos2, 8)
    out1, _ = model.apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pp)[None],
        jnp.asarray(m)[None],
    )
    out2, _ = model.apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pp2)[None],
        jnp.asarray(m)[None],
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


def test_permutation_invariance(schnet_setup):
    model, params = schnet_setup
    rng = np.random.default_rng(4)
    z, pos = _random_mol(rng, 6)
    perm = rng.permutation(6)
    zp, pp, m = _pad(z, pos, 8)
    zq, pq, _ = _pad(z[perm], pos[perm], 8)
    out1, _ = model.apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pp)[None],
        jnp.asarray(m)[None],
    )
    out2, _ = model.apply(
        {"params": params}, jnp.asarray(zq)[None], jnp.asarray(pq)[None],
        jnp.asarray(m)[None],
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


def test_forces_finite_and_match_fd(schnet_setup):
    """-dE/dpos is finite and matches finite differences (MD17 path)."""
    model, params = schnet_setup
    rng = np.random.default_rng(5)
    z, pos = _random_mol(rng, 5)
    zp, pp, m = _pad(z, pos, 8)
    zp, m = jnp.asarray(zp)[None], jnp.asarray(m)[None]

    def energy(p):
        out, _ = model.apply({"params": params}, zp, p, m)
        return jnp.sum(out)

    g = jax.grad(energy)(jnp.asarray(pp)[None])
    g = np.asarray(g)[0]
    assert np.all(np.isfinite(g))
    # finite differences on a few coordinates
    eps = 1e-3
    for (i, k) in [(0, 0), (2, 1), (4, 2)]:
        pp_plus = pp.copy()
        pp_plus[i, k] += eps
        pp_minus = pp.copy()
        pp_minus[i, k] -= eps
        fd = (
            float(energy(jnp.asarray(pp_plus)[None]))
            - float(energy(jnp.asarray(pp_minus)[None]))
        ) / (2 * eps)
        np.testing.assert_allclose(g[i, k], fd, rtol=5e-2, atol=1e-4)
    # second-order (loss on forces) is finite
    def force_loss(p):
        f = -jax.grad(energy)(p)
        return jnp.sum(f**2)

    g2 = jax.grad(force_loss)(jnp.asarray(pp)[None])
    assert np.all(np.isfinite(np.asarray(g2)))


def test_bf16_compute_close_to_f32(schnet_setup):
    """--compute_dtype bfloat16 path: outputs within bf16 tolerance of f32."""
    _, params = schnet_setup
    rng = np.random.default_rng(9)
    z, pos = _random_mol(rng, 6)
    zp, pp, m = _pad(z, pos, 8)
    kwargs = dict(hidden_channels=32, num_filters=32, num_interactions=3,
                  num_gaussians=17, cutoff=4.0, node_class=9, readout="mean")
    out32, _ = SchNet(**kwargs).apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pp)[None],
        jnp.asarray(m)[None],
    )
    out16, _ = SchNet(**kwargs, dtype=jnp.bfloat16).apply(
        {"params": params}, jnp.asarray(zp)[None], jnp.asarray(pp)[None],
        jnp.asarray(m)[None],
    )
    assert out16.dtype == jnp.float32  # pooled output upcast
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(out16), rtol=0.1, atol=0.05
    )


def test_filter_mxu_bf16_close_to_f32(schnet_setup):
    """--filter_mxu bf16 (half-precision filter matmuls only, everything else
    f32): tighter than full-bf16 compute, and gradients stay usable."""
    _, params = schnet_setup
    rng = np.random.default_rng(10)
    z, pos = _random_mol(rng, 6)
    zp, pp, m = _pad(z, pos, 8)
    args = (jnp.asarray(zp)[None], jnp.asarray(pp)[None], jnp.asarray(m)[None])
    kwargs = dict(hidden_channels=32, num_filters=32, num_interactions=3,
                  num_gaussians=17, cutoff=4.0, node_class=9, readout="mean")
    out32, _ = SchNet(**kwargs).apply({"params": params}, *args)
    out16, _ = SchNet(**kwargs, filter_mxu="bf16").apply({"params": params}, *args)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(out16), rtol=0.02, atol=0.01
    )

    def loss(model):
        def f(p):
            out, _ = model.apply({"params": p}, *args)
            return jnp.sum(out**2)
        return f

    g32 = jax.grad(loss(SchNet(**kwargs)))(params)
    g16 = jax.grad(loss(SchNet(**kwargs, filter_mxu="bf16")))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g32), jax.tree_util.tree_leaves(g16)):
        sa = float(np.abs(np.asarray(a)).mean()) + 1e-8
        assert float(np.abs(np.asarray(a) - np.asarray(b)).mean()) < 0.05 * sa


def test_dipole_readout_invariances():
    """The reconstructed dipole branch (reference schnet.py:103-118 is dead
    code — wrong mass indexing, shape-invalid broadcast): ||Σ q_i(pos_i-com)||
    must be rigid-motion invariant (com-centering kills translation, the
    norm kills rotation), padding-invariant, and positive-finite."""
    rng = np.random.default_rng(5)
    model = SchNet(num_interactions=2, dipole=True)
    z, pos = _random_mol(rng, 7)
    zp, pp, mask = _pad(z, pos, 12)
    zb, pb, mb = zp[None], pp[None], mask[None]
    params = model.init(jax.random.PRNGKey(0), zb, pb, mb)

    out, h = model.apply(params, zb, pb, mb)
    assert out.shape == (1, 1) and np.isfinite(float(out[0, 0]))
    assert float(out[0, 0]) >= 0

    # rigid motion: rotate + translate
    a = 0.7
    rot = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                    [0, 0, 1]], np.float32)
    pb2 = pb @ rot.T + np.array([3.0, -1.0, 2.0], np.float32)
    out2, _ = model.apply(params, zb, pb2.astype(np.float32), mb)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=2e-4)

    # padding width must not matter
    zp3, pp3, m3 = _pad(z, pos, 20)
    out3, _ = model.apply(params, zp3[None], pp3[None], m3[None])
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out), rtol=1e-5)

    # mean/std/atomref are bypassed under dipole (reference gating): same
    # params, wildly different mean/std must not change the output
    model_ms = SchNet(num_interactions=2, dipole=True, mean=100.0, std=50.0)
    out4, _ = model_ms.apply(params, zb, pb, mb)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out), rtol=1e-6)
