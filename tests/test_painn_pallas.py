import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.ops.painn_pallas import painn_message_fused, painn_message_reference

B, N, R, F = 2, 16, 20, 32
CUTOFF = 5.0


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    pos = np.cumsum(rng.normal(scale=0.8, size=(B, N, 3)), axis=1).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.linalg.norm(diff, axis=-1).astype(np.float32)
    eye = np.eye(N, dtype=bool)
    np.place(dist, np.broadcast_to(eye, dist.shape), 1.0)
    direction = diff / dist[..., None]
    np.place(dist, np.broadcast_to(eye, dist.shape), 0.0)
    direction[np.broadcast_to(eye[None, :, :, None], direction.shape)] = 0.0
    adj = (dist < CUTOFF) & ~eye
    gate = (0.5 * (np.cos(dist * np.pi / CUTOFF) + 1.0) * adj).astype(np.float32)
    x = (rng.normal(size=(B, N, 3 * F)) * 0.4).astype(np.float32)
    mu = (rng.normal(size=(B, N, 3 * F)) * 0.4).astype(np.float32)
    wk = (rng.normal(size=(R, 3 * F)) * 0.3).astype(np.float32)
    bk = (rng.normal(size=(3 * F,)) * 0.1).astype(np.float32)
    args = (dist, gate, direction[..., 0].copy(), direction[..., 1].copy(),
            direction[..., 2].copy(), x, mu, wk, bk)
    return tuple(map(jnp.asarray, args))


def test_forward_matches_reference(inputs):
    dq, dmu = painn_message_fused(*inputs, CUTOFF)
    dq_r, dmu_r = painn_message_reference(*inputs, CUTOFF)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dmu), np.asarray(dmu_r), rtol=2e-4, atol=2e-4)


def test_gradients_match_reference(inputs):
    def loss(fn):
        def f(args):
            dq, dmu = fn(*args, CUTOFF)
            return jnp.sum(dq * jnp.sin(dq)) + jnp.sum(dmu * jnp.cos(dmu))
        return f

    g_fused = jax.grad(loss(painn_message_fused))(inputs)
    g_ref = jax.grad(loss(painn_message_reference))(inputs)
    names = ["dist", "gate", "dirx", "diry", "dirz", "x", "mu", "wk", "bk"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_painn_model_pallas_matches_xla():
    from geossl_tpu.models.painn import PaiNN

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.integers(0, 9, size=(2, 16)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.8, size=(2, 16, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(16)[None, :] < np.array([[16], [10]]))
    kwargs = dict(n_atom_basis=32, n_interactions=2, n_rbf=9, cutoff=4.0, max_z=9)
    m_xla = PaiNN(**kwargs, use_pallas=False)
    m_pal = PaiNN(**kwargs, use_pallas=True)
    params = m_xla.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    out_x, node_x = m_xla.apply({"params": params}, z, pos, mask)
    out_p, node_p = m_pal.apply({"params": params}, z, pos, mask)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(node_x), np.asarray(node_p), rtol=1e-4, atol=1e-4)

    def loss(m):
        def fn(p):
            out, _ = m.apply({"params": p}, z, pos, mask)
            return jnp.sum(out**2)
        return fn

    gx = jax.grad(loss(m_xla))(params)
    gp = jax.grad(loss(m_pal))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4)
