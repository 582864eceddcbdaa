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


def test_second_order_matches_reference(inputs):
    """MD17's force path with PaiNN: grad-of-grad through the fused op must
    equal the XLA reference (the fused backward is itself custom-VJP'd, with
    its derivative routed through the reference math)."""
    dist, gate, dirx, diry, dirz, x, mu, wk, bk = inputs

    def make_loss(op):
        def loss(params, dist, gate, x):
            wk, bk = params
            dq, dmu = op(dist, gate, dirx, diry, dirz, x, mu, wk, bk, CUTOFF)
            # "force": gradient of a scalar energy w.r.t. dist, then a loss
            # of that gradient — second derivative w.r.t. params
            f = jax.grad(
                lambda d: jnp.sum(jnp.tanh(
                    op(d, gate, dirx, diry, dirz, x, mu, wk, bk, CUTOFF)[0]))
            )(dist)
            return jnp.sum(dq) * 1e-3 + jnp.sum(dmu**2) * 1e-3 + jnp.sum(jnp.abs(f))
        return loss

    params = (wk, bk)
    g_fused = jax.grad(make_loss(painn_message_fused))(params, dist, gate, x)
    g_ref = jax.grad(make_loss(painn_message_reference))(params, dist, gate, x)
    for name, a, b in zip(["wk", "bk"], g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3,
            err_msg=f"second-order grad mismatch for {name}",
        )


def test_md17_force_training_grads_fused_vs_xla():
    """End-to-end MD17 shape with PaiNN: grad of [L1(E) + L1(-dE/dpos)]
    w.r.t. params through the full model, fused vs XLA paths."""
    from geossl_tpu.models.painn import PaiNN

    rng = np.random.default_rng(7)
    b, n = 2, 8
    z = jnp.asarray(rng.integers(0, 9, (b, n)), jnp.int32)
    pos = jnp.asarray(np.cumsum(rng.normal(scale=0.8, size=(b, n, 3)),
                                axis=1).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    forces = jnp.asarray(rng.normal(scale=0.1, size=(b, n, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))

    def make(use_pallas):
        model = PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=9, cutoff=5.0,
                      max_z=9, use_pallas=use_pallas)
        params = model.init(jax.random.PRNGKey(0), z, pos, mask)["params"]

        def energy(p, q):
            g, _ = model.apply({"params": p}, z, q, mask)
            return g.mean(axis=-1)

        def loss(p):
            e = energy(p, pos)
            f = -jax.grad(lambda q: jnp.sum(energy(p, q)))(pos)
            return 0.05 * jnp.mean(jnp.abs(e - y)) + 0.95 * jnp.mean(
                jnp.abs(f - forces))

        return params, jax.grad(loss)(params)

    params_x, gx = make(False)
    params_p, gp = make(True)
    for a, b_ in zip(jax.tree_util.tree_leaves(params_x),
                     jax.tree_util.tree_leaves(params_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b_ in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_larger_n_gradients_multi_tile():
    """Gradients at N=128 (multi-tile grid): j-indexed dx/dmu accumulation
    over i-tiles must match the reference."""
    n = 128
    rng = np.random.default_rng(6)
    pos = np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.linalg.norm(diff, axis=-1).astype(np.float32)
    eye = np.eye(n, dtype=bool)
    np.place(dist, np.broadcast_to(eye, dist.shape), 1.0)
    direction = diff / dist[..., None]
    np.place(dist, np.broadcast_to(eye, dist.shape), 0.0)
    direction[np.broadcast_to(eye[None, :, :, None], direction.shape)] = 0.0
    adj = (dist < CUTOFF) & ~eye
    gate = (0.5 * (np.cos(dist * np.pi / CUTOFF) + 1.0) * adj).astype(np.float32)
    x = (rng.normal(size=(1, n, 3 * F)) * 0.4).astype(np.float32)
    mu = (rng.normal(size=(1, n, 3 * F)) * 0.4).astype(np.float32)
    wk = (rng.normal(size=(R, 3 * F)) * 0.3).astype(np.float32)
    bk = (rng.normal(size=(3 * F,)) * 0.1).astype(np.float32)
    args = tuple(map(jnp.asarray, (
        dist, gate, direction[..., 0].copy(), direction[..., 1].copy(),
        direction[..., 2].copy(), x, mu, wk, bk)))

    def loss(fn):
        def f(a):
            dq, dmu = fn(*a, CUTOFF)
            return jnp.sum(jnp.tanh(dq)) + jnp.sum(jnp.tanh(dmu))
        return f

    g_fused = jax.grad(loss(painn_message_fused))(args)
    g_ref = jax.grad(loss(painn_message_reference))(args)
    names = ["dist", "gate", "dirx", "diry", "dirz", "x", "mu", "wk", "bk"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3,
            err_msg=f"multi-tile grad mismatch: {name}",
        )


def _symmetric_painn_inputs(n, seed=13):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.linalg.norm(diff, axis=-1).astype(np.float32)
    eye = np.eye(n, dtype=bool)
    np.place(dist, np.broadcast_to(eye, dist.shape), 1.0)
    direction = diff / dist[..., None]
    np.place(dist, np.broadcast_to(eye, dist.shape), 0.0)
    direction[np.broadcast_to(eye[None, :, :, None], direction.shape)] = 0.0
    adj = (dist < CUTOFF) & ~eye
    gate = (0.5 * (np.cos(dist * np.pi / CUTOFF) + 1.0) * adj).astype(np.float32)
    x = (rng.normal(size=(1, n, 3 * F)) * 0.4).astype(np.float32)
    mu = (rng.normal(size=(1, n, 3 * F)) * 0.4).astype(np.float32)
    wk = (rng.normal(size=(R, 3 * F)) * 0.3).astype(np.float32)
    bk = (rng.normal(size=(3 * F,)) * 0.1).astype(np.float32)
    return jnp.asarray(pos), tuple(map(jnp.asarray, (
        dist, gate, direction[..., 0].copy(), direction[..., 1].copy(),
        direction[..., 2].copy(), x, mu, wk, bk)))


def test_painn_sym_profitable_gate():
    from geossl_tpu.ops.painn_pallas import painn_sym_profitable

    assert not painn_sym_profitable(16)
    assert not painn_sym_profitable(128)
    assert painn_sym_profitable(256)
    assert painn_sym_profitable(512)


def test_painn_sym_forward_matches_reference():
    from geossl_tpu.ops.painn_pallas import painn_message_fused_sym

    _, args = _symmetric_painn_inputs(256)
    dq, dmu = painn_message_fused_sym(*args, CUTOFF)
    dq_r, dmu_r = painn_message_reference(*args, CUTOFF)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dmu), np.asarray(dmu_r),
                               rtol=2e-3, atol=2e-3)


def test_painn_sym_gradients_through_symmetric_chain():
    """Pair-field cotangents are placement-symmetrized (with the
    antisymmetric sign for directions), so compare gradients THROUGH the
    symmetric construction (positions -> dist/gate/dir), which is how PaiNN
    consumes the op."""
    from geossl_tpu.ops.painn_pallas import painn_message_fused_sym

    n = 256
    pos, (_, _, _, _, _, x, mu, wk, bk) = _symmetric_painn_inputs(n)

    def loss(op, pos, x, mu, wk, bk):
        eye = jnp.eye(n)[None]
        diff = pos[:, :, None] - pos[:, None, :]
        d = jnp.linalg.norm(diff + eye[..., None], axis=-1) * (1.0 - eye)
        direction = diff / (d[..., None] + eye[..., None])
        adj = (d < CUTOFF) & (d > 0)
        gate = 0.5 * (jnp.cos(d * jnp.pi / CUTOFF) + 1.0) * adj
        dq, dmu = op(d, gate, direction[..., 0], direction[..., 1],
                     direction[..., 2], x, mu, wk, bk, CUTOFF)
        return jnp.sum(jnp.tanh(dq)) + jnp.sum(jnp.tanh(dmu))

    g_sym = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(
        painn_message_fused_sym, pos, x, mu, wk, bk)
    g_ref = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(
        painn_message_reference, pos, x, mu, wk, bk)
    for name, a, b in zip(["pos", "x", "mu", "wk", "bk"], g_sym, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3,
            err_msg=f"painn sym grad mismatch for {name}",
        )


def test_painn_model_pallas_matches_xla_large_n():
    """PaiNN at N=256 on the fused path (the model keeps the plain kernel —
    the symmetric variant measured slower for PaiNN, see docs/PERF.md):
    outputs and gradients through live-position dist/dir must match XLA."""
    from geossl_tpu.models.painn import PaiNN

    rng = np.random.default_rng(14)
    n = 256
    z = jnp.asarray(rng.integers(0, 9, size=(1, n)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(n)[None, :] < n - 10)
    kwargs = dict(n_atom_basis=32, n_interactions=2, n_rbf=9, cutoff=6.0, max_z=9)
    m_xla = PaiNN(**kwargs, use_pallas=False)
    m_sym = PaiNN(**kwargs, use_pallas=True)
    params = m_xla.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    out_x, _ = m_xla.apply({"params": params}, z, pos, mask)
    out_s, _ = m_sym.apply({"params": params}, z, pos, mask)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_s),
                               rtol=1e-3, atol=1e-3)

    def loss(m):
        def f(p, q):
            out, _ = m.apply({"params": p}, z, q, mask)
            return jnp.sum(out**2)
        return f

    gx = jax.grad(loss(m_xla), argnums=(0, 1))(params, pos)
    gs = jax.grad(loss(m_sym), argnums=(0, 1))(params, pos)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-3)


def test_painn_sym_second_order_through_positions():
    """Grad-of-grad (MD17 shape) through the symmetric PaiNN kernel: the
    antisymmetric-signed placement transpose in the second-order path must
    reproduce the reference."""
    from geossl_tpu.ops.painn_pallas import painn_message_fused_sym

    n = 256
    pos, (_, _, _, _, _, x, mu, wk, bk) = _symmetric_painn_inputs(n)

    def energy(op, pos, wk):
        eye = jnp.eye(n)[None]
        diff = pos[:, :, None] - pos[:, None, :]
        d = jnp.linalg.norm(diff + eye[..., None], axis=-1) * (1.0 - eye)
        direction = diff / (d[..., None] + eye[..., None])
        adj = (d < CUTOFF) & (d > 0)
        gate = 0.5 * (jnp.cos(d * jnp.pi / CUTOFF) + 1.0) * adj
        dq, dmu = op(d, gate, direction[..., 0], direction[..., 1],
                     direction[..., 2], x, mu, wk, bk, CUTOFF)
        return jnp.sum(jnp.tanh(dq)) + jnp.sum(jnp.tanh(dmu))

    def loss(op, wk):
        f = jax.grad(lambda p: energy(op, p, wk))(pos)
        return jnp.sum(f * f)

    g_sym = jax.grad(lambda w: loss(painn_message_fused_sym, w))(wk)
    g_ref = jax.grad(lambda w: loss(painn_message_reference, w))(wk)
    np.testing.assert_allclose(
        np.asarray(g_sym), np.asarray(g_ref), rtol=1e-2, atol=1e-3)


# ---------------------------------------------------------------------------
# occupancy-gated ("sparse") tiles


def test_painn_sparse_forward_matches_dense():
    """sparse=True must be bitwise-identical to dense — skipped tiles have
    gate==0 everywhere, so the dense kernel adds exact zeros there."""
    from geossl_tpu.ops.pallas_utils import tile_occupancy

    _, args = _symmetric_painn_inputs(256, seed=31)
    occ = np.asarray(tile_occupancy(args[1], 1, 8, 128))
    assert 0 < occ.mean() < 1, "fixture must contain empty AND occupied tiles"
    dq_d, dmu_d = painn_message_fused(*args, CUTOFF, False)
    dq_s, dmu_s = painn_message_fused(*args, CUTOFF, True)
    np.testing.assert_array_equal(np.asarray(dq_d), np.asarray(dq_s))
    np.testing.assert_array_equal(np.asarray(dmu_d), np.asarray(dmu_s))


def test_painn_sparse_gradients_through_symmetric_chain():
    """The dgate cotangent is zeroed on skipped tiles — exact once chained
    through the gate construction (cosine cutoff: value AND slope zero
    outside). Compare position/param grads sparse vs dense."""
    n = 256
    pos, (_, _, _, _, _, x, mu, wk, bk) = _symmetric_painn_inputs(n, seed=32)

    def loss(sparse, pos, x, mu, wk, bk):
        eye = jnp.eye(n)[None]
        diff = pos[:, :, None] - pos[:, None, :]
        d = jnp.linalg.norm(diff + eye[..., None], axis=-1) * (1.0 - eye)
        direction = diff / (d[..., None] + eye[..., None])
        adj = (d < CUTOFF) & (d > 0)
        gate = 0.5 * (jnp.cos(d * jnp.pi / CUTOFF) + 1.0) * adj
        dq, dmu = painn_message_fused(
            d, gate, direction[..., 0], direction[..., 1], direction[..., 2],
            x, mu, wk, bk, CUTOFF, sparse)
        return jnp.sum(jnp.tanh(dq)) + jnp.sum(jnp.tanh(dmu))

    g_s = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(True, pos, x, mu, wk, bk)
    g_d = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(False, pos, x, mu, wk, bk)
    for name, a, b in zip(["pos", "x", "mu", "wk", "bk"], g_s, g_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"painn sparse grad mismatch for {name}",
        )


def test_painn_sparse_sym_matches_reference():
    """sparse composes with the tile-skipping symmetric variant."""
    from geossl_tpu.ops.painn_pallas import painn_message_fused_sym

    _, args = _symmetric_painn_inputs(256, seed=33)
    dq_s, dmu_s = painn_message_fused_sym(*args, CUTOFF, True)
    dq_r, dmu_r = painn_message_reference(*args, CUTOFF)
    np.testing.assert_allclose(np.asarray(dq_s), np.asarray(dq_r),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dmu_s), np.asarray(dmu_r),
                               rtol=2e-3, atol=2e-3)
    dq_d, dmu_d = painn_message_fused_sym(*args, CUTOFF, False)
    np.testing.assert_array_equal(np.asarray(dq_s), np.asarray(dq_d))
    np.testing.assert_array_equal(np.asarray(dmu_s), np.asarray(dmu_d))


def test_painn_model_sparse_matches_dense():
    """Model level: PaiNN(sparse=True) == PaiNN(sparse=False) with padding
    (padding rows/cols are empty tiles too), outputs and parameter grads."""
    from geossl_tpu.models.painn import PaiNN

    rng = np.random.default_rng(34)
    n = 256
    z = jnp.asarray(rng.integers(0, 9, size=(1, n)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(n)[None, :] < n - 64)
    kwargs = dict(n_atom_basis=32, n_interactions=2, n_rbf=9, cutoff=6.0,
                  max_z=9, use_pallas=True)
    m_d = PaiNN(**kwargs, sparse=False)
    m_s = PaiNN(**kwargs, sparse=True)
    params = m_d.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    out_d, _ = m_d.apply({"params": params}, z, pos, mask)
    out_s, _ = m_s.apply({"params": params}, z, pos, mask)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p}, z, pos, mask)
            return jnp.sum(out**2)
        return f

    gd = jax.tree_util.tree_leaves(jax.grad(loss(m_d))(params))
    gs = jax.tree_util.tree_leaves(jax.grad(loss(m_s))(params))
    # grads see f32 reassociation drift from XLA recompiling the surrounding
    # graph (the occ computation changes fusion decisions) — the kernel-level
    # sparse-vs-dense chain test above pins 1e-6; here ~1e-4 relative is the
    # observed XLA noise floor
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-3)


@pytest.mark.parametrize("sparse", [False, True])
def test_fused_rectangular_stripe_matches_reference(sparse):
    """painn_message_fused on a [B, Ni, Nj] stripe (pair-axis model-parallel
    shape) equals the reference math — values and all grads."""
    from geossl_tpu.ops.painn_pallas import (
        painn_message_fused,
        painn_message_reference,
    )

    rng = np.random.default_rng(13)
    b, ni, nj, f, r = 2, 32, 16, 8, 5
    cutoff = 4.0
    pos = rng.normal(scale=1.5, size=(b, ni, 3)).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    d_full = np.linalg.norm(diff, axis=-1)
    d_safe = np.maximum(d_full, 1e-9)
    dirs = diff / d_safe[..., None]
    adj = (d_full < cutoff) & (d_full > 0)
    gate = (0.5 * (np.cos(d_full * np.pi / cutoff) + 1) * adj).astype(np.float32)

    sl = np.s_[:, :, :nj]
    args = (
        jnp.asarray(d_full[sl].astype(np.float32)),
        jnp.asarray(gate[sl]),
        jnp.asarray(dirs[..., 0][sl].astype(np.float32)),
        jnp.asarray(dirs[..., 1][sl].astype(np.float32)),
        jnp.asarray(dirs[..., 2][sl].astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, nj, 3 * f)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, nj, 3 * f)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(r, 3 * f)).astype(np.float32) * 0.3),
        jnp.asarray(rng.normal(size=(3 * f,)).astype(np.float32) * 0.1),
    )
    dq, dmu = painn_message_fused(*args, cutoff, sparse)
    rq, rmu = painn_message_reference(*args, cutoff)
    assert dq.shape == (b, ni, f) and dmu.shape == (b, ni, 3 * f)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dmu), np.asarray(rmu),
                               rtol=1e-5, atol=1e-5)

    def loss(op, extra):
        def f_(a):
            o1, o2 = op(*a, cutoff, *extra)
            return jnp.sum(o1**2) + jnp.sum(jnp.sin(o2))
        return f_

    gf = jax.grad(loss(painn_message_fused, (sparse,)))(args)
    gr = jax.grad(loss(painn_message_reference, ()))(args)
    names = ["ddist", "dgate", "ddx", "ddy", "ddz", "dx", "dmu", "dwk", "dbk"]
    for a, b_, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-4, err_msg=name)


def test_fused_stack_apply_matches_module_apply():
    """painn_stack_infer / fused_stack_apply (kexp9 integration): the
    whole-stack inference program must reproduce module.apply exactly
    (same math, one kernel). Covers default and shared_filters configs,
    padded rows included."""
    import numpy as np

    from geossl_tpu.models.painn import PaiNN, fused_stack_apply

    rng = np.random.default_rng(11)
    B, N = 8, 32
    z = np.zeros((B, N), np.int32)
    pos = np.zeros((B, N, 3), np.float32)
    mask = np.zeros((B, N), bool)
    for i in range(B):
        n = int(rng.integers(4, N + 1)) if i else 1  # incl. single-atom
        z[i, :n] = rng.integers(0, 9, n)
        pos[i, :n] = np.cumsum(rng.normal(scale=0.9, size=(n, 3)), 0)
        mask[i, :n] = True
    z, pos, mask = map(jnp.asarray, (z, pos, mask))

    for kwargs in ({}, {"shared_filters": True},
                   {"shared_interactions": True}):
        m = PaiNN(use_pallas=False, **kwargs)
        params = m.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
        ref_g, ref_n = m.apply({"params": params}, z, pos, mask)
        got_g, got_n = fused_stack_apply(m, params, z, pos, mask)
        np.testing.assert_allclose(np.asarray(got_n), np.asarray(ref_n),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=f"node repr diverged ({kwargs})")
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                                   rtol=2e-5, atol=1e-5)


def test_fused_stack_rejects_large_n():
    import numpy as np
    import pytest

    from geossl_tpu.models.painn import PaiNN, fused_stack_apply

    m = PaiNN(use_pallas=False)
    B, N = 2, 256  # kexp10 raised STACK_MAX_N to 128
    z = jnp.zeros((B, N), jnp.int32)
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 3)),
                      jnp.float32)
    mask = jnp.ones((B, N), bool)
    params = m.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    with pytest.raises(ValueError, match="VMEM"):
        fused_stack_apply(m, params, z, pos, mask)


def test_painn_fused_stack_n128_matches_module_apply():
    """kexp10 raised STACK_MAX_N to 128 (measured 1.32x on chip at the
    kernel family's usual bf16 drift): pin parity at the new top bucket."""
    import numpy as np

    from geossl_tpu.models.painn import PaiNN, fused_stack_apply

    rng = np.random.default_rng(4)
    B, N = 2, 128
    z = rng.integers(1, 9, (B, N)).astype(np.int32)
    pos = np.cumsum(rng.normal(scale=0.9, size=(B, N, 3)), 1).astype(
        np.float32)
    mask = np.ones((B, N), bool)
    mask[1, 70:] = False
    z[1, 70:] = 0
    z, pos, mask = map(jnp.asarray, (z, pos, mask))
    m = PaiNN(use_pallas=False)
    params = m.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    ref_g, _ = m.apply({"params": params}, z, pos, mask)
    got_g, _ = fused_stack_apply(m, params, z, pos, mask)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=2e-5, atol=1e-5)
