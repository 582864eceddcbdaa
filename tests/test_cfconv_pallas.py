import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.ops.cfconv_pallas import cfconv_fused, cfconv_fused_reference

B, N, G, F1, F = 2, 32, 51, 64, 128
START, STOP = 0.0, 10.0


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    pos = np.cumsum(rng.normal(scale=0.9, size=(B, N, 3)), axis=1).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.linalg.norm(diff, axis=-1).astype(np.float32)
    adj = (dist < STOP) & ~np.eye(N, dtype=bool)
    env = (0.5 * (np.cos(dist * np.pi / STOP) + 1.0) * adj).astype(np.float32)
    x = rng.normal(size=(B, N, F)).astype(np.float32) * 0.5
    w1 = (rng.normal(size=(G, F1)) * 0.2).astype(np.float32)
    b1 = (rng.normal(size=(F1,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(F1, F)) * 0.2).astype(np.float32)
    b2 = (rng.normal(size=(F,)) * 0.1).astype(np.float32)
    return tuple(map(jnp.asarray, (dist, env, x, w1, b1, w2, b2)))


def test_forward_matches_reference(inputs):
    out = cfconv_fused(*inputs, START, STOP, G)
    ref = cfconv_fused_reference(*inputs, START, STOP, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_gradients_match_reference(inputs):
    def loss_fused(args):
        out = cfconv_fused(*args, START, STOP, G)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def loss_ref(args):
        out = cfconv_fused_reference(*args, START, STOP, G)
        return jnp.sum(out * jnp.cos(out))

    g_fused = jax.grad(loss_fused)(inputs)
    g_ref = jax.grad(loss_ref)(inputs)
    names = ["dist", "env", "x", "w1", "b1", "w2", "b2"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_larger_n_tiling():
    n = 256
    rng = np.random.default_rng(1)
    dist = np.abs(rng.normal(size=(1, n, n))).astype(np.float32) * 5
    dist = (dist + dist.transpose(0, 2, 1)) / 2
    env = (0.5 * (np.cos(dist * np.pi / STOP) + 1.0)).astype(np.float32)
    x = rng.normal(size=(1, n, F)).astype(np.float32) * 0.5
    w1 = (rng.normal(size=(G, F1)) * 0.2).astype(np.float32)
    b1 = np.zeros(F1, np.float32)
    w2 = (rng.normal(size=(F1, F)) * 0.2).astype(np.float32)
    b2 = np.zeros(F, np.float32)
    args = tuple(map(jnp.asarray, (dist, env, x, w1, b1, w2, b2)))
    out = cfconv_fused(*args, START, STOP, G)
    ref = cfconv_fused_reference(*args, START, STOP, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_schnet_pallas_path_matches_xla():
    from geossl_tpu.models.schnet import SchNet

    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.integers(0, 9, size=(2, 16)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.9, size=(2, 16, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(16)[None, :] < np.array([[16], [11]]))
    kwargs = dict(hidden_channels=32, num_filters=32, num_interactions=2,
                  num_gaussians=17, cutoff=6.0)
    m_xla = SchNet(**kwargs, use_pallas=False)
    m_pal = SchNet(**kwargs, use_pallas=True)
    params = m_xla.init(jax.random.PRNGKey(0), z, pos, mask)["params"]

    out_x, node_x = m_xla.apply({"params": params}, z, pos, mask)
    out_p, node_p = m_pal.apply({"params": params}, z, pos, mask)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p), rtol=1e-4, atol=1e-5)

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p}, z, pos, mask)
            return jnp.sum(out**2)
        return f

    gx = jax.grad(loss(m_xla))(params)
    gp = jax.grad(loss(m_pal))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4)


def test_second_order_matches_reference(inputs):
    """MD17's force path: grad-of-grad through the fused op must equal the
    XLA reference (the fused backward is itself custom-VJP'd, with its
    derivative routed through the reference math — VERDICT r1 #9)."""
    dist, env, x, w1, b1, w2, b2 = inputs

    def make_loss(op):
        def loss(params, dist, env, x):
            w1, b1, w2, b2 = params
            out = op(dist, env, x, w1, b1, w2, b2, START, STOP, G)
            # "force": gradient of a scalar energy w.r.t. dist, then a loss
            # of that gradient — second derivative w.r.t. params
            f = jax.grad(
                lambda d: jnp.sum(jnp.tanh(
                    op(d, env, x, w1, b1, w2, b2, START, STOP, G)))
            )(dist)
            return jnp.sum(out) * 1e-3 + jnp.sum(jnp.abs(f))
        return loss

    params = (w1, b1, w2, b2)
    g_fused = jax.grad(make_loss(cfconv_fused))(params, dist, env, x)
    g_ref = jax.grad(make_loss(cfconv_fused_reference))(params, dist, env, x)
    for name, a, b in zip(["w1", "b1", "w2", "b2"], g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3,
            err_msg=f"second-order grad mismatch for {name}",
        )


def test_second_order_wrt_positions_chain(inputs):
    """Full MD17 shape: loss(grad_pos E) differentiated w.r.t. everything —
    checks the dx recursion path too (x depends on upstream params)."""
    dist, env, x, w1, b1, w2, b2 = inputs

    def energy(op, xw, dist):
        xx = x * xw  # x carries parameter dependence like stacked blocks do
        out = op(dist, env, xx, w1, b1, w2, b2, START, STOP, G)
        return jnp.sum(jnp.sin(out))

    def loss(op, xw):
        f = jax.grad(partial_energy := lambda d: energy(op, xw, d))(dist)
        del partial_energy
        return jnp.sum(f * f)

    g_fused = jax.grad(lambda w: loss(cfconv_fused, w))(jnp.float32(1.3))
    g_ref = jax.grad(lambda w: loss(cfconv_fused_reference, w))(jnp.float32(1.3))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-2)


def test_md17_force_training_grads_fused_vs_xla():
    """End-to-end MD17 shape: grad of [L1(E) + L1(-dE/dpos)] w.r.t. params
    through the full SchNet, fused vs XLA paths."""
    from geossl_tpu.models.schnet import SchNet

    rng = np.random.default_rng(7)
    b, n = 2, 8
    z = jnp.asarray(rng.integers(0, 9, (b, n)), jnp.int32)
    pos = jnp.asarray(np.cumsum(rng.normal(scale=0.8, size=(b, n, 3)),
                                axis=1).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    forces = jnp.asarray(rng.normal(scale=0.1, size=(b, n, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))

    def make(use_pallas):
        model = SchNet(hidden_channels=16, num_filters=16, num_interactions=2,
                       num_gaussians=9, cutoff=6.0, use_pallas=use_pallas)
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
    # same init either way
    for a, b_ in zip(jax.tree_util.tree_leaves(params_x),
                     jax.tree_util.tree_leaves(params_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b_ in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_bf16_mxu_mode(inputs):
    """mxu='bf16' (full-MXU-rate filter matmuls, f32 accumulation): fused
    matches the bf16 reference tightly, and both stay within bf16 drift of
    the f32 path; gradients stay usable."""
    out_ref16 = cfconv_fused_reference(*inputs, START, STOP, G, "bf16")
    out_f16 = cfconv_fused(*inputs, START, STOP, G, "bf16")
    np.testing.assert_allclose(np.asarray(out_f16), np.asarray(out_ref16),
                               rtol=2e-3, atol=2e-3)
    out_f32 = cfconv_fused_reference(*inputs, START, STOP, G)
    scale = float(np.abs(np.asarray(out_f32)).mean())
    err = float(np.abs(np.asarray(out_f16) - np.asarray(out_f32)).mean())
    assert err < 0.03 * scale, (err, scale)

    def loss(args, mxu):
        return jnp.sum(jnp.tanh(cfconv_fused(*args, START, STOP, G, mxu)))

    g16 = jax.grad(lambda a: loss(a, "bf16"))(inputs)
    g32 = jax.grad(lambda a: loss(a, "f32"))(inputs)
    for name, a, b in zip(["dist", "env", "x", "w1", "b1", "w2", "b2"],
                          g16, g32):
        sa = float(np.abs(np.asarray(b)).mean()) + 1e-8
        ea = float(np.abs(np.asarray(a) - np.asarray(b)).mean())
        assert ea < 0.05 * sa, (name, ea, sa)


def test_larger_n_gradients_multi_tile():
    """Gradients at N=256 (multi-tile grid): the dx accumulation over i-tiles
    and the transposed (b, j, i) backward grid must match the reference."""
    n = 256
    rng = np.random.default_rng(5)
    pos = np.cumsum(rng.normal(scale=0.7, size=(2, n, 3)), axis=1).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.linalg.norm(diff, axis=-1).astype(np.float32)
    adj = (dist < STOP) & ~np.eye(n, dtype=bool)
    env = (0.5 * (np.cos(dist * np.pi / STOP) + 1.0) * adj).astype(np.float32)
    x = rng.normal(size=(2, n, F)).astype(np.float32) * 0.5
    w1 = (rng.normal(size=(G, F1)) * 0.2).astype(np.float32)
    b1 = (rng.normal(size=(F1,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(F1, F)) * 0.2).astype(np.float32)
    b2 = (rng.normal(size=(F,)) * 0.1).astype(np.float32)
    args = tuple(map(jnp.asarray, (dist, env, x, w1, b1, w2, b2)))

    def loss(op):
        return lambda a: jnp.sum(jnp.tanh(op(*a, START, STOP, G)))

    g_fused = jax.grad(loss(cfconv_fused))(args)
    g_ref = jax.grad(loss(cfconv_fused_reference))(args)
    for name, a, b in zip(["dist", "env", "x", "w1", "b1", "w2", "b2"],
                          g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3,
            err_msg=f"multi-tile grad mismatch for {name}",
        )


def _symmetric_inputs(n, b=2, seed=11):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.normal(scale=0.7, size=(b, n, 3)), axis=1).astype(np.float32)
    diff = pos[:, :, None] - pos[:, None, :]
    dist = np.linalg.norm(diff, axis=-1).astype(np.float32)
    adj = (dist < STOP) & ~np.eye(n, dtype=bool)
    env = (0.5 * (np.cos(dist * np.pi / STOP) + 1.0) * adj).astype(np.float32)
    x = rng.normal(size=(b, n, F)).astype(np.float32) * 0.5
    w1 = (rng.normal(size=(G, F1)) * 0.2).astype(np.float32)
    b1 = (rng.normal(size=(F1,)) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=(F1, F)) * 0.2).astype(np.float32)
    b2 = (rng.normal(size=(F,)) * 0.1).astype(np.float32)
    return jnp.asarray(pos), tuple(
        map(jnp.asarray, (dist, env, x, w1, b1, w2, b2)))


def test_sym_profitable_gate():
    from geossl_tpu.ops.cfconv_pallas import sym_profitable

    assert not sym_profitable(32)   # single tile — nothing to skip
    assert not sym_profitable(128)  # (32,128) tiling has no fully-lower tile
    assert sym_profitable(256)
    assert sym_profitable(512)


def test_sym_forward_matches_reference():
    from geossl_tpu.ops.cfconv_pallas import cfconv_fused_sym

    for n in (256, 512):
        _, args = _symmetric_inputs(n, b=1)
        out = cfconv_fused_sym(*args, START, STOP, G)
        ref = cfconv_fused_reference(*args, START, STOP, G)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3,
            err_msg=f"sym forward mismatch at N={n}",
        )


def test_sym_gradients_through_symmetric_chain():
    """ddist/denv are placement-symmetrized, so compare gradients THROUGH a
    symmetric construction (positions -> dist -> env), which is how SchNet
    consumes the op: grads w.r.t. positions/x/weights must match exactly."""
    from geossl_tpu.ops.cfconv_pallas import cfconv_fused_sym

    n = 256
    pos, (_, _, x, w1, b1, w2, b2) = _symmetric_inputs(n, b=1)

    def loss(op, pos, x, w1, b1, w2, b2):
        d = jnp.linalg.norm(
            pos[:, :, None] - pos[:, None, :]
            + jnp.eye(n)[None, :, :, None], axis=-1
        ) * (1.0 - jnp.eye(n))[None]
        adj = (d < STOP) & (d > 0)
        env = 0.5 * (jnp.cos(d * jnp.pi / STOP) + 1.0) * adj
        out = op(d, env, x, w1, b1, w2, b2, START, STOP, G)
        return jnp.sum(jnp.tanh(out))

    g_sym = jax.grad(loss, argnums=(1, 2, 3, 4, 5, 6))(
        cfconv_fused_sym, pos, x, w1, b1, w2, b2)
    g_ref = jax.grad(loss, argnums=(1, 2, 3, 4, 5, 6))(
        cfconv_fused_reference, pos, x, w1, b1, w2, b2)
    for name, a, b in zip(["pos", "x", "w1", "b1", "w2", "b2"], g_sym, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3,
            err_msg=f"sym grad mismatch for {name}",
        )


def test_sym_second_order_through_positions():
    """MD17 shape at sym-qualifying N: grad of loss(-dE/dpos) w.r.t. params
    must match the reference through the placement-symmetrized backward."""
    from geossl_tpu.ops.cfconv_pallas import cfconv_fused_sym

    n = 256
    pos, (_, _, x, w1, b1, w2, b2) = _symmetric_inputs(n, b=1)

    def energy(op, pos, w1):
        d = jnp.linalg.norm(
            pos[:, :, None] - pos[:, None, :]
            + jnp.eye(n)[None, :, :, None], axis=-1
        ) * (1.0 - jnp.eye(n))[None]
        adj = (d < STOP) & (d > 0)
        env = 0.5 * (jnp.cos(d * jnp.pi / STOP) + 1.0) * adj
        out = op(d, env, x, w1, b1, w2, b2, START, STOP, G)
        return jnp.sum(jnp.tanh(out))

    def loss(op, w1):
        f = jax.grad(lambda p: energy(op, p, w1))(pos)
        return jnp.sum(f * f)

    g_sym = jax.grad(lambda w: loss(cfconv_fused_sym, w))(w1)
    g_ref = jax.grad(lambda w: loss(cfconv_fused_reference, w))(w1)
    np.testing.assert_allclose(
        np.asarray(g_sym), np.asarray(g_ref), rtol=1e-2, atol=1e-3)


def test_schnet_sym_path_matches_xla_large_n():
    """SchNet at N=256 routes to the symmetric kernel; outputs and parameter
    gradients must match the XLA path."""
    from geossl_tpu.models.schnet import SchNet

    rng = np.random.default_rng(12)
    n = 256
    z = jnp.asarray(rng.integers(0, 9, size=(1, n)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(n)[None, :] < n - 10)
    kwargs = dict(hidden_channels=32, num_filters=32, num_interactions=2,
                  num_gaussians=17, cutoff=8.0)
    m_xla = SchNet(**kwargs, use_pallas=False)
    m_sym = SchNet(**kwargs, use_pallas=True)
    params = m_xla.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    out_x, _ = m_xla.apply({"params": params}, z, pos, mask)
    out_s, _ = m_sym.apply({"params": params}, z, pos, mask)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_s),
                               rtol=1e-3, atol=1e-4)

    def loss(m):
        def f(p):
            out, _ = m.apply({"params": p}, z, pos, mask)
            return jnp.sum(out**2)
        return f

    gx = jax.grad(loss(m_xla))(params)
    gs = jax.grad(loss(m_sym))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-3)


def test_sym_batched_blocks():
    """b > 1 exercises bb > 1 batch-blocking in the symmetric kernel's
    per-tile slot outputs."""
    from geossl_tpu.ops.cfconv_pallas import cfconv_fused_sym

    _, args = _symmetric_inputs(256, b=4, seed=15)
    out = cfconv_fused_sym(*args, START, STOP, G)
    ref = cfconv_fused_reference(*args, START, STOP, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss(op):
        return lambda x, w2: jnp.sum(jnp.tanh(op(
            args[0], args[1], x, args[3], args[4], w2, args[6],
            START, STOP, G)))

    gs = jax.grad(loss(cfconv_fused_sym), argnums=(0, 1))(args[2], args[5])
    gr = jax.grad(loss(cfconv_fused_reference), argnums=(0, 1))(args[2], args[5])
    for name, a, b in zip(["x", "w2"], gs, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3,
            err_msg=f"batched sym grad mismatch for {name}",
        )


# ---------------------------------------------------------------------------
# occupancy-gated ("sparse") tiles


def test_sparse_utils():
    from geossl_tpu.ops.pallas_utils import sparse_auto, tile_occupancy

    # auto: Atom3D pair grids only
    assert not sparse_auto(32, "auto")
    assert not sparse_auto(64, "auto")
    assert sparse_auto(128, "auto")
    assert sparse_auto(256, "auto")
    assert sparse_auto(448, "auto")
    assert sparse_auto(512, "auto")
    # forced modes ignore n; the string knob vocabulary maps, not bool()s
    assert sparse_auto(32, True) and not sparse_auto(512, False)
    assert sparse_auto(32, "on") and not sparse_auto(512, "off")
    assert not sparse_auto(512, None)
    with pytest.raises(ValueError):
        sparse_auto(512, "bf-16")

    env = np.zeros((2, 8, 8), np.float32)
    env[0, 0, 5] = 1.0   # tile (0, 0, 1) occupied
    env[1, 6, 1] = 2.0   # merges into block flag when bb=2
    # flat [b, i, j]-order flags (1-D keeps the SMEM array unpadded)
    occ = np.asarray(tile_occupancy(jnp.asarray(env), 1, 4, 4))
    assert occ.shape == (8,)
    assert occ.reshape(2, 2, 2)[0].tolist() == [[0, 1], [0, 0]]
    assert occ.reshape(2, 2, 2)[1].tolist() == [[0, 0], [1, 0]]
    occ2 = np.asarray(tile_occupancy(jnp.asarray(env), 2, 4, 4))
    assert occ2.shape == (4,) and occ2.reshape(2, 2).tolist() == [[0, 1], [1, 0]]

    from geossl_tpu.ops.pallas_utils import occ_at

    # occ_at indexes the flat layout like the 3-D one
    o3 = occ.reshape(2, 2, 2)
    for bi in range(2):
        for ii in range(2):
            for jj in range(2):
                assert int(occ_at(occ, bi, ii, jj, 2, 2)) == int(o3[bi, ii, jj])


def test_sparse_forward_matches_dense():
    """sparse=True must be bitwise-identical to dense — skipped tiles have
    env==0 everywhere, so the dense kernel adds exact zeros there."""
    from geossl_tpu.ops.pallas_utils import tile_occupancy

    _, args = _symmetric_inputs(256, b=2, seed=21)
    occ = np.asarray(tile_occupancy(args[1], 1, 32, 128))
    assert 0 < occ.mean() < 1, "fixture must contain empty AND occupied tiles"
    out_d = cfconv_fused(*args, START, STOP, G, "f32", False)
    out_s = cfconv_fused(*args, START, STOP, G, "f32", True)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


def test_sparse_gradients_through_symmetric_chain():
    """The denv cotangent is zeroed on skipped tiles — exact once chained
    through the env construction (cosine envelope: value AND slope zero
    outside the cutoff). Compare position/param grads sparse vs dense."""
    n = 256
    pos, (_, _, x, w1, b1, w2, b2) = _symmetric_inputs(n, b=1, seed=22)

    def loss(sparse, pos, x, w1, b1, w2, b2):
        d = jnp.linalg.norm(
            pos[:, :, None] - pos[:, None, :]
            + jnp.eye(n)[None, :, :, None], axis=-1
        ) * (1.0 - jnp.eye(n))[None]
        adj = (d < STOP) & (d > 0)
        env = 0.5 * (jnp.cos(d * jnp.pi / STOP) + 1.0) * adj
        out = cfconv_fused(d, env, x, w1, b1, w2, b2, START, STOP, G,
                           "f32", sparse)
        return jnp.sum(jnp.tanh(out))

    g_s = jax.grad(loss, argnums=(1, 2, 3, 4, 5, 6))(
        True, pos, x, w1, b1, w2, b2)
    g_d = jax.grad(loss, argnums=(1, 2, 3, 4, 5, 6))(
        False, pos, x, w1, b1, w2, b2)
    for name, a, b in zip(["pos", "x", "w1", "b1", "w2", "b2"], g_s, g_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
            err_msg=f"sparse grad mismatch for {name}",
        )


def test_sparse_sym_matches_reference():
    """sparse composes with the tile-skipping symmetric variant."""
    from geossl_tpu.ops.cfconv_pallas import cfconv_fused_sym

    _, args = _symmetric_inputs(256, b=2, seed=23)
    out_s = cfconv_fused_sym(*args, START, STOP, G, "f32", True)
    ref = cfconv_fused_reference(*args, START, STOP, G)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    out_d = cfconv_fused_sym(*args, START, STOP, G, "f32", False)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_d))


def test_schnet_sparse_path_matches_dense():
    """Model level: SchNet(sparse=True) == SchNet(sparse=False) with padding
    (padding rows/cols are empty tiles too), outputs and parameter grads."""
    from geossl_tpu.models.schnet import SchNet

    rng = np.random.default_rng(24)
    n = 256
    z = jnp.asarray(rng.integers(0, 9, size=(1, n)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(n)[None, :] < n - 64)
    kwargs = dict(hidden_channels=32, num_filters=32, num_interactions=2,
                  num_gaussians=17, cutoff=8.0, use_pallas=True)
    m_d = SchNet(**kwargs, sparse=False)
    m_s = SchNet(**kwargs, sparse=True)
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
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_schnet_sparse_with_max_neighbors_matches_dense():
    """max_neighbors breaks adjacency symmetry (routes symmetric=False), and
    the occupancy gating must stay exact on the resulting ASYMMETRIC env."""
    from geossl_tpu.models.schnet import SchNet

    rng = np.random.default_rng(25)
    n = 256
    z = jnp.asarray(rng.integers(0, 9, size=(1, n)), jnp.int32)
    pos = jnp.asarray(
        np.cumsum(rng.normal(scale=0.7, size=(1, n, 3)), axis=1).astype(np.float32)
    )
    mask = jnp.asarray(np.arange(n)[None, :] < n - 32)
    kwargs = dict(hidden_channels=32, num_filters=32, num_interactions=2,
                  num_gaussians=17, cutoff=8.0, use_pallas=True,
                  max_neighbors=16)
    m_d = SchNet(**kwargs, sparse=False)
    m_s = SchNet(**kwargs, sparse=True)
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
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# rectangular (pair-axis stripe) grids


@pytest.mark.parametrize("sparse", [False, True])
def test_fused_rectangular_stripe_matches_reference(sparse):
    """cfconv_fused on a [B, Ni, Nj] stripe (the pair-axis model-parallel
    shape, Ni != Nj) equals the reference math — value and all grads."""
    from geossl_tpu.ops.cfconv_pallas import cfconv_fused, cfconv_fused_reference

    rng = np.random.default_rng(11)
    b, ni, nj, f, g = 2, 32, 16, 8, 7
    pos = rng.normal(scale=2.0, size=(b, ni, 3)).astype(np.float32)
    d_full = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
    dist = jnp.asarray(d_full[:, :, :nj])
    env = jnp.asarray(
        (d_full[:, :, :nj] < 4.0) * np.cos(d_full[:, :, :nj]) ** 2
    ).astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, nj, f)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(g, f)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(f,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(f, f)).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.normal(size=(f,)).astype(np.float32) * 0.1)

    args = (dist, env, x, w1, b1, w2, b2)
    out = cfconv_fused(*args, 0.0, 4.0, g, "f32", sparse)
    ref = cfconv_fused_reference(*args, 0.0, 4.0, g, "f32")
    assert out.shape == (b, ni, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(*a):
        return jnp.sum(cfconv_fused(*a, 0.0, 4.0, g, "f32", sparse) ** 2)

    def loss_ref(*a):
        return jnp.sum(cfconv_fused_reference(*a, 0.0, 4.0, g, "f32") ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b_, name in zip(gf, gr,
                           ["ddist", "denv", "dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-4, err_msg=name)


def test_schnet_fused_stack_apply_matches_module_apply():
    """schnet_stack_infer / fused_stack_apply (kexp2 integration): the
    whole-stack inference program must reproduce module.apply — default,
    mean/std+atomref, and dipole configs, padded + single-atom rows."""
    import numpy as np

    from geossl_tpu.models.schnet import SchNet, fused_stack_apply

    rng = np.random.default_rng(4)
    B, N = 8, 32
    z = np.zeros((B, N), np.int32)
    pos = np.zeros((B, N, 3), np.float32)
    mask = np.zeros((B, N), bool)
    for i in range(B):
        n = int(rng.integers(4, N + 1)) if i else 1
        z[i, :n] = rng.integers(0, 9, n)
        pos[i, :n] = np.cumsum(rng.normal(scale=0.9, size=(n, 3)), 0)
        mask[i, :n] = True
    z, pos, mask = map(jnp.asarray, (z, pos, mask))

    atomref = np.linspace(-1.0, 1.0, 9).astype(np.float32)
    for kwargs in ({}, {"mean": 0.3, "std": 1.7, "atomref": atomref},
                   {"dipole": True}, {"readout": "add"}):
        m = SchNet(use_pallas=False, **kwargs)
        params = m.init(jax.random.PRNGKey(1), z, pos, mask)["params"]
        ref_g, ref_n = m.apply({"params": params}, z, pos, mask)
        got_g, got_n = fused_stack_apply(m, params, z, pos, mask)
        np.testing.assert_allclose(np.asarray(got_n), np.asarray(ref_n),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=f"node repr diverged ({kwargs})")
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                                   rtol=2e-5, atol=1e-5)


def test_schnet_fused_stack_guard_rejects_unsupported_configs():
    """Rectangular filter widths and f64 positions must raise (or, in
    serving, fall back) — the stack kernel keeps h resident at ONE width
    and owns no f64 parity contract (review findings, round 4)."""
    import numpy as np
    import pytest

    from geossl_tpu.models.schnet import SchNet, fused_stack_apply

    B, N = 2, 16
    z = jnp.zeros((B, N), jnp.int32)
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 3)),
                      jnp.float32)
    mask = jnp.ones((B, N), bool)

    rect = SchNet(use_pallas=False, num_filters=64)
    params = rect.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    with pytest.raises(ValueError, match="default config"):
        fused_stack_apply(rect, params, z, pos, mask)

    m = SchNet(use_pallas=False)
    params = m.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    # f16 stands in for any non-f32 dtype (f64 needs the x64 flag flipped)
    with pytest.raises(ValueError, match="float32"):
        fused_stack_apply(m, params, z, pos.astype(jnp.float16), mask)


def test_predictor_rectangular_filters_falls_back_to_per_block():
    """serve.Predictor with num_filters != hidden_channels must not route
    into the stack kernel (it cannot represent the config) — predictions
    still come out finite via the per-block path."""
    import numpy as np

    from geossl_tpu.config import ModelConfig, SchNetConfig
    from geossl_tpu.data.store import MolRecord, MolStore
    from geossl_tpu.serve import Predictor
    from geossl_tpu.train import common
    from geossl_tpu.train.finetune_qm9 import LinearHead

    cfg = ModelConfig(use_pallas=True, schnet=SchNetConfig(num_filters=64))
    module, _ = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(0)
    params = {
        "model": common.init_backbone(module, rng, n_max=16),
        "graph_pred_linear": LinearHead().init(
            rng, jnp.zeros((2, cfg.emb_dim)))["params"],
    }
    nrng = np.random.default_rng(0)
    records = [MolRecord(
        atom_type=nrng.integers(0, 9, 8).astype(np.int32),
        positions=np.cumsum(nrng.normal(scale=0.9, size=(8, 3)),
                            axis=0).astype(np.float32)) for _ in range(4)]
    store = MolStore.from_records(records)
    out = Predictor(cfg, params, batch_size=4,
                    bucket_sizes=(16,)).predict(store)
    assert np.isfinite(out).all()


def test_schnet_fused_stack_rejects_large_n():
    import numpy as np
    import pytest

    from geossl_tpu.models.schnet import SchNet, fused_stack_apply

    m = SchNet(use_pallas=False)
    B, N = 2, 256  # kexp10 raised STACK_MAX_N to 128
    z = jnp.zeros((B, N), jnp.int32)
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 3)),
                      jnp.float32)
    mask = jnp.ones((B, N), bool)
    params = m.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    with pytest.raises(ValueError, match="VMEM"):
        fused_stack_apply(m, params, z, pos, mask)


def test_schnet_fused_stack_n128_matches_module_apply():
    """kexp10 raised STACK_MAX_N to 128 (measured 1.18-1.25x on chip,
    bitwise): pin parity at the new top bucket."""
    import numpy as np

    from geossl_tpu.models.schnet import SchNet, fused_stack_apply

    rng = np.random.default_rng(4)
    B, N = 2, 128
    z = rng.integers(1, 9, (B, N)).astype(np.int32)
    pos = np.cumsum(rng.normal(scale=0.9, size=(B, N, 3)), 1).astype(
        np.float32)
    mask = np.ones((B, N), bool)
    mask[1, 70:] = False
    z[1, 70:] = 0
    z, pos, mask = map(jnp.asarray, (z, pos, mask))
    m = SchNet(use_pallas=False)
    params = m.init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    ref_g, _ = m.apply({"params": params}, z, pos, mask)
    got_g, _ = fused_stack_apply(m, params, z, pos, mask)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=2e-5, atol=1e-5)
