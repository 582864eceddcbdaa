"""Pair-grid model parallelism (parallel/pair_parallel.py + the backbones'
``pair_axis`` field): sharded == unsharded for forward AND grads, composed
with data parallelism on a 2-D mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.models import PaiNN, SchNet
from geossl_tpu.parallel.pair_parallel import (
    PAIR_AXIS,
    make_pair_mesh,
    pair_sharded_apply,
)

# tiny configs: the sharding logic is size-independent, and full-size
# backbones make the CPU interpret-mode kernels crawl
_SMALL = {
    SchNet: dict(hidden_channels=32, num_filters=32, num_interactions=2,
                 num_gaussians=9),
    PaiNN: dict(n_atom_basis=32, n_interactions=2, n_rbf=5),
}


def _make(model_cls, **kw):
    return model_cls(**_SMALL[model_cls], **kw)


def _inputs(b=4, n=32, seed=0):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.integers(1, 9, (b, n)).astype(np.int32))
    pos = jnp.asarray(rng.normal(scale=2.0, size=(b, n, 3)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[0, n // 2 :] = False  # padding rows exercise the masked paths
    return z, pos, jnp.asarray(mask)


@pytest.mark.parametrize("model_cls", [SchNet, PaiNN])
def test_pair_sharded_forward_matches(model_cls):
    z, pos, mask = _inputs()
    plain = _make(model_cls)
    sharded = _make(model_cls, pair_axis=PAIR_AXIS)
    params = plain.init(jax.random.PRNGKey(0), z, pos, mask)["params"]

    mesh = make_pair_mesh(num_pair=4)
    apply_sharded = pair_sharded_apply(
        lambda p, *a: sharded.apply({"params": p}, *a), mesh)
    g0, h0 = plain.apply({"params": params}, z, pos, mask)
    g1, h1 = apply_sharded(params, z, pos, mask)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("model_cls", [SchNet, PaiNN])
def test_pair_sharded_grads_match(model_cls):
    z, pos, mask = _inputs(b=2, n=16, seed=1)
    plain = _make(model_cls)
    sharded = _make(model_cls, pair_axis=PAIR_AXIS)
    params = plain.init(jax.random.PRNGKey(1), z, pos, mask)["params"]
    mesh = make_pair_mesh(num_pair=2)
    apply_sharded = pair_sharded_apply(
        lambda p, *a: sharded.apply({"params": p}, *a), mesh)

    def loss_plain(p):
        g, _ = plain.apply({"params": p}, z, pos, mask)
        return jnp.sum(g**2)

    def loss_sharded(p):
        g, _ = apply_sharded(p, z, pos, mask)
        return jnp.sum(g**2)

    l0, g0 = jax.value_and_grad(loss_plain)(params)
    l1, g1 = jax.value_and_grad(loss_sharded)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, v0 in flat0:
        # f32 summation-order drift only (the psum reduces in stripe order)
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(v0), rtol=5e-3, atol=1e-4,
            err_msg=str(path))


def test_pair_plus_data_parallel_train_step():
    """2-D ("data", "pair") mesh: batch sharded over data, pair grid over
    pair; a full loss+grad step matches single-device."""
    z, pos, mask = _inputs(b=4, n=32, seed=2)
    y = jnp.asarray(np.random.default_rng(3).normal(size=(4,)).astype(np.float32))
    plain = _make(SchNet)
    sharded = _make(SchNet, pair_axis=PAIR_AXIS)
    params = plain.init(jax.random.PRNGKey(2), z, pos, mask)["params"]
    mesh = make_pair_mesh(num_pair=4, num_data=2)
    apply_sharded = pair_sharded_apply(
        lambda p, *a: sharded.apply({"params": p}, *a), mesh)

    def loss_plain(p):
        g, _ = plain.apply({"params": p}, z, pos, mask)
        return jnp.mean((g.mean(axis=-1) - y) ** 2)

    def loss_sharded(p):
        g, _ = apply_sharded(p, z, pos, mask)
        return jnp.mean((g.mean(axis=-1) - y) ** 2)

    l0, g0 = jax.jit(jax.value_and_grad(loss_plain))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_sharded))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for (path, v0), (_, v1) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=5e-4, atol=1e-5, err_msg=str(path))


def test_pair_axis_requires_divisible_n():
    z, pos, mask = _inputs(b=2, n=30, seed=4)  # 30 % 4 != 0
    sharded = _make(SchNet, pair_axis=PAIR_AXIS)
    params = _make(SchNet).init(jax.random.PRNGKey(0), z, pos, mask)["params"]
    mesh = make_pair_mesh(num_pair=4)
    apply_sharded = pair_sharded_apply(
        lambda p, *a: sharded.apply({"params": p}, *a), mesh)
    with pytest.raises(ValueError, match="axis_size"):
        apply_sharded(params, z, pos, mask)


@pytest.mark.parametrize("model_cls", [SchNet, PaiNN])
def test_pair_sharded_fused_kernel_matches(model_cls):
    """use_pallas + pair_axis: each device runs the rectangular fused kernel
    on its stripe (interpret mode on CPU); output and grads match the plain
    unsharded fused model."""
    z, pos, mask = _inputs(b=2, n=32, seed=5)
    plain = _make(model_cls, use_pallas=True)
    sharded = _make(model_cls, use_pallas=True, pair_axis=PAIR_AXIS)
    params = plain.init(jax.random.PRNGKey(3), z, pos, mask)["params"]
    mesh = make_pair_mesh(num_pair=4)
    apply_sharded = pair_sharded_apply(
        lambda p, *a: sharded.apply({"params": p}, *a), mesh)

    g0, _ = plain.apply({"params": params}, z, pos, mask)
    g1, _ = apply_sharded(params, z, pos, mask)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-5, atol=1e-5)

    def loss(fn):
        def f(p):
            g, _ = fn(p)
            return jnp.sum(g**2)
        return f

    gp0 = jax.grad(loss(lambda p: plain.apply({"params": p}, z, pos, mask)))(
        params)
    gp1 = jax.grad(loss(lambda p: apply_sharded(p, z, pos, mask)))(params)
    for (path, v0), (_, v1) in zip(
        jax.tree_util.tree_leaves_with_path(gp0),
        jax.tree_util.tree_leaves_with_path(gp1),
    ):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=5e-3, atol=1e-4, err_msg=str(path))
