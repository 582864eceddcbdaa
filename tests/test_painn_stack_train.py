"""painn_stack_train (kexp10): the differentiable whole-stack forward must
match the per-block model — value AND gradients (params + positions) — since
training steps may route through it. Runs the kernels in interpret mode on
CPU (conftest pins the platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.models.painn import PaiNN, stack_train_apply


def _batch(b=8, n=24, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.integers(1, 9, (b, n)).astype(np.int32)
    pos = rng.normal(0, 1.5, (b, n, 3)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[-1, n // 2:] = False
    z[-1, n // 2:] = 0
    return jnp.asarray(z), jnp.asarray(pos), jnp.asarray(mask)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-12)


@pytest.mark.parametrize("shared", [False, True])
def test_stack_train_matches_per_block_grads(shared):
    z, pos, mask = _batch()
    mod = PaiNN(shared_interactions=shared, shared_filters=shared)
    params = mod.init(jax.random.PRNGKey(1), z, pos, mask)["params"]
    cot = jnp.asarray(
        np.random.default_rng(7).normal(size=(z.shape[0], 128)).astype(
            np.float32))

    def loss_ref(p, x):
        g, _ = mod.apply({"params": p}, z, x, mask)
        return jnp.sum(g * cot)

    def loss_stack(p, x):
        g, _ = stack_train_apply(mod, p, z, x, mask)
        return jnp.sum(g * cot)

    v1, (gp1, gx1) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, pos)
    v2, (gp2, gx2) = jax.value_and_grad(loss_stack, argnums=(0, 1))(params,
                                                                    pos)
    assert abs(float(v1 - v2)) / abs(float(v1)) < 1e-5
    rels = jax.tree_util.tree_map(_rel, gp1, gp2)
    assert max(jax.tree_util.tree_leaves(rels)) < 1e-3
    assert _rel(gx1, gx2) < 1e-3


def test_stack_train_cached_pair_mask_and_zero_row():
    """The GeoSSL perturbed-view path: a clean-geometry pair_mask is supplied
    while positions are perturbed; padding row 0 of the embedding must get
    zero gradient (padding_idx=0 semantics)."""
    z, pos, mask = _batch(seed=3)
    mod = PaiNN()
    params = mod.init(jax.random.PRNGKey(2), z, pos, mask)["params"]
    from geossl_tpu.ops import geometry

    dist, pm = geometry.pairwise_distances(pos, mask)
    pair_mask = geometry.radius_adjacency(dist, pm, mod.cutoff, None)
    pos2 = pos + 0.1 * jax.random.normal(jax.random.PRNGKey(3), pos.shape)

    def loss_ref(p):
        g, _ = mod.apply({"params": p}, z, pos2, mask, pair_mask)
        return jnp.sum(g ** 2)

    def loss_stack(p):
        g, _ = stack_train_apply(mod, p, z, pos2, mask, pair_mask)
        return jnp.sum(g ** 2)

    v1, g1 = jax.value_and_grad(loss_ref)(params)
    v2, g2 = jax.value_and_grad(loss_stack)(params)
    assert abs(float(v1 - v2)) / abs(float(v1)) < 1e-5
    rels = jax.tree_util.tree_map(_rel, g1, g2)
    assert max(jax.tree_util.tree_leaves(rels)) < 1e-3
    assert float(jnp.abs(g2["embedding"][0]).max()) == 0.0


def test_stack_train_rejects_large_n():
    z, pos, mask = _batch(n=256)  # kexp10 raised STACK_MAX_N to 128
    mod = PaiNN()
    params = mod.init(jax.random.PRNGKey(1), z, pos, mask)["params"]
    with pytest.raises(ValueError, match="VMEM-resident"):
        stack_train_apply(mod, params, z, pos, mask)


def test_stack_train_rejects_f64_positions():
    # same contract as fused_stack_apply: the f64 numerics-parity path must
    # raise, not silently downcast to f32. conftest pins jax_enable_x64=False,
    # under which astype(float64) is a silent no-op — build the f64 array
    # inside an enable_x64 scope so the guard actually sees float64.
    z, pos, mask = _batch()
    mod = PaiNN()
    params = mod.init(jax.random.PRNGKey(1), z, pos, mask)["params"]
    jax.config.update("jax_enable_x64", True)
    try:
        pos64 = jnp.asarray(np.asarray(pos, np.float64))
        assert pos64.dtype == jnp.float64
        with pytest.raises(ValueError, match="float32"):
            stack_train_apply(mod, params, z, pos64, mask)
    finally:
        jax.config.update("jax_enable_x64", False)
