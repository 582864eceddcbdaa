"""Analytic FLOP accounting (utils/flops.py) cross-checked against XLA's own
cost analysis — keeps the MFU/roofline table in docs/PERF.md honest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geossl_tpu.ops import geometry
from geossl_tpu.utils import flops


def _xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c["flops"])


def _inputs(batch, n, seed=0):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.integers(1, 9, (batch, n)), jnp.int32)
    pos = jnp.asarray(rng.normal(size=(batch, n, 3)) * 2, jnp.float32)
    mask = jnp.ones((batch, n), bool)
    return z, pos, mask


def test_schnet_forward_matches_xla_cost_analysis():
    from geossl_tpu.models import SchNet

    batch, n = 8, 32
    z, pos, mask = _inputs(batch, n)
    model = SchNet(use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), z, pos, mask)

    def fwd(p, z, pos, mask):
        g, _ = model.apply(p, z, pos, mask)
        return jnp.sum(g)

    xla = _xla_flops(fwd, params, z, pos, mask)
    analytic = flops.schnet_forward(n).scale(batch).total
    assert analytic == pytest.approx(xla, rel=0.10)


def test_painn_forward_matches_xla_cost_analysis():
    from geossl_tpu.models import PaiNN

    batch, n = 8, 32
    z, pos, mask = _inputs(batch, n)
    model = PaiNN(use_pallas=False)
    dist, pm = geometry.pairwise_distances(pos, mask)
    pair_mask = geometry.radius_adjacency(dist, pm, 5.0)
    params = model.init(jax.random.PRNGKey(0), z, pos, mask, pair_mask)

    def fwd(p, z, pos, mask, pair_mask):
        g, _ = model.apply(p, z, pos, mask, pair_mask)
        return jnp.sum(g)

    xla = _xla_flops(fwd, params, z, pos, mask, pair_mask)
    analytic = flops.painn_forward(n).scale(batch).total
    assert analytic == pytest.approx(xla, rel=0.15)


def test_train_step_backward_convention_brackets_xla():
    """The 3x-forward training-step convention should bracket XLA's count of
    value_and_grad within the documented ~±35% (docs it as approximate but
    not fictional)."""
    from geossl_tpu.models import SchNet

    batch, n = 4, 32
    z, pos, mask = _inputs(batch, n)
    model = SchNet(use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), z, pos, mask)

    def loss(p, z, pos, mask):
        g, _ = model.apply(p, z, pos, mask)
        return jnp.mean(g**2)

    def step(p, z, pos, mask):
        return jax.value_and_grad(loss)(p, z, pos, mask)

    xla = _xla_flops(step, params, z, pos, mask)
    analytic = flops.train_step(flops.schnet_forward(n)).scale(batch).total
    assert 0.65 * xla < analytic < 1.35 * xla


def test_mfu_helper():
    tf, frac = flops.mfu(1e12, 0.01)  # 1 TFLOP in 10 ms = 100 TFLOP/s
    assert tf == pytest.approx(100.0)
    assert frac == pytest.approx(100e12 / flops.V5E_PEAK_BF16)
    assert flops.ddm_step(128, 32).total > 2 * flops.schnet_forward(32).scale(
        128).total  # two views + heads + backward strictly dominate one fwd
