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


def test_executed_pair_fraction_semantics():
    """executed_pair_fraction: 1.0 for single-tile grids (no gating), < 0.5
    on an Atom3D-density N=512 grid (symmetric band + empty tiles), and
    exactly the hand-count on a constructed grid."""
    # N=32: sparse_auto off, sym unprofitable -> everything executes
    env32 = np.ones((4, 32, 32), np.float32)
    assert flops.executed_pair_fraction(env32) == 1.0

    # constructed N=256 grid, 1 graph: only the first 128x128 quadrant live
    env = np.zeros((1, 256, 256), np.float32)
    env[0, :128, :128] = 1.0
    from geossl_tpu.ops.pallas_utils import sym_grid_info

    ti, tj, _ = sym_grid_info(256)
    nti, ntj = 256 // ti, 256 // tj
    expected = sum(
        1
        for ii in range(nti)
        for jj in range(ntj)
        if (jj + 1) * tj > ii * ti  # in band
        and ii * ti < 128 and jj * tj < 128  # live quadrant
    ) * ti * tj / 256**2
    got = flops.executed_pair_fraction(env, model="schnet")
    assert got == pytest.approx(expected)
    assert got < 0.5  # band + occupancy both bite

    # dense everything-live N=512: schnet executes ~the upper band only
    env512 = np.ones((2, 512, 512), np.float32)
    sym_frac = flops.executed_pair_fraction(env512, model="schnet")
    assert 0.5 < sym_frac < 0.7  # band incl. diagonal tiles
    # painn has no symmetric variant: all-live means all-executed
    assert flops.executed_pair_fraction(env512, model="painn") == 1.0


def test_executed_fraction_realistic_atom3d_below_one():
    """At Atom3D density (N=512 complexes, 10 A cutoff) the executed
    fraction must be well below 1 — this is the number that kept BENCH_r03's
    pct_*_peak above 100 when it was missing (VERDICT r3 weak #1)."""
    rng = np.random.default_rng(7)
    b, n = 4, 512
    pos = np.cumsum(rng.normal(scale=2.0, size=(b, n, 3)), axis=1)
    mask = np.zeros((b, n), bool)
    for i, real in enumerate([300, 400, 480, 512]):
        mask[i, :real] = True
    dist, pm = geometry.pairwise_distances(
        jnp.asarray(pos, jnp.float32), jnp.asarray(mask))
    env = np.asarray((np.asarray(dist) < 10.0) & np.asarray(pm), np.float32)
    frac = flops.executed_pair_fraction(env, model="schnet")
    assert 0.05 < frac < 0.65
    fc_dense = flops.finetune_step(64, n)
    fc_exec = flops.finetune_step(64, n, pair_frac=frac)
    assert fc_exec.total < 0.7 * fc_dense.total
    # pair_frac=1 is the dense count
    assert flops.finetune_step(64, n, pair_frac=1.0).total == fc_dense.total
