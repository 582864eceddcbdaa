"""--steps_per_call on the fine-tune/baseline drivers: k optimizer steps
fused into ONE dispatch via lax.scan (common.make_chain_step).

Chaining must be a pure dispatch-level optimization: the parameter
trajectory equals the unfused loop's (same steps, same order, same math) —
unlike --grad_accum, which changes the effective batch. The win it buys is
amortizing the ~8-10 ms per-dispatch latency of a remote-TPU tunnel
(docs/PERF.md); on CPU it must simply be a no-op in results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from geossl_tpu.train import common


def test_chain_step_equals_sequential_steps():
    tx = optax.adam(1e-2)

    def step_body(state, batch, scale):
        def loss_fn(p):
            return jnp.mean((batch["x"] @ p - batch["y"]) ** 2) * scale

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return common.apply_updates(state, grads, tx), loss

    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    batches = [
        {"x": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
         "y": jnp.asarray(rng.normal(size=(8,)), jnp.float32)}
        for _ in range(5)
    ]

    seq = common.TrainState.create(params, tx)
    seq_losses = []
    for b in batches:
        seq, loss = step_body(seq, b, 2.0)
        seq_losses.append(float(loss))

    chain_step = common.make_chain_step(step_body)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    chained = common.TrainState.create(params, tx)
    chained, losses = chain_step(chained, stacked, 5, 2.0)

    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        jax.device_get(chained.params), jax.device_get(seq.params))
    assert int(chained.step) == int(seq.step) == 5


def _qm9(extra):
    from geossl_tpu.train import finetune_qm9

    return finetune_qm9.main(
        ["--synthetic", "--synthetic_size", "64", "--epochs", "2",
         "--batch_size", "16", "--task", "mu", "--seed", "3"] + extra)


def test_qm9_driver_fused_matches_unfused():
    best1, test1 = _qm9(["--steps_per_call", "1"])
    best4, test4 = _qm9(["--steps_per_call", "4"])  # 3 train batches: 3+ remainder path
    assert best4 == pytest.approx(best1, rel=1e-5)
    assert test4 == pytest.approx(test1, rel=1e-5)


def test_lep_driver_fused_runs():
    # DualMolBatch is the deepest batch pytree the chain stacks
    from geossl_tpu.train import finetune_lep

    # --bucket 64 like every CPU lep test: the default 512 pad is a
    # multi-minute CPU compile and irrelevant to the pytree being chained.
    # size 48 (not 24): the smaller corpus leaves the val split single-class
    # (ROC undefined -> the driver reports no best epoch, fused or not)
    roc, _ = finetune_lep.main(
        ["--synthetic", "--synthetic_size", "48", "--epochs", "1",
         "--batch_size", "4", "--bucket", "64", "--steps_per_call", "3",
         "--seed", "0"])
    assert 0.0 <= roc <= 1.0


def test_steps_per_call_conflicts_with_grad_accum():
    with pytest.raises(SystemExit):
        _qm9(["--steps_per_call", "2", "--grad_accum", "2"])
