"""LR-scheduler parity with the reference's torch schedulers.

The reference fine-tune drivers expose four schedulers
(``finetune_qm9.py:503-523``; same ladder in md17/lba/lep):
CosineAnnealingLR and StepLR (covered in test_torch_parity),
CosineAnnealingWarmRestarts (per-batch fractional-epoch stepping,
``finetune_qm9.py:266-267``) and ReduceLROnPlateau (per-epoch on mean train
loss, ``:272-273``). These tests replay torch's own schedulers (CPU torch is
in the image) and pin ours to their lr traces exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geossl_tpu.train import common, optim


def _torch_lr_trace_warm_restarts(base_lr, epochs, steps_per_epoch, eta_min):
    """lr actually used by optimizer step g, under the reference's loop:
    optimizer.step() runs at the current lr, THEN
    lr_scheduler.step(epoch - 1 + step/num_iters) rewrites it
    (finetune_qm9.py:261-267; epoch is 1-based, step 0-based)."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, epochs, eta_min=eta_min)
    trace = []
    for epoch in range(1, epochs + 1):
        for step in range(steps_per_epoch):
            trace.append(opt.param_groups[0]["lr"])
            sched.step(epoch - 1 + step / steps_per_epoch)
    return np.array(trace)


@pytest.mark.parametrize("epochs,spe", [(5, 7), (3, 1), (20, 4)])
def test_warm_restarts_matches_torch(epochs, spe):
    base_lr, eta_min = 5e-4, 1e-4  # reference hardcodes eta_min=1e-4
    want = _torch_lr_trace_warm_restarts(base_lr, epochs, spe, eta_min)
    sched = optim.cosine_warm_restarts_schedule(base_lr, epochs, spe, eta_min)
    got = np.array([float(sched(g)) for g in range(epochs * spe)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _torch_lr_trace_plateau(base_lr, losses, factor, patience, min_lr):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=factor, patience=patience, min_lr=min_lr)
    trace = []
    for loss in losses:
        sched.step(loss)
        trace.append(opt.param_groups[0]["lr"])
    return np.array(trace)


@pytest.mark.parametrize("factor,patience,min_lr", [
    (0.5, 2, 1e-6),
    (0.1, 0, 1e-3),   # aggressive decay straight into the floor
    (0.5, 50, 1e-6),  # reference defaults: never triggers on this trace
])
def test_plateau_controller_matches_torch(factor, patience, min_lr):
    base_lr = 1e-2
    rng = np.random.default_rng(0)
    # improving start, long plateau, brief dip, plateau again — exercises
    # best-tracking, the rel-threshold, repeated reductions and the floor
    losses = np.concatenate([
        np.linspace(1.0, 0.5, 5),
        0.5 + 0.001 * rng.standard_normal(30),
        [0.3],
        0.3 + 0.0001 * rng.standard_normal(30),
    ])
    want = _torch_lr_trace_plateau(base_lr, losses, factor, patience, min_lr)
    ctl = optim.PlateauController(base_lr, factor=factor, patience=patience,
                                  min_lr=min_lr)
    got = np.array([ctl.step(l) * base_lr for l in losses])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_plateau_scale_halves_adam_update():
    """scale_by_plateau at 0.5 == running Adam at lr/2 (the scale multiplies
    the already-normalized update)."""
    tx = optim.make_optimizer(1e-3, epochs=10, steps_per_epoch=10,
                              scheduler="ReduceLROnPlateau")
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.3)}

    s1 = common.TrainState.create(params, tx)
    u1 = common.apply_updates(s1, grads, tx).params["w"] - params["w"]

    s2 = optim.set_plateau_scale(common.TrainState.create(params, tx), 0.5)
    u2 = common.apply_updates(s2, grads, tx).params["w"] - params["w"]
    # f32 arithmetic: the scale multiply lands within a few ulp of lr/2
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1) / 2, rtol=1e-4)

    # non-plateau optimizers have no PlateauScaleState leaf: chain states
    # (adam mu/nu, counts) must come through set_plateau_scale untouched
    tx3 = optim.make_optimizer(1e-3, 10, 10)  # cosine
    s3 = common.TrainState.create(params, tx3)
    s3b = optim.set_plateau_scale(s3, 0.25)
    a, b = jax.tree_util.tree_leaves(s3.opt_state), jax.tree_util.tree_leaves(
        s3b.opt_state)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_plateau_state_roundtrips_through_resume_extra(tmp_path):
    """The controller's counters ride the resume checkpoint's flat-float
    extra dict; make_plateau(args, extra) consumes (pops) its keys."""
    import argparse

    from geossl_tpu.train import checkpoints

    ctl = optim.PlateauController(1e-3, factor=0.5, patience=1, min_lr=1e-6)
    for loss in [1.0, 1.0, 1.0]:  # two bad epochs -> one reduction
        scale = ctl.step(loss)
    assert scale == 0.5

    tx = optim.make_optimizer(1e-3, 10, 10, scheduler="ReduceLROnPlateau")
    state = optim.set_plateau_scale(
        common.TrainState.create({"w": jnp.ones(3)}, tx), scale)
    path = str(tmp_path / "state.ckpt")
    checkpoints.save_train_state(
        path, state, epoch=3, best_metric=1.0,
        extra={"best_epoch": 2, **ctl.state()})

    template = common.TrainState.create({"w": jnp.ones(3)}, tx)
    restored, epoch, best, extra = checkpoints.load_train_state(path, template)
    args = argparse.Namespace(lr_scheduler="ReduceLROnPlateau", lr=1e-3,
                              lr_decay_factor=0.5, lr_decay_patience=1,
                              min_lr=1e-6)
    ctl2 = common.make_plateau(args, extra)
    assert ctl2.scale == ctl.scale and ctl2.best == ctl.best
    assert ctl2.num_bad == ctl.num_bad
    assert "plateau_scale" not in extra  # consumed, not leaked to drivers
    # the scale leaf itself restores with the optimizer state
    leaves = [l for l in jax.tree_util.tree_leaves(restored.opt_state)]
    assert any(float(np.asarray(l)) == 0.5 for l in leaves if np.ndim(l) == 0)


def test_group_lr_matches_torch_param_groups():
    """scale_by_group == torch Adam param groups with per-group lr
    (pretrain_GeoSSL.py:333-343): 4-step trajectory parity, f64."""
    import torch

    base_lr, ae_lr, steps = 1e-3, 1e-2, 4
    w_model = np.linspace(-1, 1, 6).reshape(2, 3)
    w_ae = np.linspace(0.5, -0.5, 4).reshape(2, 2)

    tm = torch.nn.Parameter(torch.tensor(w_model, dtype=torch.float64))
    ta = torch.nn.Parameter(torch.tensor(w_ae, dtype=torch.float64))
    opt = torch.optim.Adam(
        [{"params": [tm], "lr": base_lr}, {"params": [ta], "lr": ae_lr}],
        lr=base_lr)
    for s in range(steps):
        opt.zero_grad()
        loss = (tm**2).sum() + (ta**3).sum()
        loss.backward()
        opt.step()

    tx = optim.make_optimizer(
        base_lr, epochs=10, steps_per_epoch=10, scheduler="None",
        group_lr_factors={"AE_01": ae_lr / base_lr})
    jax.config.update("jax_enable_x64", True)
    try:
        params = {"model": jnp.asarray(w_model, jnp.float64),
                  "AE_01": jnp.asarray(w_ae, jnp.float64)}
        state = common.TrainState.create(params, tx)
        loss_fn = lambda p: (p["model"]**2).sum() + (p["AE_01"]**3).sum()
        for s in range(steps):
            grads = jax.grad(loss_fn)(state.params)
            state = common.apply_updates(state, grads, tx)
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(np.asarray(state.params["model"]),
                               tm.detach().numpy(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state.params["AE_01"]),
                               ta.detach().numpy(), rtol=1e-12)


def test_group_lr_unnamed_groups_bitwise_unchanged():
    """Groups not named in factors come through bitwise identical to the
    no-group-scaling optimizer (tuple-wrapped trees too, the pretrain
    drivers' (params, variables) layout)."""
    params = ({"model": jnp.ones((3,)), "NCSN_01": jnp.ones((2,))},
              {"AE_01": jnp.zeros((2,))})
    grads = jax.tree_util.tree_map(lambda x: x * 0 + 0.3, params)

    tx_plain = optim.make_optimizer(1e-3, 10, 10, scheduler="None")
    tx_group = optim.make_optimizer(1e-3, 10, 10, scheduler="None",
                                    group_lr_factors={"NCSN_01": 7.0})
    s_plain = common.apply_updates(
        common.TrainState.create(params, tx_plain), grads, tx_plain)
    s_group = common.apply_updates(
        common.TrainState.create(params, tx_group), grads, tx_group)
    # named group scaled 7x relative to plain
    d_plain = np.asarray(s_plain.params[0]["NCSN_01"]) - 1.0
    d_group = np.asarray(s_group.params[0]["NCSN_01"]) - 1.0
    np.testing.assert_allclose(d_group, 7.0 * d_plain, rtol=1e-5)
    # everything else bitwise equal
    assert np.array_equal(np.asarray(s_plain.params[0]["model"]),
                          np.asarray(s_group.params[0]["model"]))
    assert np.array_equal(np.asarray(s_plain.params[1]["AE_01"]),
                          np.asarray(s_group.params[1]["AE_01"]))


def test_group_lr_never_touches_extra_vars_sharing_a_name():
    """A factor naming "AE_01" scales ONLY the params element's subtree —
    the extra_vars element's same-named batch-stats pseudo-updates (the RR
    (params, extra_vars) tuple) stay bitwise unchanged (ADVICE r3)."""
    params = ({"model": jnp.ones((3,)), "AE_01": jnp.ones((2,))},
              {"AE_01": jnp.zeros((2,))})
    grads = jax.tree_util.tree_map(lambda x: x * 0 + 0.3, params)

    tx_plain = optim.make_optimizer(1e-3, 10, 10, scheduler="None")
    tx_group = optim.make_optimizer(1e-3, 10, 10, scheduler="None",
                                    group_lr_factors={"AE_01": 7.0})
    s_plain = common.apply_updates(
        common.TrainState.create(params, tx_plain), grads, tx_plain)
    s_group = common.apply_updates(
        common.TrainState.create(params, tx_group), grads, tx_group)
    d_plain = np.asarray(s_plain.params[0]["AE_01"]) - 1.0
    d_group = np.asarray(s_group.params[0]["AE_01"]) - 1.0
    np.testing.assert_allclose(d_group, 7.0 * d_plain, rtol=1e-5)
    # the extra_vars element sharing the group name is NOT scaled
    assert np.array_equal(np.asarray(s_plain.params[1]["AE_01"]),
                          np.asarray(s_group.params[1]["AE_01"]))


def test_group_lr_rejects_anchored_schedulers():
    """torch anchors CosineAnnealingWarmRestarts' eta_min and plateau's
    min_lr per group base lr; a post-schedule factor can't be exact, so the
    combination is rejected (ADVICE r3)."""
    import pytest

    for sched in ("CosineAnnealingWarmRestarts", "ReduceLROnPlateau"):
        with pytest.raises(ValueError, match="not torch-exact"):
            optim.make_optimizer(1e-3, 10, 10, scheduler=sched,
                                 group_lr_factors={"AE_01": 2.0})


def test_plateau_keys_stripped_under_other_scheduler():
    """Resuming a plateau checkpoint with a different --lr_scheduler must
    not leak plateau_* into the driver's metric dict (ADVICE r3:
    finetune_lba logs extra as test_*_at_best)."""
    import argparse

    extra = {"best_epoch": 2.0, "plateau_best": 0.5, "plateau_bad": 1.0,
             "plateau_scale": 0.25}
    args = argparse.Namespace(lr_scheduler="CosineAnnealingLR")
    assert common.make_plateau(args, extra) is None
    assert extra == {"best_epoch": 2.0}


def test_driver_plateau_reduces_and_logs(tmp_path):
    """End-to-end: finetune_qm9 under ReduceLROnPlateau with patience 0 on a
    tiny synthetic set runs, checkpoints, and the saved resume state carries
    the plateau counters."""
    from flax import serialization

    from geossl_tpu.train import finetune_qm9

    out = tmp_path / "run"
    best_val, _ = finetune_qm9.main([
        "--synthetic", "--synthetic_size", "60", "--epochs", "2",
        "--batch_size", "16", "--num_devices", "1", "--task", "mu",
        "--lr", "5e-4", "--lr_scheduler", "ReduceLROnPlateau",
        "--lr_decay_patience", "0", "--output_model_dir", str(out),
    ])
    assert np.isfinite(best_val)
    payload = serialization.msgpack_restore(
        (out / "state.ckpt").read_bytes())
    assert "plateau_scale" in payload["extra"]
    assert 0 < float(payload["extra"]["plateau_scale"]) <= 1.0
