import math

import jax.numpy as jnp
import numpy as np

from geossl_tpu.train import checkpoints
from geossl_tpu.train.optim import cosine_annealing_schedule, step_lr_schedule


def test_cosine_annealing_matches_torch_semantics():
    """torch CosineAnnealingLR: lr_e = min + (base-min)(1+cos(pi e/T))/2,
    stepped per epoch (constant within an epoch)."""
    base, epochs, spe = 5e-4, 100, 7
    sched = cosine_annealing_schedule(base, epochs, spe)
    for epoch in (0, 1, 50, 99):
        expect = base * 0.5 * (1 + math.cos(math.pi * epoch / epochs))
        for step_in_epoch in (0, spe - 1):
            got = float(sched(epoch * spe + step_in_epoch))
            np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-12)
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)


def test_step_lr():
    sched = step_lr_schedule(1e-3, steps_per_epoch=2, decay_factor=0.5,
                             decay_step_size=10)
    assert float(sched(0)) == 1e-3
    np.testing.assert_allclose(float(sched(2 * 10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(2 * 20)), 2.5e-4, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "model": {"layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "graph_pred_linear": {"bias": np.zeros(4, np.float32)},
    }
    path = str(tmp_path / "ckpt.msgpack")
    checkpoints.save_checkpoint(path, tree)
    loaded = checkpoints.load_checkpoint(path)
    np.testing.assert_array_equal(
        loaded["model"]["layer"]["kernel"], tree["model"]["layer"]["kernel"]
    )
    np.testing.assert_array_equal(
        loaded["graph_pred_linear"]["bias"], tree["graph_pred_linear"]["bias"]
    )


def test_best_model_saver(tmp_path):
    saver = checkpoints.BestModelSaver(str(tmp_path))
    tree = {"model": {"w": np.ones(2, np.float32)}}
    assert saver.maybe_save_best(1.0, tree)
    assert not saver.maybe_save_best(2.0, tree)  # worse: no save
    assert saver.maybe_save_best(0.5, tree)
    saver.save_final(tree)
    assert (tmp_path / "model.ckpt").exists()
    assert (tmp_path / "model_final.ckpt").exists()


def test_config_presets_match_published_protocols():
    """The Config presets mirror the reference's sweep hyperparameters
    (SURVEY.md §2.7)."""
    from geossl_tpu import config as C

    ddm = C.preset_pretrain_ddm()
    assert ddm.train.batch_size == 128 and ddm.train.epochs == 100
    assert ddm.train.lr == 5e-4 and ddm.geossl.option == "DDM"
    assert ddm.data.dataset == "Molecule3D_1000000"
    assert ddm.geossl.sm_num_noise_level == 50
    assert ddm.geossl.sm_sigma_begin == 10.0 and ddm.geossl.sm_sigma_end == 0.01

    qm9 = C.preset_finetune_qm9(task="mu")
    assert qm9.train.epochs == 1000 and qm9.train.lr == 5e-4
    assert qm9.data.split == "customized_01" and qm9.train.loss == "mae"

    md17 = C.preset_finetune_md17()
    assert md17.train.md17_train_batch_size == 5
    assert md17.train.md17_energy_coeff == 0.05
    assert md17.train.md17_force_coeff == 0.95

    lba = C.preset_finetune_lba()
    assert lba.train.batch_size == 64 and lba.train.lr == 1e-4
    assert lba.train.epochs == 300

    lep = C.preset_finetune_lep()
    assert lep.train.batch_size == 16

    # model defaults match the published SchNet/PaiNN configs
    m = C.ModelConfig()
    assert m.schnet.num_gaussians == 51 and m.schnet.cutoff == 10.0
    assert m.painn.cutoff == 5.0 and m.painn.n_rbf == 20
    assert m.painn.n_interactions == 3


def test_train_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from geossl_tpu.train import common

    tx = optax.adam(1e-3)
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    state = common.TrainState.create(params, tx)
    state = common.apply_updates(state, {"w": jnp.ones((2, 3))}, tx)
    path = str(tmp_path / "state.ckpt")
    checkpoints.save_train_state(path, state, epoch=7, best_metric=0.25,
                                 extra={"best_epoch": 3, "test_at_best": 0.5})

    template = common.TrainState.create(
        {"w": jnp.zeros((2, 3), jnp.float32)}, tx
    )
    restored, epoch, best, extra = checkpoints.load_train_state(path, template)
    assert epoch == 7 and best == 0.25
    assert extra == {"best_epoch": 3.0, "test_at_best": 0.5}
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    assert int(restored.step) == 1
    # optimizer moments restored too
    a, b = jax.tree_util.tree_leaves(state.opt_state), jax.tree_util.tree_leaves(
        restored.opt_state
    )
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_model_config_validates_fields():
    import pytest

    from geossl_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="filter_mxu"):
        ModelConfig(filter_mxu="bf-16")
    with pytest.raises(ValueError, match="model_3d"):
        ModelConfig(model_3d="dimenet")
    with pytest.raises(ValueError, match="compute_dtype"):
        ModelConfig(compute_dtype="fp16")
    with pytest.raises(ValueError, match="sparse_tiles"):
        ModelConfig(sparse_tiles=True)  # config layer wants the string form
    assert ModelConfig(filter_mxu="bf16").filter_mxu == "bf16"
    assert ModelConfig(sparse_tiles="on").sparse_tiles == "on"


def test_max_num_neighbors_cli_plumbing():
    from geossl_tpu.train import common as tc

    p = tc.add_common_args(__import__("argparse").ArgumentParser())
    args = p.parse_args(["--max_num_neighbors", "32"])
    cfg = tc.model_config_from_args(args, allow_pallas=False)
    assert cfg.max_neighbors == 32
    module, _ = tc.make_backbone(cfg)
    assert module.max_neighbors == 32
    args = p.parse_args(["--model_3d", "painn"])
    cfg = tc.model_config_from_args(args, allow_pallas=False)
    assert cfg.max_neighbors is None
    module, _ = tc.make_backbone(cfg)
    assert module.max_neighbors is None


def test_sparse_tiles_cli_plumbing():
    """--sparse_tiles strings map to the model's 'auto'/True/False knob."""
    from geossl_tpu.train import common as tc

    p = tc.add_common_args(__import__("argparse").ArgumentParser())
    for cli, model_knob in [("auto", "auto"), ("on", True), ("off", False)]:
        args = p.parse_args(["--sparse_tiles", cli])
        cfg = tc.model_config_from_args(args, allow_pallas=False)
        assert cfg.sparse_tiles == cli
        module, _ = tc.make_backbone(cfg)
        assert module.sparse == model_knob
        args = p.parse_args(["--model_3d", "painn", "--sparse_tiles", cli])
        module, _ = tc.make_backbone(
            tc.model_config_from_args(args, allow_pallas=False))
        assert module.sparse == model_knob


def test_best_model_saver_thunk_not_called_when_worse(tmp_path):
    from geossl_tpu.train.checkpoints import BestModelSaver

    saver = BestModelSaver(str(tmp_path))
    calls = []

    def thunk():
        calls.append(1)
        import numpy as np
        return {"model": {"w": np.zeros(2, np.float32)}}

    assert saver.maybe_save_best(1.0, thunk)
    assert not saver.maybe_save_best(2.0, thunk)  # worse: thunk NOT evaluated
    assert len(calls) == 1
