"""End-to-end driver smoke tests on synthetic data (tiny budgets).

These exercise the full stack: loader -> backbone -> objective -> optimizer
-> checkpointing, on the CPU test mesh.
"""

import os

import numpy as np
import pytest


def test_finetune_qm9_runs_and_learns(tmp_path):
    from geossl_tpu.train import finetune_qm9

    best_val, _ = finetune_qm9.main(
        [
            "--synthetic", "--synthetic_size", "120", "--epochs", "3",
            "--batch_size", "16", "--num_devices", "1", "--task", "mu",
            "--lr", "5e-4",
            "--output_model_dir", str(tmp_path),
        ]
    )
    assert np.isfinite(best_val)
    assert os.path.exists(tmp_path / "model.ckpt")
    assert os.path.exists(tmp_path / "model_final.ckpt")
    assert os.path.exists(tmp_path / "evaluation_best.npz")


def test_pretrain_ddm_then_transfer(tmp_path):
    from geossl_tpu.train import finetune_qm9, pretrain_geossl

    pretrain_geossl.main(
        [
            "--synthetic", "--synthetic_size", "48", "--epochs", "1",
            "--batch_size", "16", "--num_devices", "2",
            "--GeoSSL_option", "DDM", "--output_model_dir", str(tmp_path),
        ]
    )
    ckpt = str(tmp_path / "model_final.ckpt")
    assert os.path.exists(ckpt)
    best_val, _ = finetune_qm9.main(
        [
            "--synthetic", "--synthetic_size", "60", "--epochs", "1",
            "--batch_size", "12", "--num_devices", "1",
            "--input_model_file", ckpt,
        ]
    )
    assert np.isfinite(best_val)


def test_finetune_md17_force_path():
    from geossl_tpu.train import finetune_md17

    best_val_force, _ = finetune_md17.main(
        [
            "--synthetic", "--synthetic_size", "40", "--epochs", "1",
            "--num_devices", "1", "--eval_batch_size", "16",
        ]
    )
    assert np.isfinite(best_val_force)


@pytest.mark.parametrize("objective", ["charge", "distance", "infograph", "torsion", "supervised"])
def test_pretrain_baselines(objective):
    from geossl_tpu.train import pretrain_baselines

    pretrain_baselines.main(
        [
            objective, "--synthetic", "--synthetic_size", "32", "--epochs", "1",
            "--batch_size", "16", "--num_devices", "1",
        ]
    )


def test_painn_driver_path():
    from geossl_tpu.train import finetune_qm9

    best_val, _ = finetune_qm9.main(
        [
            "--synthetic", "--synthetic_size", "48", "--epochs", "1",
            "--batch_size", "16", "--num_devices", "1",
            "--model_3d", "painn", "--emb_dim", "32",
        ]
    )
    assert np.isfinite(best_val)


def test_pretrain_resume(tmp_path):
    """Full-state resume continues where the killed run stopped."""
    from geossl_tpu.train import pretrain_geossl

    base = [
        "--synthetic", "--synthetic_size", "32", "--batch_size", "16",
        "--num_devices", "1", "--GeoSSL_option", "InfoNCE",
        "--output_model_dir", str(tmp_path),
    ]
    pretrain_geossl.main(base + ["--epochs", "2"])
    assert (tmp_path / "state.ckpt").exists()
    # resume to epoch 3 (only one more epoch of work)
    state = pretrain_geossl.main(base + ["--epochs", "3", "--resume"])
    assert int(state.step) > 0


def test_finetune_lba_runs():
    from geossl_tpu.train import finetune_lba

    best_mse, best_test = finetune_lba.main(
        [
            "--synthetic", "--synthetic_size", "20", "--epochs", "1",
            "--batch_size", "4", "--bucket", "64", "--num_devices", "1",
        ]
    )
    assert np.isfinite(best_mse)
    assert {"rmse", "pearson", "spearman"} <= set(best_test)


def test_finetune_lep_runs():
    from geossl_tpu.train import finetune_lep

    best_roc, best_test = finetune_lep.main(
        [
            "--synthetic", "--synthetic_size", "48", "--epochs", "1",
            "--batch_size", "4", "--bucket", "64", "--num_devices", "1",
        ]
    )
    assert 0.0 <= best_roc <= 1.0
    assert {"roc", "pr"} <= set(best_test)


def test_multi_bucket_driver():
    """Mixed-size corpus (some molecules > 32 atoms) trains with a bucket
    ladder: batches compile per bucket, losses stay finite."""
    from geossl_tpu.train import finetune_qm9

    best_val, _ = finetune_qm9.main(
        [
            "--synthetic", "--synthetic_size", "80", "--epochs", "1",
            "--batch_size", "8", "--num_devices", "1",
            "--bucket", "32", "64",
        ]
    )
    assert np.isfinite(best_val)


def test_synthetic_supports_larger_molecules():
    from geossl_tpu.data.bucketing import BucketedLoader
    from geossl_tpu.data.synthetic import synthetic_qm9

    store = synthetic_qm9(40, seed=3, min_atoms=20, max_atoms=50)
    loader = BucketedLoader(store, 8, (32, 64), shuffle=False)
    shapes = {b.atom_type.shape[1] for b in loader.epoch(0)}
    assert shapes == {32, 64}


def test_ebm_nce_neg_samples_flag():
    """--CL_neg_samples plumbs through to the EBM-NCE loss (reference
    --CL_neg_samples, examples/config.py:166-170)."""
    from geossl_tpu.train import pretrain_geossl

    state = pretrain_geossl.main(
        [
            "--synthetic", "--synthetic_size", "32", "--epochs", "1",
            "--batch_size", "16", "--num_devices", "1",
            "--GeoSSL_option", "EBM_NCE", "--CL_neg_samples", "3",
        ]
    )
    assert int(state.step) > 0


def test_supervised_constant_column_raises():
    """A zero-variance property column must fail loudly, not NaN silently."""
    import geossl_tpu.train.pretrain_baselines as pb

    class _ConstStore:
        pass

    orig = pb.load_molecule3d

    def fake_load(*a, **kw):
        store = orig(*a, **kw)
        store.y[:, 6] = 2.5  # constant column
        return store

    pb.load_molecule3d = fake_load
    try:
        with pytest.raises(ValueError, match="no variance"):
            pb.main(
                [
                    "supervised", "--synthetic", "--synthetic_size", "32",
                    "--epochs", "1", "--batch_size", "16",
                    "--num_devices", "1",
                ]
            )
    finally:
        pb.load_molecule3d = orig


def test_finetune_resume_matches_straight_run(tmp_path, monkeypatch):
    """--resume on the fine-tuners reproduces the uninterrupted run: final
    params bit-for-bit, best-val bookkeeping (incl. test-at-best carried via
    the state file's ``extra`` payload) identical. The interruption is a real
    mid-run crash with the same --epochs (a shorter first leg would silently
    change the cosine LR schedule)."""
    import jax
    import pytest

    from geossl_tpu.train import checkpoints, finetune_qm9

    def run(name, resume=False):
        args = [
            "--synthetic", "--synthetic_size", "96", "--epochs", "4",
            "--batch_size", "16", "--num_devices", "1", "--task", "mu",
            "--lr", "5e-4", "--output_model_dir", str(tmp_path / name),
        ]
        return finetune_qm9.main(args + (["--resume"] if resume else []))

    straight_best, straight_test = run("straight")

    real_save = checkpoints.save_train_state

    def crash_after_epoch_2(path, state, epoch, best, extra=None):
        real_save(path, state, epoch, best, extra)
        if epoch == 2:
            raise KeyboardInterrupt("simulated interruption")

    monkeypatch.setattr(checkpoints, "save_train_state", crash_after_epoch_2)
    with pytest.raises(KeyboardInterrupt):
        run("resumed")
    monkeypatch.setattr(checkpoints, "save_train_state", real_save)

    resumed_best, resumed_test = run("resumed", resume=True)
    assert resumed_best == straight_best
    assert resumed_test == straight_test
    a = checkpoints.load_checkpoint(str(tmp_path / "straight/model_final.ckpt"))
    b = checkpoints.load_checkpoint(str(tmp_path / "resumed/model_final.ckpt"))
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(x, y)


def test_finetune_lba_pair_devices():
    """--pair_devices: the LBA driver trains with the pair grid sharded over
    2 devices per data replica (2x2 mesh) and reproduces the plain-driver
    first-epoch loss (same data, same init; f32 tolerance)."""
    from geossl_tpu.train import finetune_lba

    common_args = [
        "--synthetic", "--synthetic_size", "24", "--epochs", "2",
        "--batch_size", "8", "--bucket", "128", "--seed", "3",
    ]
    best_pair, _ = finetune_lba.main(
        common_args + ["--num_devices", "2", "--pair_devices", "2"])
    best_plain, _ = finetune_lba.main(common_args + ["--num_devices", "2"])
    assert np.isfinite(best_pair)
    np.testing.assert_allclose(best_pair, best_plain, rtol=1e-3)
