"""--eval_only on the fine-tune drivers: evaluate a FINE-TUNED checkpoint
(backbone + head) on the official splits without training.

The reference has no such mode — evaluating a trained model means re-running
the training script and reading the first epoch's eval print. Here the best
checkpoint (``model.ckpt``) reproduces its recorded best-val metric exactly.
"""

import numpy as np
import pytest


def test_qm9_eval_only_reproduces_best_val(tmp_path):
    from geossl_tpu.train import finetune_qm9

    args = [
        "--synthetic", "--synthetic_size", "80", "--batch_size", "16",
        "--num_devices", "1", "--task", "mu", "--lr", "5e-4",
    ]
    best_val, _ = finetune_qm9.main(
        args + ["--epochs", "2", "--output_model_dir", str(tmp_path)]
    )
    val, test = finetune_qm9.main(
        args + ["--epochs", "1", "--eval_only",
                "--input_model_file", str(tmp_path / "model.ckpt")]
    )
    assert np.isfinite(test)
    np.testing.assert_allclose(val, best_val, rtol=1e-5)


def test_eval_only_rejects_backbone_only_ckpt(tmp_path):
    from geossl_tpu.train import finetune_qm9, pretrain_geossl

    pretrain_geossl.main([
        "--synthetic", "--synthetic_size", "16", "--epochs", "1",
        "--batch_size", "8", "--num_devices", "1",
        "--GeoSSL_option", "InfoNCE", "--output_model_dir", str(tmp_path),
    ])
    with pytest.raises(SystemExit):
        finetune_qm9.main([
            "--synthetic", "--synthetic_size", "40", "--eval_only",
            "--num_devices", "1",
            "--input_model_file", str(tmp_path / "model_final.ckpt"),
        ])
    # and without any checkpoint at all
    with pytest.raises(SystemExit):
        finetune_qm9.main(["--synthetic", "--synthetic_size", "40",
                           "--eval_only", "--num_devices", "1"])


def test_lba_eval_only(tmp_path):
    from geossl_tpu.train import finetune_lba

    args = [
        "--synthetic", "--synthetic_size", "32", "--batch_size", "8",
        "--num_devices", "1", "--bucket", "64",
    ]
    best_mse, _ = finetune_lba.main(
        args + ["--epochs", "2", "--output_model_dir", str(tmp_path)]
    )
    val_mse, test = finetune_lba.main(
        args + ["--epochs", "1", "--eval_only",
                "--input_model_file", str(tmp_path / "model.ckpt")]
    )
    np.testing.assert_allclose(val_mse, best_mse, rtol=1e-5)
    assert np.isfinite(test["rmse"])


def test_md17_eval_only(tmp_path):
    from geossl_tpu.train import finetune_md17

    args = [
        "--synthetic", "--synthetic_size", "30", "--num_devices", "1",
        "--eval_batch_size", "16",
    ]
    finetune_md17.main(
        args + ["--epochs", "1", "--output_model_dir", str(tmp_path)]
    )
    val_f, (test_e, test_f) = finetune_md17.main(
        args + ["--epochs", "1", "--eval_only",
                "--input_model_file", str(tmp_path / "model.ckpt")]
    )
    assert np.isfinite(val_f) and np.isfinite(test_e) and np.isfinite(test_f)


def test_lep_eval_only(tmp_path):
    from geossl_tpu.train import finetune_lep

    args = [
        "--synthetic", "--synthetic_size", "48", "--batch_size", "8",
        "--num_devices", "1", "--bucket", "64",
    ]
    best_roc, _ = finetune_lep.main(
        args + ["--epochs", "2", "--output_model_dir", str(tmp_path)]
    )
    val_roc, test = finetune_lep.main(
        args + ["--epochs", "1", "--eval_only",
                "--input_model_file", str(tmp_path / "model.ckpt")]
    )
    np.testing.assert_allclose(val_roc, best_roc, rtol=1e-5)
    assert np.isfinite(test["roc"])
