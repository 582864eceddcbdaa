"""--log_file: one JSON line of metrics per epoch + a final-summary line
(common.MetricLogger) — machine-readable run history for sweep tooling."""

import json


def _read(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_pretrain_log_file(tmp_path):
    from geossl_tpu.train import pretrain_geossl

    log = tmp_path / "run.jsonl"
    pretrain_geossl.main([
        "--synthetic", "--synthetic_size", "16", "--epochs", "2",
        "--batch_size", "8", "--num_devices", "1",
        "--GeoSSL_option", "InfoNCE", "--log_file", str(log),
    ])
    rows = _read(log)
    assert [r.get("epoch") for r in rows[:2]] == [1, 2]
    assert all({"loss", "acc", "time_s", "saved_best"} <= set(r)
               for r in rows[:2])
    assert rows[-1]["final"] is True and "best_loss" in rows[-1]


def test_finetune_log_file_and_resume_appends(tmp_path):
    from geossl_tpu.train import finetune_qm9

    log = tmp_path / "run.jsonl"
    args = [
        "--synthetic", "--synthetic_size", "60", "--batch_size", "12",
        "--num_devices", "1", "--task", "mu", "--log_file", str(log),
        "--output_model_dir", str(tmp_path),
    ]
    finetune_qm9.main(args + ["--epochs", "1"])
    n1 = len(_read(log))
    finetune_qm9.main(args + ["--epochs", "2", "--resume"])
    rows = _read(log)
    assert len(rows) > n1  # appended, not truncated
    epoch_rows = [r for r in rows if "epoch" in r]
    assert epoch_rows[-1]["epoch"] == 2
    assert {"train_loss", "val_mae", "test_mae"} <= set(epoch_rows[-1])
    finals = [r for r in rows if r.get("final")]
    assert finals and finals[-1]["task"] == "mu"
