"""The released-checkpoint eval kit must run end-to-end with NO egress:
a synthesized reference-format .pth + synthetic corpora through the FULL
protocol surface (QM9 + MD17 + LBA + LEP cells, resumable results), so it
is guaranteed to work the day the real checkpoints/corpora land
(VERDICT r3 #3; protocol source: reference scripts/finetune/*)."""

import json
import os

import jax
import numpy as np


def test_evalkit_smoke_full_protocol(tmp_path):
    from geossl_tpu import evalkit
    from geossl_tpu.train import common
    from geossl_tpu.config import ModelConfig
    from geossl_tpu.utils.torch_import import save_torch_checkpoint

    # a "released checkpoint": reference-format .pth of a fresh backbone
    module, _ = common.make_backbone(ModelConfig())
    params = common.init_backbone(module, jax.random.PRNGKey(0))
    pth = str(tmp_path / "released.pth")
    save_torch_checkpoint(pth, {"model": params})

    out = str(tmp_path / "kit")
    results = evalkit.main([
        "--input_model_file", pth, "--out_dir", out, "--budget", "smoke",
        "--qm9_tasks", "mu", "--md17_tasks", "aspirin",
        "--atom3d_seeds", "12", "22",
    ])
    # every protocol family produced a finite cell
    assert np.isfinite(results["qm9/mu"]["test_mae"])
    assert np.isfinite(results["md17/aspirin"]["test_force_mae"])
    for ds in ("lba", "lep"):
        for seed in (12, 22):
            assert any(np.isfinite(v)
                       for v in results[f"{ds}/seed{seed}"].values())
        assert f"{ds}/mean" in results  # the published 5-seed aggregate row
    # results land incrementally and the report is written
    with open(os.path.join(out, "results.json")) as f:
        assert json.load(f).keys() == results.keys()
    report = open(os.path.join(out, "report.md")).read()
    assert "qm9/mu" in report and "| task |" in report

    # resumability: a second invocation must skip every finished cell
    # (same results object back, no retraining — fast)
    import time

    t0 = time.time()
    again = evalkit.main([
        "--input_model_file", pth, "--out_dir", out, "--budget", "smoke",
        "--qm9_tasks", "mu", "--md17_tasks", "aspirin",
        "--atom3d_seeds", "12", "22",
    ])
    assert time.time() - t0 < 30, "finished cells were re-run"
    assert again.keys() == results.keys()


def test_evalkit_expected_table_deltas(tmp_path):
    from geossl_tpu import evalkit

    results = {"qm9/mu": {"test_mae": 0.030}}
    expected = {"qm9": {"mu": {"test_mae": 0.025}}}
    table = evalkit.report(results, expected)
    assert "+20.0%" in table
    # absent expected values render as em-dash, not a crash
    assert "—" in evalkit.report({"md17/aspirin": {"test_force_mae": 1.0}},
                                 expected)
