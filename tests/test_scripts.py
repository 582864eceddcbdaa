"""Sweep-script regression tests: the pretrain->finetune matrix walker
(scripts/finetune_all.sh) must enumerate checkpoints, infer the backbone
from the run-dir name, and emit the published per-task hyperparameters.
Python is PATH-shimmed to an echo stub, so nothing trains."""

import os
import stat
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WALKER = os.path.join(REPO, "scripts", "finetune_all.sh")


def _run_walker(tmp_path, env_extra):
    shim = tmp_path / "bin"
    shim.mkdir()
    py = shim / "python"
    py.write_text("#!/bin/bash\necho \"PY $@\"\n")
    py.chmod(py.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ)
    env["PATH"] = f"{shim}:{env['PATH']}"
    # isolate outputs (and the idempotence skip-check) from the real repo
    env["OUT_ROOT"] = str(tmp_path / "out" / "runs" / "finetune")
    env.update(env_extra)
    out = subprocess.run(["bash", WALKER], env=env, capture_output=True,
                        text=True, timeout=120)
    return out


@pytest.fixture
def fixture_runs(tmp_path):
    runs = tmp_path / "runs"
    for d in ("GeoSSL_DDM/painn_mask0.3_L50_a10", "baseline_charge/schnet"):
        (runs / d).mkdir(parents=True)
        (runs / d / "model_final.ckpt").write_bytes(b"x")
    return runs


def test_walker_enumerates_and_infers_model(tmp_path, fixture_runs):
    out = _run_walker(tmp_path, {
        "RUNS_GLOB": f"{fixture_runs}/*/*", "TASKS": "qm9",
    })
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("PY ")]
    # 2 checkpoints x 12 QM9 targets
    assert len(lines) == 24
    painn = [l for l in lines if "--model_3d painn" in l]
    schnet = [l for l in lines if "--model_3d schnet" in l]
    assert len(painn) == len(schnet) == 12
    # published hypers + checkpoint plumbed through
    assert all("--epochs 1000" in l and "--lr 5e-4" in l for l in lines)
    assert all("--input_model_file" in l for l in lines)
    # tags don't leak the absolute tmp path separators
    assert any("GeoSSL_DDM__painn_mask0.3_L50_a10" in l for l in painn)


def test_walker_lba_lep_and_scratch(tmp_path, fixture_runs):
    out = _run_walker(tmp_path, {
        "RUNS_GLOB": f"{fixture_runs}/baseline_charge/*", "TASKS": "lba",
        "SCRATCH": "1",
    })
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("PY ")]
    lba = [l for l in lines if "finetune_lba" in l]
    lep = [l for l in lines if "finetune_lep" in l]
    # scratch(2 models) + 1 ckpt, 5 seeds each, both LBA and LEP
    assert len(lba) == len(lep) == 3 * 5
    scratch = [l for l in lba if "--input_model_file" not in l]
    assert len(scratch) == 10  # 2 models x 5 seeds from SCRATCH=1
    assert all("--split atom3d_lba_split30" in l for l in lba)


def test_walker_fails_without_checkpoints(tmp_path):
    out = _run_walker(tmp_path, {
        "RUNS_GLOB": f"{tmp_path}/empty/*/*", "TASKS": "qm9",
    })
    assert out.returncode == 1
    assert "no pretrained checkpoints" in out.stderr
