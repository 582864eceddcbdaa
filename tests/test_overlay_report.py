"""Pin the math of experiments/overlay_report.py — the tool that turns the
cross-framework overlay arms (VERDICT r4 #1/#2) into the committed
agreement numbers (experiments/overlay_{RR,DDM}_results.json). The claims
built on those numbers ("torch matches JAX inside seed noise", "drift onset
at step N") should not rest on untested reducers.
"""

import json
import math
import sys

import pytest

sys.path.insert(0, "/root/repo")

from experiments import overlay_report


def _run(losses, probes, seed=0):
    return {
        "objective": "DDM",
        "arm": "x",
        "platform": "default",
        "noise_seed": seed,
        "steps": len(losses),
        "protocol": {"corpus": "synthetic"},
        "losses": list(map(float, losses)),
        "probes": probes,
        "completed": True,
    }


def _probes(steps, norms, cos=0.5):
    return [{"step": int(s), "mean_norm": float(n), "mean_pairwise_cos": cos}
            for s, n in zip(steps, norms)]


def test_loss_gap_exact():
    a = _run([1.0, 2.0, 4.0], [])
    b = _run([1.1, 2.0, 3.0], [])
    g = overlay_report.loss_gap(a, b)
    # rel gaps vs a: |1-1.1|/1=0.1, 0, |4-3|/4=0.25
    assert g["steps"] == 3
    assert g["median_rel"] == pytest.approx(0.1)
    assert g["final_rel"] == pytest.approx(0.25)


def test_loss_gap_truncates_to_common_horizon():
    a = _run([1.0] * 10, [])
    b = _run([1.0] * 7, [])
    assert overlay_report.loss_gap(a, b)["steps"] == 7


def test_smoothed_gap_window_averages():
    # Per-step order differs but 2-step means are identical: raw gap is
    # large, smoothed gap is exactly zero — the property the ep50 window
    # is used for in the committed results.
    a = _run([1.0, 3.0, 1.0, 3.0], [])
    b = _run([3.0, 1.0, 3.0, 1.0], [])
    raw = overlay_report.loss_gap(a, b)
    sm = overlay_report.smoothed_loss_gap(a, b, window=2)
    assert raw["median_rel"] > 0.5
    assert sm["median_rel"] == pytest.approx(0.0)
    assert sm["window"] == 2


def _report(tmp_path, t, j, y):
    paths = {}
    for name, run in [("t", t), ("j", j), ("y", y)]:
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(run))
        paths[name] = str(p)
    return overlay_report.main([
        "--objective", "DDM", "--torch", paths["t"], "--jax", paths["j"],
        "--yardstick", paths["y"], "--out", str(tmp_path / "out.json")])


def test_growth_detects_drift_onset(tmp_path):
    # Plateau at 2.0 for the first half, then exponential blow-up: onset is
    # the first probe exceeding 10x the plateau median (the reducer behind
    # the committed "RR blow-up onset at step 9600" / "DDM: no onset").
    steps = list(range(0, 2000, 100))
    norms = [2.0 if s < 1000 else 2.0 * math.exp(0.01 * (s - 1000))
             for s in steps]
    flat = _probes(steps, [2.0] * len(steps))
    out = _report(tmp_path,
                  _run([1.0] * 20, _probes(steps, norms)),
                  _run([1.0] * 20, flat),
                  _run([1.0] * 20, flat, seed=999))
    g = out["norm_growth"]["torch"]
    assert g["plateau_norm"] == pytest.approx(2.0)
    # first norm > 20.0: 2*exp(0.01*(s-1000)) > 20 -> s > 1230 -> probe 1300
    assert g["jump_onset_step"] == 1300
    assert g["exp_rate_per_step"] > 0.003
    # healthy arms: no onset, ~zero fitted rate
    assert out["norm_growth"]["jax"]["jump_onset_step"] is None
    assert abs(out["norm_growth"]["jax"]["exp_rate_per_step"]) < 1e-12


def test_main_probe_table_and_gaps(tmp_path):
    steps = [0, 50, 100]
    t = _run([1.0, 1.0, 1.0, 1.0], _probes(steps, [3.0, 3.1, 3.2]))
    j = _run([1.0, 1.0, 1.0, 1.01], _probes(steps, [3.0, 3.1, 3.3]))
    y = _run([1.2, 1.2, 1.2, 1.2], _probes(steps, [3.0, 3.0, 3.0]), seed=999)
    out = _report(tmp_path, t, j, y)
    assert [r["step"] for r in out["probe_table"]] == steps
    assert out["probe_table"][2]["norm_jax"] == pytest.approx(3.3)
    assert out["probe_table"][2]["norm_yardstick"] == pytest.approx(3.0)
    # cross-framework gap (0 except final 1%) < yardstick gap (20% flat)
    assert (out["loss_gap_torch_vs_jax"]["median_rel"]
            < out["loss_gap_jax_vs_yardstick"]["median_rel"])
    written = json.loads((tmp_path / "out.json").read_text())
    assert written["steps"] == j["steps"]
    assert written["arms"]["yardstick"].endswith("seed 999")
