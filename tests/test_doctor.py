"""`python -m geossl_tpu doctor` — environment health checks.

The doctor is the deployment-side probe for the failure modes this
environment actually exhibits (remote-compile tunnels, unreliable
block_until_ready fences, missing native runtime); here it must pass
cleanly on the CPU test backend and report structured results.
"""

import json

from geossl_tpu import doctor


def test_doctor_passes_on_cpu(capsys):
    rc = doctor.main(["--json"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "all checks passed" in out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["ok"] is True
    for key in ("backend", "cache", "dispatch", "kernels", "native"):
        assert summary[key]["ok"], key
    # CPU interpret-mode kernels are numerically tight
    assert summary["kernels"]["max_abs_err"] < 1e-4
    assert summary["kernels"]["mode"] == "interpret"
    # value-fetch vs block_until_ready agree on a healthy local backend
    assert summary["dispatch"]["fence_reliable"] is True


def test_doctor_mesh_check(capsys):
    rc = doctor.main(["--json", "--mesh", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["mesh"] == {"ok": True, "n": 2}


def test_doctor_cli_dispatch(capsys):
    """The unified CLI front door routes `doctor` to doctor.main."""
    import geossl_tpu.__main__ as front

    assert "doctor" in front.COMMANDS
    mod, help_ = front.COMMANDS["doctor"]
    assert mod == "geossl_tpu.doctor"
    assert help_
