"""Multi-host (multi-process) SPMD: 2 real processes x 2 virtual CPU devices
== one 4-device process, on an actual DDM pretrain.

This is the pod-scale story (SURVEY.md §5.8 extension; the reference is one
process / one GPU): ``jax.distributed`` + a global mesh, batches entering
via ``make_array_from_process_local_data`` (each process uploads only its
rows), gradient psum crossing process boundaries over the Gloo CPU
collectives — the same code path TPU pods take over ICI. The test pins the
multi-process parameter trajectory to the single-process one.
"""

import os
import socket
import subprocess
import sys

import numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pretrain(outdir, extra, env_extra=None, timeout=600):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # conftest's 8-device forcing: per-run below
    env.update(env_extra or {})
    cmd = [
        sys.executable, "-m", "geossl_tpu.train.pretrain_geossl",
        "--platform", "cpu", "--synthetic", "--synthetic_size", "32",
        "--epochs", "2", "--batch_size", "8", "--GeoSSL_option", "DDM",
        "--seed", "7", "--output_model_dir", str(outdir),
    ] + extra
    return subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT), timeout


def test_two_process_ddm_matches_single_process(tmp_path):
    from flax import serialization

    # single process, 4 virtual devices
    p, t = _run_pretrain(
        tmp_path / "single", ["--num_devices", "4"],
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
    out, _ = p.communicate(timeout=t)
    assert p.returncode == 0, out[-2000:]

    # two processes x 2 local devices -> the same 4-device global mesh
    port = _free_port()
    procs = [
        _run_pretrain(
            tmp_path / "multi",
            ["--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--local_device_count", "2", "--num_devices", "4"],
        )
        for i in range(2)
    ]
    outs = []
    for p, t in procs:
        out, _ = p.communicate(timeout=t)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    # process 0 wrote the checkpoints; process 1 must NOT have (gated)
    final = tmp_path / "multi" / "model_final.ckpt"
    assert final.exists()

    def params(path):
        return serialization.msgpack_restore(path.read_bytes())["model"]

    single = params(tmp_path / "single" / "model_final.ckpt")
    multi = params(final)
    import jax

    flat_s = jax.tree_util.tree_leaves_with_path(single)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(multi))
    assert len(flat_s) == len(flat_m)
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[path]), rtol=2e-4, atol=1e-6,
            err_msg=f"{path}: multi-process trajectory diverged")

    # both processes saw the same replicated losses (Time: differs, drop it)
    def epoch_lines(s):
        return [l.split("\tTime:")[0] for l in s.splitlines()
                if l.startswith("Epoch:")]

    lines0, lines1 = epoch_lines(outs[0]), epoch_lines(outs[1])
    assert lines0 and lines0 == lines1
