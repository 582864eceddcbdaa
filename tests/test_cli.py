"""The unified ``python -m geossl_tpu`` front door (geossl_tpu/__main__.py).

The reference's equivalent surface is 14 ``examples/run_*.sh`` wrappers;
here every workload is a subcommand delegating to the same ``main(argv)``
the rest of the suite calls directly.
"""

import os

import pytest


def test_usage_lists_every_command(capsys):
    from geossl_tpu.__main__ import COMMANDS, main

    assert main([]) == 0
    out = capsys.readouterr().out
    for cmd in COMMANDS:
        assert cmd in out
    assert main(["--help"]) == 0


def test_version(capsys):
    import geossl_tpu
    from geossl_tpu.__main__ import main

    assert main(["--version"]) == 0
    assert capsys.readouterr().out.strip() == geossl_tpu.__version__


def test_unknown_command_suggests(capsys):
    from geossl_tpu.__main__ import main

    assert main(["finetune"]) == 2
    err = capsys.readouterr().err
    assert "unknown command" in err
    assert "finetune-qm9" in err


def test_every_command_module_has_main():
    import importlib

    from geossl_tpu.__main__ import COMMANDS

    for cmd, (modname, _) in COMMANDS.items():
        mod = importlib.import_module(modname)
        assert callable(getattr(mod, "main")), cmd


def test_subcommand_help_is_argparse(capsys):
    from geossl_tpu.__main__ import main

    with pytest.raises(SystemExit) as e:
        main(["finetune-qm9", "--help"])
    assert e.value.code == 0
    assert "--task" in capsys.readouterr().out


def test_dispatch_runs_driver(tmp_path):
    from geossl_tpu.__main__ import main

    assert main([
        "pretrain", "--synthetic", "--synthetic_size", "16",
        "--epochs", "1", "--batch_size", "8", "--num_devices", "1",
        "--GeoSSL_option", "DDM", "--output_model_dir", str(tmp_path),
    ]) == 0
    assert os.path.exists(tmp_path / "model_final.ckpt")
