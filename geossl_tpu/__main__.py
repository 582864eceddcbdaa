"""One front door for the framework: ``python -m geossl_tpu <command> ...``.

The reference scatters its user surface across 14 ``examples/run_*.sh``
wrappers plus ``generate_Molecule3D.py`` (each a conda-activate + one
python call, e.g. ``/root/reference/examples/run_pretrain_GeoSSL.sh``).
Here every workload is a subcommand of the package itself; each delegates
to the same ``main(argv)`` the test suite and the shell scripts call, so
``python -m geossl_tpu pretrain ...`` and
``python -m geossl_tpu.train.pretrain_geossl ...`` are identical.

    python -m geossl_tpu data molecule3d --root data/Molecule3D
    python -m geossl_tpu pretrain --GeoSSL_option DDM --dataset ...
    python -m geossl_tpu finetune-qm9 --task mu --input_model_file ckpt
    python -m geossl_tpu serve --ckpt runs/x/model.ckpt --input mols.sdf

Run ``python -m geossl_tpu <command> --help`` for per-command flags.
"""

from __future__ import annotations

import importlib
import sys

# command -> (module with main(argv), one-line help)
COMMANDS = {
    "data": (
        "geossl_tpu.data.__main__",
        "build dataset caches from raw files (molecule3d/qm9/md17/lba/lep)",
    ),
    "pretrain": (
        "geossl_tpu.train.pretrain_geossl",
        "GeoSSL pretraining (DDM / InfoNCE / EBM-NCE / RR)",
    ),
    "pretrain-baseline": (
        "geossl_tpu.train.pretrain_baselines",
        "baseline SSL pretraining (supervised/charge/distance/torsion/infograph/contextpred)",
    ),
    "finetune-qm9": (
        "geossl_tpu.train.finetune_qm9",
        "QM9 property regression fine-tune (12 targets)",
    ),
    "finetune-md17": (
        "geossl_tpu.train.finetune_md17",
        "MD17 energy+force fine-tune (-dE/dpos)",
    ),
    "finetune-lba": (
        "geossl_tpu.train.finetune_lba",
        "Atom3D LBA binding-affinity fine-tune",
    ),
    "finetune-lep": (
        "geossl_tpu.train.finetune_lep",
        "Atom3D LEP ligand-efficacy fine-tune (dual tower)",
    ),
    "evalkit": (
        "geossl_tpu.evalkit",
        "published downstream protocol from a pretrained checkpoint "
        "(QM9 12 targets + MD17 8 molecules + LBA/LEP, resumable)",
    ),
    "serve": (
        "geossl_tpu.serve",
        "batched inference on a trained checkpoint (predict/embed/forces/pairs)",
    ),
    "seal": (
        "geossl_tpu.export",
        "seal a checkpoint into an AOT serving artifact (jax.export/StableHLO)",
    ),
    "doctor": (
        "geossl_tpu.doctor",
        "environment health check (backend/cache/tunnel/native/kernels)",
    ),
}


def _usage() -> str:
    lines = [
        "usage: python -m geossl_tpu <command> [args...]",
        "",
        "commands:",
    ]
    width = max(len(c) for c in COMMANDS)
    for cmd, (_, help_) in COMMANDS.items():
        lines.append(f"  {cmd:<{width}}  {help_}")
    lines += [
        "",
        "per-command flags: python -m geossl_tpu <command> --help",
    ]
    return "\n".join(lines)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_usage())
        return 0
    if argv[0] == "--version":
        from geossl_tpu import __version__

        print(__version__)
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        close = [c for c in COMMANDS if c.startswith(cmd.split("-")[0])]
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        print(f"unknown command {cmd!r}{hint}\n\n{_usage()}", file=sys.stderr)
        return 2
    module = importlib.import_module(COMMANDS[cmd][0])
    # Driver mains return their result tuples (best metrics / final state)
    # for programmatic callers; as a CLI, completing without raising is
    # success. `doctor` returns a real exit code — propagate it.
    rc = module.main(argv[1:])
    return rc if isinstance(rc, int) else 0


if __name__ == "__main__":
    sys.exit(main())
