"""Released-checkpoint evaluation kit: one command that reproduces the
paper's full downstream table from a pretrained checkpoint.

The reference publishes no result numbers in-repo (BASELINE.md: "protocol
only"); its de-facto regression oracle is the externally hosted GeoSSL-DDM
checkpoints/logs (``/root/reference/README.md:91-103``). This kit packages
the COMPLETE published fine-tune protocol so that the moment those files
land on a machine with the raw corpora, a single command produces the
paper table:

    python -m geossl_tpu evalkit --input_model_file model.pth \
        --data_root data --out_dir output/evalkit

Protocol encoded (from the reference sweep scripts, hypers verbatim):

* QM9, 12 targets — lr 5e-4, CosineAnnealingLR, 1000 epochs, batch 128,
  seed 42, customized_01 split (``scripts/finetune/submit_finetune_qm9_schnet.sh:6-16``)
* MD17, 8 molecules — lr 5e-4, CosineAnnealingLR, 1000 epochs, train
  batch 5, seed 42, 1000/1000 split (``submit_finetune_md17_schnet.sh:9-19``)
* LBA — lr 1e-4, batch 64, 300 epochs, atom3d 30% split, seeds
  12/22/32/42/52 (``submit_finetune_lba_lep_schnet.sh:8-33``)
* LEP — lr 1e-4, batch 16, 300 epochs, same seeds

Every fine-tune runs resumable (``--ckpt_every``/``--resume``) and lands
incrementally in ``results.json``, so the multi-day sweep survives
restarts; re-running the command skips finished cells. ``--budget smoke``
shrinks epochs/corpora to a no-egress dry-run on synthetic stand-ins —
exactly what ``tests/test_evalkit.py`` pins, so the kit is guaranteed to
work the day the real files arrive.

Expected-value columns: the reference repo vendors none; pass
``--expected table.json`` ({"qm9": {"mu": 0.0xx, ...}, "md17": {...}, ...},
filled from the paper / released logs) and the report gains a "published"
column plus per-cell deltas.
"""

from __future__ import annotations

import argparse
import json
import os

QM9_TASKS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve",
             "u0", "u298", "h298", "g298", "cv"]
MD17_TASKS = ["aspirin", "benzene2018", "ethanol", "malonaldehyde",
              "naphthalene", "salicylic", "toluene", "uracil"]
ATOM3D_SEEDS = [12, 22, 32, 42, 52]


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_model_file", required=True,
                   help="pretrained backbone: released .pth (imported via "
                        "utils/torch_import.py) or a native .ckpt")
    p.add_argument("--data_root", default="data",
                   help="root holding QM9/ MD17/ LBA/ LEP/ raw trees")
    p.add_argument("--out_dir", default="output/evalkit")
    p.add_argument("--tasks", nargs="+",
                   default=["qm9", "md17", "lba", "lep"],
                   choices=["qm9", "md17", "lba", "lep"])
    p.add_argument("--model_3d", default="schnet",
                   choices=["schnet", "painn"])
    p.add_argument("--budget", default="paper", choices=["paper", "smoke"],
                   help="paper: published epochs/corpora; smoke: 2-epoch "
                        "synthetic dry-run (no raw files needed)")
    p.add_argument("--expected", default=None,
                   help="JSON of published numbers to diff against")
    p.add_argument("--platform", default=None)
    p.add_argument("--qm9_tasks", nargs="+", default=QM9_TASKS)
    p.add_argument("--md17_tasks", nargs="+", default=MD17_TASKS)
    p.add_argument("--atom3d_seeds", type=int, nargs="+",
                   default=ATOM3D_SEEDS)
    return p


def _common(args, smoke):
    c = ["--model_3d", args.model_3d, "--num_devices", "1",
         "--input_model_file", args.input_model_file,
         "--ckpt_every", "5", "--resume"]
    if smoke:
        c += ["--synthetic"]
    else:
        c += ["--data_root", args.data_root]
    return c


def run_qm9(args, results, save):
    from geossl_tpu.train import finetune_qm9

    smoke = args.budget == "smoke"
    for task in args.qm9_tasks:
        key = f"qm9/{task}"
        if key in results:
            continue
        out = os.path.join(args.out_dir, "qm9", task)
        argv = _common(args, smoke) + [
            "--task", task, "--seed", "42", "--lr", "5e-4",
            "--lr_scheduler", "CosineAnnealingLR", "--batch_size", "128",
            "--output_model_dir", out,  # split: customized_01 (driver's own)
            "--epochs", "2" if smoke else "1000",
        ] + (["--synthetic_size", "96"] if smoke else [])
        best_val, test_at_best = finetune_qm9.main(argv)
        results[key] = {"val_mae": float(best_val),
                        "test_mae": float(test_at_best)}
        save(results)


def run_md17(args, results, save):
    from geossl_tpu.train import finetune_md17

    smoke = args.budget == "smoke"
    for task in args.md17_tasks:
        key = f"md17/{task}"
        if key in results:
            continue
        out = os.path.join(args.out_dir, "md17", task)
        argv = _common(args, smoke) + [
            "--task", task, "--seed", "42", "--lr", "5e-4",
            "--lr_scheduler", "CosineAnnealingLR",
            "--MD17_train_batch_size", "5", "--output_model_dir", out,
            "--epochs", "2" if smoke else "1000",
        ] + (["--synthetic_size", "24"] if smoke else [])
        best_val_f, (test_e, test_f) = finetune_md17.main(argv)
        results[key] = {"val_force_mae": float(best_val_f),
                        "test_energy_mae": float(test_e),
                        "test_force_mae": float(test_f)}
        save(results)


def _run_atom3d(args, results, save, dataset):
    import numpy as np

    if dataset == "lba":
        from geossl_tpu.train import finetune_lba as mod

        batch, extra = 64, ["--split", "atom3d_lba_split30"]
    else:
        from geossl_tpu.train import finetune_lep as mod

        batch, extra = 16, []
    smoke = args.budget == "smoke"
    per_seed = {}
    for seed in args.atom3d_seeds:
        key = f"{dataset}/seed{seed}"
        if key not in results:
            out = os.path.join(args.out_dir, dataset, str(seed))
            argv = _common(args, smoke) + extra + [
                "--seed", str(seed), "--lr", "1e-4",
                "--lr_scheduler", "CosineAnnealingLR",
                "--batch_size", str(batch), "--output_model_dir", out,
                "--epochs", "2" if smoke else "300",
            ] + (["--synthetic_size", "24", "--bucket", "64"] if smoke
                 else [])
            best_val, best_test = mod.main(argv)
            results[key] = {"val": float(best_val),
                            **{k: float(v) for k, v in best_test.items()}}
            save(results)
        per_seed[seed] = results[key]
    # the published protocol reports mean over the 5 seeds
    agg_key = f"{dataset}/mean"
    metrics = [k for k in next(iter(per_seed.values())) if k != "val"]
    results[agg_key] = {
        m: float(np.mean([per_seed[s][m] for s in per_seed]))
        for m in metrics
    }
    results[agg_key].update({
        f"{m}_std": float(np.std([per_seed[s][m] for s in per_seed]))
        for m in metrics
    })
    save(results)


def report(results, expected):
    """Markdown table of every cell, with published-number deltas where an
    expected table was provided."""
    lines = ["| task | metric | value | published | delta |",
             "|---|---|---|---|---|"]
    for key in sorted(results):
        group, name = key.split("/", 1)
        exp_group = expected.get(group, {}) if expected else {}
        for metric, val in results[key].items():
            exp = exp_group.get(name, {}).get(metric) if isinstance(
                exp_group.get(name), dict) else None
            # exp is None => no published number; exp == 0 => a legitimate
            # zero, where a relative delta is undefined — print the absolute
            delta = ("—" if exp is None
                     else f"{val - exp:+.5f} (abs)" if exp == 0
                     else f"{100 * (val - exp) / abs(exp):+.1f}%")
            lines.append(f"| {key} | {metric} | {val:.5f} | "
                         f"{exp if exp is not None else '—'} | {delta} |")
    return "\n".join(lines)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    os.makedirs(args.out_dir, exist_ok=True)
    results_path = os.path.join(args.out_dir, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)

    def save(r):
        with open(results_path, "w") as f:
            json.dump(r, f, indent=1)

    if "qm9" in args.tasks:
        run_qm9(args, results, save)
    if "md17" in args.tasks:
        run_md17(args, results, save)
    if "lba" in args.tasks:
        _run_atom3d(args, results, save, "lba")
    if "lep" in args.tasks:
        _run_atom3d(args, results, save, "lep")

    expected = None
    if args.expected:
        with open(args.expected) as f:
            expected = json.load(f)
    table = report(results, expected)
    print(table)
    with open(os.path.join(args.out_dir, "report.md"), "w") as f:
        f.write(table + "\n")
    print(f"\nwrote {results_path} and report.md", flush=True)
    return results


if __name__ == "__main__":
    main()
