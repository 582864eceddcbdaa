"""RR (representation reconstruction) diagnostic — why did round 3's
objective matrix score RR WORSE than random init (VERDICT r3 weak #2)?

Hypotheses, from the reference's own protocol
(/root/reference/scripts/pretrain_baselines/submit_pretrain_GeoSSL_RR.sh):

1. The published RR sweep passes ``--normalize`` (the ONLY sweep that
   does); the round-3 matrix ran RR without it. Without L2-normalized
   graph reprs the backbone can shrink ``||g||`` toward 0, making the AE
   reconstruction loss trivially small — representation collapse that
   actively degrades the encoder.
2. The published sweep ALSO hits the reference's param-group quirk
   (``pretrain_GeoSSL.py:335-337``): the AE heads' group lr is the
   *scale flag itself* (default 1) as an ABSOLUTE lr — AE heads thrash
   at lr 1.0 under Adam while the backbone trains at 5e-4.

This runs the pretrain -> QM9-transfer chain for 4 RR variants plus the
random-init baseline on one shared corpus, and adds COLLAPSE metrics
(mean pairwise cosine similarity and per-dim std of held-out graph
reprs, encoded from the saved checkpoint) so the mechanism is visible,
not inferred. Results: experiments/rr_diagnostic_results.json; the
conclusion lives in experiments/README.md.

Run (TPU):       python experiments/rr_diagnostic.py
Quick smoke:     python experiments/rr_diagnostic.py --platform cpu \
                     --pretrain_size 48 --finetune_size 60 --epochs 1 \
                     --finetune_epochs 2 --seeds 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# variant -> extra pretrain_geossl args
VARIANTS = {
    # round-3 matrix config: no normalize, AE heads at --lr
    "rr_r3_matrix": [],
    # + L2-normalized graph reprs (published sweep's --normalize)
    "rr_normalize": ["--normalize"],
    # the reference's published protocol: --normalize AND the param-group
    # quirk (AE heads at ABSOLUTE lr 1.0, pretrain_GeoSSL.py:335-337)
    "rr_published": ["--normalize", "--gnn_2d_lr_scale", "1.0"],
    # quirk without normalize (completes the 2x2)
    "rr_quirk_only": ["--gnn_2d_lr_scale", "1.0"],
}


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None)
    p.add_argument("--pretrain_size", type=int, default=2048)
    p.add_argument("--finetune_size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--finetune_epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--variants", nargs="+",
                   default=["none"] + list(VARIANTS))
    p.add_argument("--out_dir", default="/tmp/rr_diagnostic")
    return p


def repr_stats(ckpt_path: str | None, probe_size: int = 128):
    """Collapse metrics on held-out molecules: encode with the (pretrained
    or random-init) backbone, report mean pairwise cosine similarity of
    graph reprs and the mean per-dim std. Collapse = cosine -> 1, std -> 0.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geossl_tpu import config as gconfig
    from geossl_tpu.data.batch import stack_batch
    from geossl_tpu.data.synthetic import synthetic_molecule3d
    from geossl_tpu.train import checkpoints, common

    cfg = gconfig.ModelConfig()
    module, apply = common.make_backbone(cfg)
    store = synthetic_molecule3d(probe_size, seed=777)  # disjoint seed
    n_max = int(store.num_atoms().max())
    recs = [store.get(i) for i in range(len(store))]
    batch = stack_batch([r.atom_type for r in recs],
                        [r.positions for r in recs], n_max)
    params = common.init_backbone(module, jax.random.PRNGKey(0), n_max=n_max)
    if ckpt_path:
        params = checkpoints.load_checkpoint(ckpt_path)["model"]
    g, _ = jax.jit(apply)(params, jnp.asarray(batch.atom_type),
                          jnp.asarray(batch.positions),
                          jnp.asarray(batch.node_mask))
    g = np.asarray(g, np.float64)
    norms = np.linalg.norm(g, axis=-1)
    gn = g / np.maximum(norms, 1e-12)[:, None]
    cos = gn @ gn.T
    iu = np.triu_indices(len(g), k=1)
    return {
        "mean_pairwise_cos": float(cos[iu].mean()),
        "mean_dim_std": float(g.std(axis=0).mean()),
        "mean_norm": float(norms.mean()),
    }


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from geossl_tpu.train import finetune_qm9, pretrain_geossl

    os.makedirs(args.out_dir, exist_ok=True)
    common_args = ["--synthetic", "--batch_size", str(args.batch_size),
                   "--num_devices", "1"]
    results_path = os.path.join(args.out_dir, "results.json")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            results = json.load(f)

    for name in args.variants:
        if name in results:
            continue
        ckpt = None
        t0 = time.time()
        if name != "none":
            out = os.path.join(args.out_dir, f"pre_{name}")
            pretrain_geossl.main(
                common_args + VARIANTS[name] + [
                    "--GeoSSL_option", "RR",
                    "--synthetic_size", str(args.pretrain_size),
                    "--epochs", str(args.epochs), "--seed", "42",
                    "--output_model_dir", out,
                ])
            ckpt = os.path.join(out, "model_final.ckpt")
        stats = repr_stats(ckpt)
        maes = []
        for seed in range(args.seeds):
            ft = common_args + [
                "--synthetic_size", str(args.finetune_size),
                "--epochs", str(args.finetune_epochs),
                "--seed", str(seed), "--task", "mu",
            ]
            if ckpt:
                ft += ["--input_model_file", ckpt]
            best_val, _ = finetune_qm9.main(ft)
            maes.append(float(best_val))
        results[name] = {
            "val_mae_mean": float(np.mean(maes)),
            "val_mae_std": float(np.std(maes)),
            "maes": maes, **stats,
            "pretrain_s": round(time.time() - t0, 1),
        }
        print(f"[rr] {name}: MAE {np.mean(maes):.4f}±{np.std(maes):.4f} "
              f"cos {stats['mean_pairwise_cos']:.3f} "
              f"dim_std {stats['mean_dim_std']:.4f} "
              f"norm {stats['mean_norm']:.2f}", flush=True)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), flush=True)
    return results


if __name__ == "__main__":
    main()
