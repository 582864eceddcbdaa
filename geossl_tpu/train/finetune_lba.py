"""Atom3D LBA fine-tuning driver — binding-affinity (logKd) regression.

Reference: ``examples/finetune_lba.py`` — MSE train loss (``:244``), metrics
RMSE + Pearson + Spearman (``:98-101``), best-val-MSE selection, identity-30
split from downloaded index files (``splitters.py:361-388``), batch 64,
lr 1e-4, 300 epochs (``submit_finetune_lba_lep_schnet.sh:10-33``).
Complexes are ~500 atoms → bucket 512.

Run: ``python -m geossl_tpu.train.finetune_lba --synthetic --epochs 3``
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.bucketing import BucketedLoader
from geossl_tpu.data.lba import load_lba
from geossl_tpu.data.splitters import atom3d_lba_split, random_split
from geossl_tpu.parallel import mesh as pmesh
from geossl_tpu.train import checkpoints, common
from geossl_tpu.utils import metrics


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--LBA_year", type=int, default=2020)
    p.add_argument("--split", default="random", choices=["random", "atom3d_lba_split30"])
    p.add_argument("--spatial_sort", default="on", choices=["on", "off"],
                   help="Morton-reorder each complex's atoms once at load "
                        "(outputs unchanged up to f32 summation order — the "
                        "models are permutation-equivariant); concentrates "
                        "in-cutoff pairs into few tiles so the "
                        "occupancy-gated kernels skip more (docs/PERF.md)")
    p.add_argument("--pair_devices", type=int, default=1,
                   help="shard the [B,N,N] pair grid over this many devices "
                        "per data-parallel replica (pair-grid model "
                        "parallelism, parallel/pair_parallel.py) — needs "
                        "num_devices*pair_devices devices and bucket %% "
                        "pair_devices == 0; the stripes run the fused "
                        "kernels")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: evaluate --input_model_file (a "
                        "FINE-TUNED checkpoint incl. its head) on the "
                        "val/test splits and exit")
    p.set_defaults(lr=1e-4, epochs=300, batch_size=64, bucket=[512])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.setup_platform(args)
    if args.synthetic:
        from geossl_tpu.data.synthetic import synthetic_lba

        store = synthetic_lba(
            args.synthetic_size, max_atoms=min(400, common.buckets(args)[-1] - 16)
        )
    else:
        store = load_lba(args.data_root, year=args.LBA_year)
    if args.spatial_sort == "on":
        from geossl_tpu.data.transforms import spatial_sort_store

        store = spatial_sort_store(store)
    if args.split == "atom3d_lba_split30" and not args.synthetic:
        tr, va, te = atom3d_lba_split(args.data_root, args.LBA_year)
    else:
        tr, va, te = random_split(len(store), seed=args.seed)
    train_store, valid_store, test_store = (
        store.select(tr), store.select(va), store.select(te)
    )

    cfg = common.model_config_from_args(args)
    if args.pair_devices > 1:
        import dataclasses

        from geossl_tpu.parallel.pair_parallel import (
            PAIR_AXIS, make_pair_mesh, pair_sharded_apply)

        mesh = make_pair_mesh(num_pair=args.pair_devices,
                              num_data=args.num_devices or 1)
        # init with the UNSHARDED module (pair_axis uses lax.axis_index,
        # only valid inside shard_map; the param tree is identical)
        module, _ = common.make_backbone(cfg)
        _, raw_apply = common.make_backbone(
            dataclasses.replace(cfg, pair_axis=PAIR_AXIS))
        backbone_apply = pair_sharded_apply(raw_apply, mesh)
    else:
        mesh = pmesh.make_mesh(args.num_devices)
        module, backbone_apply = common.make_backbone(cfg)
    head = common.make_head(args.model_3d, args.emb_dim)
    rng = jax.random.PRNGKey(args.seed)
    params = {
        "model": common.init_backbone(module, rng, n_max=common.buckets(args)[-1]),
        "graph_pred_linear": head.init(rng, jnp.zeros((2, args.emb_dim)))["params"],
    }
    ckpt = None
    if args.input_model_file:
        ckpt = checkpoints.load_checkpoint(args.input_model_file)
        params["model"] = ckpt["model"]
        if "graph_pred_linear" in ckpt:  # fine-tuned checkpoint: head too
            params["graph_pred_linear"] = ckpt["graph_pred_linear"]
        print(f"Loaded pretrained backbone from {args.input_model_file}")

    bs = common.round_batch_to_mesh(args.batch_size, mesh)
    loaders = [
        BucketedLoader(s, bs, common.buckets(args), shuffle=(i == 0), seed=args.seed)
        for i, s in enumerate((train_store, valid_store, test_store))
    ]
    train_loader, valid_loader, test_loader = loaders

    common.check_chain_args(args)
    tx = common.make_optimizer_from_args(
        args, common.opt_steps_per_epoch(len(train_loader), args.grad_accum))
    state = common.TrainState.create(params, tx)
    state = jax.device_put(state, pmesh.replicated(mesh))

    def loss_fn(params, batch):
        graph, _ = backbone_apply(
            params["model"], batch.atom_type, batch.positions, batch.node_mask
        )
        pred = head.apply({"params": params["graph_pred_linear"]}, graph)
        per = (pred - batch.y[:, 0]) ** 2  # MSE (finetune_lba.py:244)
        return common.graph_masked_mean(per, batch.graph_mask)

    def step_body(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return common.apply_updates(state, grads, tx), loss

    train_step = jax.jit(step_body, donate_argnums=(0,))
    chain_step = jax.jit(common.make_chain_step(step_body),
                         donate_argnums=(0,), static_argnums=(2,))

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def accum_step(state, stacked, k):
        loss, grads = common.scan_mean(
            lambda mb, i: jax.value_and_grad(loss_fn)(state.params, mb),
            stacked, k,
        )
        return common.apply_updates(state, grads, tx), loss

    @jax.jit
    def predict(params, batch):
        graph, _ = backbone_apply(
            params["model"], batch.atom_type, batch.positions, batch.node_mask
        )
        return head.apply({"params": params["graph_pred_linear"]}, graph)

    def evaluate(params, loader):
        preds, trues = [], []
        for b in pmesh.prefetch(loader.epoch(0), mesh):
            gm = pmesh.fetch(b.graph_mask)
            preds.append(pmesh.fetch(predict(params, b))[gm])
            trues.append(pmesh.fetch(b.y)[gm, 0])
        p, t = np.concatenate(preds), np.concatenate(trues)
        return {
            "mse": metrics.mse(t, p),
            "rmse": metrics.rmse(t, p),
            "pearson": metrics.pearson(t, p),
            "spearman": metrics.spearman(t, p),
        }

    if args.eval_only:
        if ckpt is None or "graph_pred_linear" not in ckpt:
            raise SystemExit(
                "--eval_only needs --input_model_file pointing at a "
                "FINE-TUNED checkpoint (with graph_pred_linear; pretrain "
                "checkpoints carry no head)"
            )
        val = evaluate(state.params, valid_loader)
        test = evaluate(state.params, test_loader)
        print(f"eval-only\tval RMSE: {val['rmse']:.5f} P: {val['pearson']:.4f}"
              f" S: {val['spearman']:.4f}\ttest RMSE: {test['rmse']:.5f}"
              f" P: {test['pearson']:.4f} S: {test['spearman']:.4f}")
        return val["mse"], test

    mlog = common.MetricLogger(args.log_file)
    state, start_epoch, best_val_mse, extra, state_path = common.try_resume(
        args, state, mesh)
    plateau = common.make_plateau(args, extra)  # pops its keys from extra
    best_epoch = int(extra.pop("best_epoch", -1))
    best_test = extra  # remaining keys are the test metrics at best
    for epoch in range(start_epoch, args.epochs + 1):
        timer = common.EpochTimer()
        losses = []
        batches = pmesh.prefetch(train_loader.epoch(epoch), mesh)
        if args.grad_accum > 1:
            for stacked, kk in common.accum_groups(batches, args.grad_accum):
                state, loss = accum_step(state, stacked, kk)
                losses.append(jnp.atleast_1d(loss))
        elif args.steps_per_call > 1:
            for stacked, kk in common.accum_groups(batches,
                                                   args.steps_per_call):
                state, ls = chain_step(state, stacked, kk)
                losses.append(ls)
        else:
            for b in batches:
                state, loss = train_step(state, b)
                losses.append(jnp.atleast_1d(loss))
        # one device->host transfer per epoch (per-scalar float() costs
        # ~ms over the remote-TPU tunnel x steps/epoch)
        train_loss = float(jnp.mean(jnp.concatenate(losses)))
        state = common.plateau_update(state, plateau, train_loss)
        val = evaluate(state.params, valid_loader)
        test = evaluate(state.params, test_loader)
        print(
            f"Epoch: {epoch}\tLoss: {train_loss:.5f}\t"
            f"val RMSE: {val['rmse']:.5f} P: {val['pearson']:.4f} "
            f"S: {val['spearman']:.4f}\ttest RMSE: {test['rmse']:.5f}"
            f"\tTime: {timer.elapsed():.3f}"
        )
        mlog.log(epoch=epoch, train_loss=train_loss,
                 val_rmse=val["rmse"], val_pearson=val["pearson"],
                 val_spearman=val["spearman"], test_rmse=test["rmse"],
                 time_s=round(timer.elapsed(), 3))
        if val["mse"] < best_val_mse:
            best_val_mse, best_epoch, best_test = val["mse"], epoch, test
            if args.output_model_dir:
                checkpoints.save_checkpoint(
                    os.path.join(args.output_model_dir, "model.ckpt"),
                    jax.device_get(state.params),
                )
        common.maybe_save_state(
            args, state_path, state, epoch, best_val_mse,
            {"best_epoch": best_epoch, **best_test,
             **(plateau.state() if plateau else {})},
        )
    mlog.log(final=True, best_val_mse=best_val_mse, best_epoch=best_epoch,
             **{f"test_{k}_at_best": v for k, v in best_test.items()})
    print(
        f"best val MSE: {best_val_mse:.5f} (epoch {best_epoch})\ttest @ best: "
        f"RMSE {best_test.get('rmse', float('nan')):.5f} "
        f"Pearson {best_test.get('pearson', float('nan')):.4f} "
        f"Spearman {best_test.get('spearman', float('nan')):.4f}"
    )
    return best_val_mse, best_test


if __name__ == "__main__":
    main()
