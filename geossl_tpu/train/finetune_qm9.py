"""QM9 fine-tuning driver.

Reference: ``examples/finetune_qm9.py`` — single-target regression with a
linear head on the pooled representation, y z-normalized by the *train
split*'s mean/std (``:255-257,444-447``), MAE loss (``--loss mae`` default),
denormalized eval, best-val-MAE selection, predictions saved
(``:550-565``). Split: ``qm9_random_customized_01`` (110k/10k/rest).

Run: ``python -m geossl_tpu.train.finetune_qm9 --synthetic --task mu --epochs 3``
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.bucketing import BucketedLoader
from geossl_tpu.data.qm9 import TARGET_FIELDS, load_qm9
from geossl_tpu.data.splitters import qm9_random_customized_01
from geossl_tpu.parallel import mesh as pmesh
from geossl_tpu.train import checkpoints, common
from geossl_tpu.utils import metrics

# re-export (tests/serve historically import it from here)
from geossl_tpu.train.common import LinearHead  # noqa: F401


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--task", default="mu", choices=TARGET_FIELDS)
    p.add_argument("--loss", default="mae", choices=["mae", "mse"])
    p.add_argument("--split_seed", type=int, default=0)
    p.add_argument("--use_rotation_transform", action="store_true",
                   help="random-rotation augmentation (datasets_QM9.py:139-140)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: evaluate --input_model_file (a "
                        "FINE-TUNED checkpoint incl. its head) on the "
                        "official val/test splits and exit")
    return p


def make_train_step(backbone_apply, head, tx, loss_kind: str):
    def loss_fn(params, batch, mean, std):
        graph_repr, _ = backbone_apply(
            params["model"], batch.atom_type, batch.positions, batch.node_mask
        )
        pred = head.apply({"params": params["graph_pred_linear"]}, graph_repr)
        y = (batch.y[:, 0] - mean) / std
        err = pred - y
        per = jnp.abs(err) if loss_kind == "mae" else err**2
        return common.graph_masked_mean(per, batch.graph_mask)

    def step_body(state, batch, mean, std):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, mean, std)
        return common.apply_updates(state, grads, tx), loss

    train_step = partial(jax.jit, donate_argnums=(0,))(step_body)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def accum_step(state, stacked, mean, std, k):
        loss, grads = common.scan_mean(
            lambda mb, i: jax.value_and_grad(loss_fn)(state.params, mb, mean, std),
            stacked, k,
        )
        return common.apply_updates(state, grads, tx), loss

    chain_step = partial(jax.jit, donate_argnums=(0,),
                         static_argnums=(2,))(common.make_chain_step(step_body))
    return train_step, accum_step, chain_step


def make_eval_step(backbone_apply, head):
    @jax.jit
    def eval_step(params, batch, mean, std):
        graph_repr, _ = backbone_apply(
            params["model"], batch.atom_type, batch.positions, batch.node_mask
        )
        pred = head.apply({"params": params["graph_pred_linear"]}, graph_repr)
        return pred * std + mean  # denormalize (finetune_qm9.py:375)

    return eval_step


def evaluate(eval_step, params, loader, mean, std, mesh):
    preds, trues = [], []
    for b in pmesh.prefetch(loader.epoch(0), mesh):
        p = pmesh.fetch(eval_step(params, b, mean, std))
        gm = pmesh.fetch(b.graph_mask)
        preds.append(p[gm])
        trues.append(pmesh.fetch(b.y)[gm, 0])
    return np.concatenate(preds), np.concatenate(trues)


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.setup_platform(args)
    store = load_qm9(args.data_root, synthetic=args.synthetic,
                     synthetic_size=args.synthetic_size)
    task_id = TARGET_FIELDS.index(args.task)
    tr, va, te = qm9_random_customized_01(len(store), seed=args.split_seed)
    train_store, valid_store, test_store = (
        store.select(tr), store.select(va), store.select(te)
    )
    # train-split normalization (finetune_qm9.py:444-447)
    mean = float(train_store.y[:, task_id].mean())
    std = float(train_store.y[:, task_id].std())
    print(f"Train mean: {mean:.6f}\tTrain std: {std:.6f}")

    def select_task(s):
        s.y = s.y[:, task_id : task_id + 1]
        return s

    train_store, valid_store, test_store = map(
        select_task, (train_store, valid_store, test_store)
    )

    mesh = pmesh.make_mesh(args.num_devices)
    cfg = common.model_config_from_args(args)
    module, backbone_apply = common.make_backbone(cfg)
    # per-backbone head: Linear for SchNet, the create_output_layers halving
    # MLP for PaiNN (finetune_qm9.py:113/:125)
    head = common.make_head(args.model_3d, args.emb_dim)
    rng = jax.random.PRNGKey(args.seed)
    bucket_sizes = common.buckets(args)
    backbone_params = common.init_backbone(module, rng, n_max=bucket_sizes[-1])
    head_params = head.init(rng, jnp.zeros((2, args.emb_dim)))["params"]
    params = {"model": backbone_params, "graph_pred_linear": head_params}
    ckpt = None
    if args.input_model_file:
        ckpt = checkpoints.load_checkpoint(args.input_model_file)
        params["model"] = ckpt["model"]  # pretrain transfer contract
        if "graph_pred_linear" in ckpt:
            params["graph_pred_linear"] = ckpt["graph_pred_linear"]
        print(f"Loaded pretrained backbone from {args.input_model_file}")

    transform = None
    if args.use_rotation_transform:
        from geossl_tpu.data.transforms import random_rotation_transform

        transform = random_rotation_transform
    bs = common.round_batch_to_mesh(args.batch_size, mesh)
    train_loader = BucketedLoader(
        train_store, bs, bucket_sizes, shuffle=True,
        seed=args.seed, transform=transform,
    )
    valid_loader = BucketedLoader(valid_store, bs, bucket_sizes, shuffle=False, seed=0)
    test_loader = BucketedLoader(test_store, bs, bucket_sizes, shuffle=False, seed=0)

    if args.eval_only:
        if ckpt is None or "graph_pred_linear" not in ckpt:
            raise SystemExit(
                "--eval_only needs --input_model_file pointing at a "
                "FINE-TUNED checkpoint (with graph_pred_linear; pretrain "
                "checkpoints carry no head)"
            )
        # the checkpoint's own normalization stats, when it carries them
        mean = float(ckpt.get("y_mean", mean))
        std = float(ckpt.get("y_std", std))
        eval_step = make_eval_step(backbone_apply, head)
        eparams = jax.device_put(params, pmesh.replicated(mesh))
        vp, vt = evaluate(eval_step, eparams, valid_loader, mean, std, mesh)
        tp, tt = evaluate(eval_step, eparams, test_loader, mean, std, mesh)
        val_mae, test_mae = metrics.mae(vt, vp), metrics.mae(tt, tp)
        print(f"eval-only ({args.task})\tval MAE: {val_mae:.5f}"
              f"\ttest MAE: {test_mae:.5f}")
        return val_mae, test_mae

    tx = common.make_optimizer_from_args(
        args, common.opt_steps_per_epoch(len(train_loader), args.grad_accum))
    state = common.TrainState.create(params, tx)
    state = jax.device_put(state, pmesh.replicated(mesh))
    common.check_chain_args(args)
    train_step, accum_step, chain_step = make_train_step(
        backbone_apply, head, tx, args.loss)
    eval_step = make_eval_step(backbone_apply, head)

    mlog = common.MetricLogger(args.log_file)
    state, start_epoch, best_val, extra, state_path = common.try_resume(
        args, state, mesh)
    plateau = common.make_plateau(args, extra)
    best_epoch = int(extra.get("best_epoch", -1))
    test_at_best = extra.get("test_at_best", float("nan"))
    for epoch in range(start_epoch, args.epochs + 1):
        timer = common.EpochTimer()
        losses = []
        batches = pmesh.prefetch(train_loader.epoch(epoch), mesh)
        if args.grad_accum > 1:
            for stacked, kk in common.accum_groups(batches, args.grad_accum):
                state, loss = accum_step(state, stacked, mean, std, kk)
                losses.append(jnp.atleast_1d(loss))
        elif args.steps_per_call > 1:
            for stacked, kk in common.accum_groups(batches,
                                                   args.steps_per_call):
                state, ls = chain_step(state, stacked, kk, mean, std)
                losses.append(ls)
        else:
            for b in batches:
                state, loss = train_step(state, b, mean, std)
                losses.append(jnp.atleast_1d(loss))
        # one device->host transfer per epoch (per-scalar float() costs
        # ~ms over the remote-TPU tunnel x steps/epoch)
        train_loss = float(jnp.mean(jnp.concatenate(losses)))
        state = common.plateau_update(state, plateau, train_loss)
        vp, vt = evaluate(eval_step, state.params, valid_loader, mean, std, mesh)
        tp, tt = evaluate(eval_step, state.params, test_loader, mean, std, mesh)
        val_mae, test_mae = metrics.mae(vt, vp), metrics.mae(tt, tp)
        print(
            f"Epoch: {epoch}\tLoss: {train_loss:.5f}\tval MAE: {val_mae:.5f}"
            f"\ttest MAE: {test_mae:.5f}\tTime: {timer.elapsed():.3f}"
        )
        mlog.log(epoch=epoch, train_loss=train_loss, val_mae=val_mae,
                 test_mae=test_mae, time_s=round(timer.elapsed(), 3))
        if val_mae < best_val:
            best_val, best_epoch, test_at_best = val_mae, epoch, test_mae
            if args.output_model_dir:
                checkpoints.save_checkpoint(
                    os.path.join(args.output_model_dir, "model.ckpt"),
                    # y_mean/y_std ride along so serving (geossl_tpu.serve)
                    # can denormalize without re-deriving the train split;
                    # extra keys are ignored by every loader
                    {**jax.device_get(state.params),
                     "y_mean": np.float32(mean), "y_std": np.float32(std)},
                )
                np.savez(
                    os.path.join(args.output_model_dir, "evaluation_best.npz"),
                    val_target=vt, val_pred=vp, test_target=tt, test_pred=tp,
                )
        common.maybe_save_state(
            args, state_path, state, epoch, best_val,
            {"best_epoch": best_epoch, "test_at_best": test_at_best,
             **(plateau.state() if plateau else {})},
        )
    mlog.log(final=True, task=args.task, best_val_mae=best_val,
             best_epoch=best_epoch, test_mae_at_best=test_at_best)
    print(f"best val MAE: {best_val:.5f} (epoch {best_epoch})\t"
          f"test MAE @ best: {test_at_best:.5f}")
    if args.output_model_dir:
        checkpoints.save_checkpoint(
            os.path.join(args.output_model_dir, "model_final.ckpt"),
            {**jax.device_get(state.params),
             "y_mean": np.float32(mean), "y_std": np.float32(std)},
        )
    return best_val, test_at_best


if __name__ == "__main__":
    main()
