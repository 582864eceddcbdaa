"""MD17 fine-tuning driver — energy + force regression.

Reference: ``examples/finetune_md17.py``. Forces are the negative gradient of
the predicted energy w.r.t. positions, differentiated *through the model*
with ``create_graph=True`` (``:46``); training therefore backpropagates
through a gradient (double backward). JAX form: ``force = -jax.grad(E_sum)``
inside the loss; ``jax.grad`` of that loss handles the second order.

Loss: ``0.05·L1(E) + 0.95·L1(F)`` (``:51``, coeffs ``config.py:59-60``).
Split: shuffled 1000 train / 1000 valid / rest test (``:171``). Selection:
best val *force* MAE (``:297-301``). Train batch 5
(``submit_finetune_md17_schnet.sh:9-17``). NaN forces at eval are masked
(``:101-107``).

Run: ``python -m geossl_tpu.train.finetune_md17 --synthetic --epochs 3``
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.bucketing import BucketedLoader
from geossl_tpu.data.md17 import MD17_TASKS, load_md17
from geossl_tpu.data.splitters import md17_split
from geossl_tpu.parallel import mesh as pmesh
from geossl_tpu.train import checkpoints, common


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--task", default="aspirin", choices=MD17_TASKS)
    p.add_argument("--md17_energy_coeff", type=float, default=0.05)
    p.add_argument("--md17_force_coeff", type=float, default=0.95)
    p.add_argument("--MD17_train_batch_size", type=int, default=5)
    p.add_argument("--eval_batch_size", type=int, default=128)
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: evaluate --input_model_file (a "
                        "FINE-TUNED checkpoint incl. its head) on the "
                        "val/test splits and exit")
    p.set_defaults(lr=5e-4, epochs=1000)
    return p


def make_energy_force_fn(backbone_apply, head):
    def energy(params, positions, batch):
        graph_repr, _ = backbone_apply(
            params["model"], batch.atom_type, positions, batch.node_mask
        )
        return head.apply({"params": params["graph_pred_linear"]}, graph_repr)

    def energy_and_force(params, batch):
        e = energy(params, batch.positions, batch)
        # force = -dE/dpos; padded atoms get zero grad by construction
        f = -jax.grad(lambda p: jnp.sum(energy(params, p, batch)))(batch.positions)
        return e, f

    return energy_and_force


def make_train_step(energy_and_force, tx, e_coeff, f_coeff):
    def loss_fn(params, batch):
        e, f = energy_and_force(params, batch)
        gm = (
            batch.graph_mask.astype(jnp.float32)
            if batch.graph_mask is not None
            else jnp.ones_like(e)
        )
        e_loss = jnp.sum(jnp.abs(e - batch.y[:, 0]) * gm) / jnp.maximum(gm.sum(), 1.0)
        nm = batch.node_mask.astype(jnp.float32)[..., None]
        f_loss = jnp.sum(jnp.abs(f - batch.forces) * nm) / jnp.maximum(
            3.0 * nm.sum(), 1.0
        )
        return e_coeff * e_loss + f_coeff * f_loss

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

    return train_step, accum_step, chain_step


def evaluate(energy_and_force_jit, params, loader, mesh):
    e_pred, e_true, f_pred, f_true = [], [], [], []
    for b in pmesh.prefetch(loader.epoch(0), mesh):
        e, f = energy_and_force_jit(params, b)
        e, f = pmesh.fetch(e), pmesh.fetch(f)
        gm = pmesh.fetch(b.graph_mask)
        nm = pmesh.fetch(b.node_mask) & gm[:, None]
        f, ft = f[nm], pmesh.fetch(b.forces)[nm]
        # NaN-force guard (finetune_md17.py:101-107)
        ok = ~np.isnan(f).any(axis=-1)
        e_pred.append(e[gm])
        e_true.append(pmesh.fetch(b.y)[gm, 0])
        f_pred.append(f[ok])
        f_true.append(ft[ok])
    e_pred, e_true = np.concatenate(e_pred), np.concatenate(e_true)
    f_pred, f_true = np.concatenate(f_pred), np.concatenate(f_true)
    return (
        float(np.mean(np.abs(e_pred - e_true))),
        float(np.mean(np.abs(f_pred - f_true))),
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.setup_platform(args)
    store = load_md17(
        args.data_root, args.task, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size,
    )
    tr, va, te = md17_split(len(store), seed=args.seed)
    train_store, valid_store, test_store = (
        store.select(tr), store.select(va), store.select(te)
    )

    mesh = pmesh.make_mesh(args.num_devices)
    # forces take grad-of-grad through the backbone; both fused kernels
    # define second-order AD (their backward is custom-VJP'd through the XLA
    # reference math), so SchNet and PaiNN may run fused here too.
    cfg = common.model_config_from_args(args)
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

    # train batch 5 must still be divisible by the mesh; pad up if needed.
    train_bs = max(args.MD17_train_batch_size, mesh.size)
    train_bs += (-train_bs) % mesh.size
    eval_bs = args.eval_batch_size + (-args.eval_batch_size) % mesh.size
    bucket_sizes = common.buckets(args)
    train_loader = BucketedLoader(
        train_store, train_bs, bucket_sizes, shuffle=True, seed=args.seed,
        with_forces=True,
    )
    valid_loader = BucketedLoader(
        valid_store, eval_bs, bucket_sizes, shuffle=False, with_forces=True
    )
    test_loader = BucketedLoader(
        test_store, eval_bs, bucket_sizes, shuffle=False, with_forces=True
    )

    tx = common.make_optimizer_from_args(
        args, common.opt_steps_per_epoch(len(train_loader), args.grad_accum))
    state = common.TrainState.create(params, tx)
    state = jax.device_put(state, pmesh.replicated(mesh))
    energy_and_force = make_energy_force_fn(backbone_apply, head)
    common.check_chain_args(args)
    train_step, accum_step, chain_step = make_train_step(
        energy_and_force, tx, args.md17_energy_coeff, args.md17_force_coeff
    )
    ef_jit = jax.jit(energy_and_force)

    if args.eval_only:
        if ckpt is None or "graph_pred_linear" not in ckpt:
            raise SystemExit(
                "--eval_only needs --input_model_file pointing at a "
                "FINE-TUNED checkpoint (with graph_pred_linear; pretrain "
                "checkpoints carry no head)"
            )
        eparams = jax.device_put(params, pmesh.replicated(mesh))
        val_e, val_f = evaluate(ef_jit, eparams, valid_loader, mesh)
        test_e, test_f = evaluate(ef_jit, eparams, test_loader, mesh)
        print(f"eval-only ({args.task})\tval E/F MAE: {val_e:.5f}/{val_f:.5f}"
              f"\ttest E/F MAE: {test_e:.5f}/{test_f:.5f}")
        return val_f, (test_e, test_f)

    mlog = common.MetricLogger(args.log_file)
    state, start_epoch, best_val_force, extra, state_path = common.try_resume(
        args, state, mesh)
    plateau = common.make_plateau(args, extra)
    best_epoch = int(extra.get("best_epoch", -1))
    test_at_best = (extra.get("test_e", float("nan")),
                    extra.get("test_f", float("nan")))
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
        val_e, val_f = evaluate(ef_jit, state.params, valid_loader, mesh)
        test_e, test_f = evaluate(ef_jit, state.params, test_loader, mesh)
        print(
            f"Epoch: {epoch}\tLoss: {train_loss:.5f}\tval E/F MAE: "
            f"{val_e:.5f}/{val_f:.5f}\ttest E/F MAE: {test_e:.5f}/{test_f:.5f}"
            f"\tTime: {timer.elapsed():.3f}"
        )
        mlog.log(epoch=epoch, train_loss=train_loss, val_e_mae=val_e,
                 val_f_mae=val_f, test_e_mae=test_e, test_f_mae=test_f,
                 time_s=round(timer.elapsed(), 3))
        # best-val *force* MAE selection (finetune_md17.py:297-301)
        if val_f < best_val_force:
            best_val_force, best_epoch = val_f, epoch
            test_at_best = (test_e, test_f)
            if args.output_model_dir:
                checkpoints.save_checkpoint(
                    os.path.join(args.output_model_dir, "model.ckpt"),
                    jax.device_get(state.params),
                )
        common.maybe_save_state(
            args, state_path, state, epoch, best_val_force,
            {"best_epoch": best_epoch,
             "test_e": test_at_best[0], "test_f": test_at_best[1],
             **(plateau.state() if plateau else {})},
        )
    mlog.log(final=True, task=args.task, best_val_f_mae=best_val_force,
             best_epoch=best_epoch, test_e_mae_at_best=test_at_best[0],
             test_f_mae_at_best=test_at_best[1])
    print(
        f"best val force MAE: {best_val_force:.5f} (epoch {best_epoch})\t"
        f"test E/F MAE @ best: {test_at_best[0]:.5f}/{test_at_best[1]:.5f}"
    )
    if args.output_model_dir:
        checkpoints.save_checkpoint(
            os.path.join(args.output_model_dir, "model_final.ckpt"),
            jax.device_get(state.params),
        )
    return best_val_force, test_at_best


if __name__ == "__main__":
    main()
