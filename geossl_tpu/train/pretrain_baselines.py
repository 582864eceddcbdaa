"""Baseline SSL pretraining drivers: Supervised, ChargePrediction,
DistancePrediction, TorsionAnglePrediction, 3D-InfoGraph, ContextPred.

One ``main_*`` per workload, mirroring the reference's one-script-per-
objective layout (``examples/pretrain_{Supervised,ChargePrediction,
DistancePrediction,TorsionAnglePrediction,3DInfoGraph}.py``; ``contextpred``
reconstructs the dead ``util.py:79-119`` — see objectives/contextpred.py).
Each saves the backbone-only checkpoint on best epoch-mean train loss + a
final checkpoint. AttrMask (``util.py:71-76``, also dead) needs no separate
driver: ``charge`` already IS mask-atoms-and-classify with the identical
masked-CE + accuracy semantics.

Run e.g.:
``python -m geossl_tpu.train.pretrain_baselines charge --synthetic --epochs 2``
"""

from __future__ import annotations

import argparse
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.bucketing import BucketedLoader
from geossl_tpu.data.molecule3d import load_molecule3d
from geossl_tpu.objectives import (
    ChargePredictor,
    DistancePredictor,
    InfoGraphDiscriminator,
    TorsionAnglePredictor,
    charge_loss,
    charge_masking,
    distance_loss,
    infograph_loss,
    pair_selection,
    torsion_loss,
    torsion_triples,
)
from geossl_tpu.ops import geometry
from geossl_tpu.parallel import mesh as pmesh
from geossl_tpu.train import checkpoints, common

NODE_CLASS = 9


def build_parser(objective: str):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--dataset", default="Molecule3D_1000000")
    if objective == "charge":
        p.add_argument("--charge_masking_ratio", type=float, default=0.3)
    if objective == "distance":
        p.add_argument("--distance_sample_ratio", type=float, default=1.0)
    if objective == "torsion":
        p.add_argument("--torsion_angle_sample_ratio", type=float, default=0.001)
    if objective == "supervised":
        p.add_argument("--task_id", type=int, default=6)  # pretrain_Supervised.py:159
        p.add_argument("--loss", default="mae", choices=["mae", "mse"])
    if objective == "contextpred":
        # the reference's do_ContextPred is dead code with no script
        # hyperparameters; these defaults map its 2D-bond-graph geometry
        # (substruct ball = GNN depth, ring l1=K-1..l1+csize, Hu et al.
        # semantics) onto the bond-scale radius graph
        p.add_argument("--contextpred_neg_samples", type=int, default=1)
        p.add_argument("--context_hops", type=int, default=5,
                       help="substruct ball radius K (hops)")
        p.add_argument("--context_csize", type=int, default=3,
                       help="ring width: context spans K-1 .. K-1+csize")
        p.add_argument("--context_bond_cutoff", type=float, default=1.8,
                       help="radius (Å) of the hop graph — covalent-bond "
                            "scale reproduces the reference's 2D bond-graph "
                            "hops from 3D geometry")
    return p


def _run(args, objective: str):
    common.setup_platform(args)
    subset = None
    if args.dataset.startswith("Molecule3D_"):
        subset = int(args.dataset.split("_")[-1])
    store = load_molecule3d(
        args.data_root, subset=subset, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size,
        synthetic_max_atoms=args.synthetic_max_atoms,
    )
    mesh = pmesh.make_mesh(args.num_devices)
    cfg = common.model_config_from_args(args)
    module, backbone_apply = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(args.seed)
    bucket_sizes = common.buckets(args)
    n_max = bucket_sizes[-1]
    params = {"model": common.init_backbone(module, rng, n_max=n_max)}

    # objective-specific heads + supervised normalization
    train_mean = train_std = 0.0
    if objective == "charge":
        head = ChargePredictor(node_class=NODE_CLASS)
        params["head"] = head.init(rng, jnp.zeros((2, 4, args.emb_dim)))["params"]
    elif objective == "distance":
        head = DistancePredictor()
        params["head"] = head.init(rng, jnp.zeros((2, 4, args.emb_dim)))["params"]
    elif objective == "torsion":
        head = TorsionAnglePredictor()
        params["head"] = head.init(
            rng, jnp.zeros((2, 4, args.emb_dim)), jnp.zeros((2, 3, 3), jnp.int32)
        )["params"]
    elif objective == "infograph":
        head = InfoGraphDiscriminator(hidden_dim=args.emb_dim)
        x = jnp.zeros((2, 4, args.emb_dim))
        params["head"] = head.init(rng, x, x)["params"]
    elif objective == "contextpred":
        # two encoders, as in the reference (molecule_substruct_model /
        # molecule_context_model, util.py:82-92): the saved/transferred
        # backbone is the substruct one; the context encoder is auxiliary
        params["context_model"] = common.init_backbone(
            module, jax.random.fold_in(rng, 1), n_max=n_max)
    elif objective == "supervised":
        from geossl_tpu.train.finetune_qm9 import LinearHead

        head = LinearHead()
        params["head"] = head.init(rng, jnp.zeros((2, args.emb_dim)))["params"]
        y = store.y[:, args.task_id]
        train_mean, train_std = float(y.mean()), float(y.std())
        if not np.isfinite(train_std) or train_std < 1e-12:
            raise ValueError(
                f"property column task_id={args.task_id} has no variance over "
                f"this corpus (std={train_std}); z-normalization would divide "
                f"by zero — pick a different --task_id"
            )
        print(f"Train mean: {train_mean}\tTrain std: {train_std}")
    else:
        raise ValueError(objective)

    loader = BucketedLoader(
        store, common.round_batch_to_mesh(args.batch_size, mesh), bucket_sizes,
        shuffle=True, seed=args.seed,
    )
    common.check_chain_args(args)
    tx = common.make_optimizer_from_args(
        args, common.opt_steps_per_epoch(len(loader), args.grad_accum))
    state = common.TrainState.create(params, tx)
    state = jax.device_put(state, pmesh.replicated(mesh))

    # torsion: triples per graph from N^3 * ratio at the bucket size
    num_triples = 0
    if objective == "torsion":
        num_triples = max(8, int(n_max**3 * args.torsion_angle_sample_ratio))

    def loss_fn(params, batch, rng):
        if objective == "charge":
            # mask atoms to the unknown token BEFORE encoding
            # (pretrain_ChargePrediction.py:64-81)
            masked, sel = charge_masking(
                rng, batch.atom_type, batch.node_mask,
                args.charge_masking_ratio, NODE_CLASS,
            )
            _, node = backbone_apply(
                params["model"], masked, batch.positions, batch.node_mask
            )
            logits = ChargePredictor(NODE_CLASS).apply({"params": params["head"]}, node)
            loss, acc = charge_loss(logits, batch.atom_type, sel)
            return loss, acc
        if objective == "distance":
            _, node = backbone_apply(
                params["model"], batch.atom_type, batch.positions, batch.node_mask
            )
            pred = DistancePredictor().apply({"params": params["head"]}, node)
            dist, _ = geometry.pairwise_distances(batch.positions, batch.node_mask)
            sel = pair_selection(
                batch.node_mask, "permutation", args.distance_sample_ratio,
                rng if args.distance_sample_ratio < 1 else None,
            )
            return distance_loss(pred, dist, sel), jnp.zeros(())
        if objective == "torsion":
            _, node = backbone_apply(
                params["model"], batch.atom_type, batch.positions, batch.node_mask
            )
            idx, angle, valid = torsion_triples(
                rng, batch.positions, batch.node_mask, num_triples
            )
            pred = TorsionAnglePredictor().apply({"params": params["head"]}, node, idx)
            return torsion_loss(pred, angle, valid), jnp.zeros(())
        if objective == "infograph":
            graph, node = backbone_apply(
                params["model"], batch.atom_type, batch.positions, batch.node_mask
            )
            disc = InfoGraphDiscriminator(hidden_dim=args.emb_dim)
            return infograph_loss(
                disc, params["head"], node, graph, batch.node_mask, batch.graph_mask
            )
        if objective == "contextpred":
            from geossl_tpu.objectives import (
                context_masks, contextpred_loss, hop_distances, sample_centers,
            )

            k = args.context_hops
            l1, l2 = k - 1, k - 1 + args.context_csize
            dist, pm = geometry.pairwise_distances(
                batch.positions, batch.node_mask)
            bond_adj = geometry.radius_adjacency(
                dist, pm, args.context_bond_cutoff)
            centers = sample_centers(rng, batch.node_mask)
            hops = hop_distances(bond_adj, centers, l2)
            sub_mask, ctx_mask, ov_mask = context_masks(
                hops, batch.node_mask, k, l1, l2)
            _, sub_node = backbone_apply(
                params["model"], batch.atom_type, batch.positions, sub_mask)
            _, ctx_node = backbone_apply(
                params["context_model"], batch.atom_type, batch.positions,
                ctx_mask)
            substruct = jnp.einsum("bnf,bn->bf", sub_node, centers)
            ov = ov_mask.astype(jnp.float32)
            context = (jnp.einsum("bnf,bn->bf", ctx_node, ov)
                       / jnp.maximum(ov.sum(-1, keepdims=True), 1.0))
            valid = batch.graph_mask & (ov_mask.sum(-1) > 0)
            return contextpred_loss(substruct, context, valid,
                                    args.contextpred_neg_samples)
        if objective == "supervised":
            from geossl_tpu.train.finetune_qm9 import LinearHead

            graph, _ = backbone_apply(
                params["model"], batch.atom_type, batch.positions, batch.node_mask
            )
            pred = LinearHead().apply({"params": params["head"]}, graph)
            y = (batch.y[:, args.task_id] - train_mean) / train_std
            err = pred - y
            per = jnp.abs(err) if args.loss == "mae" else err**2
            return common.graph_masked_mean(per, batch.graph_mask), jnp.zeros(())
        raise ValueError(objective)

    def step_body(state, batch, epoch_key):
        rng = jax.random.fold_in(epoch_key, state.step)  # on-device step RNG
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        return common.apply_updates(state, grads, tx), (loss, acc)

    def _unpack(fn):
        def wrapped(state, *a):
            state, (loss, acc) = fn(state, *a)
            return state, loss, acc
        return wrapped

    train_step = _unpack(jax.jit(step_body, donate_argnums=(0,)))
    # chain k steps into one dispatch; fold_in(epoch_key, state.step) inside
    # the scan gives each chained step the SAME per-step RNG as the loop
    _chain = jax.jit(common.make_chain_step(step_body),
                     donate_argnums=(0,), static_argnums=(2,))

    def chain_step(state, stacked, k, epoch_key):
        state, (ls, ac) = _chain(state, stacked, k, epoch_key)
        return state, ls, ac

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def accum_step(state, stacked, epoch_key, k):
        step_key = jax.random.fold_in(epoch_key, state.step)

        def body(mb, i):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, mb, jax.random.fold_in(step_key, i)
            )
            return loss, acc, grads

        loss, acc, grads = common.scan_mean(body, stacked, k)
        return common.apply_updates(state, grads, tx), loss, acc

    saver = checkpoints.BestModelSaver(args.output_model_dir)
    mlog = common.MetricLogger(args.log_file)
    state, start_epoch, best, extra, state_path = common.try_resume(
        args, state, mesh)
    plateau = common.make_plateau(args, extra)
    saver.best_metric = best  # don't let a worse epoch overwrite model.ckpt
    for epoch in range(start_epoch, args.epochs + 1):
        timer = common.EpochTimer()
        epoch_key = jax.random.PRNGKey(hash((args.seed + 1, epoch)) % (2**31))
        losses, accs = [], []
        batches = pmesh.prefetch(loader.epoch(epoch), mesh)
        if args.grad_accum > 1:
            for stacked, kk in common.accum_groups(batches, args.grad_accum):
                state, loss, acc = accum_step(state, stacked, epoch_key, kk)
                losses.append(jnp.atleast_1d(loss))
                accs.append(jnp.atleast_1d(acc))
        elif args.steps_per_call > 1:
            for stacked, kk in common.accum_groups(batches,
                                                   args.steps_per_call):
                state, ls, ac = chain_step(state, stacked, kk, epoch_key)
                losses.append(ls)
                accs.append(ac)
        else:
            for b in batches:
                state, loss, acc = train_step(state, b, epoch_key)
                losses.append(jnp.atleast_1d(loss))
                accs.append(jnp.atleast_1d(acc))
        # one device->host transfer per epoch (per-scalar float() costs
        # ~ms over the remote-TPU tunnel x steps/epoch)
        mean_loss = float(jnp.mean(jnp.concatenate(losses)))
        mean_acc = float(jnp.mean(jnp.concatenate(accs)))
        state = common.plateau_update(state, plateau, mean_loss)
        saved = saver.maybe_save_best(
            mean_loss,
            lambda: {"model": jax.device_get(state.params["model"])},
        )
        print(
            f"Epoch: {epoch}\tLoss: {mean_loss:.5f}\tAcc: {mean_acc:.5f}"
            f"\tTime: {timer.elapsed():.3f}" + ("\t[saved best]" if saved else "")
        )
        mlog.log(epoch=epoch, loss=mean_loss, acc=mean_acc,
                 time_s=round(timer.elapsed(), 3), saved_best=saved)
        common.maybe_save_state(args, state_path, state, epoch,
                                saver.best_metric,
                                plateau.state() if plateau else None)
    saver.save_final({"model": jax.device_get(state.params["model"])})
    mlog.log(final=True, best_loss=saver.best_metric, epochs=args.epochs)
    return state


OBJECTIVES = ("supervised", "charge", "distance", "torsion", "infograph",
              "contextpred")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in OBJECTIVES:
        raise SystemExit(
            f"usage: python -m geossl_tpu.train.pretrain_baselines "
            f"{{{','.join(OBJECTIVES)}}} [options]"
        )
    objective, rest = argv[0], argv[1:]
    args = build_parser(objective).parse_args(rest)
    return _run(args, objective)


if __name__ == "__main__":
    main()
