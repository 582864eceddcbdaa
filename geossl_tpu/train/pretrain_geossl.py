"""GeoSSL pretraining driver — DDM / InfoNCE / EBM-NCE / RR.

Reference: ``examples/pretrain_GeoSSL.py``. Recipe shared by all options
(``:68-212``): view 1 = clean geometry, view 2 = positions + N(mu, sigma);
optional BFS atom masking (``--GeoSSL_atom_masking_ratio``); for PaiNN the
radius graph is cached from the clean geometry and reused for the perturbed
view (``:88-89``). Per option:

* **DDM**  (``:179-212``): node latents of each view scored against the
  *other* view's pairwise distances by two NCSN_version_03 heads, averaged.
* **InfoNCE** (``:141-176``): symmetric CE over B×B graph-repr similarities.
* **EBM_NCE** (``:103-138``): BCE on positive dot products vs cyclic-shift
  negatives.
* **RR** (``:77-100``): two AutoEncoders reconstruct each view's graph repr
  from the other.

Saves the backbone-only checkpoint on best epoch-mean train loss plus a
final checkpoint (``:48-65,262-267``) — the transfer contract for the
fine-tune drivers.

Run: ``python -m geossl_tpu.train.pretrain_geossl --synthetic --GeoSSL_option DDM --epochs 2``
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from geossl_tpu.data.bucketing import BucketedLoader
from geossl_tpu.data.masking import make_bfs_transform
from geossl_tpu.data.molecule3d import load_molecule3d
from geossl_tpu.objectives import (
    AutoEncoder,
    dual_infonce_loss,
    ebm_nce_loss,
    l2_normalize,
    pair_selection,
    perturb_positions,
)
from geossl_tpu.objectives.ncsn import NCSNv3
from geossl_tpu.ops import geometry
from geossl_tpu.parallel import mesh as pmesh
from geossl_tpu.train import checkpoints, common


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--dataset", default="Molecule3D_1000000")
    p.add_argument("--GeoSSL_option", default="DDM",
                   choices=["DDM", "EBM_NCE", "InfoNCE", "RR"])
    p.add_argument("--GeoSSL_mu", type=float, default=0.0)
    p.add_argument("--GeoSSL_sigma", type=float, default=0.3)
    p.add_argument("--GeoSSL_atom_masking_ratio", type=float, default=0.3)
    p.add_argument("--SM_sigma_begin", type=float, default=10.0)
    p.add_argument("--SM_sigma_end", type=float, default=0.01)
    p.add_argument("--SM_num_noise_level", type=int, default=50)
    p.add_argument("--SM_noise_type", default="symmetry", choices=["symmetry", "random"])
    p.add_argument("--SM_anneal_power", type=float, default=2.0)
    p.add_argument("--distance_sample_ratio", type=float, default=1.0)
    p.add_argument("--gnn_2d_lr_scale", type=float, default=None,
                   help="RR only: ABSOLUTE lr for the two AutoEncoder heads "
                        "(torch param-group quirk, pretrain_GeoSSL.py:335-337"
                        " — the group lr is the scale itself, NOT lr*scale; "
                        "reference default 1.0). Default: AE heads train at "
                        "--lr like everything else")
    p.add_argument("--T", type=float, default=0.1)
    p.add_argument("--CL_neg_samples", type=int, default=1,
                   help="cyclic-shift negatives per positive for EBM_NCE "
                        "(reference --CL_neg_samples, config.py:166-170)")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--AE_loss", default="l2", choices=["l1", "l2", "cosine"])
    p.add_argument("--detach_target", dest="detach_target",
                   action="store_true", default=True)
    p.add_argument("--no_detach_target", dest="detach_target",
                   action="store_false")
    # --steps_per_call comes from add_common_args (since round 4 every
    # driver chains; this one keeps its RR-aware inline multi_step)
    p.set_defaults(lr=5e-4, epochs=100)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.setup_platform(args)
    subset = None
    if args.dataset.startswith("Molecule3D_"):
        subset = int(args.dataset.split("_")[-1])
    store = load_molecule3d(
        args.data_root, subset=subset, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size,
        synthetic_max_atoms=args.synthetic_max_atoms,
    )

    # SM_noise_type -> pair option (pretrain_GeoSSL.py:289-295)
    pair_option = "permutation" if args.SM_noise_type == "random" else "combination"
    transform = None
    if args.GeoSSL_atom_masking_ratio > 0:
        transform = make_bfs_transform(args.GeoSSL_atom_masking_ratio)

    mesh = pmesh.make_mesh(args.num_devices)
    cfg = common.model_config_from_args(args)
    module, backbone_apply = common.make_backbone(cfg)
    is_painn = args.model_3d == "painn"
    painn_cutoff = cfg.painn.cutoff

    rng = jax.random.PRNGKey(args.seed)
    bucket_sizes = common.buckets(args)
    n_max = bucket_sizes[-1]
    params = {"model": common.init_backbone(module, rng, n_max=n_max)}
    extra_vars = {}

    option = args.GeoSSL_option
    ncsn = ae = None
    if option == "DDM":
        ncsn = NCSNv3(
            emb_dim=args.emb_dim, sigma_begin=args.SM_sigma_begin,
            sigma_end=args.SM_sigma_end, num_noise_level=args.SM_num_noise_level,
            anneal_power=args.SM_anneal_power,
            # fused per-pair score kernel: measured NEUTRAL at every bucket
            # tried (N=32, 64 and 256 interleaved A/Bs — docs/PERF.md); the
            # DDM step is backbone-bound and XLA schedules the head's
            # [B,N,N,emb] passes well. Kept correctness-tested and opt-in
            # via NCSNv3(use_pallas=True); the driver takes the simple path.
            use_pallas=False,
        )
        h = jnp.zeros((2, n_max, args.emb_dim))
        d = jnp.zeros((2, n_max, n_max))
        sel = jnp.ones((2, n_max, n_max), bool)
        k1, k2 = jax.random.split(rng)
        params["NCSN_01"] = ncsn.init(k1, k1, h, d, sel)["params"]
        params["NCSN_02"] = ncsn.init(k2, k2, h, d, sel)["params"]
    elif option == "RR":
        ae = AutoEncoder(emb_dim=args.emb_dim, loss=args.AE_loss,
                         detach_target=args.detach_target)
        x = jnp.zeros((2, args.emb_dim))
        k1, k2 = jax.random.split(rng)
        v1, v2 = ae.init(k1, x, x), ae.init(k2, x, x)
        params["AE_01"], params["AE_02"] = v1["params"], v2["params"]
        extra_vars = {
            "AE_01": v1.get("batch_stats", {}),
            "AE_02": v2.get("batch_stats", {}),
        }

    if args.input_model_file:
        params["model"] = checkpoints.load_checkpoint(args.input_model_file)["model"]

    loader = BucketedLoader(
        store, common.round_batch_to_mesh(args.batch_size, mesh), bucket_sizes,
        shuffle=True, seed=args.seed, transform=transform,
    )
    common.check_chain_args(args)
    group_lr = None
    if args.gnn_2d_lr_scale is not None:
        if args.GeoSSL_option != "RR":
            raise SystemExit("--gnn_2d_lr_scale only applies to the RR "
                             "AutoEncoder heads (GeoSSL_option=RR)")
        # reference quirk reproduced: the AE param groups get the scale as
        # their ABSOLUTE lr (pretrain_GeoSSL.py:335-337), expressed here as
        # a multiplicative factor on the base lr
        f = args.gnn_2d_lr_scale / args.lr
        group_lr = {"AE_01": f, "AE_02": f}
    tx = common.make_optimizer_from_args(
        args, common.opt_steps_per_epoch(len(loader), args.grad_accum),
        group_lr_factors=group_lr)
    state = common.TrainState.create((params, extra_vars), tx)
    state = jax.device_put(state, pmesh.replicated(mesh))

    mu, sigma, T = args.GeoSSL_mu, args.GeoSSL_sigma, args.T

    def encode(model_params, batch, positions, pair_mask):
        return backbone_apply(
            model_params, batch.atom_type, positions, batch.node_mask, pair_mask
        )

    def two_views(model_params, batch, k_view):
        pos1 = batch.positions
        pos2 = perturb_positions(k_view, pos1, mu, sigma)
        pair_mask = None
        if is_painn:
            # cached clean-geometry radius graph (pretrain_GeoSSL.py:88-89)
            dist, pm = geometry.pairwise_distances(pos1, batch.node_mask)
            pair_mask = geometry.radius_adjacency(
                dist, pm, painn_cutoff, cfg.max_neighbors
            )
        g1, h1 = encode(model_params, batch, pos1, pair_mask)
        g2, h2 = encode(model_params, batch, pos2, pair_mask)
        return (pos1, g1, h1), (pos2, g2, h2)

    def loss_fn(params_and_vars, batch, rng):
        params, variables = params_and_vars
        if isinstance(rng, tuple):
            k_view, k_sel, k1, k2 = rng
        else:
            k_view, k_sel, k1, k2 = jax.random.split(rng, 4)
        (pos1, g1, h1), (pos2, g2, h2) = two_views(params["model"], batch, k_view)
        new_vars = variables
        if option == "DDM":
            if args.normalize:
                h1, h2 = l2_normalize(h1), l2_normalize(h2)
            sel = pair_selection(
                batch.node_mask, pair_option, args.distance_sample_ratio,
                k_sel if args.distance_sample_ratio < 1 else None,
            )
            d1, _ = geometry.pairwise_distances(pos1, batch.node_mask)
            d2, _ = geometry.pairwise_distances(pos2, batch.node_mask)
            # cross terms (pretrain_GeoSSL.py:207-208)
            l1 = ncsn.apply({"params": params["NCSN_01"]}, k1, h1, d2, sel,
                            batch.graph_mask)
            l2 = ncsn.apply({"params": params["NCSN_02"]}, k2, h2, d1, sel,
                            batch.graph_mask)
            loss, acc = (l1 + l2) / 2, jnp.zeros(())
        elif option == "InfoNCE":
            if args.normalize:
                g1, g2 = l2_normalize(g1), l2_normalize(g2)
            loss, acc = dual_infonce_loss(g1, g2, T, batch.graph_mask)
        elif option == "EBM_NCE":
            if args.normalize:
                g1, g2 = l2_normalize(g1), l2_normalize(g2)
            loss, acc = ebm_nce_loss(
                g1, g2, batch.graph_mask, num_neg=args.CL_neg_samples
            )
        elif option == "RR":
            if args.normalize:
                g1, g2 = l2_normalize(g1), l2_normalize(g2)
            out1 = ae.apply(
                {"params": params["AE_01"], "batch_stats": variables["AE_01"]},
                g1, g2, batch.graph_mask, train=True, mutable=["batch_stats"],
            )
            out2 = ae.apply(
                {"params": params["AE_02"], "batch_stats": variables["AE_02"]},
                g2, g1, batch.graph_mask, train=True, mutable=["batch_stats"],
            )
            loss = (out1[0] + out2[0]) / 2
            new_vars = {
                "AE_01": out1[1]["batch_stats"],
                "AE_02": out2[1]["batch_stats"],
            }
            acc = jnp.zeros(())
        else:
            raise ValueError(option)
        return loss, (acc, new_vars)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, epoch_key):
        # derive the step RNG on-device: avoids a host->device roundtrip per
        # step (jax.random.split on the host costs ~0.3 ms over this tunnel)
        rng = jax.random.fold_in(epoch_key, state.step)
        (loss, (acc, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch, rng)
        # AE batch_stats are state, not trainable: zero their "grads"
        grads = (grads[0], jax.tree_util.tree_map(jnp.zeros_like, grads[1]))
        new_state = common.apply_updates(state, grads, tx)
        new_state = new_state.replace(params=(new_state.params[0], new_vars))
        return new_state, loss, acc

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def accum_step(state, stacked, epoch_key, k):
        """ONE optimizer step from k stacked microbatches (grad averaging
        via lax.scan — one microbatch of activations live). AE batch_stats
        (RR) are sequential state, not averaged: each microbatch sees the
        previous one's running stats, and the last wins."""
        step_key = jax.random.fold_in(epoch_key, state.step)
        params0, variables0 = state.params
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params0)

        def body(carry, xs):
            i, mb = xs
            gsum, lsum, asum, variables = carry
            rngs = tuple(jax.random.split(jax.random.fold_in(step_key, i), 4))
            (loss, (acc, new_vars)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )((params0, variables), mb, rngs)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads[0])
            return (gsum, lsum + loss, asum + acc, new_vars), None

        (gsum, lsum, asum, new_vars), _ = jax.lax.scan(
            body, (zero_g, jnp.zeros(()), jnp.zeros(()), variables0),
            (jnp.arange(k), stacked),
        )
        grads = (
            jax.tree_util.tree_map(lambda g: g / k, gsum),
            jax.tree_util.tree_map(jnp.zeros_like, variables0),
        )
        new_state = common.apply_updates(state, grads, tx)
        new_state = new_state.replace(params=(new_state.params[0], new_vars))
        return new_state, lsum / k, asum / k

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def multi_step(state, stacked, epoch_key, k):
        """Run k train steps in ONE dispatch: lax.scan over stacked batches
        (leading axis k). Amortizes the per-dispatch latency of the training
        loop — ~10 ms/step through a remote-TPU tunnel."""

        def body(st, batch):
            k_view, k_sel, k1, k2 = jax.random.split(
                jax.random.fold_in(epoch_key, st.step), 4
            )
            (loss, (acc, new_vars)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params, batch, (k_view, k_sel, k1, k2))
            grads = (grads[0], jax.tree_util.tree_map(jnp.zeros_like, grads[1]))
            st = common.apply_updates(st, grads, tx)
            st = st.replace(params=(st.params[0], new_vars))
            return st, (loss, acc)

        state, (losses, accs) = jax.lax.scan(body, state, stacked, length=k)
        return state, losses, accs

    def stack_batches(batches):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    saver = checkpoints.BestModelSaver(args.output_model_dir)
    mlog = common.MetricLogger(args.log_file)
    state, start_epoch, best, extra, state_path = common.try_resume(
        args, state, mesh)
    plateau = common.make_plateau(args, extra)
    saver.best_metric = best  # don't let a worse epoch overwrite model.ckpt
    profiler_active = False
    for epoch in range(start_epoch, args.epochs + 1):
        if args.profile_dir and epoch == start_epoch:
            from jax import profiler as _profiler

            _profiler.start_trace(args.profile_dir)
            profiler_active = True
        timer = common.EpochTimer()
        epoch_key = jax.random.PRNGKey(hash((args.seed + 1, epoch)) % (2**31))
        losses, accs = [], []
        k = max(1, args.steps_per_call)
        pending = []
        def flush():
            nonlocal state, pending
            if not pending:
                return
            if len(pending) == 1 and k > 1:
                state, loss, acc = train_step(state, pending[0], epoch_key)
                losses.append(jnp.atleast_1d(loss))
                accs.append(jnp.atleast_1d(acc))
            else:
                state, ls, ac = multi_step(
                    state, stack_batches(pending), epoch_key, len(pending)
                )
                losses.append(ls)
                accs.append(ac)
            pending = []
        if args.grad_accum > 1:
            for stacked, kk in common.accum_groups(
                pmesh.prefetch(loader.epoch(epoch), mesh), args.grad_accum
            ):
                state, loss, acc = accum_step(state, stacked, epoch_key, kk)
                losses.append(jnp.atleast_1d(loss))
                accs.append(jnp.atleast_1d(acc))
        elif k == 1:
            for b in pmesh.prefetch(loader.epoch(epoch), mesh):
                state, loss, acc = train_step(state, b, epoch_key)
                losses.append(jnp.atleast_1d(loss))
                accs.append(jnp.atleast_1d(acc))
        else:
            for b in pmesh.prefetch(loader.epoch(epoch), mesh):
                # a multi-bucket ladder switches padded widths mid-epoch:
                # never stack across a shape change
                if pending and b.atom_type.shape != pending[0].atom_type.shape:
                    flush()
                pending.append(b)
                if len(pending) == k:
                    flush()
            flush()
        # one device->host transfer per epoch (per-scalar float() costs
        # ~ms over the remote-TPU tunnel x steps/epoch)
        mean_loss = float(jnp.mean(jnp.concatenate(losses)))
        mean_acc = float(jnp.mean(jnp.concatenate(accs)))
        state = common.plateau_update(state, plateau, mean_loss)
        saved = saver.maybe_save_best(
            mean_loss,
            lambda: {"model": jax.device_get(state.params[0]["model"])},
        )
        print(
            f"Epoch: {epoch}\tSSL Loss: {mean_loss:.5f}\tSSL Acc: {mean_acc:.5f}"
            f"\tTime: {timer.elapsed():.3f}" + ("\t[saved best]" if saved else "")
        )
        mlog.log(epoch=epoch, loss=mean_loss, acc=mean_acc,
                 time_s=round(timer.elapsed(), 3), saved_best=saved)
        if profiler_active:
            from jax import profiler as _profiler

            _profiler.stop_trace()
            profiler_active = False
            print(f"profiler trace written to {args.profile_dir}")
        common.maybe_save_state(args, state_path, state, epoch,
                                saver.best_metric,
                                plateau.state() if plateau else None)
    saver.save_final({"model": jax.device_get(state.params[0]["model"])})
    mlog.log(final=True, best_loss=saver.best_metric, epochs=args.epochs)
    return state


if __name__ == "__main__":
    main()
