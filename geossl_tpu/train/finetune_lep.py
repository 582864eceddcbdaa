"""Atom3D LEP fine-tuning driver — ligand efficacy binary classification.

Reference: ``examples/finetune_lep.py`` — dual tower: the SHARED backbone
encodes the active and inactive structures, pooled representations are
concatenated into Linear(2·emb -> 1) with BCE-with-logits (``:34-45,179-206``);
metrics ROC-AUC + PR-AUC (``:96-99``); best-val-ROC selection; batch 16,
lr 1e-4 (``submit_finetune_lba_lep_schnet.sh:28-33``). LEP ships pre-split
by protein (train/val/test LMDB dirs); the synthetic stand-in is randomly
split here.

Run: ``python -m geossl_tpu.train.finetune_lep --synthetic --epochs 3``
"""

from __future__ import annotations

import argparse
import os
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geossl_tpu.data.batch import DualMolBatch
from geossl_tpu.data.bucketing import pack_batch
from geossl_tpu.data.lep import load_lep
from geossl_tpu.data.splitters import random_split
from geossl_tpu.parallel import mesh as pmesh
from geossl_tpu.train import checkpoints, common
from geossl_tpu.utils import metrics


# re-export (tests/serve historically import it from here)
from geossl_tpu.train.common import DualHead  # noqa: F401


class DualLoader:
    """Zip two MolStores + labels into DualMolBatch batches
    (reference collate: ``dataloaders_LEP.py:6-68``).

    Pairs are bucketed by max(active, inactive) atom count so both towers of
    a batch share one padded width — the protocol caps structures at
    maxnum=400 atoms (``datasets_LEP.py:100-115``). The default bucket is
    512 (128-divisible: the occupancy-gated kernels skip the padding tiles,
    so the larger pad COSTS nothing and buys (32,128)-tile granularity —
    docs/PERF.md round 3). Uses the native C++ packer when available;
    training batch order interleaves buckets like BucketedLoader."""

    def __init__(self, active, inactive, labels, batch_size, bucket_sizes,
                 shuffle, seed=0):
        assert len(active) == len(inactive) == len(labels)
        self.active, self.inactive = active, inactive
        self.labels = np.asarray(labels, np.float32)
        self.batch_size = batch_size
        self.shuffle, self.seed = shuffle, seed
        from geossl_tpu.data.bucketing import assign_buckets, find_native_packer

        sizes = np.maximum(active.num_atoms(), inactive.num_atoms())
        self._bucket_of = assign_buckets(sizes, bucket_sizes)
        self._native = find_native_packer()

    def __len__(self):
        return sum(
            -(-int((self._bucket_of == b).sum()) // self.batch_size)
            for b in np.unique(self._bucket_of)
        )

    def _pack(self, store, chunk, n_max):
        if self._native is not None:
            at, pos, nm, gm, y = self._native.pack_batch_from_store(
                store, chunk, n_max, self.batch_size
            )
            from geossl_tpu.data.batch import DenseMolBatch

            return DenseMolBatch(atom_type=at, positions=pos, node_mask=nm,
                                 y=y, graph_mask=gm)
        return pack_batch(
            [store.get(int(i)) for i in chunk], n_max, self.batch_size
        )

    def epoch(self, epoch: int = 0) -> Iterator[DualMolBatch]:
        from geossl_tpu.data.bucketing import bucket_chunks

        rng = np.random.default_rng((self.seed, epoch))
        chunks = bucket_chunks(self._bucket_of, self.batch_size, rng, self.shuffle)
        for bucket, chunk in chunks:
            a = self._pack(self.active, chunk, bucket)
            b = self._pack(self.inactive, chunk, bucket)
            y = np.zeros((self.batch_size,), np.float32)
            y[: len(chunk)] = self.labels[chunk]
            yield DualMolBatch(active=a, inactive=b, y=y)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--spatial_sort", default="on", choices=["on", "off"],
                   help="Morton-reorder each complex's atoms once at load "
                        "(outputs unchanged up to f32 summation order); see "
                        "finetune_lba --spatial_sort / docs/PERF.md")
    # structures are env-capped at 400 atoms (datasets_LEP.py maxnum); the
    # bucket is 512 rather than the round-2 448 because a 128-divisible pad
    # gives the occupancy-gated kernels (32,128) tiles instead of full-row
    # (8,448) ones — the SAME molecules run ~40% faster at the larger pad
    # (docs/PERF.md round-3 table; --bucket 448 restores the old shape)
    p.add_argument("--eval_only", action="store_true",
                   help="skip training: evaluate --input_model_file (a "
                        "FINE-TUNED checkpoint incl. its dual head) on the "
                        "val/test splits and exit")
    p.set_defaults(lr=1e-4, epochs=300, batch_size=16, bucket=[512])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.setup_platform(args)
    if args.synthetic:
        from geossl_tpu.data.synthetic import synthetic_lep

        act, inact, labels = synthetic_lep(
            args.synthetic_size, max_atoms=min(300, common.buckets(args)[-1] - 16)
        )
        tr, va, te = random_split(len(labels), seed=args.seed)
        splits = {
            "train": (act.select(tr), inact.select(tr), labels[tr]),
            "val": (act.select(va), inact.select(va), labels[va]),
            "test": (act.select(te), inact.select(te), labels[te]),
        }
    else:
        splits = {
            k: load_lep(args.data_root, split_dir=k) for k in ("train", "val", "test")
        }
    if args.spatial_sort == "on":
        from geossl_tpu.data.transforms import spatial_sort_store

        splits = {
            k: (spatial_sort_store(a), spatial_sort_store(b), y)
            for k, (a, b, y) in splits.items()
        }

    mesh = pmesh.make_mesh(args.num_devices)
    cfg = common.model_config_from_args(args)
    module, backbone_apply = common.make_backbone(cfg)
    head = DualHead()
    rng = jax.random.PRNGKey(args.seed)
    params = {
        "model": common.init_backbone(module, rng, n_max=common.buckets(args)[-1]),
        "graph_pred_linear": head.init(
            rng, jnp.zeros((2, args.emb_dim)), jnp.zeros((2, args.emb_dim))
        )["params"],
    }
    ckpt = None
    if args.input_model_file:
        ckpt = checkpoints.load_checkpoint(args.input_model_file)
        params["model"] = ckpt["model"]
        if "graph_pred_linear" in ckpt:  # fine-tuned checkpoint: head too
            params["graph_pred_linear"] = ckpt["graph_pred_linear"]
        print(f"Loaded pretrained backbone from {args.input_model_file}")

    bs = common.round_batch_to_mesh(args.batch_size, mesh)
    loaders = {
        k: DualLoader(a, i, y, bs, common.buckets(args),
                      shuffle=(k == "train"), seed=args.seed)
        for k, (a, i, y) in splits.items()
    }

    common.check_chain_args(args)
    tx = common.make_optimizer_from_args(
        args, common.opt_steps_per_epoch(len(loaders["train"]), args.grad_accum))
    state = common.TrainState.create(params, tx)
    state = jax.device_put(state, pmesh.replicated(mesh))

    def logits_fn(params, dual: DualMolBatch):
        ga, _ = backbone_apply(
            params["model"], dual.active.atom_type, dual.active.positions,
            dual.active.node_mask,
        )
        gi, _ = backbone_apply(
            params["model"], dual.inactive.atom_type, dual.inactive.positions,
            dual.inactive.node_mask,
        )
        return head.apply({"params": params["graph_pred_linear"]}, ga, gi)

    def loss_fn(params, dual):
        logits = logits_fn(params, dual)
        per = optax.sigmoid_binary_cross_entropy(logits, dual.y)
        return common.graph_masked_mean(per, dual.active.graph_mask)

    def step_body(state, dual):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, dual)
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

    predict = jax.jit(logits_fn)

    def evaluate(params, loader):
        scores, trues = [], []
        for d in pmesh.prefetch(loader.epoch(0), mesh):
            gm = pmesh.fetch(d.active.graph_mask)
            scores.append(pmesh.fetch(predict(params, d))[gm])
            trues.append(pmesh.fetch(d.y)[gm])
        s, t = np.concatenate(scores), np.concatenate(trues)
        return {"roc": metrics.roc_auc(t, s), "pr": metrics.pr_auc(t, s)}

    if args.eval_only:
        if ckpt is None or "graph_pred_linear" not in ckpt:
            raise SystemExit(
                "--eval_only needs --input_model_file pointing at a "
                "FINE-TUNED checkpoint (with graph_pred_linear; pretrain "
                "checkpoints carry no head)"
            )
        val = evaluate(state.params, loaders["val"])
        test = evaluate(state.params, loaders["test"])
        print(f"eval-only\tval ROC: {val['roc']:.4f} PR: {val['pr']:.4f}"
              f"\ttest ROC: {test['roc']:.4f} PR: {test['pr']:.4f}")
        return val["roc"], test

    mlog = common.MetricLogger(args.log_file)
    state, start_epoch, best_val_roc, extra, state_path = common.try_resume(
        args, state, mesh, higher_is_better=True)
    best_val_roc = max(best_val_roc, -1.0)  # fresh start: -inf -> -1.0
    plateau = common.make_plateau(args, extra)  # pops its keys from extra
    best_epoch = int(extra.pop("best_epoch", -1))
    best_test = extra  # remaining keys are the test metrics at best
    for epoch in range(start_epoch, args.epochs + 1):
        timer = common.EpochTimer()
        losses = []
        batches = pmesh.prefetch(loaders["train"].epoch(epoch), mesh)
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
            for d in batches:
                state, loss = train_step(state, d)
                losses.append(jnp.atleast_1d(loss))
        # one device->host transfer per epoch (per-scalar float() costs
        # ~ms over the remote-TPU tunnel x steps/epoch)
        train_loss = float(jnp.mean(jnp.concatenate(losses)))
        state = common.plateau_update(state, plateau, train_loss)
        val, test = evaluate(state.params, loaders["val"]), evaluate(
            state.params, loaders["test"]
        )
        print(
            f"Epoch: {epoch}\tLoss: {train_loss:.5f}\tval ROC: {val['roc']:.4f} "
            f"PR: {val['pr']:.4f}\ttest ROC: {test['roc']:.4f} PR: {test['pr']:.4f}"
            f"\tTime: {timer.elapsed():.3f}"
        )
        mlog.log(epoch=epoch, train_loss=train_loss,
                 val_roc=val["roc"], val_pr=val["pr"],
                 test_roc=test["roc"], test_pr=test["pr"],
                 time_s=round(timer.elapsed(), 3))
        if val["roc"] > best_val_roc:
            best_val_roc, best_epoch, best_test = val["roc"], epoch, test
            if args.output_model_dir:
                checkpoints.save_checkpoint(
                    os.path.join(args.output_model_dir, "model.ckpt"),
                    jax.device_get(state.params),
                )
        common.maybe_save_state(
            args, state_path, state, epoch, best_val_roc,
            {"best_epoch": best_epoch, **best_test,
             **(plateau.state() if plateau else {})},
        )
    mlog.log(final=True, best_val_roc=best_val_roc, best_epoch=best_epoch,
             **{f"test_{k}_at_best": v for k, v in best_test.items()})
    print(
        f"best val ROC: {best_val_roc:.4f} (epoch {best_epoch})\ttest @ best: "
        f"ROC {best_test.get('roc', float('nan')):.4f} "
        f"PR {best_test.get('pr', float('nan')):.4f}"
    )
    return best_val_roc, best_test


if __name__ == "__main__":
    main()
