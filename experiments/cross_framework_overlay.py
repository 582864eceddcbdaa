"""Cross-framework training overlays: the reference's torch math vs this
framework, same corpus, same batch stream, same noise (VERDICT r4 #1 and #2).

Two questions, one harness:

* ``--objective RR``  — does the reference's own torch RR implementation
  (backbone + two AutoEncoders, --normalize, the AE-heads-at-absolute-lr-1.0
  param-group quirk of ``pretrain_GeoSSL.py:335-343``) exhibit the SAME
  corpus-scale repr-norm drift the round-4 JAX arms measured (3.8 -> 4e8
  over 39k steps)? Round 4 inferred "the failure is the protocol's own";
  this measures it: both arms run the same steps and probe graph-repr
  norm/cos on the same held-out batch at the same cadence.
* ``--objective DDM`` — long-horizon convergence overlay: same-seed,
  same-batch-stream f32 SchNet-DDM loss curves, torch vs JAX, ~1-2k steps
  (``pretrain_GeoSSL.py:215-270``). Extends the 4-step f64 Adam parity of
  tests/test_training_parity.py to training horizon.

Design notes (what makes the overlay apples-to-apples):
* both arms consume the SAME BucketedLoader stream (same corpus cache, same
  seed, same BFS-masking transform) and the SAME numpy noise draws (view
  perturbation, sigma levels, pair noise) — stochasticity is shared, so
  curve differences are framework differences, not sampling;
* both arms start from the SAME initialization (the flax tree, converted
  leaf-by-leaf for torch);
* before training, the script pins f64 forward/loss parity on the first
  batch (machine epsilon — experiments/torch_twin.py docstring);
* the torch arm is experiments/torch_twin.py (the reference's math; its
  PyG original cannot run here — no torch_geometric, zero egress);
* ``--arm jax --platform cpu`` gives the same-platform comparison;
  ``--arm jax`` (axon default) replicates it on the real chip;
  ``--arm jax --noise_seed N`` gives the run-to-run yardstick (same
  framework, different noise) that defines "agreement".

Run (see experiments/README.md for the round-5 protocol):
  python experiments/cross_framework_overlay.py --objective RR --arm torch
  python experiments/cross_framework_overlay.py --objective RR --arm jax --platform cpu
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--objective", required=True, choices=["RR", "DDM"])
    p.add_argument("--arm", required=True, choices=["torch", "jax", "check"],
                   help="'check' = f64 one-batch loss parity torch-vs-jax "
                        "(run before the arms; asserts < 1e-9)")
    p.add_argument("--platform", default=None, help="cpu to force CPU (jax arm)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--probe_every", type=int, default=50)
    p.add_argument("--data_root", default="/root/corpora/m3d_100k")
    p.add_argument("--size", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=42, help="init + loader seed")
    p.add_argument("--noise_seed", type=int, default=12345,
                   help="shared numpy noise stream (vary for the "
                        "run-to-run yardstick arm)")
    p.add_argument("--epochs_for_schedule", type=int, default=50,
                   help="cosine T_max — the corpus-arm protocol value")
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--sigma", type=float, default=0.3)
    p.add_argument("--mask_ratio", type=float, default=0.3)
    p.add_argument("--out", default=None)
    p.add_argument("--save_params_every", type=int, default=0,
                   help="jax arm: save a flat-npz param snapshot every N "
                        "steps (for drift-regime continuation arms)")
    p.add_argument("--init_params", default=None,
                   help="start from a snapshot npz instead of fresh init "
                        "(optimizer state starts FRESH in both arms — the "
                        "continuation protocol is identical either way)")
    p.add_argument("--skip_steps", type=int, default=0,
                   help="fast-forward the shared batch/noise streams by N "
                        "steps before training (aligns a continuation arm "
                        "with the snapshot's position in the stream)")
    return p


# ----------------------------------------------------- snapshot (de)serial
def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_snapshot(path, params, extra_vars):
    flat = _flatten({"params": params, "extra_vars": extra_vars})
    np.savez(path, **flat)


def load_snapshot(path):
    with np.load(path) as z:
        tree = _unflatten({k: z[k] for k in z.files})
    return tree["params"], tree.get("extra_vars", {})


# --------------------------------------------------------- shared machinery
def make_loader(args):
    from geossl_tpu.data.bucketing import BucketedLoader
    from geossl_tpu.data.masking import make_bfs_transform
    from geossl_tpu.data.molecule3d import load_molecule3d

    store = load_molecule3d(args.data_root, subset=args.size)
    transform = (make_bfs_transform(args.mask_ratio)
                 if args.mask_ratio > 0 else None)
    return BucketedLoader(store, args.batch_size, (32, 64, 128),
                          shuffle=True, seed=args.seed, transform=transform)


def batch_stream(loader, steps):
    """(step, epoch, numpy batch) across epochs — identical for both arms."""
    step, epoch = 0, 0
    while step < steps:
        epoch += 1
        for b in loader.epoch(epoch):
            yield step, epoch, b
            step += 1
            if step >= steps:
                return


def noise_for(rng, batch, objective, num_noise_level=50):
    """Per-step noise from the SHARED numpy stream. Draw order is fixed and
    shape-dependent only through the batch itself (same for both arms)."""
    b, n = np.asarray(batch.atom_type).shape
    view_eps = rng.standard_normal((b, n, 3)).astype(np.float32)
    if objective == "RR":
        return {"view_eps": view_eps}
    level = rng.integers(0, num_noise_level, size=(b,))
    pair_eps1 = rng.standard_normal((b, n, n)).astype(np.float32)
    pair_eps2 = rng.standard_normal((b, n, n)).astype(np.float32)
    return {"view_eps": view_eps, "level": level,
            "pair_eps1": pair_eps1, "pair_eps2": pair_eps2}


def probe_batch_np():
    """Held-out probe molecules — same construction as
    experiments/rr_diagnostic.repr_stats (synthetic, seed 777)."""
    from geossl_tpu.data.batch import stack_batch
    from geossl_tpu.data.synthetic import synthetic_molecule3d

    store = synthetic_molecule3d(128, seed=777)
    n_max = int(store.num_atoms().max())
    recs = [store.get(i) for i in range(len(store))]
    return stack_batch([r.atom_type for r in recs],
                       [r.positions for r in recs], n_max)


def init_params(args, objective):
    """The pretrain_geossl driver's exact init (seed, key splits), on CPU
    JAX regardless of arm — both arms share this tree."""
    import jax
    import jax.numpy as jnp

    from geossl_tpu.objectives import AutoEncoder
    from geossl_tpu.objectives.ncsn import NCSNv3
    from geossl_tpu.train import common
    from geossl_tpu import config as gconfig

    cfg = gconfig.ModelConfig()
    module, apply = common.make_backbone(cfg)
    rng = jax.random.PRNGKey(args.seed)
    n_max = 128  # bucket ladder max (32, 64, 128)
    params = {"model": common.init_backbone(module, rng, n_max=n_max)}
    extra_vars = {}
    emb = 128
    if objective == "DDM":
        ncsn = NCSNv3(emb_dim=emb)
        h = jnp.zeros((2, n_max, emb))
        d = jnp.zeros((2, n_max, n_max))
        sel = jnp.ones((2, n_max, n_max), bool)
        k1, k2 = jax.random.split(rng)
        params["NCSN_01"] = ncsn.init(k1, k1, h, d, sel)["params"]
        params["NCSN_02"] = ncsn.init(k2, k2, h, d, sel)["params"]
    else:
        ae = AutoEncoder(emb_dim=emb)
        x = jnp.zeros((2, emb))
        k1, k2 = jax.random.split(rng)
        v1, v2 = ae.init(k1, x, x), ae.init(k2, x, x)
        params["AE_01"], params["AE_02"] = v1["params"], v2["params"]
        extra_vars = {"AE_01": v1.get("batch_stats", {}),
                      "AE_02": v2.get("batch_stats", {})}
    return module, params, extra_vars


def cosine_lr_factor(epoch, t_max):
    """torch CosineAnnealingLR stepped per epoch (epoch 1 trains at the
    base lr — the scheduler steps AFTER each epoch), eta_min=0."""
    return 0.5 * (1.0 + math.cos(math.pi * (epoch - 1) / t_max))


# ------------------------------------------------------------- parity pin
def run_check(args, module, params, extra_vars, stream):
    """f64 one-batch loss parity, both objectives' full loss chains."""
    import jax
    import jax.numpy as jnp
    import torch

    from experiments import torch_twin as tw
    from geossl_tpu.objectives import AutoEncoder, l2_normalize
    from geossl_tpu.objectives.ncsn import NCSNv3, sigma_ladder
    from geossl_tpu.objectives.pairs import pair_selection
    from geossl_tpu.ops import geometry

    _, _, b = next(iter(stream))
    nz = noise_for(np.random.default_rng(args.noise_seed), b, args.objective)
    p64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
    z = jnp.asarray(b.atom_type)
    pos1 = jnp.asarray(b.positions, jnp.float64)
    mask = jnp.asarray(b.node_mask)
    gmask = jnp.asarray(b.graph_mask)
    pos2 = pos1 + args.sigma * jnp.asarray(nz["view_eps"], jnp.float64)
    g1, h1 = module.apply({"params": p64["model"]}, z, pos1, mask)
    g2, h2 = module.apply({"params": p64["model"]}, z, pos2, mask)
    if args.objective == "RR":
        ae = AutoEncoder(emb_dim=128)
        g1n, g2n = l2_normalize(g1), l2_normalize(g2)
        bs64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), extra_vars)
        out1 = ae.apply({"params": p64["AE_01"], "batch_stats": bs64["AE_01"]},
                        g1n, g2n, gmask, train=True, mutable=["batch_stats"])
        out2 = ae.apply({"params": p64["AE_02"], "batch_stats": bs64["AE_02"]},
                        g2n, g1n, gmask, train=True, mutable=["batch_stats"])
        loss_j = float((out1[0] + out2[0]) / 2)
    else:
        ncsn = NCSNv3(emb_dim=128)
        sel = pair_selection(mask, "combination", 1.0)
        d1, _ = geometry.pairwise_distances(pos1, mask)
        d2, _ = geometry.pairwise_distances(pos2, mask)
        sig = jnp.asarray(sigma_ladder(10.0, 0.01, 50), jnp.float64)[
            nz["level"]]
        l1 = ncsn.apply({"params": p64["NCSN_01"]}, None, h1, d2, sel, gmask,
                        sigmas=sig, noise=jnp.asarray(nz["pair_eps1"],
                                                      jnp.float64))
        l2 = ncsn.apply({"params": p64["NCSN_02"]}, None, h2, d1, sel, gmask,
                        sigmas=sig, noise=jnp.asarray(nz["pair_eps2"],
                                                      jnp.float64))
        loss_j = float((l1 + l2) / 2)

    tp = tw.to_torch_tree(jax.tree_util.tree_map(np.asarray, params),
                          dtype=torch.float64, requires_grad=False)
    zt = torch.tensor(np.asarray(b.atom_type), dtype=torch.long)
    p1 = torch.tensor(np.asarray(b.positions), dtype=torch.float64)
    mt = torch.tensor(np.asarray(b.node_mask))
    gt = torch.tensor(np.asarray(b.graph_mask))
    p2 = p1 + args.sigma * torch.tensor(nz["view_eps"],
                                        dtype=torch.float64)
    g1t, h1t = tw.schnet_forward(tp["model"], zt, p1, mt)
    g2t, h2t = tw.schnet_forward(tp["model"], zt, p2, mt)
    if args.objective == "RR":
        g1n, g2n = tw.l2_normalize(g1t), tw.l2_normalize(g2t)
        loss_t = float((tw.ae_loss(tp["AE_01"], g1n, g2n, gt)
                        + tw.ae_loss(tp["AE_02"], g2n, g1n, gt)) / 2)
    else:
        sel = tw.combination_sel(mt)
        d1, _ = tw.pairwise_distances(p1, mt)
        d2, _ = tw.pairwise_distances(p2, mt)
        sig = torch.tensor(tw.sigma_ladder(10.0, 0.01, 50)[nz["level"]],
                           dtype=torch.float64)
        loss_t = float((tw.ncsnv3_loss(
            tp["NCSN_01"], h1t, d2, sel, sig,
            torch.tensor(nz["pair_eps1"], dtype=torch.float64), gt)
            + tw.ncsnv3_loss(
            tp["NCSN_02"], h2t, d1, sel, sig,
            torch.tensor(nz["pair_eps2"], dtype=torch.float64), gt)) / 2)
    diff = abs(loss_j - loss_t)
    rel = diff / max(abs(loss_j), 1e-12)
    print(f"[check {args.objective}] jax {loss_j!r} torch {loss_t!r} "
          f"abs {diff:.3g} rel {rel:.3g}", flush=True)
    assert rel < 1e-9, "f64 parity pin failed"
    return loss_j, loss_t


# -------------------------------------------------------------- torch arm
def run_torch(args, params, extra_vars, stream, probe_np, writer=None):
    import torch

    from experiments import torch_twin as tw

    torch.manual_seed(args.seed)
    objective = args.objective
    tp = tw.to_torch_tree(params)
    backbone_leaves = tw.tree_leaves(tp["model"])
    head_keys = [k for k in tp if k != "model"]
    head_leaves = [lf for k in head_keys for lf in tw.tree_leaves(tp[k])]
    if objective == "RR":
        # the reference's param-group quirk: AE heads at ABSOLUTE lr 1.0
        groups = [{"params": backbone_leaves, "lr": args.lr},
                  {"params": head_leaves, "lr": 1.0}]
    else:
        groups = [{"params": backbone_leaves, "lr": args.lr},
                  {"params": head_leaves, "lr": args.lr}]
    opt = torch.optim.Adam(groups, lr=args.lr, weight_decay=0.0)
    base_lrs = [g["lr"] for g in opt.param_groups]

    pz = torch.tensor(np.asarray(probe_np.atom_type), dtype=torch.long)
    ppos = torch.tensor(np.asarray(probe_np.positions))
    pmask = torch.tensor(np.asarray(probe_np.node_mask))

    noise_rng = np.random.default_rng(args.noise_seed)
    losses, probes, cur_epoch = [], [], None
    t0 = time.time()
    for step, epoch, b in stream:
        if epoch != cur_epoch:
            cur_epoch = epoch
            f = cosine_lr_factor(epoch, args.epochs_for_schedule)
            for g, base in zip(opt.param_groups, base_lrs):
                g["lr"] = base * f
        nz = noise_for(noise_rng, b, objective)
        if step < args.skip_steps:
            continue  # stream/noise consumed; no compute
        z = torch.tensor(np.asarray(b.atom_type), dtype=torch.long)
        pos1 = torch.tensor(np.asarray(b.positions))
        mask = torch.tensor(np.asarray(b.node_mask))
        gmask = torch.tensor(np.asarray(b.graph_mask))
        pos2 = pos1 + args.sigma * torch.tensor(nz["view_eps"])

        g1, h1 = tw.schnet_forward(tp["model"], z, pos1, mask)
        g2, h2 = tw.schnet_forward(tp["model"], z, pos2, mask)
        if objective == "RR":
            g1n, g2n = tw.l2_normalize(g1), tw.l2_normalize(g2)
            l1 = tw.ae_loss(tp["AE_01"], g1n, g2n, gmask)
            l2 = tw.ae_loss(tp["AE_02"], g2n, g1n, gmask)
            loss = (l1 + l2) / 2
        else:
            sel = tw.combination_sel(mask)
            d1, _ = tw.pairwise_distances(pos1, mask)
            d2, _ = tw.pairwise_distances(pos2, mask)
            sig = torch.tensor(
                tw.sigma_ladder(10.0, 0.01, 50)[nz["level"]])
            l1 = tw.ncsnv3_loss(tp["NCSN_01"], h1, d2, sel, sig,
                                torch.tensor(nz["pair_eps1"]), gmask)
            l2 = tw.ncsnv3_loss(tp["NCSN_02"], h2, d1, sel, sig,
                                torch.tensor(nz["pair_eps2"]), gmask)
            loss = (l1 + l2) / 2
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if step % args.probe_every == 0 or step == args.steps - 1:
            with torch.no_grad():
                gp, _ = tw.schnet_forward(tp["model"], pz, ppos, pmask)
            probes.append({"step": step, **tw.repr_probe(gp.numpy())})
            print(f"[torch {objective}] step {step} loss {losses[-1]:.5f} "
                  f"norm {probes[-1]['mean_norm']:.4g} "
                  f"cos {probes[-1]['mean_pairwise_cos']:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if writer is not None:
                writer(losses, probes)  # partial result survives a kill
    return losses, probes


# ---------------------------------------------------------------- jax arm
def run_jax(args, module, params, extra_vars, stream, probe_np, writer=None):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from geossl_tpu.objectives import AutoEncoder, l2_normalize
    from geossl_tpu.objectives.ncsn import NCSNv3, sigma_ladder
    from geossl_tpu.objectives.pairs import pair_selection
    from geossl_tpu.ops import geometry
    from geossl_tpu.train import optim

    objective = args.objective
    emb = 128
    ae = AutoEncoder(emb_dim=emb) if objective == "RR" else None
    ncsn = NCSNv3(emb_dim=emb) if objective == "DDM" else None
    ladder = jnp.asarray(sigma_ladder(10.0, 0.01, 50))

    group_lr = ({"AE_01": 1.0 / args.lr, "AE_02": 1.0 / args.lr}
                if objective == "RR" else None)
    # steps_per_epoch for the per-epoch cosine: the schedule below is driven
    # by an explicit epoch scalar instead (bucketed epochs vary in length),
    # matching torch's per-epoch stepping exactly.
    tx = optim.make_optimizer(args.lr, args.epochs_for_schedule, 1,
                              0.0, "None", group_lr_factors=group_lr)
    opt_state = tx.init((params, extra_vars))

    def apply_backbone(mp, z, pos, mask):
        return module.apply({"params": mp}, z, pos, mask)

    def loss_fn(params_and_vars, batch, noise):
        p, variables = params_and_vars
        z, pos1, mask, gmask = batch
        pos2 = pos1 + args.sigma * noise["view_eps"]
        g1, h1 = apply_backbone(p["model"], z, pos1, mask)
        g2, h2 = apply_backbone(p["model"], z, pos2, mask)
        new_vars = variables
        if objective == "RR":
            g1n, g2n = l2_normalize(g1), l2_normalize(g2)
            out1 = ae.apply(
                {"params": p["AE_01"], "batch_stats": variables["AE_01"]},
                g1n, g2n, gmask, train=True, mutable=["batch_stats"])
            out2 = ae.apply(
                {"params": p["AE_02"], "batch_stats": variables["AE_02"]},
                g2n, g1n, gmask, train=True, mutable=["batch_stats"])
            loss = (out1[0] + out2[0]) / 2
            new_vars = {"AE_01": out1[1]["batch_stats"],
                        "AE_02": out2[1]["batch_stats"]}
        else:
            sel = pair_selection(mask, "combination", 1.0)
            d1, _ = geometry.pairwise_distances(pos1, mask)
            d2, _ = geometry.pairwise_distances(pos2, mask)
            sig = ladder[noise["level"]]
            l1 = ncsn.apply({"params": p["NCSN_01"]}, None, h1, d2, sel,
                            gmask, sigmas=sig, noise=noise["pair_eps1"])
            l2 = ncsn.apply({"params": p["NCSN_02"]}, None, h2, d1, sel,
                            gmask, sigmas=sig, noise=noise["pair_eps2"])
            loss = (l1 + l2) / 2
        return loss, new_vars

    import optax

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(pv, opt_state, batch, noise, lr_factor):
        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(pv, batch, noise)
        grads = (grads[0], jax.tree_util.tree_map(jnp.zeros_like, grads[1]))
        updates, opt_state = tx.update(grads, opt_state, pv)
        # per-epoch cosine applied as a multiplicative factor on the
        # constant-lr optimizer (exact for eta_min=0 — optim.py docstring)
        updates = jax.tree_util.tree_map(lambda u: u * lr_factor, updates)
        pv = optax.apply_updates(pv, updates)
        pv = (pv[0], new_vars)
        return pv, opt_state, loss

    probe = (jnp.asarray(probe_np.atom_type), jnp.asarray(probe_np.positions),
             jnp.asarray(probe_np.node_mask))
    probe_fn = jax.jit(lambda mp: apply_backbone(mp, *probe)[0])

    from experiments.torch_twin import repr_probe

    pv = (params, extra_vars)
    noise_rng = np.random.default_rng(args.noise_seed)
    # losses stay ON DEVICE (async dispatch) and come back in window fetches
    # — a per-step float() costs a ~10 ms tunnel roundtrip (CLAUDE.md)
    losses, pending, probes, t0 = [], [], [], time.time()

    def drain():
        nonlocal pending
        if pending:
            losses.extend(np.asarray(jnp.stack(pending)).tolist())
            pending = []

    for step, epoch, b in stream:
        nz = noise_for(noise_rng, b, objective)
        if step < args.skip_steps:
            continue  # stream/noise consumed; no compute
        batch = (jnp.asarray(b.atom_type), jnp.asarray(b.positions),
                 jnp.asarray(b.node_mask), jnp.asarray(b.graph_mask))
        nzj = {k: jnp.asarray(v) for k, v in nz.items()}
        f = cosine_lr_factor(epoch, args.epochs_for_schedule)
        pv, opt_state, loss = train_step(pv, opt_state, batch, nzj,
                                         jnp.float32(f))
        pending.append(loss)
        if args.save_params_every and step and \
                step % args.save_params_every == 0:
            snap = (args.out or "/tmp/overlay") + f".step{step}.npz"
            save_snapshot(snap, jax.device_get(pv[0]),
                          jax.device_get(pv[1]))
            print(f"[jax {objective}] snapshot {snap}", flush=True)
        if step % args.probe_every == 0 or step == args.steps - 1:
            drain()
            gp = np.asarray(probe_fn(pv[0]["model"]))
            probes.append({"step": step, **repr_probe(gp)})
            print(f"[jax {objective}] step {step} loss {losses[-1]:.5f} "
                  f"norm {probes[-1]['mean_norm']:.4g} "
                  f"cos {probes[-1]['mean_pairwise_cos']:.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if writer is not None:
                writer(losses, probes)  # partial result survives a kill
    drain()
    return losses, probes


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    elif args.arm in ("torch", "check"):
        jax.config.update("jax_platforms", "cpu")  # init/parity/probing only
    if args.arm == "check":
        jax.config.update("jax_enable_x64", True)

    loader = make_loader(args)
    module, params, extra_vars = init_params(args, args.objective)
    if args.init_params:
        params, extra_vars = load_snapshot(args.init_params)
        print(f"[overlay] initialized from {args.init_params}", flush=True)
    probe_np = probe_batch_np()
    stream = batch_stream(loader, args.steps)
    t0 = time.time()
    if args.arm == "check":
        run_check(args, module, params, extra_vars, stream)
        return
    out = args.out or (f"/root/corpora/overlay_{args.objective}_{args.arm}"
                       f"_{args.platform or 'default'}_s{args.noise_seed}.json")

    def write_out(losses, probes, done=False):
        # atomic replace so a kill mid-write can't corrupt the result
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump({
                "objective": args.objective, "arm": args.arm,
                "platform": args.platform or "default",
                "steps": args.steps, "noise_seed": args.noise_seed,
                "skip_steps": args.skip_steps,
                "init_params": args.init_params,
                "completed": bool(done),
                "protocol": {
                    "corpus": f"{args.data_root} subset {args.size}",
                    "batch_size": args.batch_size, "lr": args.lr,
                    "cosine_T_max_epochs": args.epochs_for_schedule,
                    "sigma": args.sigma, "mask_ratio": args.mask_ratio,
                    "rr_quirk": "AE heads at absolute lr 1.0" if
                                args.objective == "RR" else None,
                },
                "wall_s": round(time.time() - t0, 1),
                "losses": losses, "probes": probes,
            }, f)
        os.replace(tmp, out)

    if args.arm == "torch":
        losses, probes = run_torch(args, params, extra_vars, stream, probe_np,
                                   writer=write_out)
    else:
        losses, probes = run_jax(args, module, params, extra_vars, stream,
                                 probe_np, writer=write_out)
    write_out(losses, probes, done=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
