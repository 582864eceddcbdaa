"""Shared driver plumbing: backbone construction, train state, step builders.

Mirrors the reference's per-script ``model_setup()`` dispatch
(``pretrain_GeoSSL.py:22-45``): only SchNet and PaiNN are runnable backbones.
"""

from __future__ import annotations

import argparse
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from geossl_tpu.config import Config, ModelConfig
from geossl_tpu.models.painn import PaiNN
from geossl_tpu.models.schnet import SchNet
from geossl_tpu.train import optim


class LinearHead(nn.Module):
    """``graph_pred_linear`` for SchNet downstream tasks:
    ``torch.nn.Linear(emb, 1)`` (``finetune_qm9.py:113``)."""

    @nn.compact
    def __call__(self, x):
        from geossl_tpu.models.common import Dense

        return Dense(1)(x)[..., 0]


class DualHead(nn.Module):
    """LEP's ``graph_pred_linear``: ``Linear(2·emb -> 1)`` on concatenated
    tower representations, for BOTH backbones (``finetune_lep.py:34-45``,
    ``:194-206``)."""

    @nn.compact
    def __call__(self, repr_active, repr_inactive):
        from geossl_tpu.models.common import Dense

        x = jnp.concatenate([repr_active, repr_inactive], axis=-1)
        return Dense(1)(x)[..., 0]


class PaiNNHead(nn.Module):
    """``graph_pred_linear`` for PaiNN downstream tasks: the backbone's
    ``create_output_layers()`` halving-width silu MLP
    (``painn.py:205-213`` → ``painn_utils.build_mlp``; emb → emb/2 → 1)."""

    emb_dim: int = 128

    @nn.compact
    def __call__(self, x):
        from geossl_tpu.models.common import HalvingMLP

        return HalvingMLP(self.emb_dim, 1)(x)[..., 0]


def make_head(model_3d: str, emb_dim: int) -> nn.Module:
    """The reference's per-backbone downstream head (QM9/MD17/LBA drivers;
    LEP uses a Linear(2·emb → 1) dual head for BOTH backbones,
    ``finetune_lep.py:194-206``)."""
    if model_3d == "schnet":
        return LinearHead()
    return PaiNNHead(emb_dim)


def make_backbone(cfg: ModelConfig):
    """Returns (module, apply) where
    ``apply(params, atom_type, positions, node_mask, pair_mask=None)``
    -> (graph_repr [B,F], node_repr [B,N,F]) for either backbone."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    # config uses strings; the model knob is "auto"/True/False
    sparse = {"auto": "auto", "on": True, "off": False}[cfg.sparse_tiles]
    if cfg.model_3d == "schnet":
        s = cfg.schnet
        module = SchNet(
            hidden_channels=cfg.emb_dim,
            num_filters=s.num_filters,
            num_interactions=s.num_interactions,
            num_gaussians=s.num_gaussians,
            cutoff=s.cutoff,
            node_class=s.node_class,
            readout=s.readout,
            max_neighbors=cfg.max_neighbors,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            filter_mxu=cfg.filter_mxu,
            sparse=sparse,
            pair_axis=cfg.pair_axis,
        )

        def apply(params, atom_type, positions, node_mask, pair_mask=None):
            return module.apply({"params": params}, atom_type, positions, node_mask)

    elif cfg.model_3d == "painn":
        p = cfg.painn
        module = PaiNN(
            n_atom_basis=cfg.emb_dim,
            n_interactions=p.n_interactions,
            n_rbf=p.n_rbf,
            cutoff=p.cutoff,
            readout=p.readout,
            max_z=p.max_z,
            shared_interactions=p.shared_interactions,
            shared_filters=p.shared_filters,
            epsilon=p.epsilon,
            max_neighbors=cfg.max_neighbors,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
            sparse=sparse,
            pair_axis=cfg.pair_axis,
        )

        def apply(params, atom_type, positions, node_mask, pair_mask=None):
            return module.apply(
                {"params": params}, atom_type, positions, node_mask, pair_mask
            )

    else:
        raise ValueError(f"3D model {cfg.model_3d!r} not included.")
    return module, apply


def init_backbone(module, rng, n_max: int = 32, batch: int = 2):
    z = jnp.zeros((batch, n_max), jnp.int32)
    pos = jnp.zeros((batch, n_max, 3), jnp.float32)
    # two real atoms per graph so every code path traces
    mask = jnp.zeros((batch, n_max), bool).at[:, :2].set(True)
    pos = pos.at[:, 1, 0].set(1.0)
    return module.init(rng, z, pos, mask)["params"]


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @staticmethod
    def create(params, tx: optax.GradientTransformation):
        return TrainState(
            params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
        )


def apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return TrainState(
        params=optax.apply_updates(state.params, updates),
        opt_state=new_opt,
        step=state.step + 1,
    )


def accum_groups(batch_iter, k: int):
    """Group consecutive same-shape batches into stacked microbatch groups.

    Yields ``(stacked, count)`` where ``stacked`` is the batch pytree with a
    new leading axis of ``count <= k`` microbatches. A padded-bucket shape
    change mid-epoch flushes the open group (microbatches of different
    padded widths cannot share one compiled program), as does end-of-epoch,
    so partial groups occur; pair them with a ``static_argnums`` count.
    """
    pending, shapes = [], None

    def flush():
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pending)
        return stacked, len(pending)

    for b in batch_iter:
        s = tuple(x.shape for x in jax.tree_util.tree_leaves(b))
        if pending and s != shapes:
            yield flush()
            pending = []
        pending.append(b)
        shapes = s
        if len(pending) == k:
            yield flush()
            pending = []
    if pending:
        yield flush()


def scan_mean(body_fn, stacked, k: int):
    """Elementwise-mean pytree of ``body_fn(microbatch, i)`` over the ``k``
    stacked microbatches.

    The gradient-accumulation core: a ``lax.scan`` keeps ONE microbatch of
    activations live, so the effective batch ``k * microbatch`` trains in
    the memory footprint of one microbatch — how a TPU chip runs effective
    batches its HBM cannot hold at once (e.g. Atom3D N=512 complexes, or
    the giant-graph shapes of docs/PERF.md's kexp8 ladder). For losses that
    are means over equal-size microbatches, the averaged gradients equal
    the full-batch gradient exactly.
    """
    first = jax.tree_util.tree_map(lambda x: x[0], stacked)
    out_sd = jax.eval_shape(body_fn, first, jnp.zeros((), jnp.int32))
    zero = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), out_sd
    )

    def body(carry, xs):
        i, mb = xs
        return jax.tree_util.tree_map(jnp.add, carry, body_fn(mb, i)), None

    total, _ = jax.lax.scan(body, zero, (jnp.arange(k), stacked))
    return jax.tree_util.tree_map(lambda t: t / k, total)


def make_chain_step(step_body):
    """Fuse ``k`` optimizer steps into ONE dispatch (``--steps_per_call``).

    ``step_body(state, batch, *extra) -> (state, loss)`` is scanned over a
    stacked batch group (leading axis ``k``, from :func:`accum_groups`).
    Unlike ``--grad_accum`` this changes NOTHING about the math — the
    parameter trajectory is the sequential loop's exactly (same steps, same
    order); the only effect is amortizing the ~8-10 ms per-dispatch latency
    of a remote-TPU tunnel (docs/PERF.md). Returns
    ``chain_step(state, stacked, k, *extra) -> (state, losses [k])``; wrap
    in ``jax.jit(..., static_argnums=(2,), donate_argnums=(0,))`` at the
    driver.
    """

    def chain_step(state, stacked, k, *extra):
        def body(st, batch):
            return step_body(st, batch, *extra)

        return jax.lax.scan(body, state, stacked, length=k)

    return chain_step


def check_chain_args(args) -> None:
    """--grad_accum and --steps_per_call both consume loader-batch groups
    and compose confusingly (k*k' batches per dispatch); refuse the mix."""
    if getattr(args, "grad_accum", 1) > 1 and \
            getattr(args, "steps_per_call", 1) > 1:
        raise SystemExit(
            "--grad_accum fuses loader batches into ONE optimizer step; "
            "--steps_per_call fuses optimizer steps into one dispatch — "
            "pick one"
        )


def opt_steps_per_epoch(num_batches: int, grad_accum: int) -> int:
    """Optimizer steps per epoch under gradient accumulation (for the
    per-epoch LR schedules): ceil(batches / k)."""
    return -(-num_batches // max(grad_accum, 1))


def graph_masked_mean(per_graph: jnp.ndarray, graph_mask) -> jnp.ndarray:
    if graph_mask is None:
        return jnp.mean(per_graph)
    gm = graph_mask.astype(per_graph.dtype)
    return jnp.sum(per_graph * gm) / jnp.maximum(jnp.sum(gm), 1.0)


class EpochTimer:
    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start


class MetricLogger:
    """Machine-readable run history: one JSON line per epoch appended to
    ``--log_file`` (the reference's only record is stdout prints captured
    into SLURM ``result.out`` files — sweep tooling has to grep them).
    Disabled when the path is empty; resume appends to the existing file."""

    def __init__(self, path: str = ""):
        self.path = path

    def log(self, **fields) -> None:
        if not self.path or jax.process_index() != 0:
            return
        import json
        import math
        import os

        # strict JSON: inf/nan (e.g. best-metric sentinel with saving
        # disabled, ROC on a one-class val split) become null
        fields = {
            k: (None if isinstance(v, float) and not math.isfinite(v) else v)
            for k, v in fields.items()
        }
        d = os.path.dirname(self.path)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(fields) + "\n")


def setup_platform(args) -> None:
    """Pin the JAX platform before any backend initialization (the TPU PJRT
    plugin in some images overrides JAX_PLATFORMS at interpreter startup, so
    the config API is the only reliable switch) and enable the persistent
    compilation cache — first TPU compiles can cost minutes per program."""
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "coordinator_address", None):
        from geossl_tpu.parallel import multihost

        multihost.initialize(
            args.coordinator_address, args.num_processes, args.process_id,
            local_device_count=getattr(args, "local_device_count", None),
        )
    import os

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "jax"),
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass  # cache is best-effort


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu", "axon"],
                   help="force a JAX platform (default: auto)")
    p.add_argument("--model_3d", default="schnet", choices=["schnet", "painn"])
    p.add_argument("--emb_dim", type=int, default=128)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--decay", type=float, default=0.0)
    p.add_argument("--lr_scheduler", default="CosineAnnealingLR",
                   choices=list(optim.SCHEDULERS),
                   help="CosineAnnealingLR (per-epoch cosine, the published "
                        "default), CosineAnnealingWarmRestarts (per-step "
                        "cosine, eta_min=1e-4), StepLR, ReduceLROnPlateau "
                        "(on mean train loss), or None (constant)")
    # scheduler knobs (reference examples/config.py:99-102, same defaults)
    p.add_argument("--lr_decay_factor", type=float, default=0.5,
                   help="StepLR gamma / ReduceLROnPlateau factor")
    p.add_argument("--lr_decay_step_size", type=int, default=100,
                   help="StepLR step size (epochs)")
    p.add_argument("--lr_decay_patience", type=int, default=50,
                   help="ReduceLROnPlateau patience (epochs)")
    p.add_argument("--min_lr", type=float, default=1e-6,
                   help="ReduceLROnPlateau lr floor")
    p.add_argument("--data_root", default="data")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic stand-in dataset (no downloads)")
    p.add_argument("--synthetic_size", type=int, default=256)
    p.add_argument("--synthetic_max_atoms", type=int, default=29,
                   help="largest synthetic molecule; >32 spans multiple "
                        "padding buckets (pretrain corpora only)")
    p.add_argument("--output_model_dir", default="")
    p.add_argument("--input_model_file", default="")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    # multi-host (multi-process) SPMD: one process per TPU host, same flags
    # on every process except --process_id (parallel/multihost.py)
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 — enables jax.distributed "
                        "multi-host SPMD; the mesh spans every process's "
                        "devices")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--local_device_count", type=int, default=None,
                   help="devices this process contributes (testing: virtual "
                        "CPU devices per process; real TPU hosts: leave "
                        "unset)")
    p.add_argument("--bucket", type=int, nargs="+", default=[32, 64, 128],
                   help="padded bucket size(s); molecules fall into the "
                        "smallest bucket that fits. The default ladder covers "
                        "Molecule3D's size range; QM9/MD17 use only the 32 "
                        "bucket of it (unused buckets cost nothing)")
    # model hyperparameters (reference examples/config.py:111-121) — every
    # knob the published sweep scripts vary must be expressible as a flag
    p.add_argument("--num_filters", type=int, default=128)
    p.add_argument("--num_interactions", type=int, default=6)
    p.add_argument("--num_gaussians", type=int, default=51)
    p.add_argument("--cutoff", type=float, default=10.0)
    p.add_argument("--readout", default="mean", choices=["mean", "add"])
    p.add_argument("--painn_radius_cutoff", type=float, default=5.0)
    p.add_argument("--painn_n_interactions", type=int, default=3)
    p.add_argument("--painn_n_rbf", type=int, default=20)
    p.add_argument("--painn_readout", default="add", choices=["mean", "add"])
    p.add_argument("--max_num_neighbors", type=int, default=None,
                   help="cap on neighbors per atom: keep the k NEAREST "
                        "in-cutoff neighbors (checkpoint-parity knob for "
                        "torch_cluster's default max_num_neighbors=32 "
                        "truncation; matters only at LBA/LEP density). "
                        "Default: full neighborhoods")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--filter_mxu", default="f32", choices=["f32", "bf16"],
                   help="SchNet filter-MLP matmul precision; bf16 = "
                        "half-precision MXU operands with f32 accumulation "
                        "(measured NEUTRAL on v5e at both N=32 and N=512 — "
                        "see docs/PERF.md; kept for other hardware)")
    p.add_argument("--log_file", default="",
                   help="append one JSON line of metrics per epoch (plus a "
                        "final-summary line) to this path — machine-readable "
                        "run history for sweep tooling")
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace of the first training "
                        "epoch into this directory (TensorBoard/xprof)")
    p.add_argument("--use_pallas", default="auto", choices=["auto", "on", "off"],
                   help="fused Pallas kernels (auto: on for TPU backends; "
                        "both support second-order AD for MD17 forces)")
    p.add_argument("--sparse_tiles", default="auto",
                   choices=["auto", "on", "off"],
                   help="occupancy-gated pair tiles in the fused kernels: "
                        "skip tiles whose envelope/gate block is all zero "
                        "(out-of-cutoff + padding; ~half of all tiles at "
                        "Atom3D density). auto = on for N>=128 pair grids. "
                        "Outputs are identical either way")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over k same-shape loader "
                        "batches before each optimizer step (lax.scan: one "
                        "microbatch of activations live) — effective batch "
                        "= k * --batch_size in the memory of one microbatch. "
                        "Exactly equal to the large batch for the mean "
                        "losses used here")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="fuse k optimizer steps into ONE device dispatch "
                        "(lax.scan over stacked batches). Pure dispatch-"
                        "level optimization — the parameter trajectory "
                        "equals the unfused loop's; amortizes the ~8-10 ms "
                        "per-dispatch tunnel latency. Incompatible with "
                        "--grad_accum")
    p.add_argument("--ckpt_every", type=int, default=1,
                   help="write the full resume state (params + optimizer + "
                        "epoch + best metrics) every k epochs; the state "
                        "fetch costs ~0.2 s through a remote-TPU tunnel — "
                        "negligible at corpus scale. Best-model saves are "
                        "unaffected")
    p.add_argument("--resume", action="store_true",
                   help="resume from <output_model_dir>/state.ckpt if present "
                        "(the reference restarts killed jobs from scratch)")
    return p


def try_resume(args, state, mesh, higher_is_better: bool = False):
    """Shared --resume wiring for every driver.

    Returns ``(state, start_epoch, best_metric, extra, state_path)`` —
    ``state_path`` is empty when no --output_model_dir was given (state
    checkpointing disabled), ``best_metric``/``extra`` come from the resume
    file or are the fresh-start defaults.
    """
    import os

    from geossl_tpu.parallel import mesh as pmesh
    from geossl_tpu.train import checkpoints

    state_path = (
        os.path.join(args.output_model_dir, "state.ckpt")
        if args.output_model_dir else ""
    )
    best = -float("inf") if higher_is_better else float("inf")
    start_epoch, extra = 1, {}
    if getattr(args, "resume", False) and state_path:
        # the resume DECISION must agree across processes: on a pod without
        # a shared filesystem only process 0 has state.ckpt, and a silent
        # split (p0 at epoch N+1, others at 1) deadlocks the collectives
        from geossl_tpu.parallel import multihost

        multihost.assert_host_agreement(
            "resume checkpoint exists", float(os.path.exists(state_path)))
    if getattr(args, "resume", False) and state_path and os.path.exists(state_path):
        state, last_epoch, best, extra = checkpoints.load_train_state(
            state_path, state)
        state = jax.device_put(state, pmesh.replicated(mesh))
        start_epoch = last_epoch + 1
        print(f"Resumed from {state_path} at epoch {last_epoch} "
              f"(best {best:.5f})")
    return state, start_epoch, best, extra, state_path


def maybe_save_state(args, state_path, state, epoch, best_metric,
                     extra=None) -> None:
    """Write the resume state on the --ckpt_every cadence (and always on the
    final epoch)."""
    from geossl_tpu.train import checkpoints

    if state_path and (epoch % max(getattr(args, "ckpt_every", 1), 1) == 0
                       or epoch == args.epochs):
        checkpoints.save_train_state(state_path, state, epoch, best_metric,
                                     extra)


def make_optimizer_from_args(args, steps_per_epoch: int,
                             group_lr_factors: dict | None = None):
    """The one optimizer construction every driver shares: Adam + the
    --lr_scheduler choice with its knobs (reference config.py:98-102).
    ``group_lr_factors`` maps top-level param keys to per-group lr factors
    (torch param groups, pretrain_GeoSSL.py:333-343)."""
    return optim.make_optimizer(
        args.lr, args.epochs, steps_per_epoch, args.decay, args.lr_scheduler,
        decay_factor=args.lr_decay_factor,
        decay_step_size=args.lr_decay_step_size,
        group_lr_factors=group_lr_factors,
    )


def make_plateau(args, extra=None) -> "optim.PlateauController | None":
    """ReduceLROnPlateau host controller, or None for every other scheduler.
    ``extra`` (the resume checkpoint's scalar dict) restores best/bad-epoch
    counters so a resumed run continues the same plateau trajectory."""
    # ALWAYS consume the plateau_* keys so drivers that treat the remaining
    # extra dict as their own metrics (finetune_lba/lep) stay clean — also
    # when resuming a plateau checkpoint under a different --lr_scheduler
    plateau_state = {}
    if extra:
        plateau_state = {k: extra.pop(k) for k in list(extra)
                         if k.startswith("plateau_")}
    if getattr(args, "lr_scheduler", None) != "ReduceLROnPlateau":
        return None
    ctl = optim.PlateauController(
        args.lr, factor=args.lr_decay_factor,
        patience=args.lr_decay_patience, min_lr=args.min_lr)
    ctl.load(plateau_state)
    return ctl


def plateau_update(state, ctl, train_loss: float):
    """Per-epoch ReduceLROnPlateau step (torch: ``lr_scheduler.step(loss_acc)``
    after each train epoch, finetune_qm9.py:272-273). No-op chain stage
    rewrite unless the controller actually changed the multiplier."""
    if ctl is None:
        return state
    old = ctl.scale
    new = ctl.step(train_loss)
    if new != old:
        state = optim.set_plateau_scale(state, new)
    return state


def buckets(args) -> tuple:
    """Sorted bucket ladder from --bucket (int or list)."""
    b = args.bucket
    if isinstance(b, int):
        b = [b]
    return tuple(sorted(b))


def round_batch_to_mesh(batch_size: int, mesh) -> int:
    """Pad the batch size up to a multiple of the data-parallel mesh so the
    leading-axis sharding always divides evenly (loaders pad partial batches
    with graph_mask=False slots)."""
    return batch_size + (-batch_size) % mesh.size


def _resolve_use_pallas(args, allow: bool = True) -> bool:
    mode = getattr(args, "use_pallas", "off")
    if not allow or mode == "off":
        return False
    if mode == "on":
        return True
    import jax as _jax

    return _jax.default_backend() == "tpu"


def model_config_from_args(args, allow_pallas: bool = True) -> ModelConfig:
    from geossl_tpu.config import PaiNNConfig, SchNetConfig

    d = SchNetConfig()
    schnet = SchNetConfig(
        hidden_channels=args.emb_dim,
        num_filters=getattr(args, "num_filters", d.num_filters),
        num_interactions=getattr(args, "num_interactions", d.num_interactions),
        num_gaussians=getattr(args, "num_gaussians", d.num_gaussians),
        cutoff=getattr(args, "cutoff", d.cutoff),
        readout=getattr(args, "readout", d.readout),
    )
    pd = PaiNNConfig()
    painn = PaiNNConfig(
        n_atom_basis=args.emb_dim,
        n_interactions=getattr(args, "painn_n_interactions", pd.n_interactions),
        n_rbf=getattr(args, "painn_n_rbf", pd.n_rbf),
        cutoff=getattr(args, "painn_radius_cutoff", pd.cutoff),
        readout=getattr(args, "painn_readout", pd.readout),
    )
    return ModelConfig(
        model_3d=args.model_3d,
        emb_dim=args.emb_dim,
        schnet=schnet,
        painn=painn,
        compute_dtype=args.compute_dtype,
        filter_mxu=getattr(args, "filter_mxu", "f32"),
        use_pallas=_resolve_use_pallas(args, allow_pallas),
        max_neighbors=getattr(args, "max_num_neighbors", None),
        sparse_tiles=getattr(args, "sparse_tiles", "auto"),
    )
