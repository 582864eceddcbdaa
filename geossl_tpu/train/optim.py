"""Optimizer + LR schedules mirroring the reference's training setup.

Reference: Adam (``pretrain_GeoSSL.py:343``) with torch-style weight decay
(L2 added to the gradient, not decoupled), and per-epoch
``CosineAnnealingLR`` (``pretrain_GeoSSL.py:349-351``):
``lr_t = min_lr + (lr0 - min_lr)(1 + cos(pi * epoch / T_max)) / 2``,
stepped once per epoch.

The fine-tune drivers additionally expose the reference's other two
schedulers (``finetune_qm9.py:503-523``, same ladder in md17/lba/lep):

- ``CosineAnnealingWarmRestarts(optimizer, T_0=epochs, eta_min=1e-4)``,
  stepped per BATCH with a fractional epoch *after* ``optimizer.step()``
  (``finetune_qm9.py:266-267``) — so optimizer step ``g`` runs at the lr
  set by batch ``g-1``. With ``T_0 = epochs`` no restart ever fires inside
  a run; it is a per-step (rather than per-epoch-quantized) cosine.
- ``ReduceLROnPlateau(optimizer, factor, patience, min_lr)``, stepped once
  per epoch with the mean train loss (``finetune_qm9.py:272-273``). Loss-
  dependent lr cannot be a pure ``schedule(step)`` under jit, so it is a
  final update-scaling stage in the optax chain (:func:`scale_by_plateau`)
  whose scalar the host-side :class:`PlateauController` rewrites between
  epochs — scaling Adam's output by ``s`` is exactly running it at
  ``lr * s`` (the lr multiplies the normalized update last).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def cosine_annealing_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, min_lr: float = 0.0
):
    """Per-epoch cosine annealing (torch semantics: constant within an epoch,
    epoch 0 uses base_lr)."""

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), epochs)
        return min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / epochs)
        )

    return schedule


def step_lr_schedule(
    base_lr: float, steps_per_epoch: int, decay_factor: float, decay_step_size: int
):
    """torch StepLR equivalent (``config.py:98-100``)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * decay_factor ** (epoch // decay_step_size)

    return schedule


def cosine_warm_restarts_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, eta_min: float = 1e-4
):
    """torch ``CosineAnnealingWarmRestarts(T_0=epochs, eta_min=1e-4)`` under
    the reference's per-batch post-step call pattern
    (``finetune_qm9.py:266-267``): optimizer step ``g`` (0-based) runs at
    the lr written by the previous batch's ``step(epoch-1+s/num_iters)``,
    i.e. fractional epoch ``(g-1)/steps_per_epoch``; step 0 runs at the
    construction lr (T_cur=0 -> base_lr)."""

    def schedule(step):
        t = jnp.maximum(step - 1, 0) / max(steps_per_epoch, 1)
        t_cur = jnp.mod(t, epochs)  # T_mult=1: restart every `epochs` epochs
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t_cur / epochs)
        )

    return schedule


class PlateauScaleState(NamedTuple):
    """Optax state for :func:`scale_by_plateau` — ``lr_effective = lr * scale``."""

    scale: jnp.ndarray


def scale_by_plateau() -> optax.GradientTransformation:
    """Final chain stage that multiplies the (already lr-scaled) update by a
    host-controlled scalar. The scalar lives in the optimizer state, so it
    checkpoints/restores with the rest of the train state and is rewritten
    between epochs via :func:`set_plateau_scale`."""

    def init(params):
        del params
        return PlateauScaleState(scale=jnp.ones((), jnp.float32))

    def update(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(lambda u: u * state.scale, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def set_plateau_scale(state, scale: float):
    """Rewrite every :class:`PlateauScaleState` leaf in ``state.opt_state``
    (TrainState -> TrainState). Placement-preserving: the new scalar is
    device_put with the old leaf's sharding so donated jit steps keep their
    compiled layout."""

    def repl(node):
        if not isinstance(node, PlateauScaleState):
            return node  # ordinary leaf (is_leaf=False path): untouched
        new = jnp.asarray(scale, jnp.float32)
        try:
            new = jax.device_put(new, node.scale.sharding)
        except (AttributeError, ValueError):
            pass  # host template / uncommitted leaf: plain array is fine
        return PlateauScaleState(scale=new)

    new_opt = jax.tree_util.tree_map(
        repl, state.opt_state,
        is_leaf=lambda x: isinstance(x, PlateauScaleState),
    )
    return state.replace(opt_state=new_opt)


class PlateauController:
    """Host-side ``torch.optim.lr_scheduler.ReduceLROnPlateau`` semantics
    (mode='min', threshold=1e-4 rel, cooldown=0 — torch defaults; the
    reference passes only factor/patience/min_lr, ``finetune_qm9.py:519-521``).

    ``step(loss)`` returns the current lr *multiplier* (lr/base_lr); feed it
    to :func:`set_plateau_scale` once per epoch. State round-trips through
    the resume checkpoints' flat-float ``extra`` dict via state()/load()."""

    def __init__(self, base_lr: float, factor: float = 0.5,
                 patience: int = 50, min_lr: float = 1e-6,
                 threshold: float = 1e-4):
        if not 0.0 < factor < 1.0:
            raise ValueError(f"plateau factor must be in (0,1), got {factor}")
        self.base_lr = float(base_lr)
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.threshold = float(threshold)
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, loss: float) -> float:
        loss = float(loss)
        # torch rel/min: better iff loss < best * (1 - threshold)
        if loss < self.best * (1.0 - self.threshold):
            self.best = loss
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            old_lr = self.base_lr * self.scale
            new_lr = max(old_lr * self.factor, self.min_lr)
            if old_lr - new_lr > 1e-8:  # torch eps gate
                self.scale = new_lr / self.base_lr
            self.num_bad = 0
        return self.scale

    def state(self) -> dict:
        return {"plateau_best": self.best, "plateau_bad": float(self.num_bad),
                "plateau_scale": self.scale}

    def load(self, extra: dict) -> None:
        if "plateau_best" in extra:
            self.best = float(extra["plateau_best"])
            self.num_bad = int(extra.get("plateau_bad", 0))
            self.scale = float(extra.get("plateau_scale", 1.0))


def scale_by_group(factors: dict) -> optax.GradientTransformation:
    """torch per-param-group lr: scale each top-level param subtree's
    (already Adam-normalized, lr-multiplied) update by ``factors[key]`` —
    running group ``key`` at ``lr * factor``. Keys are matched against the
    FIRST dict level of the update pytree (the drivers' param trees are
    ``{"model": ..., "NCSN_01": ...}``, optionally tuple-wrapped); groups
    not named keep their update bitwise-unchanged.

    Reference analog: ``optim.Adam(model_param_group, lr=args.lr)`` with
    per-group ``"lr":`` overrides (``pretrain_GeoSSL.py:333-343``). torch's
    schedulers multiply every group by the same factor, so composing this
    with the schedule is exact for MULTIPLICATIVE schedules
    (CosineAnnealingLR with eta_min=0, StepLR, None). It is NOT exact for
    the two anchored ones — torch pins CosineAnnealingWarmRestarts'
    eta_min=1e-4 and ReduceLROnPlateau's min_lr floor per group's own base
    lr, while this factor multiplies post-schedule — so
    :func:`make_optimizer` rejects those combinations outright."""
    factors = {k: float(v) for k, v in factors.items()}

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def f(path, u):
            # Match ONLY the top-level dict of the params element: path[0]
            # is the DictKey, or SequenceKey(0) then the DictKey for the
            # tuple-wrapped (params, extra_vars) trees — extra_vars subtrees
            # (batch_stats pseudo-updates) must never be scaled even when
            # they share a group name like "AE_01".
            key = None
            if path and isinstance(path[0], jax.tree_util.DictKey):
                key = path[0].key
            elif (len(path) >= 2
                  and isinstance(path[0], jax.tree_util.SequenceKey)
                  and path[0].idx == 0
                  and isinstance(path[1], jax.tree_util.DictKey)):
                key = path[1].key
            fac = factors.get(key, 1.0) if key is not None else 1.0
            return u if fac == 1.0 else u * fac

        return jax.tree_util.tree_map_with_path(f, updates), state

    return optax.GradientTransformation(init, update)


SCHEDULERS = ("CosineAnnealingLR", "CosineAnnealingWarmRestarts", "StepLR",
              "ReduceLROnPlateau", "None")


def make_optimizer(
    lr: float,
    epochs: int,
    steps_per_epoch: int,
    weight_decay: float = 0.0,
    scheduler: str = "CosineAnnealingLR",
    min_lr: float = 0.0,
    decay_factor: float = 0.5,
    decay_step_size: int = 100,
    group_lr_factors: dict | None = None,
) -> optax.GradientTransformation:
    if group_lr_factors and scheduler in ("CosineAnnealingWarmRestarts",
                                          "ReduceLROnPlateau"):
        # torch anchors these schedules' floors (eta_min / min_lr) per
        # group's own base lr; a post-schedule multiplicative factor cannot
        # reproduce that (see scale_by_group). No reference sweep combines
        # them (the RR script uses CosineAnnealingLR) — fail loudly rather
        # than silently diverge.
        raise ValueError(
            f"per-group lr factors are not torch-exact under {scheduler} "
            "(anchored eta_min/min_lr floors); use CosineAnnealingLR, "
            "StepLR, or None")
    if scheduler == "CosineAnnealingLR":
        sched = cosine_annealing_schedule(lr, epochs, steps_per_epoch, min_lr)
    elif scheduler == "CosineAnnealingWarmRestarts":
        # reference hardcodes eta_min=1e-4 (finetune_qm9.py:509-511)
        sched = cosine_warm_restarts_schedule(lr, epochs, steps_per_epoch)
    elif scheduler == "StepLR":
        sched = step_lr_schedule(lr, steps_per_epoch, decay_factor, decay_step_size)
    else:
        # constant lr; ReduceLROnPlateau scales the update post-Adam instead
        sched = lr
    chain = []
    if weight_decay > 0:
        # torch Adam's weight_decay: L2 term added to the raw gradient
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(sched))
    if group_lr_factors:
        chain.append(scale_by_group(group_lr_factors))
    if scheduler == "ReduceLROnPlateau":
        chain.append(scale_by_plateau())
    return optax.chain(*chain)
