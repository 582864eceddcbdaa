"""Optimizer + LR schedules mirroring the reference's training setup.

Reference: Adam (``pretrain_GeoSSL.py:343``) with torch-style weight decay
(L2 added to the gradient, not decoupled), and per-epoch
``CosineAnnealingLR`` (``pretrain_GeoSSL.py:349-351``):
``lr_t = min_lr + (lr0 - min_lr)(1 + cos(pi * epoch / T_max)) / 2``,
stepped once per epoch.
"""

from __future__ import annotations

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


def make_optimizer(
    lr: float,
    epochs: int,
    steps_per_epoch: int,
    weight_decay: float = 0.0,
    scheduler: str = "CosineAnnealingLR",
    min_lr: float = 0.0,
    decay_factor: float = 0.5,
    decay_step_size: int = 100,
) -> optax.GradientTransformation:
    if scheduler == "CosineAnnealingLR":
        sched = cosine_annealing_schedule(lr, epochs, steps_per_epoch, min_lr)
    elif scheduler == "StepLR":
        sched = step_lr_schedule(lr, steps_per_epoch, decay_factor, decay_step_size)
    else:
        sched = lr
    chain = []
    if weight_decay > 0:
        # torch Adam's weight_decay: L2 term added to the raw gradient
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(sched))
    return optax.chain(*chain)
