"""AutoEncoder for the GeoSSL-RR (representation reconstruction) objective.

The reference imports ``AutoEncoder`` (``pretrain_GeoSSL.py:17,320-321``) but
the class is absent from this checkout (SURVEY.md §2.9) — it comes from the
GraphMVP lineage: an MLP that reconstructs the *other* view's graph
representation, with an l1/l2/cosine criterion and a detached target
(flags ``--AE_loss --detach_target --beta``, ``config.py:178-182``).
Reconstruction per that lineage: Linear -> BatchNorm -> ReLU -> Linear.

Padding-aware: the dense batch layout can contain empty graph slots
(``graph_mask`` False). Both the BatchNorm statistics and the loss reduction
ignore those rows, so a padded final batch gives bit-identical results to the
unpadded one (tests/test_objectives.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from geossl_tpu.models.common import xavier_uniform, zeros_init


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over [B, F] rows whose statistics skip masked-out rows.

    Semantics match ``nn.BatchNorm`` (momentum 0.99, eps 1e-5, running
    stats in the ``batch_stats`` collection) with a row-weight mask.
    """

    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, graph_mask=None, use_running_average: bool = False):
        f = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if graph_mask is None:
                w = jnp.ones(x.shape[:-1], x.dtype)
            else:
                w = graph_mask.astype(x.dtype)
            tot = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w[..., None], axis=0) / tot
            var = jnp.sum(((x - mean) ** 2) * w[..., None], axis=0) / tot
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class AutoEncoder(nn.Module):
    """``AE_loss(x, y)``: reconstruct target y from input x.

    Call with ``train=True`` inside a module context that allows
    ``batch_stats`` mutation. ``graph_mask`` marks real rows; padded slots
    contribute to neither the BatchNorm statistics nor the loss.
    """

    emb_dim: int = 128
    loss: str = "l2"  # {"l1", "l2", "cosine"}
    detach_target: bool = True

    @nn.compact
    def __call__(self, x, y, graph_mask=None, train: bool = True):
        h = nn.Dense(self.emb_dim, kernel_init=xavier_uniform, bias_init=zeros_init)(x)
        h = MaskedBatchNorm()(h, graph_mask, use_running_average=not train)
        h = jax.nn.relu(h)
        recon = nn.Dense(
            self.emb_dim, kernel_init=xavier_uniform, bias_init=zeros_init
        )(h)

        if self.detach_target:
            y = jax.lax.stop_gradient(y)

        if self.loss == "l2":
            per = jnp.mean((recon - y) ** 2, axis=-1)
        elif self.loss == "l1":
            per = jnp.mean(jnp.abs(recon - y), axis=-1)
        elif self.loss == "cosine":
            num = jnp.sum(recon * y, axis=-1)
            den = jnp.maximum(
                jnp.linalg.norm(recon, axis=-1) * jnp.linalg.norm(y, axis=-1), 1e-8
            )
            per = -num / den
        else:
            raise ValueError(f"unknown AE loss {self.loss!r}")
        if graph_mask is None:
            return jnp.mean(per)
        gm = graph_mask.astype(per.dtype)
        return jnp.sum(per * gm) / jnp.maximum(jnp.sum(gm), 1.0)
