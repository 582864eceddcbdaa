"""AutoEncoder for the GeoSSL-RR (representation reconstruction) objective.

The reference imports ``AutoEncoder`` (``pretrain_GeoSSL.py:17,320-321``) but
the class is absent from this checkout (SURVEY.md §2.9) — it comes from the
GraphMVP lineage: an MLP that reconstructs the *other* view's graph
representation, with an l1/l2/cosine criterion and a detached target
(flags ``--AE_loss --detach_target --beta``, ``config.py:178-182``).
Reconstruction per that lineage: Linear -> BatchNorm -> ReLU -> Linear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from geossl_tpu.models.common import xavier_uniform, zeros_init


class AutoEncoder(nn.Module):
    """``AE_loss(x, y)``: reconstruct target y from input x.

    Call with ``train=True`` inside a module context that allows
    ``batch_stats`` mutation.
    """

    emb_dim: int = 128
    loss: str = "l2"  # {"l1", "l2", "cosine"}
    detach_target: bool = True

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        h = nn.Dense(self.emb_dim, kernel_init=xavier_uniform, bias_init=zeros_init)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
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
        return jnp.mean(per)
