"""3D InfoGraph: node-vs-graph mutual-information discrimination.

Reference: ``examples/pretrain_3DInfoGraph.py:19-76``. A bilinear
discriminator scores each node representation against a sigmoid graph
summary; positives use the node's own graph, negatives a cyclically shifted
graph's summary; BCE-with-logits on both.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from geossl_tpu.objectives.contrastive import cycle_shift


def _pyg_uniform(size: int):
    """PyG ``inits.uniform``: U(-1/sqrt(size), 1/sqrt(size))
    (``pretrain_3DInfoGraph.py:25-27``)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (size**0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class InfoGraphDiscriminator(nn.Module):
    """Bilinear score sum(x · (summary @ W)) (``pretrain_3DInfoGraph.py:19-31``)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x, summary):
        w = self.param(
            "weight", _pyg_uniform(self.hidden_dim), (self.hidden_dim, self.hidden_dim)
        )
        h = summary @ w
        return jnp.sum(x * h, axis=-1)


def infograph_loss(
    discriminator: InfoGraphDiscriminator,
    disc_params,
    node_repr: jnp.ndarray,  # [B, N, F]
    graph_repr: jnp.ndarray,  # [B, F]
    node_mask: jnp.ndarray,  # [B, N]
    graph_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``do_InfoGraph`` (``pretrain_3DInfoGraph.py:56-76``) on dense batches.

    Positive: every real node vs its own graph's sigmoid summary.
    Negative: vs the next graph's summary (cycle shift by 1). Mean BCE over
    real nodes for each term, summed.
    """
    summary = jax.nn.sigmoid(graph_repr)
    pos_summary = summary[:, None, :]  # broadcast over nodes
    neg_summary = cycle_shift(summary, 1)[:, None, :]

    def score(s):
        return discriminator.apply(
            {"params": disc_params}, node_repr, jnp.broadcast_to(s, node_repr.shape)
        )

    pos = score(pos_summary)  # [B, N]
    neg = score(neg_summary)

    w = node_mask.astype(jnp.float32)
    w_neg = w
    if graph_mask is not None:
        gm = graph_mask.astype(jnp.float32)
        w = w * gm[:, None]
        # a padded graph's (sigmoid-of-zero) summary must not act as a fake
        # negative for real nodes — the reference's batches are unpadded
        w_neg = w * cycle_shift(gm, 1)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    denom_neg = jnp.maximum(jnp.sum(w_neg), 1.0)
    loss_pos = jnp.sum(optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos)) * w) / denom
    loss_neg = jnp.sum(optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg)) * w_neg) / denom_neg
    loss = loss_pos + loss_neg
    acc = (jnp.sum((pos > 0) * w) + jnp.sum((neg < 0) * w_neg)) / (denom + denom_neg)
    return loss, acc
