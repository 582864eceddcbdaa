"""Baseline SSL prediction heads: charge, distance, torsion angle.

References:
* ``ChargePredictor``        — ``examples/pretrain_ChargePrediction.py:15-25``
* ``DistancePredictor``      — ``examples/pretrain_DistancePrediction.py:15-26``
* ``TorsionAnglePredictor``  — ``examples/pretrain_TorsionAnglePrediction.py:16-27``
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from geossl_tpu.models.common import Dense


class ChargePredictor(nn.Module):
    """Linear(emb -> node_class) (``pretrain_ChargePrediction.py:15-25``)."""

    node_class: int = 9

    @nn.compact
    def __call__(self, node_repr):
        return Dense(self.node_class)(node_repr)


def charge_masking(
    rng: jax.Array, atom_type: jnp.ndarray, node_mask: jnp.ndarray,
    ratio: float, node_class: int = 9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask a fraction of real atoms to the unknown token (node_class - 1)
    (``pretrain_ChargePrediction.py:64-69``): exactly ``int(M·ratio)`` atoms
    drawn without replacement over the WHOLE batch (M = total real atoms),
    the reference's batch-level ``np.random.choice`` semantics.

    Returns (masked_atom_type, loss_mask [B, N] bool).
    """
    from geossl_tpu.objectives.pairs import exact_count_subsample

    sel = exact_count_subsample(rng, node_mask, ratio, per_graph=False)
    masked = jnp.where(sel, node_class - 1, atom_type)
    return masked, sel


def charge_loss(
    logits: jnp.ndarray,  # [B, N, C]
    target: jnp.ndarray,  # [B, N] original atom types
    loss_mask: jnp.ndarray,  # [B, N] which atoms were masked
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-entropy over masked atoms only (``pretrain_ChargePrediction.py:81``)."""
    per = optax.softmax_cross_entropy_with_integer_labels(logits, target)
    w = loss_mask.astype(per.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(per * w) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == target) * w) / denom
    return loss, acc


class DistancePredictor(nn.Module):
    """Linear(2·emb -> 1) on [h_i, h_j] (``pretrain_DistancePrediction.py:15-26``).

    Dense form: predicts the full pair grid; the L1 loss is averaged over the
    selected pairs (reference: ``nn.L1Loss()`` mean over super edges).
    """

    @nn.compact
    def __call__(self, node_repr):
        # Linear([h_i, h_j]) == Linear_a(h_i) + Linear_b(h_j) + bias; compute
        # the two halves on nodes and broadcast — O(B·N·F) instead of
        # O(B·N²·F) matmul work.
        f = node_repr.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (2 * f, 1)
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        left = node_repr @ kernel[:f]  # [B,N,1]
        right = node_repr @ kernel[f:]
        return left[:, :, None, 0] + right[:, None, :, 0] + bias[0]  # [B,N,N]


def distance_loss(
    pred: jnp.ndarray,  # [B, N, N]
    dist: jnp.ndarray,  # [B, N, N] true distances
    sel_mask: jnp.ndarray,  # [B, N, N]
) -> jnp.ndarray:
    w = sel_mask.astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - dist) * w) / jnp.maximum(jnp.sum(w), 1.0)


class TorsionAnglePredictor(nn.Module):
    """Linear(3·emb -> 1), MSE vs per-triple angles
    (``pretrain_TorsionAnglePrediction.py:16-27``). The reference's dataset
    class (``MoleculeDataset3DTorsionAngle``) is absent from the checkout
    (SURVEY.md §2.9); the triple machinery is reconstructed: subsampled
    ordered atom triples (u, v, w) with the bond angle at vertex v as the
    regression target (see ``objectives.torsion_triples``).
    """

    @nn.compact
    def __call__(self, node_repr, triple_index):
        """node_repr [B,N,F]; triple_index [B,T,3] int32 -> pred [B,T]."""
        def take(k):
            idx = triple_index[..., k]  # [B, T]
            return jnp.take_along_axis(node_repr, idx[..., None], axis=1)

        feat = jnp.concatenate([take(0), take(1), take(2)], axis=-1)  # [B,T,3F]
        return Dense(1)(feat)[..., 0]


def torsion_triples(
    rng: jax.Array,
    positions: jnp.ndarray,  # [B, N, 3]
    node_mask: jnp.ndarray,  # [B, N]
    num_triples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample ``num_triples`` random ordered atom triples per graph and
    compute the angle at the middle vertex. Replaces the reference's
    AtomTripleExtractor (O(N³) permutations subsampled at
    ``torsion_angle_sample_ratio``, ``dataloaders_AtomTriple.py:8-31``).

    Returns (triple_index [B,T,3], angle [B,T], triple_mask [B,T]).
    """
    b, n = node_mask.shape
    counts = jnp.sum(node_mask.astype(jnp.int32), axis=1)  # [B]
    r = jax.random.uniform(rng, (b, num_triples, 3))
    idx = jnp.floor(r * counts[:, None, None]).astype(jnp.int32)
    idx = jnp.clip(idx, 0, n - 1)
    # valid iff the three indices are distinct and the graph has >= 3 atoms
    u, v, w = idx[..., 0], idx[..., 1], idx[..., 2]
    distinct = (u != v) & (v != w) & (u != w)
    valid = distinct & (counts[:, None] >= 3)

    def gather(i):
        return jnp.take_along_axis(positions, i[..., None], axis=1)

    pu, pv, pw = gather(u), gather(v), gather(w)
    a = pu - pv
    c = pw - pv
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-8)
    nc = jnp.maximum(jnp.linalg.norm(c, axis=-1), 1e-8)
    cosang = jnp.clip(jnp.sum(a * c, axis=-1) / (na * nc), -1.0, 1.0)
    angle = jnp.arccos(cosang)
    return idx, angle, valid


def torsion_loss(pred: jnp.ndarray, angle: jnp.ndarray, triple_mask: jnp.ndarray):
    w = triple_mask.astype(pred.dtype)
    return jnp.sum((pred - angle) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)
