"""ContextPred: substructure-vs-context contrastive pretraining.

Reconstruction of the reference's dead ``do_ContextPred``
(``examples/util.py:79-119``, defined but never called by any runnable
script — same category as the SchNet dipole branch): predict whether a
center atom's substructure representation and a surrounding context-ring
representation come from the same molecule, with cycle-shifted in-batch
negatives.

TPU-native formulation: everything runs on the dense padded [B, N] batch
inside one jitted step. Hop distances from the center are computed on a
bond-scale radius graph (the 3D-native stand-in for the reference's 2D
bond graph) by ``max_hops`` rounds of boolean matrix products — a
[B, N, N] masked matmul per round, which XLA tiles onto the MXU, instead
of the reference's host-side PyG subgraph extraction. Substructure and
context subgraphs are encoded by masking the SAME padded geometry two
ways (no gather/scatter, no ragged subgraphs), mirroring the reference's
two separate encoders (``molecule_substruct_model`` /
``molecule_context_model``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def sample_centers(rng: jax.Array, node_mask: jnp.ndarray) -> jnp.ndarray:
    """One-hot [B, N] center per graph, uniform over REAL atoms.

    Padded graph slots (no real atoms) get an arbitrary one-hot that the
    caller must gate with ``graph_mask`` — matching the reference's
    per-molecule ``random.sample(range(num_atoms), 1)`` semantics.
    """
    logits = jnp.where(node_mask, 0.0, -jnp.inf)
    # all -inf rows (padded graphs) would NaN: give them a uniform row
    logits = jnp.where(node_mask.any(-1, keepdims=True), logits, 0.0)
    idx = jax.random.categorical(rng, logits, axis=-1)
    return jax.nn.one_hot(idx, node_mask.shape[-1], dtype=jnp.float32)


def hop_distances(adj: jnp.ndarray, center_onehot: jnp.ndarray,
                  max_hops: int) -> jnp.ndarray:
    """BFS hop count [B, N] from each graph's center over ``adj`` [B,N,N].

    ``max_hops`` is static; unreachable (or >max_hops) nodes get
    ``max_hops + 1``. Each round is one [B,N]x[B,N,N] masked matmul —
    batched, static-shape, MXU-tileable — rather than a per-graph queue.
    """
    adj_f = adj.astype(jnp.float32)
    reach0 = center_onehot > 0
    hops0 = jnp.where(reach0, 0, max_hops + 1).astype(jnp.int32)

    def body(carry, t):
        reach, hops = carry
        new = jnp.einsum("bn,bnm->bm", reach.astype(jnp.float32), adj_f) > 0
        fresh = new & ~reach
        hops = jnp.where(fresh, t, hops)
        return (reach | new, hops), None

    (_, hops), _ = jax.lax.scan(
        body, (reach0, hops0), jnp.arange(1, max_hops + 1))
    return hops


def context_masks(hops: jnp.ndarray, node_mask: jnp.ndarray, k: int,
                  l1: int, l2: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """(substruct, context, overlap) node masks from hop counts.

    substruct = ball ``hop <= k`` (incl. the center), context = ring
    ``l1 <= hop <= l2``, overlap = their intersection ``l1 <= hop <= k``
    — the reference's ``overlap_context_substruct_idx`` set (requires
    ``l1 <= k < l2``).
    """
    sub = (hops <= k) & node_mask
    ctx = (hops >= l1) & (hops <= l2) & node_mask
    return sub, ctx, sub & ctx


def contextpred_loss(substruct_repr: jnp.ndarray, context_repr: jnp.ndarray,
                     valid: jnp.ndarray, neg_samples: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BCE on substruct·context dot products (``util.py:102-119``).

    Positives pair each graph with its own context; negative i pairs it
    with the context cycle-shifted by i+1 (the reference's
    ``cycle_index``). ``valid`` [B] gates graphs whose overlap ring is
    empty and padded batch slots; a negative needs both of its endpoints
    valid. Returns (loss, acc) with the reference's reduction:
    ``mean_BCE(pos) + neg_samples * mean_BCE(all negs)``.
    """
    if neg_samples < 1:
        raise ValueError(
            f"neg_samples must be >= 1, got {neg_samples}: with no negatives "
            "the BCE objective is all-positive and collapses trivially")
    valid = valid.astype(jnp.float32)
    pos = jnp.sum(substruct_repr * context_repr, axis=-1)

    def wmean(x, w):
        return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)

    loss_pos = wmean(optax.sigmoid_binary_cross_entropy(
        pos, jnp.ones_like(pos)), valid)
    correct = jnp.sum(valid * (pos > 0))
    total = jnp.sum(valid)
    loss_negs = []
    for i in range(neg_samples):
        neg_c = jnp.roll(context_repr, -(i + 1), axis=0)
        w = valid * jnp.roll(valid, -(i + 1), axis=0)
        neg = jnp.sum(substruct_repr * neg_c, axis=-1)
        loss_negs.append((optax.sigmoid_binary_cross_entropy(
            neg, jnp.zeros_like(neg)), w))
        correct = correct + jnp.sum(w * (neg < 0))
        total = total + jnp.sum(w)
    all_neg = jnp.concatenate([l for l, _ in loss_negs])
    all_w = jnp.concatenate([w for _, w in loss_negs])
    loss = loss_pos + neg_samples * wmean(all_neg, all_w)
    return loss, correct / jnp.maximum(total, 1.0)
