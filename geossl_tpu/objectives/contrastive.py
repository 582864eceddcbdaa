"""Contrastive GeoSSL objectives: view perturbation, InfoNCE, EBM-NCE.

Reference: ``examples/pretrain_GeoSSL.py:68-176`` and ``examples/util.py:19-64``.
View 2 is always the same atoms at positions + N(mu, sigma) noise
(``perturb``, ``pretrain_GeoSSL.py:68-74``); negatives come from cyclic batch
shifts (``util.py:19-22``).

Padding semantics: the reference's final batch is genuinely smaller; padded
graph slots here would otherwise act as fake zero-vector negatives. Whenever
``graph_mask`` is given, padded slots are excluded from InfoNCE's logit
columns, from EBM negative pairs, and from every accuracy denominator.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def perturb_positions(
    rng: jax.Array, positions: jnp.ndarray, mu: float, sigma: float
) -> jnp.ndarray:
    """positions + N(mu, sigma) elementwise (``pretrain_GeoSSL.py:68-74``).
    Padded rows get noise too — harmless, they are masked downstream."""
    noise = mu + sigma * jax.random.normal(rng, positions.shape, positions.dtype)
    return positions + noise


def cycle_shift(x: jnp.ndarray, shift: int = 1) -> jnp.ndarray:
    """``cycle_index(B, shift)`` indexing (``util.py:19-22``): element i maps
    to i + shift with wraparound — equivalent to rolling the batch axis."""
    return jnp.roll(x, -shift, axis=0)


def _bce_logits(logits, labels, weights=None):
    loss = optax.sigmoid_binary_cross_entropy(logits, labels)
    if weights is None:
        return jnp.mean(loss)
    w = weights.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def _masked_frac(pred_ok, weights):
    if weights is None:
        return jnp.mean(pred_ok.astype(jnp.float32)), jnp.asarray(
            pred_ok.shape[0], jnp.float32
        )
    w = weights.astype(jnp.float32)
    return jnp.sum(pred_ok * w), jnp.sum(w)


def _ebm_terms(
    x: jnp.ndarray,
    y: jnp.ndarray,
    num_neg: int,
    temperature: float,
    graph_mask: Optional[jnp.ndarray],
):
    """Shared EBM machinery: positive/negative BCE terms + accuracy.

    Negative pairs where either side is a padded slot are excluded (the
    reference never forms them — its batches are unpadded)."""
    if num_neg < 1:
        raise ValueError(
            f"num_neg must be >= 1, got {num_neg}: an EBM loss with no "
            "negatives is all-positive and collapses trivially")
    pred_pos = jnp.sum(x * y, axis=1) / temperature
    negs, masks = [], []
    for k in range(num_neg):
        negs.append(jnp.sum(x * cycle_shift(y, k + 1), axis=1) / temperature)
        if graph_mask is not None:
            masks.append(graph_mask & cycle_shift(graph_mask, k + 1))
    pred_neg = jnp.concatenate(negs, axis=0)
    neg_mask = jnp.concatenate(masks, axis=0) if masks else None
    loss_pos = _bce_logits(pred_pos, jnp.ones_like(pred_pos), graph_mask)
    loss_neg = _bce_logits(pred_neg, jnp.zeros_like(pred_neg), neg_mask)
    ok_pos, n_pos = _masked_frac(pred_pos > 0, graph_mask)
    ok_neg, n_neg = _masked_frac(pred_neg < 0, neg_mask)
    if graph_mask is None:
        acc = (ok_pos * n_pos + ok_neg * n_neg) / (n_pos + n_neg)
    else:
        acc = (ok_pos + ok_neg) / jnp.maximum(n_pos + n_neg, 1.0)
    return loss_pos, loss_neg, acc


def ebm_nce_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    graph_mask: Optional[jnp.ndarray] = None,
    num_neg: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EBM-NCE (``pretrain_GeoSSL.py:103-138``): positive = dot(x_i, y_i),
    negatives = dot(x_i, y_{i+k}) for cyclic shifts k=1..num_neg; BCE both,
    combined (pos + num_neg·neg)/(1+num_neg). Returns (loss, accuracy)."""
    loss_pos, loss_neg, acc = _ebm_terms(x, y, num_neg, 1.0, graph_mask)
    return (loss_pos + num_neg * loss_neg) / (1 + num_neg), acc


def infonce_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    temperature: float = 0.1,
    graph_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One direction of InfoNCE (``pretrain_GeoSSL.py:159-168``):
    CE over B×B dot-product logits / T with diagonal labels. Padded columns
    are removed from the softmax (they would be zero-logit fake negatives)."""
    b = x.shape[0]
    logits = (x @ y.T) / temperature
    labels = jnp.arange(b)
    if graph_mask is not None:
        col_ok = graph_mask[None, :] | jnp.eye(b, dtype=bool)  # keep diagonal
        logits = jnp.where(col_ok, logits, -1e9)
    loss_per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    pred = jnp.argmax(logits, axis=1)
    if graph_mask is None:
        loss = jnp.mean(loss_per)
        acc = jnp.mean((pred == labels).astype(jnp.float32))
    else:
        gm = graph_mask.astype(loss_per.dtype)
        loss = jnp.sum(loss_per * gm) / jnp.maximum(jnp.sum(gm), 1.0)
        acc = jnp.sum((pred == labels) * gm) / jnp.maximum(jnp.sum(gm), 1.0)
    return loss, acc


def dual_infonce_loss(x, y, temperature=0.1, graph_mask=None):
    """Symmetric InfoNCE (``pretrain_GeoSSL.py:170-176``)."""
    l1, a1 = infonce_loss(x, y, temperature, graph_mask)
    l2, a2 = infonce_loss(y, x, temperature, graph_mask)
    return (l1 + l2) / 2, (a1 + a2) / 2


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize equivalent (``pretrain_GeoSSL.py:92-93``).

    Written as ``x * rsqrt(max(sum(x^2), eps^2))`` rather than
    ``x / max(norm(x), eps)``: the two are equal in value, but the latter's
    GRADIENT at an all-zero row is NaN (d||x||/dx = x/||x|| = 0/0, and
    ``maximum``'s zero branch multiplies that NaN by 0 = NaN). All-zero rows
    are routine here — dense padded batches carry empty graph slots whose
    pooled repr is exactly 0 (the reference's PyG batches never pad, so it
    cannot hit this) — and one NaN row poisons the shared-backbone gradient
    for the whole batch. This form's gradient at 0 is a finite constant.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def do_cl(
    x: jnp.ndarray,
    y: jnp.ndarray,
    similarity_metric: str = "InfoNCE_dot_prod",
    temperature: float = 0.1,
    num_neg: int = 1,
    graph_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generic contrastive loss dispatch (``util.py:25-58``):
    'InfoNCE_dot_prod' = CE over B×B logits/T; 'EBM_dot_prod' = BCE on
    temperature-scaled dot products vs cyclic-shift negatives (the EBM
    variant divides predictions by T and combines pos + num_neg·neg WITHOUT
    averaging, matching the reference exactly)."""
    if similarity_metric == "InfoNCE_dot_prod":
        return infonce_loss(x, y, temperature, graph_mask)
    if similarity_metric == "EBM_dot_prod":
        loss_pos, loss_neg, acc = _ebm_terms(x, y, num_neg, temperature, graph_mask)
        return loss_pos + num_neg * loss_neg, acc  # util.py:48 (no averaging)
    raise ValueError(f"unknown similarity metric {similarity_metric!r}")


def dual_cl(x, y, similarity_metric="InfoNCE_dot_prod", temperature=0.1,
            num_neg=1, graph_mask=None):
    """Symmetric contrastive loss (``util.py:61-64``)."""
    l1, a1 = do_cl(x, y, similarity_metric, temperature, num_neg, graph_mask)
    l2, a2 = do_cl(y, x, similarity_metric, temperature, num_neg, graph_mask)
    return (l1 + l2) / 2, (a1 + a2) / 2
