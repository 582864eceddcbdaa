"""Evaluation metrics — NumPy implementations, no sklearn/scipy dependency.

Reference: ``examples/util.py:128-165`` (rmse/mse/pearson/spearman),
``finetune_lep.py:96-99`` (ROC-AUC / PR-AUC via sklearn),
``finetune_qm9.py:20-21`` (MAE). All operate host-side on eval outputs.
"""

from __future__ import annotations

import numpy as np


def mae(y: np.ndarray, f: np.ndarray) -> float:
    return float(np.mean(np.abs(y - f)))


def mse(y: np.ndarray, f: np.ndarray) -> float:
    return float(np.mean((y - f) ** 2))


def rmse(y: np.ndarray, f: np.ndarray) -> float:
    return float(np.sqrt(mse(y, f)))


def pearson(y: np.ndarray, f: np.ndarray) -> float:
    return float(np.corrcoef(y, f)[0, 1])


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average ranks (ties share the mean rank), 1-based."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), float)
    ranks[order] = np.arange(1, len(x) + 1)
    # average ties
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = ranks[order[i : j + 1]].mean()
        i = j + 1
    return ranks


def spearman(y: np.ndarray, f: np.ndarray) -> float:
    return pearson(_rankdata(y), _rankdata(f))


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """ROC-AUC via the rank statistic (equivalent to sklearn for binary
    labels, ties handled by average ranks)."""
    labels = np.asarray(labels).astype(bool)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = _rankdata(np.asarray(scores, float))
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def pr_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Average precision (sklearn ``average_precision_score`` semantics).

    Tied scores form ONE threshold block (all samples at a score enter
    together); a per-sample cumsum would make the result depend on input
    order whenever the classifier emits duplicate probabilities."""
    labels = np.asarray(labels).astype(bool)
    n_pos = int(labels.sum())
    if n_pos == 0:
        return float("nan")
    scores = np.asarray(scores, float)
    order = np.argsort(-scores, kind="stable")
    scores, labels = scores[order], labels[order]
    # last index of each tie block = the threshold points
    distinct = np.r_[scores[1:] != scores[:-1], True]
    tp = np.cumsum(labels)[distinct]
    n_at = np.arange(1, len(labels) + 1)[distinct]
    precision = tp / n_at
    recall = tp / n_pos
    d_recall = np.diff(np.r_[0.0, recall])
    return float(np.sum(precision * d_recall))


def concordance_index(y: np.ndarray, f: np.ndarray) -> float:
    """CI metric (``util.py:144-165``) — O(n²) pairwise comparison."""
    y, f = np.asarray(y, float), np.asarray(f, float)
    gt = y[:, None] > y[None, :]
    u = f[:, None] - f[None, :]
    s = np.where(u > 0, 1.0, np.where(u == 0, 0.5, 0.0))
    z = gt.sum()
    return float((s * gt).sum() / z) if z > 0 else float("nan")


# --- OC20-style energy/force metrics (``util.py:187-223``) ---------------
# The reference defines these for an OC20 pathway it never wires up (no
# dataset, no driver); reconstructed here with the same reduction semantics
# so the metric surface is complete. ``fixed_masks`` is 1.0 for FREE atoms
# (the reference's naming: it multiplies by the mask to keep free atoms),
# shape [B, N]; forces are [B, N, 3].


def energy_mae(pred_e: np.ndarray, e: np.ndarray) -> float:
    """Sum-reduced L1 on energies (``util.py:189-190``)."""
    return float(np.abs(np.asarray(pred_e) - np.asarray(e)).sum())


def force_mae(pred_f: np.ndarray, f: np.ndarray,
              fixed_masks: np.ndarray) -> float:
    """Per-structure-normalized, free-atom-masked L1 force sum
    (``util.py:192-196``): each atom's |Δf| summed over xyz, divided by its
    structure's free-atom count, summed over the free atoms."""
    m = np.asarray(fixed_masks, float)
    n_free = m.sum(axis=-1, keepdims=True)
    per_atom = np.abs(np.asarray(pred_f) - np.asarray(f)).sum(axis=-1)
    return float((per_atom / n_free)[m.astype(bool)].sum())


def force_cosine(pred_f: np.ndarray, f: np.ndarray,
                 fixed_masks: np.ndarray, eps: float = 1e-8) -> float:
    """Free-atom-masked, per-structure-normalized cosine-similarity sum
    (``util.py:198-202``; torch cosine_similarity semantics incl. eps
    clamping of each norm)."""
    pred_f, f = np.asarray(pred_f, float), np.asarray(f, float)
    m = np.asarray(fixed_masks, float)
    na = np.maximum(np.linalg.norm(pred_f, axis=-1), eps)
    nb = np.maximum(np.linalg.norm(f, axis=-1), eps)
    cos = (pred_f * f).sum(axis=-1) / (na * nb)
    n_free = m.sum(axis=-1, keepdims=True)
    return float((cos / n_free)[m.astype(bool)].sum())


def energy_within_threshold(pred_e: np.ndarray, e: np.ndarray,
                            epsilon: float = 0.02) -> float:
    """EwT (``util.py:204-210``): fraction of structures with |ΔE| < eps."""
    return float(np.mean(np.abs(np.asarray(pred_e) - np.asarray(e)) < epsilon))


def energy_force_within_threshold(pred_e, e, pred_f, f,
                                  epsilon: float = 0.02,
                                  alpha: float = 0.03) -> float:
    """EFwT (``util.py:212-223``): structures whose |ΔE| < eps AND whose max
    per-atom summed |ΔF| < alpha. Forces may be [B, N] (pre-summed |ΔF| per
    atom, the reference's docstring shape) or [B, N, 3].

    Documented deviation: the reference's literal code takes
    ``max(loss_F, dim=-1)`` AFTER already summing atoms away, so for its
    own documented [B, N] input the max runs over the BATCH and every
    structure shares one scalar force gate — dead code with a latent shape
    bug. This follows the OC20-standard definition instead (per-structure
    max over atoms), which is what the surrounding docstring describes."""
    pred_f, f = np.asarray(pred_f, float), np.asarray(f, float)
    e_ok = np.abs(np.asarray(pred_e) - np.asarray(e)) < epsilon
    d = np.abs(pred_f - f)
    if d.ndim == 3:  # [B, N, 3] -> per-atom summed |dF|
        d = d.sum(axis=-1)
    loss_f = d.max(axis=-1)  # per-structure max over atoms
    f_ok = np.abs(loss_f) < alpha
    return float(np.mean(e_ok & f_ok))
