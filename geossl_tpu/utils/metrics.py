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
    """Average precision (sklearn ``average_precision_score`` semantics)."""
    labels = np.asarray(labels).astype(bool)
    if labels.sum() == 0:
        return float("nan")
    order = np.argsort(-np.asarray(scores, float), kind="stable")
    labels = labels[order]
    tp = np.cumsum(labels)
    precision = tp / np.arange(1, len(labels) + 1)
    return float(np.sum(precision * labels) / labels.sum())


def concordance_index(y: np.ndarray, f: np.ndarray) -> float:
    """CI metric (``util.py:144-165``) — O(n²) pairwise comparison."""
    y, f = np.asarray(y, float), np.asarray(f, float)
    gt = y[:, None] > y[None, :]
    u = f[:, None] - f[None, :]
    s = np.where(u > 0, 1.0, np.where(u == 0, 0.5, 0.0))
    z = gt.sum()
    return float((s * gt).sum() / z) if z > 0 else float("nan")
