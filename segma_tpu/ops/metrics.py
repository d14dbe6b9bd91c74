"""Validation metrics in JAX (replaces torchmetrics usage,
reference ``src/segma/models/base.py:189-317``).

All metrics are computed from device-accumulated sufficient statistics so a
validation epoch is a stream of jitted batch updates plus one tiny host
finalize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def binary_counts(
    probs: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5
) -> dict[str, jnp.ndarray]:
    """Per-label TP/FP/FN/TN counts for (N, L) probabilities vs multi-hot."""
    pred = probs > threshold
    t = targets > 0.5
    tp = jnp.sum(pred & t, axis=0)
    fp = jnp.sum(pred & ~t, axis=0)
    fn = jnp.sum(~pred & t, axis=0)
    tn = jnp.sum(~pred & ~t, axis=0)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def f1_from_counts(counts: dict[str, np.ndarray], zero_division: float = 0.0) -> np.ndarray:
    """Per-label binary F1 from accumulated counts."""
    tp = np.asarray(counts["tp"], np.float64)
    fp = np.asarray(counts["fp"], np.float64)
    fn = np.asarray(counts["fn"], np.float64)
    denom = 2 * tp + fp + fn
    with np.errstate(invalid="ignore", divide="ignore"):
        f1 = np.where(denom > 0, 2 * tp / denom, zero_division)
    return f1


def multiclass_f1(
    preds: np.ndarray, targets: np.ndarray, n_classes: int
) -> np.ndarray:
    """Per-class F1 on argmax predictions (torchmetrics
    ``multiclass_f1_score(average=None, zero_division=0)`` semantics)."""
    f1 = np.zeros(n_classes)
    for c in range(n_classes):
        tp = np.sum((preds == c) & (targets == c))
        fp = np.sum((preds == c) & (targets != c))
        fn = np.sum((preds != c) & (targets == c))
        denom = 2 * tp + fp + fn
        f1[c] = 2 * tp / denom if denom > 0 else 0.0
    return f1


def binary_auroc_np(scores: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Exact per-label AUROC (Mann-Whitney U with tie handling), numpy.

    scores: (N, L) real-valued; targets: (N, L) in {0, 1}. Labels with no
    positives or no negatives return 0.5.
    """
    n, n_labels = scores.shape
    out = np.full(n_labels, 0.5)
    for li in range(n_labels):
        s = scores[:, li].astype(np.float64)
        t = targets[:, li] > 0.5
        n_pos = int(t.sum())
        n_neg = n - n_pos
        if n_pos == 0 or n_neg == 0:
            continue
        order = np.argsort(s)
        ranks = np.empty(n, np.float64)
        # average ranks over ties
        s_sorted = s[order]
        _, inv, counts = np.unique(s_sorted, return_inverse=True, return_counts=True)
        group_sums = np.bincount(inv, weights=np.arange(1, n + 1))
        avg = (group_sums / counts)[inv]
        ranks[order] = avg
        u = ranks[t].sum() - n_pos * (n_pos + 1) / 2
        out[li] = u / (n_pos * n_neg)
    return out


def roc_curve_np(
    scores: np.ndarray, targets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(fpr, tpr) arrays for one label's scores (descending thresholds)."""
    order = np.argsort(-scores)
    t = (targets[order] > 0.5).astype(np.float64)
    tps = np.cumsum(t)
    fps = np.cumsum(1 - t)
    n_pos = max(t.sum(), 1e-12)
    n_neg = max((1 - t).sum(), 1e-12)
    return fps / n_neg, tps / n_pos


