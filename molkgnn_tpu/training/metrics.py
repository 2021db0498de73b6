"""Virtual-screening evaluation metrics (host-side numpy).

Numerical contract: /root/reference/evaluation.py. These run on the host on
concatenated epoch predictions — they are cheap relative to training and need
exact parity with the reference (sklearn ROC conventions), so they stay in
numpy rather than being ported to device code.

``logAUC[a, b]``: area under the ROC curve plotted against log10(FPR),
restricted to FPR in [a, b] and normalized by log10(b) - log10(a). The
reference interpolates TPR at both bounds, appends those points, sorts, and
integrates with the trapezoid rule (evaluation.py:55-79). A random classifier
scores ~0.0215 on [0.001, 0.1].
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    auc as _sk_auc,
    confusion_matrix,
    f1_score as _sk_f1,
    roc_auc_score,
    roc_curve,
)


def sigmoid(x: np.ndarray) -> np.ndarray:
    """Numerically stable two-branch sigmoid.

    The naive 1/(1+exp(-x)) overflows for large-magnitude negative logits
    (RuntimeWarning, and 0/0 risk downstream). Branch on sign so exp() only
    ever sees non-positive arguments; identical values where both forms are
    finite. Contract: /root/reference/evaluation.py:90-121 (sigmoid feeds
    the 0.5-cutoff confusion matrices for PPV/accuracy/F1).
    """
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def calculate_logAUC(
    true_y: np.ndarray,
    predicted_score: np.ndarray,
    FPR_range=(0.001, 0.1),
) -> float:
    if FPR_range is None:
        raise ValueError("FPR range cannot be None")
    lo, hi = FPR_range
    if lo >= hi:
        raise ValueError("FPR upper_bound must be greater than lower_bound")

    with np.errstate(divide="ignore"):
        fpr, tpr, _ = roc_curve(true_y, predicted_score, pos_label=1)
        tpr = np.append(tpr, np.interp([lo, hi], fpr, tpr))
        fpr = np.append(fpr, [lo, hi])
        tpr = np.sort(tpr)
        fpr = np.sort(fpr)
        x = np.log10(fpr)
        y = tpr
        log_lo, log_hi = np.log10(lo), np.log10(hi)

    lo_idx = np.where(x == log_lo)[-1][-1]
    hi_idx = np.where(x == log_hi)[-1][-1]
    trim_x = x[lo_idx : hi_idx + 1]
    trim_y = y[lo_idx : hi_idx + 1]
    return float(_sk_auc(trim_x, trim_y) / (log_hi - log_lo))


def calculate_auc(true_y: np.ndarray, predicted_score: np.ndarray) -> float:
    """ROC AUC with the reference's -1 failure fallback (evaluation.py:82-87)."""
    try:
        return float(roc_auc_score(true_y, predicted_score))
    except Exception:
        return -1.0


def calculate_ppv(
    true_y: np.ndarray, predicted_score: np.ndarray, cutoff: float = 0.5
) -> float:
    predicted_y = np.where(sigmoid(predicted_score) > cutoff, 1, 0)
    tn, fp, fn, tp = confusion_matrix(
        true_y, predicted_y, labels=[0, 1]
    ).ravel()
    return float(tp / (tp + fp)) if (tp + fp) != 0 else float("nan")


def calculate_accuracy(true_y: np.ndarray, predicted_score: np.ndarray) -> float:
    predicted_y = np.where(sigmoid(predicted_score) > 0.5, 1, 0)
    tn, fp, fn, tp = confusion_matrix(
        true_y, predicted_y, labels=[0, 1]
    ).ravel()
    total = tp + fp + tn + fn
    return float((tp + tn) / total) if total != 0 else float("nan")


def calculate_f1_score(true_y: np.ndarray, predicted_score: np.ndarray) -> float:
    predicted_y = np.where(sigmoid(predicted_score) > 0.5, 1, 0)
    return float(_sk_f1(true_y, predicted_y))


def compute_metrics(
    metrics: list,
    true_y: np.ndarray,
    pred_y: np.ndarray,
) -> dict:
    """Metric-name dispatch matching GNNModel.get_evaluations
    (/root/reference/model.py:483-523); keys drive checkpoint monitors."""
    out = {}
    for metric in metrics:
        if metric == "accuracy":
            out["accuracy"] = calculate_accuracy(true_y, pred_y)
        elif metric == "RMSE":
            out["RMSE"] = float(np.sqrt(np.mean((true_y - pred_y) ** 2)))
        elif metric == "logAUC_0.001_0.1":
            out["logAUC_0.001_0.1"] = calculate_logAUC(true_y, pred_y)
        elif metric == "logAUC_0.001_1":
            out["logAUC_0.001_1"] = calculate_logAUC(
                true_y, pred_y, FPR_range=(0.001, 1)
            )
        elif metric == "ppv":
            out["ppv"] = calculate_ppv(true_y, pred_y)
        elif metric == "f1_score":
            out["f1_score"] = calculate_f1_score(true_y, pred_y)
        elif metric == "AUC":
            out["AUC"] = calculate_auc(true_y, pred_y)
        else:
            raise ValueError(f"unknown metric {metric}")
    return out
