"""Evaluation metrics: top-k accuracy, FG-ARI, mBO.

Counterpart of reference ``slowfast/utils/metrics.py``. ARI is fully
vectorised numpy (the reference loops per-sample with scipy.comb); mBO is
implemented (the reference ships a stub returning 0, metrics.py:86-102).
"""

from __future__ import annotations

import numpy as np


# ---- classification ------------------------------------------------------

def topks_correct(preds, labels, ks):
    """Number of top-k correct predictions for each k
    (reference metrics.py:104-147). preds: [N, C], labels: [N]."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    max_k = max(ks)
    # indices of the top max_k classes, best first
    top_inds = np.argsort(-preds, axis=1)[:, :max_k]
    correct = top_inds == labels[:, None]
    return [float(correct[:, :k].any(axis=1).sum()) for k in ks]


def topk_errors(preds, labels, ks):
    num = preds.shape[0]
    return [(1.0 - x / num) * 100.0 for x in topks_correct(preds, labels, ks)]


def topk_accuracies(preds, labels, ks):
    num = preds.shape[0]
    return [(x / num) * 100.0 for x in topks_correct(preds, labels, ks)]


def multitask_topk_accuracies(preds, labels, ks):
    """Joint accuracy across tasks (verb+noun); a sample counts only if
    every task is top-k correct (reference metrics.py:194-232)."""
    max_k = max(ks)
    joint = None
    for pred, label in zip(preds, labels):
        top_inds = np.argsort(-np.asarray(pred), axis=1)[:, :max_k]
        correct = top_inds == np.asarray(label)[:, None]
        joint = correct if joint is None else (joint & correct)
    num = joint.shape[0]
    return [float(joint[:, :k].any(axis=1).sum()) / num * 100.0 for k in ks]


def mean_ap(preds, labels):
    """Mean average precision for multi-label eval
    (reference meters.py:1275-1300 get_map)."""
    from sklearn.metrics import average_precision_score

    preds = np.asarray(preds)
    labels = np.asarray(labels)
    # drop classes with no positives (mirrors reference nan filtering)
    keep = labels.sum(axis=0) > 0
    if keep.sum() == 0:
        return 0.0
    aps = average_precision_score(labels[:, keep], preds[:, keep], average=None)
    return float(np.mean(aps))


# ---- segmentation --------------------------------------------------------

def _comb2(x):
    x = x.astype(np.float64)
    return x * (x - 1.0) / 2.0


def compute_ari(table: np.ndarray) -> float:
    """Adjusted Rand Index from a contingency table [r, s]
    (reference metrics.py:10-37)."""
    a = table.sum(axis=1)
    b = table.sum(axis=0)
    n = a.sum()
    comb_a = _comb2(a).sum()
    comb_b = _comb2(b).sum()
    comb_n = _comb2(np.asarray(n))
    comb_table = _comb2(table).sum()
    if comb_b == comb_a == comb_n == comb_table:
        return 1.0
    return float(
        (comb_table - comb_a * comb_b / comb_n)
        / (0.5 * (comb_a + comb_b) - comb_a * comb_b / comb_n)
    )


def evaluate_ari(true_mask: np.ndarray, pred_mask: np.ndarray) -> float:
    """Average ARI over a batch (reference metrics.py:59-83).

    true_mask: [B, N0, D] binary; pred_mask: [B, N1, D] soft or binary.
    Predicted masks are binarised by per-pixel argmax over the N1 axis.
    The contingency tables for all samples are computed with one einsum.
    """
    true_mask = np.asarray(true_mask, dtype=np.float64)
    pred_mask = np.asarray(pred_mask, dtype=np.float64)
    B, K, D = pred_mask.shape
    hard = np.zeros_like(pred_mask)
    idx = np.argmax(pred_mask, axis=1)  # [B, D]
    hard[np.arange(B)[:, None], idx, np.arange(D)[None, :]] = 1.0
    # per-sample contingency tables: [B, N0, N1]
    tables = np.einsum(
        "bnd,bkd->bnk",
        (true_mask != 0).astype(np.float64),
        (hard != 0).astype(np.float64),
    )
    return float(np.mean([compute_ari(t) for t in tables]))


def evaluate_mbo(true_mask: np.ndarray, pred_mask: np.ndarray) -> float:
    """Mean Best Overlap: each GT mask is matched to the predicted mask
    with maximum IoU; IoUs are averaged over non-empty GT masks.
    (The reference leaves this as a stub, metrics.py:86-102.)"""
    true_mask = np.asarray(true_mask) != 0  # [B, N0, D]
    pred_mask = np.asarray(pred_mask, dtype=np.float64)
    B, K, D = pred_mask.shape
    hard = np.zeros((B, K, D), dtype=bool)
    idx = np.argmax(pred_mask, axis=1)
    hard[np.arange(B)[:, None], idx, np.arange(D)[None, :]] = True

    inter = np.einsum(
        "bnd,bkd->bnk", true_mask.astype(np.float64), hard.astype(np.float64)
    )  # [B, N0, N1]
    area_t = true_mask.sum(-1)[:, :, None]
    area_p = hard.sum(-1)[:, None, :]
    union = area_t + area_p - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    best = iou.max(axis=-1)  # [B, N0]
    nonempty = area_t[:, :, 0] > 0
    if nonempty.sum() == 0:
        return 0.0
    return float(best[nonempty].mean())
