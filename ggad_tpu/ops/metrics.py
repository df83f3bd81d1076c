"""Evaluation metrics: AUROC, average precision, F1, G-mean, confusion.

The reference computes all metrics through sklearn (``run.py:236-240``,
``src/utils.py:207-321``). For parity we provide numpy implementations that
match sklearn exactly (tested against it), plus pure-jnp versions usable
inside jit for on-device evaluation at scale (no host transfer of N-sized
score vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Host-side (numpy) — canonical, sklearn-parity implementations
# --------------------------------------------------------------------------

def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """AUROC via the rank statistic (ties handled like sklearn)."""
    labels = np.asarray(labels).ravel().astype(np.float64)
    scores = np.asarray(scores).ravel().astype(np.float64)
    n_pos = labels.sum()
    n_neg = labels.shape[0] - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    # Average rank for ties == Mann-Whitney U with tie correction.
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    ranks[order] = np.arange(1, scores.shape[0] + 1)
    # midrank adjustment for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            mid = (i + j + 2) / 2.0
            ranks[order[i:j + 1]] = mid
        i = j + 1
    rank_sum_pos = ranks[labels == 1].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def average_precision(labels: np.ndarray, scores: np.ndarray) -> float:
    """AP = Σ_k (R_k - R_{k-1}) P_k, sklearn-style (step interpolation)."""
    labels = np.asarray(labels).ravel().astype(np.float64)
    scores = np.asarray(scores).ravel().astype(np.float64)
    n_pos = labels.sum()
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    labels = labels[order]
    scores = scores[order]
    tp = np.cumsum(labels)
    fp = np.cumsum(1 - labels)
    # collapse tied thresholds: only keep the last index of each distinct score
    distinct = np.where(np.diff(scores))[0]
    idx = np.concatenate([distinct, [labels.shape[0] - 1]])
    tp, fp = tp[idx], fp[idx]
    precision = tp / (tp + fp)
    recall = tp / n_pos
    recall_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - recall_prev) * precision))


def prob_to_pred(probs: np.ndarray, thres: float) -> np.ndarray:
    """Threshold probabilities (reference ``src/utils.py:250-260``)."""
    return (np.asarray(probs) >= thres).astype(np.int64)


def f1_scores(labels: np.ndarray, preds: np.ndarray) -> tuple[float, float, float]:
    """(f1_macro, f1_binary_pos, f1_binary_neg) — reference's trio
    (``src/utils.py:238-247``)."""
    labels = np.asarray(labels).ravel()
    preds = np.asarray(preds).ravel()

    def f1_for(cls):
        tp = np.sum((preds == cls) & (labels == cls))
        fp = np.sum((preds == cls) & (labels != cls))
        fn = np.sum((preds != cls) & (labels == cls))
        denom = 2 * tp + fp + fn
        return 2 * tp / denom if denom > 0 else 0.0

    f1_pos, f1_neg = f1_for(1), f1_for(0)
    return (f1_pos + f1_neg) / 2.0, f1_pos, f1_neg


def confusion(labels: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """2x2 confusion matrix [[tn, fp], [fn, tp]] (sklearn layout)."""
    labels = np.asarray(labels).ravel()
    preds = np.asarray(preds).ravel()
    tn = np.sum((labels == 0) & (preds == 0))
    fp = np.sum((labels == 0) & (preds == 1))
    fn = np.sum((labels == 1) & (preds == 0))
    tp = np.sum((labels == 1) & (preds == 1))
    return np.array([[tn, fp], [fn, tp]])


def gmean_from_confusion(conf: np.ndarray) -> float:
    """G-mean = sqrt(sensitivity · specificity)
    (reference ``src/utils.py:324-326``)."""
    tn, fp = conf[0]
    fn, tp = conf[1]
    sens = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    spec = tn / (tn + fp) if (tn + fp) > 0 else 0.0
    return float(np.sqrt(sens * spec))


# --------------------------------------------------------------------------
# Device-side (jnp) — jit-safe, for on-device eval of large graphs
# --------------------------------------------------------------------------

def roc_auc_jnp(labels: jax.Array, scores: jax.Array,
                mask: jax.Array | None = None) -> jax.Array:
    """AUROC inside jit. ``mask`` selects the evaluated subset (static size).

    Uses the rank formulation; ties get midranks via double argsort on
    (score, tie-broken) — matches the numpy version up to tie handling on
    exact float duplicates, which the tests cover.
    """
    labels = labels.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(labels)
    mask = mask.astype(jnp.float32)
    # push masked-out entries to -inf so they take the lowest ranks,
    # then exclude them from the positive/negative counts.
    neg_inf = jnp.finfo(jnp.float32).min
    s = jnp.where(mask > 0, scores, neg_inf)
    n = labels.shape[0]
    order = jnp.argsort(s, stable=True)
    ranks = jnp.zeros(n, jnp.float32).at[order].set(
        jnp.arange(1, n + 1, dtype=jnp.float32))
    # midrank correction for ties: average rank among equal scores
    sorted_s = s[order]
    # segment ids of equal runs
    new_run = jnp.concatenate([jnp.ones(1, jnp.int32),
                               (sorted_s[1:] != sorted_s[:-1]).astype(jnp.int32)])
    run_id = jnp.cumsum(new_run) - 1
    run_sum = jax.ops.segment_sum(jnp.arange(1, n + 1, dtype=jnp.float32),
                                  run_id, num_segments=n)
    run_cnt = jax.ops.segment_sum(jnp.ones(n, jnp.float32), run_id,
                                  num_segments=n)
    mid = run_sum / jnp.maximum(run_cnt, 1.0)
    ranks = jnp.zeros(n, jnp.float32).at[order].set(mid[run_id])

    n_masked_out = jnp.sum(1.0 - mask)
    pos = labels * mask
    neg = (1.0 - labels) * mask
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    rank_sum_pos = jnp.sum(ranks * pos)
    # masked-out entries all rank below every kept entry (score == -inf),
    # shifting kept ranks up by exactly their count ->
    # subtract that shift from each positive's rank.
    rank_sum_pos = rank_sum_pos - n_pos * n_masked_out
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)
