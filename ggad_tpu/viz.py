"""Diagnostics / visualization (reference ``utils.py:175-263``,
``utils_tam.py:92-139,249-308``).

Affinity-distribution histograms with fitted normal curves, ROC and PR
curves. Unlike the reference (pinned to matplotlib 3.0.3 APIs removed
since — ``normed=1``, ``mlab.normpdf``), these use current matplotlib and
are import-gated so headless training never pays for it.
"""

from __future__ import annotations

import os

import numpy as np


def _ensure_dir(path: str) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)


def _normpdf(bins: np.ndarray, mu: float, sigma: float) -> np.ndarray:
    sigma = max(float(sigma), 1e-12)
    return (1.0 / (sigma * np.sqrt(2 * np.pi))
            * np.exp(-0.5 * ((bins - mu) / sigma) ** 2))


def draw_affinity_pdf(message_normal, message_outlier, message_real_abnormal,
                      out_path: str, *, bins: int = 30,
                      labels=("Normal", "Outlier", "Abnormal")) -> str:
    """Histogram of the three affinity populations with fitted Gaussians
    (reference ``draw_pdf``, ``utils.py:186-224``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = [np.asarray(m).ravel() for m in
              (message_normal, message_outlier, message_real_abnormal)]
    _ensure_dir(out_path)
    fig, ax = plt.subplots(figsize=(8.5, 7.5))
    _, bin_edges, _ = ax.hist(groups, bins=bins, density=True, label=labels)
    colors = ["steelblue", "darkorange", "green"]
    for g, c in zip(groups, colors):
        if len(g) > 1:
            ax.plot(bin_edges, _normpdf(bin_edges, g.mean(), g.std()),
                    color=c, linestyle="--", linewidth=3.0)
    ax.legend(loc="upper left")
    ax.set_xlabel("Local affinity")
    ax.set_ylabel("Density")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def draw_affinity_pdf_methods(methods, out_path: str, *, bins: int = 30,
                              labels=("Normal", "Outlier",
                                      "Abnormal")) -> str:
    """Per-method affinity histograms (reference ``draw_pdf_methods``,
    ``utils.py:227-263``).

    The reference renders the same three-population plot once per METHOD
    (saving to ``fig/{method}/{dataset}2/...svg``, ylim 8); here the
    methods render as aligned panels of one figure so the cross-method
    comparison the reference builds file-by-file is a single artifact.

    ``methods``: mapping ``name -> (message_normal, message_outlier,
    message_real_abnormal)``.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(out_path)
    n = max(len(methods), 1)
    fig, axes = plt.subplots(1, n, figsize=(6.0 * n, 5.5), squeeze=False)
    colors = ["steelblue", "darkorange", "green"]
    for ax, (name, pops) in zip(axes[0], methods.items()):
        groups = [np.asarray(m).ravel() for m in pops]
        _, bin_edges, _ = ax.hist(groups, bins=bins, density=True,
                                  label=labels)
        for g, c in zip(groups, colors):
            if len(g) > 1:
                ax.plot(bin_edges, _normpdf(bin_edges, g.mean(), g.std()),
                        color=c, linestyle="--", linewidth=3.0)
        ax.set_title(name)
        ax.set_xlabel("Local affinity")
    axes[0][0].set_ylabel("Density")
    axes[0][0].legend(loc="upper left")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def draw_roc(labels, scores, out_path: str) -> str:
    """ROC curve (reference ``draw_roc``, ``utils_tam.py:254-276``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = np.asarray(labels).ravel()
    scores = np.asarray(scores).ravel()
    order = np.argsort(-scores)
    l_sorted = labels[order]
    tpr = np.concatenate([[0], np.cumsum(l_sorted) / max(l_sorted.sum(), 1)])
    fpr = np.concatenate([[0], np.cumsum(1 - l_sorted)
                          / max((1 - l_sorted).sum(), 1)])
    _ensure_dir(out_path)
    fig, ax = plt.subplots()
    ax.plot(fpr, tpr)
    ax.plot([0, 1], [0, 1], "k--", linewidth=0.8)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def draw_pr(labels, scores, out_path: str) -> str:
    """Precision-recall curve (reference ``draw_pr``,
    ``utils_tam.py:279-301``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = np.asarray(labels).ravel()
    scores = np.asarray(scores).ravel()
    order = np.argsort(-scores)
    l_sorted = labels[order]
    tp = np.cumsum(l_sorted)
    precision = tp / np.arange(1, len(l_sorted) + 1)
    recall = tp / max(l_sorted.sum(), 1)
    _ensure_dir(out_path)
    fig, ax = plt.subplots()
    ax.plot(recall, precision)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
