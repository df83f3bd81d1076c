"""Train/val/test splitting with the reference's exact semantics.

Reference ``utils.py:89-141``:
  * shuffle all node ids; 30% train / 10% val / 60% test;
  * labeled normals = first ``rate`` (default 0.5) of the normal nodes in
    the train split;
  * shuffle labeled normals; the outlier-seed set ("abnormal_label_idx") is
    the first ``seed_frac`` of them (0.05 for Amazon, 0.15 otherwise).

The reference draws from Python's global ``random`` module; we use a
dedicated ``numpy.random.Generator`` so splits are reproducible and
self-contained, while preserving the *distributional* semantics (same
split sizes, same selection structure).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SplitResult:
    idx_train: np.ndarray
    idx_val: np.ndarray
    idx_test: np.ndarray
    normal_label_idx: np.ndarray
    abnormal_label_idx: np.ndarray


def reference_split(
    ano_labels: np.ndarray,
    *,
    seed: int = 0,
    train_rate: float = 0.3,
    val_rate: float = 0.1,
    labeled_normal_rate: float = 0.5,
    seed_frac: float = 0.15,
    contamination_add_rate: float = 0.0,
    contamination_remove_rate: float = 0.0,
) -> SplitResult:
    """Reproduce the reference split semantics with a seeded RNG.

    ``contamination_add_rate``: fraction of real anomalies injected into
    the labeled-normal set (and, with ``contamination_remove_rate``,
    removed from the test split) — the reference's commented robustness
    experiments (``utils.py:111-127``) as first-class options.
    """
    rng = np.random.default_rng(seed)
    n = int(ano_labels.shape[0])
    all_idx = rng.permutation(n)
    n_train = int(n * train_rate)
    n_val = int(n * val_rate)
    idx_train = all_idx[:n_train]
    idx_val = all_idx[n_train:n_train + n_val]
    idx_test = all_idx[n_train + n_val:]

    normals_in_train = idx_train[ano_labels[idx_train] == 0]
    n_labeled = int(len(normals_in_train) * labeled_normal_rate)
    normal_label_idx = normals_in_train[:n_labeled].copy()

    if contamination_add_rate > 0:
        real_abnormal = all_idx[ano_labels[all_idx] == 1].copy()
        rng.shuffle(real_abnormal)
        add = real_abnormal[: int(contamination_add_rate
                                  * len(real_abnormal))]
        remove_rate = contamination_remove_rate or contamination_add_rate
        remove = real_abnormal[: int(remove_rate * len(real_abnormal))]
        normal_label_idx = np.concatenate([normal_label_idx, add])
        idx_test = np.setdiff1d(idx_test, remove)

    rng.shuffle(normal_label_idx)
    n_seed = int(len(normal_label_idx) * seed_frac)
    abnormal_label_idx = normal_label_idx[:n_seed].copy()

    return SplitResult(
        idx_train=np.sort(idx_train),
        idx_val=np.sort(idx_val),
        idx_test=np.sort(idx_test),
        normal_label_idx=normal_label_idx,
        abnormal_label_idx=abnormal_label_idx,
    )


def camouflage_features(features: np.ndarray, ano_labels: np.ndarray,
                        normal_label_idx: np.ndarray,
                        replace_rate: float = 0.05) -> np.ndarray:
    """Camouflage robustness variant (reference ``utils.py:129-133``):
    overwrite the first ``replace_rate`` fraction of feature columns of
    every real anomaly with the labeled-normal mean."""
    feats = np.array(features, copy=True)
    normal_mean = feats[normal_label_idx].mean(axis=0)
    k = int(replace_rate * feats.shape[1])
    anom = np.flatnonzero(ano_labels == 1)
    feats[np.ix_(anom, np.arange(k))] = normal_mean[:k]
    return feats


def minibatch_split(
    ano_labels: np.ndarray,
    *,
    seed: int = 72,
    labeled_rate: float = 0.3,
    pseudo_anomaly_frac: float = 0.05,
    contamination_frac: float = 0.0,
    test_ratio: float = 0.6,
):
    """DGraph-style split (reference ``src/model_handler.py:150-178``).

      * 30% of normal nodes become labeled;
      * the first 5% of those are *relabeled* as pseudo-anomalies (seeds);
      * optionally ``contamination_frac`` of real anomalies are moved into
        the train set (and removed from eval);
      * the rest is split valid/test stratified by label.

    Returns (idx_train, idx_valid, idx_test, labels_mutated, idx_anomaly).
    """
    rng = np.random.default_rng(seed)
    labels = np.asarray(ano_labels).copy()
    n = labels.shape[0]
    idx_normal = np.flatnonzero(labels == 0)
    idx_real_abnormal = np.flatnonzero(labels == 1)

    rng.shuffle(idx_normal)
    idx_labeled = idx_normal[: int(len(idx_normal) * labeled_rate)]
    idx_anomaly = idx_labeled[: int(len(idx_labeled) * pseudo_anomaly_frac)]
    labels[idx_anomaly] = 1

    idx_train = np.setdiff1d(idx_labeled, idx_anomaly)
    contaminate = idx_real_abnormal[
        : int(len(idx_real_abnormal) * contamination_frac)]
    idx_train = np.concatenate([idx_train, contaminate])

    idx_rest = np.setdiff1d(np.arange(n), idx_labeled)
    idx_rest = np.setdiff1d(idx_rest, contaminate)
    # stratified valid/test split
    rest_labels = labels[idx_rest]
    idx_valid_parts, idx_test_parts = [], []
    for cls in np.unique(rest_labels):
        cls_idx = idx_rest[rest_labels == cls]
        rng.shuffle(cls_idx)
        n_test = int(round(len(cls_idx) * test_ratio))
        idx_test_parts.append(cls_idx[:n_test])
        idx_valid_parts.append(cls_idx[n_test:])
    idx_valid = np.concatenate(idx_valid_parts)
    idx_test = np.concatenate(idx_test_parts)
    rng.shuffle(idx_valid)
    rng.shuffle(idx_test)

    return idx_train, idx_valid, idx_test, labels, idx_anomaly
