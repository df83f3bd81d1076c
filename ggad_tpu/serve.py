"""Inference/serving path: restore a trained GGAD checkpoint and score.

The reference has no inference entry point (scores only exist inside its
training loops, ``run.py:230-240``); production deployment needs one:

    scores = score_dataset("ckpts/photo", dataset)          # library
    python -m ggad_tpu.cli --dataset photo --score_only \
        --checkpoint_dir ckpts/photo --score_out scores.npz  # CLI

Scoring is a single jitted forward (the trainer's eval program — one
one-class logit per node, higher = more anomalous); metrics are computed
on whatever labels the dataset carries.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass
class ScoreResult:
    scores: np.ndarray     # [N] anomaly scores (one-class logits)
    auc: float
    ap: float
    step: Optional[int]    # checkpoint step restored (None = fresh init)


def score_dataset(checkpoint_dir: str, dataset, *,
                  embedding_dim: int = 300,
                  spmm_impl: str = "auto",
                  spmm_dtype: str = "float32",
                  subset: str = "test") -> ScoreResult:
    """Restore the latest checkpoint and score every node of ``dataset``.

    The checkpoint must come from ``FullBatchTrainer(checkpoint_dir=...)``
    with the same ``embedding_dim``.
    """
    from ggad_tpu.ops.metrics import average_precision, roc_auc
    from ggad_tpu.train.checkpoint import Checkpointer
    from ggad_tpu.train.full_batch import FullBatchTrainer

    tr = FullBatchTrainer(dataset, num_epoch=0,
                          embedding_dim=embedding_dim,
                          spmm_impl=spmm_impl, spmm_dtype=spmm_dtype)
    rng = jax.random.PRNGKey(0)
    params, opt_state = tr.init(rng)

    ckpt = Checkpointer(checkpoint_dir)
    step = ckpt.latest_step()
    if step is not None:
        template = jax.device_get(
            {"params": params, "opt_state": opt_state, "rng": rng,
             "epoch": 0})
        restored = ckpt.restore(template=template)
        params = jax.device_put(restored["params"])

    scores = tr.eval_scores(params)
    idx = {"test": dataset.idx_test, "val": dataset.idx_val,
           "train": dataset.idx_train,
           "all": np.arange(dataset.n_nodes)}[subset]
    return ScoreResult(
        scores=scores,
        auc=roc_auc(dataset.ano_labels[idx], scores[idx]),
        ap=average_precision(dataset.ano_labels[idx], scores[idx]),
        step=step,
    )
