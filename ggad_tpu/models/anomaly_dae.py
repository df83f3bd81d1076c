"""AnomalyDAE baseline (dual autoencoder).

Reference (``model_AnomalyDAE.py``, ``anomalyDAE.py``):
  * structure branch: Linear(n_in→n_h)+ReLU → GATConv(n_h→n_in);
    s_ = σ(emb embᵀ);
  * attribute branch: 2-layer MLP AE;
  * score_i = α·‖x_i − x̂_i‖₂ + (1−α)·‖a_i − s_i‖₂ with α = 0.5
    (``model_AnomalyDAE.py:277-283``; pos weights η = θ = 1 make the
    weighting branchless);
  * train loss = mean score over labeled normals; eval score on test rows.

The N×N structure error is computed blockwise
(:func:`ggad_tpu.ops.dense_blocks.sigmoid_structure_row_error`) — exact
same math, never materialized. Note the reference compares against the
*normalized+I* adjacency rows (its ``adj`` variable), so ``adj`` here is
the same normalized graph.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.nn.layers import GATLayer
from ggad_tpu.ops.dense_blocks import (
    attr_row_error,
    sigmoid_structure_row_error,
)


class AnomalyDAEOutput(NamedTuple):
    emb: jax.Array
    x_rec: jax.Array
    scores: jax.Array


class AnomalyDAE(nn.Module):
    n_h: int = 300
    alpha: float = 0.5

    @nn.compact
    def __call__(self, adj: Graph, x: jax.Array) -> AnomalyDAEOutput:
        h = jax.nn.relu(nn.Dense(self.n_h, name="dense_stru")(x))
        emb = GATLayer(x.shape[-1], name="gat")(adj, h)

        a = jax.nn.relu(nn.Dense(self.n_h, name="dense_attr_1")(x))
        x_rec = nn.Dense(x.shape[-1], name="dense_attr_2")(a)

        attr_err = attr_row_error(x, x_rec)
        stru_err = sigmoid_structure_row_error(adj, emb)
        scores = self.alpha * attr_err + (1.0 - self.alpha) * stru_err
        return AnomalyDAEOutput(emb, x_rec, scores)


def anomaly_dae_loss(out: AnomalyDAEOutput,
                     train_idx: jax.Array) -> jax.Array:
    return jnp.mean(out.scores[train_idx])
