"""DOMINANT baseline (reconstruction-based AD).

Reference adaptation (``model_domaint.py``, ``dominant.py``): a structure
branch (Linear→ReLU→2-layer PyG ``GCN``) whose output is computed but
*unused* for scoring (the structure reconstruction term is commented out,
``model_domaint.py:113-125``), and an attribute MLP autoencoder
(dense_attr_1→ReLU→dense_attr_2) whose per-row L2 reconstruction error is
both the training loss (over labeled normals) and the anomaly score.

Because the structure branch neither contributes to the score nor
receives a gradient, the reference trajectory depends ONLY on the
attribute branch — confirmed by EXECUTING ``dominant.py`` through
``scripts/reference_oracle.py`` (per-epoch loss parity).

We reproduce that default (``structure_weight = 1.0`` ⇒ attribute-only)
and additionally expose the structure term (blockwise, never N×N-resident)
for the full DOMINANT objective. Structure-branch faithfulness to PyG
2.1.0's ``GCN(n_h, n_in, num_layers=2)`` (``model_domaint.py:90,147-151``):
ReLU between the two convs, NO activation after the last, and GCNConv
re-normalizes the BINARIZED graph (``gcn_norm``) regardless of the edge
weights it is handed — pass ``gcn_adj=gcn_norm_graph(adj)`` for that
(``ggad_tpu.train.baselines.run_reconstruction`` does). The reference's
per-epoch O(N²) Python edge-list scan (``model_domaint.py:7-12``) has no
equivalent here — the sparse graph is device-resident from load.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.nn.layers import GCNLayer
from ggad_tpu.ops.dense_blocks import (
    attr_row_error,
    sigmoid_structure_row_error,
)


class DominantOutput(NamedTuple):
    emb: jax.Array      # structure-branch embedding [N, n_in]
    x_rec: jax.Array    # attribute reconstruction [N, n_in]
    scores: jax.Array   # per-node anomaly scores [N]


class Dominant(nn.Module):
    n_h: int = 300
    structure_weight: float = 1.0   # 1.0 = attr-only (reference default)

    @nn.compact
    def __call__(self, adj: Graph, x: jax.Array,
                 gcn_adj: Optional[Graph] = None) -> DominantOutput:
        # structure branch: Linear+ReLU then PyG-style 2-layer GCN back
        # to n_in dims (ReLU between convs only; ``gcn_adj`` should be
        # the gcn_norm-re-normalized graph for PyG parity)
        g = gcn_adj if gcn_adj is not None else adj
        h = jax.nn.relu(nn.Dense(self.n_h, name="dense_stru")(x))
        h = GCNLayer(x.shape[-1], act="relu", name="gcn1")(g, h)
        emb = GCNLayer(x.shape[-1], act="none", name="gcn2")(g, h)

        # attribute branch: 2-layer MLP AE
        a = jax.nn.relu(nn.Dense(self.n_h, name="dense_attr_1")(x))
        x_rec = nn.Dense(x.shape[-1], name="dense_attr_2")(a)

        score = self.structure_weight * attr_row_error(x, x_rec)
        if self.structure_weight < 1.0:
            stru = sigmoid_structure_row_error(adj, emb)
            score = score + (1.0 - self.structure_weight) * stru
        return DominantOutput(emb, x_rec, score)


def dominant_loss(out: DominantOutput, train_idx: jax.Array) -> jax.Array:
    """Mean score over labeled normal nodes (reference ``dominant.py:138``)."""
    return jnp.mean(out.scores[train_idx])
