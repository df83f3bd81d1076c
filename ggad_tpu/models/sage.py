"""Mini-batch GraphSAGE/GCN models (the DGraph-scale path).

TPU-native re-design of the reference ``src/`` path:

  * The reference aggregates by Python set-unions over a pickled adjacency
    dict and dense batch×uniq mask matmuls (``src/graphsage.py:295-360``).
    Here a device-resident :class:`~ggad_tpu.sampler.NeighborTable` feeds
    fixed-fanout sampled gathers with static [B, K] shapes — the whole
    step (sampling included) is one compiled XLA program.
  * The reference's GCN-mode mask normalization
    ``mask / sqrt(rowsum) / sqrt(colsum)`` has batch-local column sums that
    are ≈1 for large graphs; the TPU path uses the deterministic equivalent
    ``sqrt(deg) · mean(·)`` over sampled neighbors (documented deviation;
    both reduce to the same full-neighborhood expression when colsum == 1).
  * The reference's train-mode 2-hop expansion enumerates
    neighbors-of-neighbors exactly (frontier explosion,
    ``src/graphsage.py:331-358``); here it is a bounded K1×K2 sample.
  * Anomaly slots sit at the *end* of each batch with a static count, so
    generation/concat have static shapes. (The reference appends its 50
    seed nodes at the end too — ``src/model_handler.py:330-348``.)

Semantics preserved exactly (reference ``src/graphsage.py:363-454``,
``157-272``): outlier generation from 2-hop aggregates via a ReLU fc,
scalar one-class scorer, BCE + cosine-affinity margin (margin = 1) +
0.1·egocentric closeness.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.nn.layers import DenseNoBias, xavier_uniform
from ggad_tpu.sampler.neighbor import (
    NeighborTable,
    sample_neighbors,
    sample_two_hop,
)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    num = jnp.sum(x * jnp.expand_dims(mask, -1), axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return num / jnp.expand_dims(den, -1)


class MiniBatchGGADOutput(NamedTuple):
    combined_all: jax.Array     # [B, emb] final embeddings (anomaly slots
                                # hold the generated outliers in train mode)
    scores: jax.Array           # [B] one-class logits
    context: jax.Array          # [B, emb] 2-hop affinity context (train)
    anomaly_feat: jax.Array     # [S, emb] encoder embedding of seed slots
    anomaly_feat_new: jax.Array  # [S, emb] generated outliers


class MiniBatchGGAD(nn.Module):
    """GGAD over sampled neighborhoods (reference ``src/graphsage.py`` GCN
    aggregator + GCNEncoder + GCN scorer, fused into one module)."""

    emb_dim: int = 64
    fanout1: int = 16
    fanout2: int = 8
    agg: str = "gcn"   # "gcn": sqrt(deg)·mean;  "mean": plain mean

    def _agg_weight(self, table: NeighborTable, nodes: jax.Array) -> jax.Array:
        if self.agg == "gcn":
            deg = table.degrees_of(nodes).astype(jnp.float32)
            return jnp.sqrt(jnp.maximum(deg, 1.0))
        return jnp.ones(nodes.shape, jnp.float32)

    @nn.compact
    def __call__(self, feats: jax.Array, table: NeighborTable,
                 batch: jax.Array, n_anom: int, train: bool = True
                 ) -> MiniBatchGGADOutput:
        """``batch``: [B] node ids; the last ``n_anom`` are anomaly slots
        (outlier-seed nodes). ``feats``: [N, F] frozen feature table."""
        w_enc = self.param("w_enc", xavier_uniform,
                           (feats.shape[-1], self.emb_dim), jnp.float32)
        w_score = self.param("w_score", xavier_uniform,
                             (self.emb_dim, 1), jnp.float32)
        fc_gen = DenseNoBias(self.emb_dim, name="fc_gen")

        rng = self.make_rng("sample")
        b = batch.shape[0]

        if train:
            n1, m1, n2, m2 = sample_two_hop(
                table, batch, self.fanout1, self.fanout2, rng)
        else:
            n1, m1 = sample_neighbors(table, batch, self.fanout1, rng)

        # 1-hop feature aggregate of each batch node (table includes
        # self-loops, so "self" participates like the reference's union).
        x1 = feats[n1]                                    # [B, K1, F]
        agg_b = masked_mean(x1, m1, axis=1) \
            * self._agg_weight(table, batch)[:, None]     # [B, F]
        combined = jax.nn.relu(agg_b @ w_enc)             # [B, emb]

        if not train:
            zeros = jnp.zeros((n_anom, self.emb_dim), jnp.float32)
            scores = (combined @ w_score)[:, 0]
            return MiniBatchGGADOutput(combined, scores,
                                       jnp.zeros_like(combined),
                                       zeros, zeros)

        # 2-hop: encode each sampled neighbor from ITS neighbors, then
        # mean-aggregate those encodings per batch node (the affinity
        # context — reference src/graphsage.py:419-421).
        x2 = feats[n2]                                    # [B, K1, K2, F]
        agg_n1 = masked_mean(x2, m2, axis=2) \
            * self._agg_weight(table, n1)[..., None]      # [B, K1, F]
        combined_expand = jax.nn.relu(agg_n1 @ w_enc)     # [B, K1, emb]
        context = masked_mean(combined_expand, m1, axis=1)  # [B, emb]

        # Outlier generation from the anomaly slots' 2-hop context
        # (reference src/graphsage.py:427-430).
        anomaly_feat = combined[b - n_anom:]
        anomaly_ctx = context[b - n_anom:]
        anomaly_feat_new = jax.nn.relu(fc_gen(anomaly_ctx))

        combined_all = jnp.concatenate(
            [combined[: b - n_anom], anomaly_feat_new], axis=0)
        scores = (combined_all @ w_score)[:, 0]
        return MiniBatchGGADOutput(combined_all, scores, context,
                                   anomaly_feat, anomaly_feat_new)


class MiniBatchGGADLosses(NamedTuple):
    total: jax.Array
    cls: jax.Array
    constraint: jax.Array
    rec: jax.Array


def minibatch_ggad_losses(out: MiniBatchGGADOutput, n_anom: int,
                          *, confidence_margin: float = 1.0,
                          w_rec: float = 0.1) -> MiniBatchGGADLosses:
    """Composite loss (reference ``src/graphsage.py:244-258``):
    1·BCE + 1·affinity-margin(cos, margin=1) + 0.1·ego-closeness."""
    b = out.scores.shape[0]
    labels = jnp.concatenate([jnp.zeros(b - n_anom), jnp.ones(n_anom)])
    loss_cls = jnp.mean(
        (1 - labels) * jax.nn.softplus(out.scores)
        + labels * jax.nn.softplus(-out.scores))

    # cosine affinity between final embedding and 2-hop context
    def l2n(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, 1e-8)

    aff = jnp.sum(l2n(out.combined_all) * l2n(out.context), axis=-1)
    aff_norm = jnp.mean(aff[: b - n_anom])
    aff_anom = jnp.mean(aff[b - n_anom:])
    loss_constraint = jnp.maximum(
        confidence_margin - (aff_norm - aff_anom), 0.0)

    diff = jnp.square(out.anomaly_feat - out.anomaly_feat_new)
    loss_rec = jnp.mean(jnp.sqrt(jnp.sum(diff, axis=1)))

    total = loss_cls + loss_constraint + w_rec * loss_rec
    return MiniBatchGGADLosses(total, loss_cls, loss_constraint, loss_rec)


class GraphSAGEClassifier(nn.Module):
    """Vanilla supervised GraphSAGE baseline (reference
    ``src/graphsage.py:19-43,102-154``): concat(self, mean-neigh) →
    ReLU(W·) → class scores, cross-entropy loss."""

    emb_dim: int = 64
    fanout: int = 5
    num_classes: int = 2

    @nn.compact
    def __call__(self, feats: jax.Array, table: NeighborTable,
                 batch: jax.Array) -> jax.Array:
        f = feats.shape[-1]
        w = self.param("w_enc", xavier_uniform,
                       (2 * f, self.emb_dim), jnp.float32)
        w_cls = self.param("w_cls", xavier_uniform,
                           (self.emb_dim, self.num_classes), jnp.float32)
        rng = self.make_rng("sample")
        n1, m1 = sample_neighbors(table, batch, self.fanout, rng)
        neigh = masked_mean(feats[n1], m1, axis=1)
        combined = jnp.concatenate([feats[batch], neigh], axis=-1)
        h = jax.nn.relu(combined @ w)
        return h @ w_cls
