"""PC-GNN-style multi-relation model with GGAD's affinity margin.

Reference (``src/layers.py``, ``src/model.py`` — "Pick and Choose"
adapted): per relation r, a mean aggregation of neighbor features →
ReLU(·W_r), plus a 2-hop sym-normalized context; relations concatenate
and pass a shared transform; the loss is cross-entropy on a 2-class head
plus 5× the cosine-affinity margin (margin = 1) between the final
embedding and its 2-hop context (``src/model.py:34-47``).

The reference's label-aware neighbor filtering (``choose_step_neighs``)
is dead code there (calls commented at ``src/layers.py:195-199``) and is
not carried; its ``label_clf`` scores are likewise computed-but-unused.

TPU re-design mirrors :mod:`ggad_tpu.models.sage`: per-relation
fixed-fanout sampled gathers with static shapes; the homogeneous case
passes the same NeighborTable for every relation.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.models.sage import masked_mean
from ggad_tpu.nn.layers import xavier_uniform
from ggad_tpu.sampler.neighbor import NeighborTable, sample_two_hop


class PCGNNOutput(NamedTuple):
    embeds: jax.Array    # [B, emb]
    affinity: jax.Array  # [B]
    scores: jax.Array    # [B, num_classes]


class PCGNN(nn.Module):
    emb_dim: int = 64
    n_relations: int = 3
    fanout1: int = 16
    fanout2: int = 8
    num_classes: int = 2

    @nn.compact
    def __call__(self, feats: jax.Array, tables: Sequence[NeighborTable],
                 batch: jax.Array) -> PCGNNOutput:
        assert len(tables) == self.n_relations
        f = feats.shape[-1]
        w_inter = self.param("w_inter", xavier_uniform,
                             (self.emb_dim * self.n_relations, self.emb_dim),
                             jnp.float32)
        w_cls = self.param("w_cls", xavier_uniform,
                           (self.emb_dim, self.num_classes), jnp.float32)

        rng = self.make_rng("sample")
        r_feats, r_ctx = [], []
        for r, table in enumerate(tables):
            w_r = self.param(f"w_r{r}", xavier_uniform,
                             (f, self.emb_dim), jnp.float32)
            rng, sub = jax.random.split(rng)
            n1, m1, n2, m2 = sample_two_hop(table, batch, self.fanout1,
                                            self.fanout2, sub)
            # intra: mean aggregation of 1-hop features (IntraAgg mask.div)
            agg = masked_mean(feats[n1], m1, axis=1)
            r_feats.append(jax.nn.relu(agg @ w_r))
            # 2-hop context: sym-ish aggregate of neighbor aggregates
            deg1 = (table.indptr[n1 + 1]
                    - table.indptr[n1]).astype(jnp.float32)
            agg2 = masked_mean(feats[n2], m2, axis=2) \
                * jnp.sqrt(jnp.maximum(deg1, 1.0))[..., None]
            ctx_r = jax.nn.relu(agg2 @ w_r)             # [B, K1, emb]
            r_ctx.append(masked_mean(ctx_r, m1, axis=1))  # mask_r.mm(...)

        cat = jnp.concatenate(r_feats, axis=-1)
        embeds = jax.nn.relu(cat @ w_inter)
        ctx = jax.nn.relu(jnp.concatenate(r_ctx, axis=-1) @ w_inter)

        def l2n(v):
            n = jnp.linalg.norm(v, axis=-1, keepdims=True)
            return jnp.where(n > 0, v / jnp.maximum(n, 1e-12), 0.0)

        affinity = jnp.sum(l2n(ctx) * l2n(embeds), axis=-1)
        scores = embeds @ w_cls
        return PCGNNOutput(embeds, affinity, scores)


def pcgnn_loss(out: PCGNNOutput, labels: jax.Array,
               *, lambda_constraint: float = 5.0,
               confidence_margin: float = 1.0):
    """CE + λ·affinity-margin (reference ``src/model.py:42-47``).

    ``labels``: [B] int {0,1}; both classes must be present in the batch
    (the handler appends anomaly slots, as in the reference).
    """
    logp = jax.nn.log_softmax(out.scores, axis=-1)
    loss_cls = -jnp.mean(jnp.take_along_axis(
        logp, labels[:, None], axis=1)[:, 0])

    is_anom = labels == 1
    n_anom = jnp.maximum(jnp.sum(is_anom), 1)
    n_norm = jnp.maximum(jnp.sum(~is_anom), 1)
    aff_norm = jnp.sum(jnp.where(~is_anom, out.affinity, 0.0)) / n_norm
    aff_anom = jnp.sum(jnp.where(is_anom, out.affinity, 0.0)) / n_anom
    loss_margin = jnp.maximum(
        confidence_margin - (aff_norm - aff_anom), 0.0)
    return loss_cls + lambda_constraint * loss_margin, loss_cls, loss_margin


def pcgnn_prob(out: PCGNNOutput) -> jax.Array:
    """Anomaly probability = sigmoid of the class-1 logit (reference
    ``PCALayer.to_prob``)."""
    return jax.nn.sigmoid(out.scores[:, 1])
