"""GGAD's three-term training objective (reference ``run.py:164-210``).

    loss = 1·loss_margin + 1·loss_bce + 1·loss_rec

  * loss_bce — binary cross-entropy with logits over
    [normal nodes → 0, generated outliers → 1] with
    ``pos_weight = negsamp_ratio`` (reference ``run.py:137,164-172``).
  * loss_margin — asymmetric local-affinity margin: mean 1-hop affinity of
    labeled-normal nodes must exceed that of the generated outliers by
    ``confidence_margin = 0.7`` (reference ``run.py:174-205``). Computed
    here as an edge-space SDDMM (O(E·d)), not an N×N matmul.
  * loss_rec — egocentric closeness between the generated outliers and the
    noise-perturbed seed embeddings (reference ``run.py:207-208``).
    NB the reference reduces over the SEED axis, not per seed row — see
    the inline note at the computation below.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.models.ggad import GGADOutput
from ggad_tpu.ops.sddmm import node_affinity


def bce_with_logits(logits: jax.Array, labels: jax.Array,
                    pos_weight: float = 1.0) -> jax.Array:
    """Elementwise BCE-with-logits with positive-class weighting.

    Matches ``torch.nn.BCEWithLogitsLoss(pos_weight=w)``:
      l = (1-y)·softplus(x) + w·y·softplus(-x)
    """
    return ((1.0 - labels) * jax.nn.softplus(logits)
            + pos_weight * labels * jax.nn.softplus(-logits))


class GGADLosses(NamedTuple):
    total: jax.Array
    bce: jax.Array
    margin: jax.Array
    rec: jax.Array
    affinity_normal: jax.Array
    affinity_outlier: jax.Array


def ggad_losses(
    out: GGADOutput,
    raw_adj: Graph,
    seed_idx: jax.Array,
    normal_idx: jax.Array,
    *,
    confidence_margin: float = 0.7,
    pos_weight: float = 1.0,
    w_margin: float = 1.0,
    w_bce: float = 1.0,
    w_rec: float = 1.0,
    aff_sub=None,
) -> GGADLosses:
    """``aff_sub``: optional precomputed
    :class:`ggad_tpu.ops.sddmm.AffinitySubset` over
    ``[normal_idx ‖ seed_idx]`` — the margin only reads the affinity at
    those nodes, so the SDDMM restricts to their columns (O(E_sub·d)
    forward AND backward; identical values, tested)."""
    n_normal = normal_idx.shape[0]
    n_seed = seed_idx.shape[0]

    # BCE over [zeros(normals) ; ones(outliers)]  (run.py:165-172)
    labels = jnp.concatenate([
        jnp.zeros((n_normal, 1), jnp.float32),
        jnp.ones((n_seed, 1), jnp.float32),
    ])
    loss_bce = jnp.mean(bce_with_logits(out.logits, labels, pos_weight))

    # Local-affinity margin on the post-replacement embedding (run.py:174-205)
    if aff_sub is not None:
        from ggad_tpu.ops.sddmm import node_affinity_at

        aff = node_affinity_at(aff_sub, out.emb)
        aff_normal = jnp.mean(aff[:n_normal])
        aff_outlier = jnp.mean(aff[n_normal:])
    else:
        affinity = node_affinity(raw_adj, out.emb)
        aff_normal = jnp.mean(affinity[normal_idx])
        aff_outlier = jnp.mean(affinity[seed_idx])
    loss_margin = jnp.maximum(
        confidence_margin - (aff_normal - aff_outlier), 0.0)

    # Egocentric closeness (run.py:207-208). Reference quirk, verified by
    # EXECUTING run.py itself (scripts/reference_oracle.py): emb_abnormal
    # keeps its batch dim [1,S,h] while emb_con is [S,h], so
    # ``torch.sum(diff_attribute, 1)`` reduces over the SEED axis — the
    # loss is mean_h sqrt(Σ_s diff²), a per-dimension L2 across the seed
    # set, NOT the per-seed row norm every naive reading (ours included,
    # rounds 1-3) produces. The minibatch path (src/graphsage.py:192-199)
    # genuinely row-reduces because its tensors are feature-major [h,S].
    diff = jnp.square(out.emb_con - out.emb_abnormal)
    loss_rec = jnp.mean(jnp.sqrt(jnp.sum(diff, axis=0)))

    total = w_margin * loss_margin + w_bce * loss_bce + w_rec * loss_rec
    return GGADLosses(total, loss_bce, loss_margin, loss_rec,
                      aff_normal, aff_outlier)
