"""EXACT-mask minibatch GGAD — the reference's set-union aggregation.

The production minibatch path (:class:`~ggad_tpu.models.sage.MiniBatchGGAD`)
replaces the reference's per-batch Python set unions with fixed-fanout
sampling. The reference's ``GCN`` model, however, does NOT sample —
``GCNAggregator.forward`` (``src/graphsage.py:295-360``) builds the exact
union-of-neighbors mask, so given the same batch sequence its training
is fully deterministic. This module reproduces that computation
bit-for-semantics on padded static shapes, enabling

  * per-batch TRAJECTORY parity against the executed ``src/main.py``
    (``scripts/reference_oracle.py --leg minibatch``, which captures the
    reference's shuffled batch sequence and initial weights), and
  * the sampled-vs-exact 2-hop affinity bias measurement (SURVEY §7.4.5).

Reproduced reference semantics, quirks included (all CPU-branch —
the executed configuration; the reference's ``.cuda`` branches differ):

  * 1-hop: mask [B, U] over union(neighbors ∪ self), normalized
    mask/√rowsum/√colsum of the RECTANGULAR mask; ``to_feats`` has NO
    self-feature add (the CPU branch comments it out,
    ``src/graphsage.py:325-327``).
  * 2-hop (train): neighbor union of the 1-hop uniq nodes, same sym
    normalization; context = (mask/rowsum) @ relu(W · 2-hop feats).
  * REORDERING quirk: ``combined_all`` = [normals ‖ generated] while
    ``loss_cls``'s labels and the affinity's context stay in BATCH
    order (``src/graphsage.py:171-176,244-246,450``) — when a
    contaminated label-1 node sits mid-batch the score/label rows
    misalign exactly as the reference's do.
  * torch ``cosine_similarity`` eps: x·y / max(‖x‖‖y‖, 1e-8).
  * torch Adam ``weight_decay`` is COUPLED L2 (decay added to the grad
    before the moments — ``optax.adamw`` is decoupled and diverges);
    use :func:`coupled_adam`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ExactBatch:
    """Host-built padded batch structures (one compile per pad shape)."""

    nodes: jax.Array    # [B] int32 batch node ids
    labels: jax.Array   # [B] float32 0/1 (batch order)
    uniq: jax.Array     # [U_pad] int32 (0-padded)
    expand: jax.Array   # [E_pad] int32 (0-padded)
    mask1: jax.Array    # [B, U_pad] 0/1 — neighbors ∪ self
    mask2: jax.Array    # [U_pad, E_pad] 0/1 — rows zero on padding
    perm: jax.Array     # [B] int32: stable argsort(labels) — normals
    #                     first, anomalies last (the reference's cat
    #                     ordering)


def build_exact_batch(indptr: np.ndarray, indices: np.ndarray,
                      nodes: np.ndarray, labels: np.ndarray,
                      u_pad: int, e_pad: int,
                      two_hop: bool = True) -> ExactBatch:
    """Build the exact union masks for one batch from a CSR adjacency
    (which must already contain self-loops, like the reference's pickled
    ``adj_list``). ``two_hop=False`` (eval path) leaves mask2/expand
    empty."""
    nodes = np.asarray(nodes, np.int64)
    neighs = [set(indices[indptr[n]: indptr[n + 1]].tolist()) | {int(n)}
              for n in nodes]
    uniq_list = sorted(set().union(*neighs))
    uniq_pos = {n: i for i, n in enumerate(uniq_list)}
    m1 = np.zeros((len(nodes), u_pad), np.float32)
    for i, s in enumerate(neighs):
        m1[i, [uniq_pos[n] for n in s]] = 1.0

    m2 = np.zeros((u_pad, e_pad), np.float32)
    exp_list = []
    if two_hop:
        neighs2 = [set(indices[indptr[n]: indptr[n + 1]].tolist())
                   for n in uniq_list]
        exp_list = sorted(set().union(*neighs2))
        exp_pos = {n: i for i, n in enumerate(exp_list)}
        for i, s in enumerate(neighs2):
            m2[i, [exp_pos[n] for n in s]] = 1.0

    uniq = np.zeros(u_pad, np.int32)
    uniq[: len(uniq_list)] = uniq_list
    expand = np.zeros(e_pad, np.int32)
    expand[: len(exp_list)] = exp_list
    labels = np.asarray(labels, np.float32)
    perm = np.argsort(labels, kind="stable").astype(np.int32)
    return ExactBatch(
        nodes=jnp.asarray(nodes, jnp.int32),
        labels=jnp.asarray(labels),
        uniq=jnp.asarray(uniq), expand=jnp.asarray(expand),
        mask1=jnp.asarray(m1), mask2=jnp.asarray(m2),
        perm=jnp.asarray(perm))


def init_exact_params(rng: jax.Array, feat_dim: int,
                      emb_dim: int = 64) -> dict:
    """Xavier-uniform like the reference (``src/graphsage.py:168,388-390``)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    xav = jax.nn.initializers.xavier_uniform()
    return {
        "w_enc": xav(k1, (emb_dim, feat_dim), jnp.float32),
        "fc": xav(k2, (emb_dim, emb_dim), jnp.float32),
        "w_score": xav(k3, (1, emb_dim), jnp.float32),
    }


def _sym_norm(mask):
    r = jnp.sum(mask, axis=1, keepdims=True)
    c = jnp.sum(mask, axis=0, keepdims=True)
    ri = jnp.where(r > 0, jax.lax.rsqrt(jnp.maximum(r, 1e-30)), 0.0)
    ci = jnp.where(c > 0, jax.lax.rsqrt(jnp.maximum(c, 1e-30)), 0.0)
    return mask * ri * ci


def exact_forward(params: dict, feats: jax.Array, b: ExactBatch):
    """Mirror of ``GCNEncoder.forward`` + ``GCN.forward`` (train path).

    Returns (scores [B], combined_all [B, D] in reordered order,
    context [B, D] in batch order, rec_terms [B] masked to anomaly
    slots)."""
    to_feats = _sym_norm(b.mask1) @ feats[b.uniq]           # [B, F]
    r1 = jnp.sum(b.mask1, axis=1, keepdims=True)
    mask_row = b.mask1 * jnp.where(r1 > 0, 1.0 / jnp.maximum(r1, 1e-30),
                                   0.0)
    nf_expand = _sym_norm(b.mask2) @ feats[b.expand]        # [U, F]

    combined = jax.nn.relu(to_feats @ params["w_enc"].T)    # [B, D]
    combined_expand = jax.nn.relu(nf_expand @ params["w_enc"].T)
    context = mask_row @ combined_expand                    # [B, D]

    cp = combined[b.perm]
    ctxp = context[b.perm]
    gen = jax.nn.relu(ctxp @ params["fc"].T)                # [B, D]
    am = b.labels[b.perm] == 1
    combined_all = jnp.where(am[:, None], gen, cp)          # [B, D]

    scores = (combined_all @ params["w_score"].T)[:, 0]     # [B]
    # recon2: per-anomaly sqrt of the FEATURE-axis sum
    rec_rows = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(cp - gen), axis=1), 1e-30))
    rec_terms = jnp.where(am, rec_rows, 0.0)
    return scores, combined_all, context, rec_terms, am


def exact_losses(params: dict, feats: jax.Array, b: ExactBatch):
    """total, (cls, constraint, rec) — ``GCN.loss``
    (``src/graphsage.py:244-258``), quirks preserved."""
    scores, combined_all, context, rec_terms, am = exact_forward(
        params, feats, b)
    # BCEWithLogits vs labels in BATCH order against reordered scores
    loss_cls = jnp.mean((1 - b.labels) * jax.nn.softplus(scores)
                        + b.labels * jax.nn.softplus(-scores))

    # affinity: cos(combined_all[i], context[i]) — context in batch
    # order (the reference's half-scrambled pairing)
    num = jnp.sum(combined_all * context, axis=1)
    den = jnp.linalg.norm(combined_all, axis=1) \
        * jnp.linalg.norm(context, axis=1)
    aff = num / jnp.maximum(den, 1e-8)          # torch cosine eps
    n_norm = jnp.sum(1 - b.labels)
    n_anom = jnp.maximum(jnp.sum(b.labels), 1.0)
    aff_norm = jnp.sum(jnp.where(b.labels == 0, aff, 0.0)) \
        / jnp.maximum(n_norm, 1.0)
    aff_anom = jnp.sum(jnp.where(b.labels == 1, aff, 0.0)) / n_anom
    loss_constraint = jnp.maximum(1.0 - (aff_norm - aff_anom), 0.0)

    loss_rec = jnp.sum(rec_terms) / jnp.maximum(jnp.sum(am), 1.0)
    total = loss_cls + loss_constraint + 0.1 * loss_rec
    return total, (loss_cls, loss_constraint, loss_rec)


def exact_scores(params: dict, feats: jax.Array, b: ExactBatch):
    """Eval-path probabilities (``GCN.to_prob``): sigmoid(w·combined),
    NO reordering (train_flag=False)."""
    to_feats = _sym_norm(b.mask1) @ feats[b.uniq]
    combined = jax.nn.relu(to_feats @ params["w_enc"].T)
    return jax.nn.sigmoid((combined @ params["w_score"].T)[:, 0])


def coupled_adam(lr: float, weight_decay: float):
    """torch ``Adam(weight_decay=wd)``: L2 added to the GRADIENT before
    the moment updates (coupled) — optax.adamw's decoupled decay
    diverges from it after a few steps."""
    import optax

    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale(-lr),
    )
