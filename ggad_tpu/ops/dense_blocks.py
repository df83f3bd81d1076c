"""Blockwise all-pairs reductions (structure-reconstruction errors).

Several baselines score nodes by the per-row error of a reconstructed
adjacency ``s_ = σ(E Eᵀ)`` against the dense adjacency (AnomalyDAE:
reference ``model_AnomalyDAE.py:252-267, 289-301``; GAAN edge logits).
The reference materializes the full N×N matrix; here the row error

    stru_err_i = sqrt( Σ_j (a_ij − σ(e_i·e_j))² )
               = sqrt( Σ_j σ(e_i·e_j)²  −  2·Σ_{j∈N(i)} a_ij σ(e_i·e_j)
                       + Σ_j a_ij² )

is computed exactly with (1) a blockwise scan over column blocks for the
all-pairs term (MXU matmuls, O(N·block) memory) and (2) edge-space SDDMM
for the adjacency cross terms — no N×N tensor is ever resident.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.ops.sddmm import sddmm_dot


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def blockwise_pair_reduce(emb: jax.Array, fn, block: int = 1024,
                          precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Return r_i = Σ_j fn(e_i · e_j), scanning j in column blocks."""
    n, d = emb.shape
    n_pad = _round_up(n, block)
    embp = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    n_blocks = n_pad // block
    col_ids = jnp.arange(block)

    # rematerialized: without checkpoint the scan's backward saves every
    # block's [N, block] similarity panel (46 x 190 MB = 8.7 GB at
    # elliptic scale -> chip OOM, round-5 zoo run); recomputing s in the
    # backward keeps memory O(N x block)
    @jax.checkpoint
    def panel(emb, embp, blk):
        e_blk = jax.lax.dynamic_slice(embp, (blk * block, 0), (block, d))
        mask = (blk * block + col_ids) < n
        s = jnp.dot(emb, e_blk.T, preferred_element_type=jnp.float32,
                    precision=precision)
        return jnp.sum(jnp.where(mask[None, :], fn(s), 0.0), axis=1)

    def body(acc, blk):
        return acc + panel(emb, embp, blk), None

    acc, _ = jax.lax.scan(body, jnp.zeros(n, jnp.float32),
                          jnp.arange(n_blocks))
    return acc


def sigmoid_structure_row_error(g: Graph, emb: jax.Array,
                                block: int = 1024) -> jax.Array:
    """Per-row L2 error between A (``g``, dense semantics incl. weights)
    and σ(emb embᵀ) — the AnomalyDAE structure term, O(N²d/block-resident).
    """
    # Σ_j σ(e_i·e_j)²
    term1 = blockwise_pair_reduce(
        emb, lambda s: jnp.square(jax.nn.sigmoid(s)), block=block)
    # −2 Σ_edges a_ij σ(e_i·e_j)   (row-indexed)
    edge_sig = jax.nn.sigmoid(
        jnp.einsum("ed,ed->e", emb[g.row], emb[g.col],
                   preferred_element_type=jnp.float32))
    cross = jax.ops.segment_sum(edge_sig * g.val, g.row,
                                num_segments=g.n_nodes,
                                indices_are_sorted=True)
    # Σ_j a_ij²
    a_sq = jax.ops.segment_sum(jnp.square(g.val), g.row,
                               num_segments=g.n_nodes,
                               indices_are_sorted=True)
    sq = jnp.maximum(term1 - 2.0 * cross + a_sq, 0.0)
    return jnp.sqrt(sq)


def attr_row_error(x: jax.Array, x_rec: jax.Array) -> jax.Array:
    """Per-row L2 attribute reconstruction error (reference
    ``double_recon_loss`` attr term, ``model_AnomalyDAE.py:203-213``)."""
    return jnp.sqrt(jnp.sum(jnp.square(x - x_rec), axis=1))
