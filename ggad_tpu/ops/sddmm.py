"""SDDMM and the GGAD local-affinity computation.

The reference materializes an N×N cosine-similarity matrix and masks it by
the raw adjacency (``run.py:182-188``):

    sim = emb_norm @ emb_norm.T          # O(N²·d)  (!)
    similar = sim * raw_adj
    affinity = similar.sum(0) * (raw_adj.sum(0) ** -1)

Only edge entries of ``sim`` survive the mask, so this is exactly a sampled
dense-dense matmul (SDDMM) over raw_adj's edges followed by a column
segment-sum — O(E·d). The math is identical (tests verify against the dense
oracle to 1e-6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph


def sddmm_dot(g: Graph, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-edge dot product  e ↦ val[e] · ⟨a[row[e]], b[col[e]]⟩.

    Returns [E_pad] float32; padding edges give 0 because val == 0.
    """
    return jnp.einsum("ed,ed->e", a[g.row], b[g.col],
                      preferred_element_type=jnp.float32) * g.val


def l2_normalize_rows(x: jax.Array) -> jax.Array:
    """Row L2-normalize with the reference's inf-guard semantics.

    Reference (``run.py:177-180``): norm⁻¹ with infinities (zero rows)
    replaced by 0, so zero rows stay zero.
    """
    # the zero-guard must sit INSIDE the sqrt: sqrt'(0) = inf would NaN
    # the gradient of zero rows (0 · inf) even when the result is masked
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    pos = sq > 0
    norm = jnp.sqrt(jnp.where(pos, sq, 1.0))
    return x * jnp.where(pos, 1.0 / norm, 0.0)


def edge_cosine(g: Graph, emb: jax.Array) -> jax.Array:
    """Cosine similarity along each edge of ``g`` (val-weighted)."""
    return sddmm_dot(g, l2_normalize_rows(emb), l2_normalize_rows(emb))


def node_affinity(g: Graph, emb: jax.Array) -> jax.Array:
    """GGAD's per-node local affinity (reference ``run.py:177-188``).

    affinity[j] = (Σ_{e: col[e]=j} cos(emb[row[e]], emb[j]) · val[e])
                  / (Σ_{e: col[e]=j} val[e])

    with 1/0 → 0 (isolated nodes). ``g`` must be the *raw* adjacency plus
    self-loops (A + I), exactly as the reference's ``raw_adj``.

    When ``g`` carries BCSR tiles the numerator runs on the MXU
    (``ggad_tpu.ops.pallas_sddmm``) — same math, ~10× less HBM traffic
    than the edge-parallel gather/scatter path.
    """
    from ggad_tpu.ops.ell_spmm import ELLGraph
    from ggad_tpu.ops.pallas_spmm import BCSRGraph

    den = jax.ops.segment_sum(g.val, g.col, num_segments=g.n_nodes)
    inv = jnp.where(den != 0, 1.0 / den, 0.0)
    if isinstance(g, BCSRGraph):
        from ggad_tpu.ops.pallas_sddmm import bcsr_sddmm_colsum
        num = bcsr_sddmm_colsum(g.tiles, l2_normalize_rows(emb))
    elif isinstance(g, ELLGraph):
        from ggad_tpu.ops.ell_spmm import ell_affinity_colsum
        num = ell_affinity_colsum(g.tables, l2_normalize_rows(emb))
    else:
        cos = edge_cosine(g, emb)
        num = jax.ops.segment_sum(cos, g.col, num_segments=g.n_nodes)
    return num * inv
