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

import dataclasses as _dataclasses

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


# ---------------------------------------------------------------------------
# Subset affinity: only the columns the margin loss reads
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@_dataclasses.dataclass(frozen=True)
class AffinitySubset:
    """Edges of a graph restricted to columns in a fixed node subset,
    with columns renumbered to subset positions.

    GGAD's margin loss reads the affinity ONLY at the labeled normals
    and seeds (``run.py:190-205``) — a small fraction of nodes — so
    computing the per-node affinity over all N columns wastes most of
    the SDDMM + its backward. This restriction is exact at the read
    nodes.
    """

    row: jax.Array        # [E_sub_pad] global source ids
    col_local: jax.Array  # [E_sub_pad] position of the column in `uniq`
    val: jax.Array        # [E_sub_pad] edge values (0 on padding)
    uniq: jax.Array       # [U] unique subset node ids
    gather: jax.Array     # [S] position of idx[k] in `uniq` (the
                          # requested ids may repeat — GGAD's seeds are a
                          # subset of the labeled normals)
    den: jax.Array        # [U] column-sum of val (the denominator)
    n_uniq: int = _dataclasses.field(metadata=dict(static=True))


def affinity_subset(g: Graph, idx) -> AffinitySubset:
    """Host-side: restrict ``g``'s edges to columns in ``idx``."""
    import numpy as np

    idx = np.asarray(idx, np.int64)
    uniq, gather = np.unique(idx, return_inverse=True)
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    lookup = np.full(g.n_nodes, -1, np.int64)
    lookup[uniq] = np.arange(len(uniq))
    sel = lookup[col] >= 0
    r, c, v = row[sel], lookup[col[sel]], val[sel]
    order = np.argsort(c, kind="stable")
    r, c, v = r[order], c[order], v[order]
    e = len(r)
    e_pad = max(-(-e // 8) * 8, 8)
    rp = np.zeros(e_pad, np.int32)
    # pad col_local with the LAST real value so the sorted promise of
    # segment_sum actually holds (padding vals are 0 — no contribution)
    cp = np.full(e_pad, c[-1] if e else 0, np.int32)
    vp = np.zeros(e_pad, np.float32)
    rp[:e], cp[:e], vp[:e] = r, c, v
    den = np.zeros(len(uniq), np.float32)
    np.add.at(den, c, v)
    return AffinitySubset(
        row=jnp.asarray(rp), col_local=jnp.asarray(cp),
        val=jnp.asarray(vp), uniq=jnp.asarray(uniq, jnp.int32),
        gather=jnp.asarray(gather, jnp.int32),
        den=jnp.asarray(den), n_uniq=len(uniq))


@jax.tree_util.register_dataclass
@_dataclasses.dataclass(frozen=True)
class TileAffinitySubset:
    """Column-subset affinity on the MXU: rect BCSR tiles of
    ``A[:, uniq]`` ([N × U], columns renumbered) driving
    ``bcsr_sddmm_colsum_rect``.

    Round-4 motivation: in bf16 tile mode the margin ran the FULL-column
    tile SDDMM (+ its two-SpMM backward) although it reads ~U ≪ N nodes
    — ~4 of the 7 ms amazon step. The subset tile set touches only the
    occupied [N × U] tiles; identical values at the read nodes (tested),
    both operands differentiable through the rect custom VJP.
    """

    pair: object          # pallas_spmm.BCSRPair (fwd [N×U], bwd [U×N])
    uniq: jax.Array       # [U] unique subset node ids
    gather: jax.Array     # [S] position of idx[k] in `uniq`
    inv_den: jax.Array    # [U] 1/column-sum (0 where isolated)
    n_uniq: int = _dataclasses.field(metadata=dict(static=True))


def tile_affinity_subset(g: Graph, idx, *, dtype="float32",
                         tile_rows: int | None = None) -> TileAffinitySubset:
    """Host-side: rect-tile restriction of ``g`` to columns in ``idx``."""
    import numpy as np

    from ggad_tpu.ops.pallas_spmm import (
        BCSRPair,
        bcsr_rect_from_coo,
        pick_tile_rows,
    )

    idx = np.asarray(idx, np.int64)
    uniq, gather = np.unique(idx, return_inverse=True)
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    lookup = np.full(g.n_nodes, -1, np.int64)
    lookup[uniq] = np.arange(len(uniq))
    sel = lookup[col] >= 0
    r, c, v = row[sel], lookup[col[sel]], val[sel].astype(np.float32)
    den = np.zeros(len(uniq), np.float32)
    np.add.at(den, c, v)
    if tile_rows is None:
        tile_rows = pick_tile_rows(r, c, g.n_nodes)
    fwd = bcsr_rect_from_coo(r, c, v, g.n_nodes, len(uniq),
                             dtype=dtype, tile_rows=tile_rows)
    bwd = bcsr_rect_from_coo(c, r, v, len(uniq), g.n_nodes,
                             dtype=dtype, tile_rows=tile_rows)
    inv = np.where(den != 0, 1.0 / den, 0.0).astype(np.float32)
    return TileAffinitySubset(
        pair=BCSRPair(fwd=fwd, bwd=bwd, n_nodes=g.n_nodes),
        uniq=jnp.asarray(uniq, jnp.int32),
        gather=jnp.asarray(gather, jnp.int32),
        inv_den=jnp.asarray(inv), n_uniq=len(uniq))


def node_affinity_at(sub, emb: jax.Array) -> jax.Array:
    """affinity[k] for the k-th requested node — identical values to
    ``node_affinity(g, emb)[idx]`` (tested), at O(E_sub·d) (edge
    variant) or O(tiles_sub) on the MXU (tile variant)."""
    from ggad_tpu.ops.ell_spmm import ELLAffinitySubset, ell_subset_colsum

    emb_n = l2_normalize_rows(emb)
    if isinstance(sub, ELLAffinitySubset):
        num = ell_subset_colsum(sub, emb_n)
        return (num * sub.inv_den)[sub.gather]
    tgt = emb_n[sub.uniq]
    if isinstance(sub, TileAffinitySubset):
        from ggad_tpu.ops.pallas_sddmm import bcsr_sddmm_colsum_rect

        num = bcsr_sddmm_colsum_rect(sub.pair, tgt, emb_n)
        return (num * sub.inv_den)[sub.gather]
    cos = jnp.einsum("ed,ed->e", emb_n[sub.row], tgt[sub.col_local],
                     preferred_element_type=jnp.float32) * sub.val
    num = jax.ops.segment_sum(cos, sub.col_local,
                              num_segments=sub.n_uniq,
                              indices_are_sorted=True)
    aff = num * jnp.where(sub.den != 0, 1.0 / sub.den, 0.0)
    return aff[sub.gather]
