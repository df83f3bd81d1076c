"""Sparse matrix × dense matrix (SpMM): out[r] = Σ_e val[e] · X[col[e]].

This is the hot aggregation op of every GCN layer — the reference computes
it as a dense ``torch.bmm(adj, seq_fts)`` over a densified N×N adjacency
(reference ``model.py:29-31``). Here the XLA path is gather + sorted
``segment_sum`` (O(E·d)); the Pallas block-sparse path (``pallas_spmm``)
maps the same contraction onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph


def spmm_coo(row: jax.Array, col: jax.Array, val: jax.Array,
             x: jax.Array, n_rows: int, *,
             rows_sorted: bool = True) -> jax.Array:
    """COO SpMM via gather + segment_sum. Differentiable in val and x.

    Padding edges must have val == 0 (their gathered row contributes 0).
    """
    gathered = x[col] * val[:, None]
    return jax.ops.segment_sum(
        gathered, row, num_segments=n_rows, indices_are_sorted=rows_sorted)


def spmm(g, x: jax.Array, *, impl: str = "auto") -> jax.Array:
    """Compute A @ x for the sparse adjacency held by ``g``.

    Dispatch: if ``g`` carries precomputed BCSR tiles (a
    :class:`~ggad_tpu.ops.pallas_spmm.BCSRGraph`, built once at load by
    the trainer when the graph is tile-dense), the Pallas MXU kernel runs;
    otherwise the XLA gather+segment-sum path. ``impl='xla'`` forces the
    segment path even on a BCSRGraph.

    Args:
      g: Graph (or BCSRGraph) with sorted-by-row COO edges.
      x: [N, d] dense feature/embedding matrix.
      impl: "auto" (dispatch on type), "xla", or "pallas".
    """
    from ggad_tpu.ops.ell_spmm import ELLGraph, ell_spmm
    from ggad_tpu.ops.pallas_spmm import BCSRGraph, bcsr_spmm

    if isinstance(g, BCSRGraph) and impl != "xla":
        return bcsr_spmm(g.tiles, x)
    if isinstance(g, ELLGraph) and impl != "xla":
        return ell_spmm(g.tables, x)
    if impl == "pallas":
        from ggad_tpu.ops.pallas_spmm import bcsr_spmm_graph
        return bcsr_spmm_graph(g, x)  # raises with guidance
    return spmm_coo(g.row, g.col, g.val, x, g.n_nodes)
