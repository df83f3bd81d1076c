"""Device-resident graph structure for TPU message passing.

Unlike the reference (mala-lab/GGAD), which densifies every adjacency matrix
to a ``[1, N, N]`` float tensor (reference ``run.py:100-109``), this framework
keeps graphs in a padded COO+CSR hybrid with static shapes so that every
message-passing op is jit-compilable and sparse: O(E·d) instead of O(N²·d).

Design notes (TPU-first):
  * All index arrays are ``int32`` (TPU-native integer width).
  * Edge arrays are padded to a static size; padding edges carry
    ``val == 0`` and ``row == col == 0`` so they contribute nothing to
    segment reductions.
  * Edges are sorted by ``row`` so ``segment_sum`` can use
    ``indices_are_sorted=True``.
  * The structure is a registered pytree — it can cross ``jit`` /
    ``shard_map`` boundaries and be donated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A static-shape sparse graph in sorted-COO form (+ CSR indptr).

    Attributes:
      row:    [E_pad] int32, source node of each edge (sorted ascending).
      col:    [E_pad] int32, destination node of each edge.
      val:    [E_pad] float32, edge weight (0.0 on padding edges).
      indptr: [N+1] int32 CSR row pointers into the *unpadded* edge range.
      n_nodes: static number of nodes N.
      n_edges: static number of real (non-padding) edges E.
    """

    row: jax.Array
    col: jax.Array
    val: jax.Array
    indptr: jax.Array
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def e_pad(self) -> int:
        return self.row.shape[0]

    # ---- degree helpers -------------------------------------------------
    def out_degrees(self) -> jax.Array:
        """Weighted out-degree per node: sum of val over rows."""
        return jax.ops.segment_sum(
            self.val, self.row, num_segments=self.n_nodes,
            indices_are_sorted=True)

    def in_degrees(self) -> jax.Array:
        """Weighted in-degree per node: sum of val over cols."""
        return jax.ops.segment_sum(
            self.val, self.col, num_segments=self.n_nodes)

    def with_val(self, val: jax.Array) -> "Graph":
        return dataclasses.replace(self, val=val)

    # ---- transforms -----------------------------------------------------
    def transpose_host(self) -> "Graph":
        """Transpose (swap row/col) and re-sort. Host-side (numpy)."""
        row = np.asarray(self.col)[: self.n_edges]
        col = np.asarray(self.row)[: self.n_edges]
        val = np.asarray(self.val)[: self.n_edges]
        return from_coo(row, col, val, self.n_nodes, e_pad=self.e_pad)


def from_coo(
    row: np.ndarray,
    col: np.ndarray,
    val: Optional[np.ndarray],
    n_nodes: int,
    *,
    e_pad: Optional[int] = None,
    pad_multiple: int = 512,
) -> Graph:
    """Build a Graph from host-side COO arrays. Sorts by (row, col), pads.

    Duplicate edges are preserved (summed implicitly by segment ops),
    matching scipy's COO semantics under matmul.
    """
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    n_edges = int(row.shape[0])
    if val is None:
        val = np.ones(n_edges, dtype=np.float32)
    val = np.asarray(val, dtype=np.float32)

    if n_edges > 1_000_000:
        # native C++ sort (matters at DGraph scale; see native/graphbuild.cpp)
        from ggad_tpu import native
        if native.available():
            row32, col32, val = native.sort_coo(row, col, val)
            row, col = row32.astype(np.int64), col32.astype(np.int64)
        else:
            order = np.lexsort((col, row))
            row, col, val = row[order], col[order], val[order]
    else:
        order = np.lexsort((col, row))
        row, col, val = row[order], col[order], val[order]

    if e_pad is None:
        e_pad = max(_round_up(max(n_edges, 1), pad_multiple), pad_multiple)
    assert e_pad >= n_edges

    row_p = np.zeros(e_pad, dtype=np.int32)
    col_p = np.zeros(e_pad, dtype=np.int32)
    val_p = np.zeros(e_pad, dtype=np.float32)
    row_p[:n_edges] = row
    col_p[:n_edges] = col
    val_p[:n_edges] = val

    indptr = np.zeros(n_nodes + 1, dtype=np.int32)
    counts = np.bincount(row, minlength=n_nodes)
    indptr[1:] = np.cumsum(counts)

    return Graph(
        row=jnp.asarray(row_p),
        col=jnp.asarray(col_p),
        val=jnp.asarray(val_p),
        indptr=jnp.asarray(indptr),
        n_nodes=int(n_nodes),
        n_edges=n_edges,
    )


def from_scipy(mat, *, pad_multiple: int = 512) -> Graph:
    """Build a Graph from any scipy sparse matrix."""
    coo = mat.tocoo()
    return from_coo(coo.row, coo.col, coo.data, coo.shape[0],
                    pad_multiple=pad_multiple)


def to_scipy(g: Graph):
    """Convert back to scipy CSR (drops padding). Host-side."""
    import scipy.sparse as sp

    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    return sp.coo_matrix((val, (row, col)),
                         shape=(g.n_nodes, g.n_nodes)).tocsr()


def rows_subgraph(g: Graph, rows) -> Graph:
    """Rectangular row-subgraph: the edges of ``rows`` with row indices
    renumbered 0..len(rows)-1 IN THE ORDER GIVEN (columns stay global).

    ``spmm(sub, x)`` then computes ``(A @ x)[rows]`` in O(E_rows) instead
    of a full SpMM + slice — and, critically, its BACKWARD scatters only
    the ``rows`` cotangents instead of running a full transposed SpMM on
    a mostly-zero cotangent. Used for GGAD's generator aggregation
    (reference ``model.py:151-156``: ``adj[seed_idx, :] @ emb``).

    NB the result's ``n_nodes`` is len(rows) (the ROW count); column
    indices still address the original N — only ``spmm`` semantics are
    supported, not degree helpers.
    """
    rows = np.asarray(rows, dtype=np.int64)
    r = np.asarray(g.row)[: g.n_edges]
    c = np.asarray(g.col)[: g.n_edges]
    v = np.asarray(g.val)[: g.n_edges]
    lookup = np.full(g.n_nodes, -1, np.int64)
    lookup[rows] = np.arange(len(rows))
    sel = lookup[r] >= 0
    new_r = lookup[r[sel]]
    order = np.argsort(new_r, kind="stable")
    new_r, new_c, new_v = new_r[order], c[sel][order], v[sel][order]

    n_e = len(new_r)
    e_pad = max(_round_up(max(n_e, 1), 8), 8)
    row_p = np.zeros(e_pad, np.int32)
    col_p = np.zeros(e_pad, np.int32)
    val_p = np.zeros(e_pad, np.float32)
    row_p[:n_e], col_p[:n_e], val_p[:n_e] = new_r, new_c, new_v
    indptr = np.zeros(len(rows) + 1, np.int32)
    indptr[1:] = np.cumsum(np.bincount(new_r, minlength=len(rows)))
    return Graph(row=jnp.asarray(row_p), col=jnp.asarray(col_p),
                 val=jnp.asarray(val_p), indptr=jnp.asarray(indptr),
                 n_nodes=len(rows), n_edges=n_e)


def add_self_loops(g: Graph, weight: float = 1.0) -> Graph:
    """Return A + weight·I as a new Graph (host-side rebuild).

    Matches the reference's ``adj + sp.eye(N)`` (``run.py:100-101``). If a
    self-loop already exists the identity entry is *added* as a separate
    duplicate edge, exactly like scipy's ``A + eye``.
    """
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    loops = np.arange(g.n_nodes, dtype=np.int64)
    row = np.concatenate([row, loops])
    col = np.concatenate([col, loops])
    val = np.concatenate([val, np.full(g.n_nodes, weight, dtype=np.float32)])
    return from_coo(row, col, val, g.n_nodes)


def coalesce(row, col, val, n_nodes):
    """Host-side: sum duplicate (row, col) entries."""
    key = row.astype(np.int64) * n_nodes + col.astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    out_val = np.zeros(uniq.shape[0], dtype=np.float32)
    np.add.at(out_val, inv, val)
    return (uniq // n_nodes).astype(np.int64), (uniq % n_nodes).astype(np.int64), out_val
