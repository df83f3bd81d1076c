"""Balanced graph partitioning for the halo-exchange distribution path.

The boundary-halo schedule (``ggad_tpu.parallel.spmm_shard``) assigns
contiguous row blocks to devices, so its comm volume is set by how well
the node ORDER aligns with graph locality. RCM (``datasets/reorder``)
minimizes bandwidth for BCSR tiles but is defeated by expander-like
cross edges; this module provides a METIS-style two-phase partitioner:

  1. **Graph growing**: grow each part by BFS from a fresh seed over
     still-unassigned nodes until it reaches N/D — on community graphs
     each part swallows whole communities before the random cross edges
     can pull it elsewhere.
  2. **Refinement**: capacity-bounded asynchronous label propagation
     (each node moves to its neighbor-majority part while balance
     allows) — the scalar hot loop runs in the native C++ helper
     (``native/graphbuild.cpp::gg_partition_refine``).

Pure host-side; O(E + N·rounds). Reference counterpart: none (the
reference is single-process, ``README.md:21``).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import scipy.sparse as sp

from ggad_tpu import native


def _ggp_init(indptr: np.ndarray, indices: np.ndarray,
              n_parts: int, seed: int = 0,
              node_w: np.ndarray | None = None) -> np.ndarray:
    """Graph-growing initial partition: BFS over unassigned nodes until
    each part reaches its share of the total node WEIGHT."""
    n = len(indptr) - 1
    if node_w is None:
        node_w = np.ones(n, np.int64)
    target = -(-int(node_w.sum()) // n_parts)
    part = np.full(n, -1, np.int32)
    deg = np.diff(indptr)
    rng = np.random.default_rng(seed)

    for p in range(n_parts - 1):
        free = np.flatnonzero(part == -1)
        if len(free) == 0:
            break
        # seed at a high-degree unassigned node (community cores first)
        seed_node = free[int(np.argmax(deg[free]))]
        q = deque([seed_node])
        part[seed_node] = p
        filled = int(node_w[seed_node])
        while q and filled < target:
            u = q.popleft()
            for v in indices[indptr[u]:indptr[u + 1]]:
                if part[v] == -1:
                    part[v] = p
                    filled += int(node_w[v])
                    q.append(v)
                    if filled >= target:
                        break
        # graph may be disconnected / frontier exhausted: top up randomly
        if filled < target:
            free = np.flatnonzero(part == -1)
            for v in free[rng.permutation(len(free))]:
                part[v] = p
                filled += int(node_w[v])
                if filled >= target:
                    break
    part[part == -1] = n_parts - 1
    return part


def _exact_balance(a: sp.csr_matrix, part: np.ndarray, n_parts: int,
                   block: int) -> np.ndarray:
    """Force part sizes to exactly ``block`` (last part takes the
    remainder) by evicting surplus nodes with the fewest intra-part
    edges into parts with room — the fixed ceil(N/D) row blocks of
    ``partition_edges`` then align 1:1 with parts."""
    n = a.shape[0]
    part = part.copy()
    want = np.full(n_parts, block, np.int64)
    want[-1] = n - block * (n_parts - 1)
    onehot = sp.csr_matrix((np.ones(n, np.float32), (np.arange(n), part)),
                           shape=(n, n_parts))
    votes = np.asarray((a @ onehot).todense())

    sizes = np.bincount(part, minlength=n_parts)
    for p in range(n_parts):
        surplus = sizes[p] - want[p]
        if surplus <= 0:
            continue
        members = np.flatnonzero(part == p)
        movers = members[np.argsort(votes[members, p])[:surplus]]
        for m in movers:
            order = np.argsort(-votes[m])
            dest = next((q for q in order
                         if q != p and sizes[q] < want[q]),
                        int(np.argmin(sizes - want)))
            part[m] = dest
            sizes[dest] += 1
            sizes[p] -= 1
    return part


def lp_partition(adj: sp.spmatrix, n_parts: int, *, rounds: int = 10,
                 slack: float = 1.02, seed: int = 0,
                 exact_block: int | None = None) -> np.ndarray:
    """Balanced partition labels [N] in [0, n_parts): graph-growing init
    + native capacity-bounded LP refinement (cap = slack · N/D).

    ``exact_block``: force sizes to exactly this block (e.g.
    ceil(N/D)) so contiguous node order aligns with fixed row blocks.
    """
    a = adj.tocsr()
    n = a.shape[0]
    part = _ggp_init(a.indptr.astype(np.int32),
                     a.indices.astype(np.int32), n_parts, seed)
    cap = int(np.ceil(slack * n / n_parts))
    part = native.partition_refine(a.indptr, a.indices, part, n_parts,
                                   cap, rounds=rounds, seed=seed + 1)
    if exact_block is not None:
        part = _exact_balance(a, part, n_parts, exact_block)
    return part


def _spectral_init(g: sp.csr_matrix, n_parts: int,
                   node_w: np.ndarray) -> np.ndarray:
    """Recursive weight-balanced bisection by the Fiedler vector of the
    normalized Laplacian. Dense eigh — only ever run on the coarsest
    graph (≤ ~512 nodes), where it is exact and cheap."""
    n = g.shape[0]
    part = np.zeros(n, np.int32)
    next_id = [0]

    def bisect(nodes: np.ndarray, k: int):
        if k == 1 or len(nodes) <= 1:
            part[nodes] = next_id[0]
            next_id[0] += 1
            return
        sub = np.asarray(g[nodes][:, nodes].todense(), np.float64)
        d = sub.sum(axis=1)
        dinv = 1.0 / np.sqrt(np.maximum(d, 1e-12))
        lap = np.eye(len(nodes)) - dinv[:, None] * sub * dinv[None, :]
        _, vecs = np.linalg.eigh(lap)
        order = np.argsort(vecs[:, 1])
        k1 = k // 2
        cum = np.cumsum(node_w[nodes][order])
        cut = int(np.searchsorted(cum, cum[-1] * k1 / k)) + 1
        cut = min(max(cut, 1), len(nodes) - 1)
        bisect(nodes[order[:cut]], k1)
        bisect(nodes[order[cut:]], k - k1)

    bisect(np.arange(n), n_parts)
    return part


def multilevel_partition(adj: sp.spmatrix, n_parts: int, *,
                         rounds: int = 10, slack: float = 1.02,
                         seed: int = 0,
                         exact_block: int | None = None) -> np.ndarray:
    """METIS-style multilevel partition: heavy-edge-matching coarsening
    (native ``gg_hem_match``), graph-growing + weighted LP on the
    coarsest graph, then uncoarsen with weighted capacity-bounded LP
    refinement at every level (native ``gg_partition_refine``)."""
    a = adj.tocsr().astype(np.float32)
    n0 = a.shape[0]
    min_coarse = max(40 * n_parts, 512)
    graphs = [a]
    node_ws = [np.ones(n0, np.int32)]
    maps: list[np.ndarray] = []

    while graphs[-1].shape[0] > min_coarse:
        g = graphs[-1]
        n = g.shape[0]
        partner = native.hem_match(g.indptr, g.indices, g.data,
                                   seed=seed + 7 * len(maps) + 1)
        rep = np.minimum(np.arange(n), partner)
        uniq, cid = np.unique(rep, return_inverse=True)
        nc = len(uniq)
        if nc > 0.95 * n:          # matching stalled
            break
        coo = g.tocoo()
        cg = sp.csr_matrix((coo.data, (cid[coo.row], cid[coo.col])),
                           shape=(nc, nc))
        cg.sum_duplicates()
        cg.setdiag(0)
        cg.eliminate_zeros()
        node_ws.append(np.bincount(cid, weights=node_ws[-1],
                                   minlength=nc).astype(np.int32))
        graphs.append(cg.tocsr())
        maps.append(cid.astype(np.int64))

    cap = int(np.ceil(slack * n0 / n_parts))
    gl = graphs[-1]
    part = _spectral_init(gl, n_parts, node_ws[-1])
    part = native.partition_refine(
        gl.indptr, gl.indices, part, n_parts, cap, rounds=2 * rounds,
        seed=seed + 101, weights=gl.data, node_w=node_ws[-1])

    for lvl in range(len(maps) - 1, -1, -1):
        part = part[maps[lvl]]
        g = graphs[lvl]
        part = native.partition_refine(
            g.indptr, g.indices, part, n_parts, cap, rounds=rounds,
            seed=seed + lvl, weights=g.data, node_w=node_ws[lvl])

    # NB: nodes with majority-external edges (cross-community anomalies)
    # carry irreducible cut; experiments show KEEPING them concentrated
    # where LP puts them minimizes the max per-pair boundary (their
    # request sets saturate and are shared across requesters), so no
    # scatter post-pass is applied.
    if exact_block is not None:
        part = _exact_balance(a, part, n_parts, exact_block)
    return part.astype(np.int32)


def cut_fraction(adj: sp.spmatrix, part: np.ndarray) -> float:
    """Fraction of edges crossing partitions (the comm-volume proxy)."""
    coo = adj.tocoo()
    return float((part[coo.row] != part[coo.col]).mean())


def partition_order(part_labels: np.ndarray) -> np.ndarray:
    """perm (new→old) placing each partition's nodes contiguously."""
    return np.argsort(part_labels, kind="stable")


def reorder_lp(ds, n_parts: int, *, rounds: int = 10, seed: int = 0,
               multilevel: bool = True):
    """Dataset renumbered so graph partitions are contiguous row blocks,
    sized exactly like ``parallel.spmm_shard.partition_edges``'s fixed
    ceil(N/D) blocks (partition p == row block p)."""
    from ggad_tpu.datasets.reorder import apply_permutation

    block = -(-ds.adj.shape[0] // n_parts)
    fn = multilevel_partition if multilevel else lp_partition
    labels = fn(ds.adj, n_parts, rounds=rounds, seed=seed,
                exact_block=block)
    return apply_permutation(ds, partition_order(labels))
