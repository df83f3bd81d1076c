"""ELL (padded neighbor-table) SpMM — the sparse-regime TPU path.

The BCSR/MXU kernels (``pallas_spmm``) win only when the occupied 128×128
adjacency tiles are dense; graphs like elliptic (~1.5 edges per occupied
tile, reference ``README.md:56``) fall back to XLA gather + ``segment_sum``
whose scatter-add dominates. This path removes the scatter entirely:

    pad each row's neighbor list to K slots → idx/val tables [K, N]
    out[n] = Σ_k val[k, n] · x[idx[k, n]]

computed as K fused gather-multiply-accumulate sweeps (no [N, K, d]
intermediate, no scatter — each output row is accumulated locally).
Tables are SLOT-MAJOR so each sweep's index vector is contiguous (a
strided column slice feeds TPU gathers ~300× slower). Rows longer than
K spill their tail edges to an overflow COO handled by the ordinary
segment path (power-law hubs would otherwise blow up K for everyone).
K is chosen per graph by a sweep-vs-spill cost model (see _pick_k).

The same tables evaluate the affinity-loss numerator (the column sums of
A ∘ (N Nᵀ), reference ``run.py:182-188``) scatter-free via the transposed
table. Both ops are differentiable in the dense operand with custom VJPs
that reuse the transposed tables (the adjacency itself is not trained).

Reference equivalence: ``ell_spmm`` computes exactly
``torch.bmm(adj, seq_fts)`` (reference ``model.py:29-31``);
``ell_affinity_colsum`` computes ``(sim * raw_adj).sum(0)``
(reference ``run.py:182-186``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ggad_tpu.graph import Graph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELL:
    """Padded neighbor table (+ COO overflow) for one matrix orientation."""

    idx: jax.Array      # [K, N] int32 neighbor ids (0 on padding slots).
                        # SLOT-MAJOR: each sweep k reads the CONTIGUOUS
                        # [N] vector idx[k] — feeding a TPU gather a
                        # strided column slice of a row-major [N, K]
                        # table lowers ~300x slower (round-4 micro:
                        # 27 ms vs 0.09 ms for one [46K]-row gather)
    val: jax.Array      # [K, N] float32 edge weights (0 on padding)
    ov_row: jax.Array   # [E_ov_pad] int32 overflow edges (sorted by row)
    ov_col: jax.Array   # [E_ov_pad] int32
    ov_val: jax.Array   # [E_ov_pad] float32 (0 on padding)
    n_rows: int = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return self.idx.shape[0]

    @property
    def n_overflow(self) -> int:
        return self.ov_row.shape[0]


def _pick_k(degrees: np.ndarray, coverage: float, k_max: int,
            spill_weight: float = 3.0) -> int:
    """Cost-model K: minimize ``K·N + spill(K)·spill_weight``.

    Every slot sweep streams the [N, d] f32 accumulator in and out plus
    the gathered rows — cost ∝ K·N regardless of padding occupancy — so
    chasing edge coverage overpays on low-mean/high-p99 degree graphs
    (elliptic: mean 5.2, p99 12 → the old ≥98%-coverage rule picked
    K=16 with 74% padded slots; K=8 spills 4% of edges to the overflow
    segment path and halves the sweep traffic — measured 6.6 → 3.7 ms,
    round-4 study). An overflow edge costs ~``spill_weight`` slot
    equivalents (gather + scatter-add vs a slot's gather + local acc).
    ``coverage`` only bounds the candidate search (the scan stops once
    a candidate covers >= coverage of edges; taller K would trade the
    remaining <=(1-coverage) of edges against K*N slot traffic, a loss
    on every ELL-routed graph).
    """
    if degrees.size == 0 or degrees.max() == 0:
        return 8
    n = degrees.size
    total = degrees.sum()
    best_k, best_cost = None, None
    for k in range(4, k_max + 1, 4):
        spill = int(np.maximum(degrees - k, 0).sum())
        cost = k * n + spill_weight * spill
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if np.minimum(degrees, k).sum() >= coverage * total:
            break  # candidates above the coverage floor can only add K·N
    return best_k


def _ell_layout(row, col, n_rows, k=None, coverage=0.98, k_max=64):
    """Shared slot-assignment logic: lexsort edges, assign each to its
    row slot, split ELL vs overflow. Returns
    ``(order, row_s, col_s, slot, in_ell, k, e_ov_pad)`` where ``order``
    maps sorted position → ORIGINAL edge index."""
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    order = np.lexsort((col, row))
    row_s, col_s = row[order], col[order]

    degrees = np.bincount(row_s, minlength=n_rows)
    if k is None:
        k = _pick_k(degrees, coverage, k_max)

    starts = np.zeros(n_rows + 1, dtype=np.int64)
    starts[1:] = np.cumsum(degrees)
    slot = np.arange(row_s.shape[0]) - starts[row_s]
    in_ell = slot < k
    n_ov = int((~in_ell).sum())
    e_ov_pad = max(_round_up(n_ov, 512), 512) if n_ov else 0
    return order, row_s, col_s, slot, in_ell, k, e_ov_pad


def ell_from_coo(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                 n_rows: int, *, k: int | None = None,
                 coverage: float = 0.98, k_max: int = 64,
                 dtype="float32") -> ELL:
    """Host-side ELL construction from (unsorted) COO arrays.

    ``dtype`` sets the storage/multiply precision of the padded tables
    (bf16 tables halve HBM traffic; accumulation stays f32 — same policy
    as the BCSR kernels' ``spmm_dtype``). Overflow edges stay f32 (tiny).
    """
    val = np.asarray(val, dtype=np.float32)
    order, row_s, col_s, slot, in_ell, k, e_ov_pad = _ell_layout(
        row, col, n_rows, k, coverage, k_max)
    val_s = val[order]

    idx = np.zeros((n_rows, k), dtype=np.int32)
    ell_val = np.zeros((n_rows, k), dtype=np.float32)
    idx[row_s[in_ell], slot[in_ell]] = col_s[in_ell]
    ell_val[row_s[in_ell], slot[in_ell]] = val_s[in_ell]

    ov = ~in_ell
    n_ov = int(ov.sum())
    ov_row = np.zeros(e_ov_pad, dtype=np.int32)
    ov_col = np.zeros(e_ov_pad, dtype=np.int32)
    ov_val = np.zeros(e_ov_pad, dtype=np.float32)
    ov_row[:n_ov] = row_s[ov]
    ov_col[:n_ov] = col_s[ov]
    ov_val[:n_ov] = val_s[ov]
    if n_ov:
        # pad with the LAST real row id (vals are 0) so segment_sum's
        # indices_are_sorted promise actually holds
        ov_row[n_ov:] = ov_row[n_ov - 1]

    return ELL(idx=jnp.asarray(idx.T.copy()),
               val=jnp.asarray(ell_val.T.copy()).astype(jnp.dtype(dtype)),
               ov_row=jnp.asarray(ov_row), ov_col=jnp.asarray(ov_col),
               ov_val=jnp.asarray(ov_val), n_rows=int(n_rows))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLValueMap:
    """Edge-order → ELL-layout value remap for one orientation.

    For a fixed structure whose edge VALUES vary (TAM's NSGT cut
    ensemble: every member is the same graph with different values —
    ``utils_tam.py:222-240``), the ELL tables can be shared and only the
    value planes rebuilt per member:

        ell_val = where(slot_mask, v[slot_map], 0)     # [K, N] slot-major
        ov_val  = where(ov_mask,  v[ov_map],  0)       # [E_ov_pad]

    where ``v`` is the [E_pad] edge-value vector in the GRAPH's sorted
    edge order.
    """

    slot_map: jax.Array   # [K, N] int32 edge index (0 where empty)
    slot_mask: jax.Array  # [K, N] bool
    ov_map: jax.Array     # [E_ov_pad] int32
    ov_mask: jax.Array    # [E_ov_pad] bool


def ell_value_maps(row, col, n_rows: int, k: int,
                   transpose: bool = False) -> ELLValueMap:
    """Host-side: build the edge→slot maps matching ``ell_from_coo``'s
    layout exactly (same lexsort, same slot split). ``row``/``col`` are
    the graph's REAL edges in its edge order; ``transpose=True`` maps
    into the transposed table (rows of Aᵀ)."""
    if transpose:
        row, col = col, row
    order, row_s, col_s, slot, in_ell, k, e_ov_pad = _ell_layout(
        row, col, n_rows, k)
    slot_map = np.zeros((n_rows, k), np.int32)
    slot_mask = np.zeros((n_rows, k), bool)
    slot_map[row_s[in_ell], slot[in_ell]] = order[in_ell]
    slot_mask[row_s[in_ell], slot[in_ell]] = True
    n_ov = int((~in_ell).sum())
    ov_map = np.zeros(e_ov_pad, np.int32)
    ov_mask = np.zeros(e_ov_pad, bool)
    ov_map[:n_ov] = order[~in_ell]
    ov_mask[:n_ov] = True
    return ELLValueMap(
        slot_map=jnp.asarray(slot_map.T.copy()),
        slot_mask=jnp.asarray(slot_mask.T.copy()),
        ov_map=jnp.asarray(ov_map), ov_mask=jnp.asarray(ov_mask))


def ell_remap_values(m: ELLValueMap, v: jax.Array):
    """Device-side: edge-order values → (ELL val plane, overflow vals)."""
    ell_val = jnp.where(m.slot_mask, v[m.slot_map], 0.0)
    ov_val = jnp.where(m.ov_mask, v[m.ov_map], 0.0)
    return ell_val, ov_val


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLPair:
    """Forward + transposed tables for differentiable SpMM/affinity."""

    fwd: ELL
    bwd: ELL
    n_nodes: int = dataclasses.field(metadata=dict(static=True))


def ell_pair_from_graph(g: Graph, **kw) -> ELLPair:
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    return ELLPair(fwd=ell_from_coo(row, col, val, g.n_nodes, **kw),
                   bwd=ell_from_coo(col, row, val, g.n_nodes, **kw),
                   n_nodes=g.n_nodes)


def _ell_matmul(m: ELL, x: jax.Array) -> jax.Array:
    """out = M @ x via K gather-accumulate sweeps + overflow segment-sum.

    Multiplies in the table dtype (bf16 when built with
    ``dtype='bfloat16'``), accumulates in f32.
    """
    xc = x.astype(m.val.dtype)

    # lax.scan over the K slots (a Python loop would unroll K gather
    # sweeps into the traced program — compile-time risk at high K)
    def body(acc, slot):
        idx_s, val_s = slot
        rows = xc.at[idx_s].get(mode="promise_in_bounds")
        return acc + (rows * val_s[:, None]).astype(jnp.float32), None

    # init derives from x so its varying-manual-axes type matches the
    # body output under shard_map (the halo-sharded ELL path)
    acc0 = jnp.zeros((m.n_rows, x.shape[1]), jnp.float32) \
        + 0.0 * xc[0, 0].astype(jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (m.idx, m.val))
    if m.n_overflow:
        gathered = x[m.ov_col] * m.ov_val[:, None]
        out = out + jax.ops.segment_sum(
            gathered, m.ov_row, num_segments=m.n_rows,
            indices_are_sorted=True)
    return out


@jax.custom_vjp
def ell_spmm(pair: ELLPair, x: jax.Array) -> jax.Array:
    """out = A @ x; differentiable in x (Aᵀ g via the transposed table)."""
    return _ell_matmul(pair.fwd, x)


def _ell_spmm_fwd(pair, x):
    return _ell_matmul(pair.fwd, x), pair


def _ell_spmm_bwd(pair, g):
    return None, _ell_matmul(pair.bwd, g)


ell_spmm.defvjp(_ell_spmm_fwd, _ell_spmm_bwd)


def _ell_colsum_raw(m_t: ELL, emb_n: jax.Array) -> jax.Array:
    """num[j] = Σ_i A_ij ⟨n_i, n_j⟩ using the TRANSPOSED table m_t
    (rows of Aᵀ are columns of A) — K scatter-free sweeps."""
    ec = emb_n.astype(m_t.val.dtype)

    def body(num, slot):
        idx_s, val_s = slot
        rows = ec.at[idx_s].get(mode="promise_in_bounds")
        return num + val_s.astype(jnp.float32) * jnp.einsum(
            "nd,nd->n", rows, ec,
            preferred_element_type=jnp.float32), None

    num0 = jnp.zeros((m_t.n_rows,), jnp.float32) \
        + 0.0 * ec[0, 0].astype(jnp.float32)
    num, _ = jax.lax.scan(body, num0, (m_t.idx, m_t.val))
    if m_t.n_overflow:
        # overflow edges of Aᵀ: (row=j, col=i) pairs
        cos = jnp.einsum("ed,ed->e", emb_n[m_t.ov_col], emb_n[m_t.ov_row],
                         preferred_element_type=jnp.float32) * m_t.ov_val
        num = num + jax.ops.segment_sum(
            cos, m_t.ov_row, num_segments=m_t.n_rows,
            indices_are_sorted=True)
    return num


@jax.custom_vjp
def ell_affinity_colsum(pair: ELLPair, emb_n: jax.Array) -> jax.Array:
    """Column sums of A ∘ (N Nᵀ) for row-normalized embeddings N; [N].

    Differentiable in ``emb_n``: dN = A (g ⊙ N) + g ⊙ (Aᵀ N), two table
    sweeps (same identity as ``pallas_sddmm``).
    """
    return _ell_colsum_raw(pair.bwd, emb_n)


def _ell_colsum_fwd(pair, emb_n):
    return _ell_colsum_raw(pair.bwd, emb_n), (pair, emb_n)


def _ell_colsum_bwd(res, g):
    pair, emb_n = res
    term1 = _ell_matmul(pair.fwd, g[:, None] * emb_n)
    term2 = g[:, None] * _ell_matmul(pair.bwd, emb_n)
    return None, term1 + term2


ell_affinity_colsum.defvjp(_ell_colsum_fwd, _ell_colsum_bwd)


# --------------------------------------------------------------------------
# Graph-level wrapper (drop-in for ops.spmm / ops.sddmm dispatch)
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLGraph:
    """A Graph plus its ELL tables; drop-in for ops.spmm dispatch."""

    graph: "object"          # ggad_tpu.graph.Graph (itself a pytree)
    tables: ELLPair

    @property
    def row(self):
        return self.graph.row

    @property
    def col(self):
        return self.graph.col

    @property
    def val(self):
        return self.graph.val

    @property
    def indptr(self):
        return self.graph.indptr

    @property
    def n_nodes(self):
        return self.graph.n_nodes

    @property
    def n_edges(self):
        return self.graph.n_edges

    def out_degrees(self):
        return self.graph.out_degrees()

    def in_degrees(self):
        return self.graph.in_degrees()


def as_ell_graph(g: Graph, **kw) -> ELLGraph:
    return ELLGraph(graph=g, tables=ell_pair_from_graph(g, **kw))
