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
            spill_weight: float = 4.0) -> int:
    """Cost-model K: minimize ``K·N + spill(K)·spill_weight``.

    Every slot sweep gathers an [N]-row slice — the TPU gather engine is
    ROW-bound (~5 ns/row at d=300 regardless of padding occupancy,
    round-5 micro) — so chasing edge coverage overpays on
    low-mean/high-p99 degree graphs (elliptic: mean 5.2, p99 12 → the
    old ≥98%-coverage rule picked K=16 with 74% padded slots). An
    overflow edge costs ~``spill_weight`` slot equivalents (its gather
    PLUS a share of the sorted scatter-add; fitted from the round-5
    K∈{4,6,8} sweep on elliptic — 2.39/1.90/1.94 ms — which the
    weight-4 model ranks correctly, picking K=6). ``coverage`` only
    bounds the candidate search (the scan stops once a candidate covers
    >= coverage of edges; taller K would trade the remaining
    <=(1-coverage) of edges against K·N slot traffic, a loss on every
    ELL-routed graph).
    """
    if degrees.size == 0 or degrees.max() == 0:
        return 8
    n = degrees.size
    total = degrees.sum()
    best_k, best_cost = None, None
    for k in range(2, k_max + 1, 2):
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


# --------------------------------------------------------------------------
# Sigma layout: degree-bucketed rows — scatter-free overflow
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SigmaBucket:
    idx: jax.Array   # [K_b, N_b] int32 gather ids into the operand
    val: jax.Array   # [K_b, N_b] edge weights (0 on padding)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLSigma:
    """Degree-bucketed ELL (CSR-sigma): rows sorted by degree, grouped
    into buckets whose per-bucket K covers every member row — NO
    overflow edges below the hub cap, so the flat layout's overflow
    scatter-add disappears entirely (round-5 elliptic trace: the two
    COO-overflow scatters were 1.45 ms of a 9.4 ms step; a TPU scatter
    costs ~20× the equivalent gather). Zero-degree rows are dropped
    from the sweeps and re-enter as an implicit zeros block. The
    bucket outputs concatenate in permuted order and one inverse-
    permutation GATHER (~0.17 ms at [46K, 300]) restores row order.

    Pathological hubs (degree > 64) spill their tail edges to the COO
    residual exactly like the flat layout.
    """

    buckets: tuple           # tuple[SigmaBucket, ...]
    perm: jax.Array          # [n_rows] int32, new (degree-sorted) → old
    inv: jax.Array           # [n_rows] int32, old → new
    ov_row: jax.Array        # [E_ov_pad] COO residual (sorted by row)
    ov_col: jax.Array
    ov_val: jax.Array
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_zero: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_overflow(self) -> int:
        return self.ov_row.shape[0]


# bucket K ladder; buckets smaller than _SIGMA_MIN_ROWS merge DOWNWARD
# (tail edges spill to the COO residual) to bound the number of gather
# invocations. Coarse ladder by measurement: the round-5 elliptic sweep
# gave 1.05 ms (12-step ladder) vs 0.93 ms (this one) per matmul — many
# small gathers pay fixed dispatch; a few wasted padding slots don't.
_SIGMA_LADDER = (2, 4, 8, 16, 32, 64)
_SIGMA_MIN_ROWS = 256


def ell_sigma_from_coo(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                       n_rows: int, *, dtype="float32") -> ELLSigma:
    """Host-side sigma construction from (unsorted) COO arrays."""
    val = np.asarray(val, dtype=np.float32)
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    order = np.lexsort((col, row))
    row_s, col_s, val_s = row[order], col[order], val[order]
    degrees = np.bincount(row_s, minlength=n_rows)
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    starts[1:] = np.cumsum(degrees)
    slot = np.arange(row_s.shape[0]) - starts[row_s]

    cap = _SIGMA_LADDER[-1]
    # per-row bucket K = smallest ladder step >= min(deg, cap)
    kk = np.full(n_rows, 0, np.int64)
    nz = degrees > 0
    kk[nz] = np.minimum(degrees[nz], cap)
    k_of = np.zeros(n_rows, np.int64)
    for step in reversed(_SIGMA_LADDER):
        k_of[(kk > 0) & (kk <= step)] = step
    k_of[~nz] = 0
    # merge small buckets DOWNWARD into the ladder predecessor (their
    # tail edges land in the COO residual via the slot >= k_of rule
    # below). Upward merging would cascade a handful of deg-17 rows
    # into a K=64 bucket — 64 near-empty gather sweeps.
    for i in range(len(_SIGMA_LADDER) - 1, 0, -1):
        m = k_of == _SIGMA_LADDER[i]
        if 0 < int(m.sum()) < _SIGMA_MIN_ROWS:
            k_of[m] = _SIGMA_LADDER[i - 1]

    # degree-sorted permutation: larger buckets of SMALL K first (order
    # irrelevant to correctness; group by k_of, zeros last)
    perm = np.argsort(np.where(k_of == 0, np.iinfo(np.int64).max, k_of),
                      kind="stable")
    inv = np.empty(n_rows, np.int64)
    inv[perm] = np.arange(n_rows)

    buckets = []
    pos = 0
    for step in _SIGMA_LADDER:
        rows_b = perm[pos: pos + int(np.sum(k_of == step))]
        if rows_b.size == 0:
            continue
        nb = rows_b.size
        idx_b = np.zeros((nb, step), np.int32)
        val_b = np.zeros((nb, step), np.float32)
        # edges of these rows with slot < step
        sel = (k_of[row_s] == step) & (slot < step)
        local = inv[row_s[sel]] - pos
        idx_b[local, slot[sel]] = col_s[sel]
        val_b[local, slot[sel]] = val_s[sel]
        buckets.append(SigmaBucket(
            idx=jnp.asarray(idx_b.T.copy()),
            val=jnp.asarray(val_b.T.copy()).astype(jnp.dtype(dtype))))
        pos += nb
    n_zero = int(np.sum(k_of == 0))

    # hub residual: edges with slot >= their row's bucket K (only rows
    # clamped at the cap can have any)
    ovm = slot >= np.maximum(k_of[row_s], 1)
    n_ov = int(ovm.sum())
    e_ov_pad = max(_round_up(n_ov, 512), 512) if n_ov else 0
    ov_row = np.zeros(e_ov_pad, np.int32)
    ov_col = np.zeros(e_ov_pad, np.int32)
    ov_val = np.zeros(e_ov_pad, np.float32)
    ov_row[:n_ov] = row_s[ovm]
    ov_col[:n_ov] = col_s[ovm]
    ov_val[:n_ov] = val_s[ovm]
    if n_ov:
        ov_row[n_ov:] = ov_row[n_ov - 1]
    return ELLSigma(
        buckets=tuple(buckets),
        perm=jnp.asarray(perm, jnp.int32),
        inv=jnp.asarray(inv, jnp.int32),
        ov_row=jnp.asarray(ov_row), ov_col=jnp.asarray(ov_col),
        ov_val=jnp.asarray(ov_val), n_rows=int(n_rows),
        n_zero=n_zero)


def _sigma_matmul(s: ELLSigma, x: jax.Array) -> jax.Array:
    """out = M @ x: per-bucket unrolled sweeps, concat, unpermute
    GATHER (no scatter below the hub cap)."""
    xc = x.astype(s.buckets[0].val.dtype if s.buckets else x.dtype)
    outs = []
    for b in s.buckets:
        part = None
        for k in range(b.idx.shape[0]):
            rows = xc.at[b.idx[k]].get(mode="promise_in_bounds")
            t = (rows * b.val[k][:, None]).astype(jnp.float32)
            part = t if part is None else part + t
        outs.append(part)
    if s.n_zero:
        outs.append(jnp.zeros((s.n_zero, x.shape[1]), jnp.float32))
    cat = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    out = cat.at[s.inv].get(mode="promise_in_bounds")
    if s.n_overflow:
        out = out + _overflow_spmm(s.ov_row, s.ov_col, s.ov_val, x,
                                   s.n_rows)
    return out


def _sigma_colsum(s: ELLSigma, emb_n: jax.Array,
                  tgt: jax.Array) -> jax.Array:
    """num[u] = Σ_i M_ui ⟨emb_n[idx], tgt[u]⟩ over the table's rows u
    (used with the TRANSPOSED/U-row table; tgt has one row per table
    row)."""
    ec = emb_n.astype(s.buckets[0].val.dtype if s.buckets else emb_n.dtype)
    tgt_p = tgt.at[s.perm].get(mode="promise_in_bounds")
    tc = tgt_p.astype(ec.dtype)
    outs = []
    pos = 0
    for b in s.buckets:
        nb = b.idx.shape[1]
        tb = tc[pos: pos + nb]
        part = None
        for k in range(b.idx.shape[0]):
            rows = ec.at[b.idx[k]].get(mode="promise_in_bounds")
            t = b.val[k].astype(jnp.float32) * jnp.einsum(
                "nd,nd->n", rows, tb, preferred_element_type=jnp.float32)
            part = t if part is None else part + t
        outs.append(part)
        pos += nb
    if s.n_zero:
        outs.append(jnp.zeros((s.n_zero,), jnp.float32))
    cat = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    num = cat.at[s.inv].get(mode="promise_in_bounds")
    if s.n_overflow:
        cos = jnp.einsum(
            "ed,ed->e", emb_n[s.ov_col], tgt[s.ov_row],
            preferred_element_type=jnp.float32) * s.ov_val
        num = num + jax.ops.segment_sum(
            cos, s.ov_row, num_segments=s.n_rows,
            indices_are_sorted=True)
    return num


def _matmul_any(m, x: jax.Array) -> jax.Array:
    if isinstance(m, ELLSigma):
        return _sigma_matmul(m, x)
    return _ell_matmul(m, x)


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
    """Forward + transposed tables for differentiable SpMM/affinity.
    Each side is either a flat :class:`ELL` (shared-structure remapping,
    halo sharding) or a :class:`ELLSigma` (the single-device sparse
    regime — scatter-free overflow)."""

    fwd: object
    bwd: object
    n_nodes: int = dataclasses.field(metadata=dict(static=True))


def ell_pair_from_graph(g: Graph, *, layout: str = "flat",
                        **kw) -> ELLPair:
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    if layout == "sigma":
        dtype = kw.pop("dtype", "float32")
        return ELLPair(
            fwd=ell_sigma_from_coo(row, col, val, g.n_nodes, dtype=dtype),
            bwd=ell_sigma_from_coo(col, row, val, g.n_nodes, dtype=dtype),
            n_nodes=g.n_nodes)
    return ELLPair(fwd=ell_from_coo(row, col, val, g.n_nodes, **kw),
                   bwd=ell_from_coo(col, row, val, g.n_nodes, **kw),
                   n_nodes=g.n_nodes)



_OV_CHUNK_ELEMS = 1 << 26   # cap the [E_ov, d] overflow gather at 256 MB


def _overflow_spmm(ov_row, ov_col, ov_val, x, n_rows):
    """Overflow-COO segment-sum with CHUNKED gathers: the naive
    ``x[ov_col] * ov_val[:, None]`` materializes [E_ov, d] — 8 GB at
    TAM-amazon density (mean degree ~330 spills most edges), a
    round-5 chip OOM. Chunks keep it ≤ _OV_CHUNK_ELEMS elements;
    per-chunk rows stay sorted so the segment promise holds."""
    e, d = ov_row.shape[0], x.shape[1]
    if e * d <= _OV_CHUNK_ELEMS:
        gathered = x[ov_col] * ov_val[:, None]
        return jax.ops.segment_sum(gathered, ov_row,
                                   num_segments=n_rows,
                                   indices_are_sorted=True)
    chunk = max(_OV_CHUNK_ELEMS // d, 1)
    n_full = e // chunk

    def body(acc, i):
        sl_r = jax.lax.dynamic_slice_in_dim(ov_row, i * chunk, chunk)
        sl_c = jax.lax.dynamic_slice_in_dim(ov_col, i * chunk, chunk)
        sl_v = jax.lax.dynamic_slice_in_dim(ov_val, i * chunk, chunk)
        g = x[sl_c] * sl_v[:, None]
        return acc + jax.ops.segment_sum(
            g, sl_r, num_segments=n_rows, indices_are_sorted=True), None

    acc0 = jnp.zeros((n_rows, d), jnp.float32) \
        + 0.0 * x[0, 0].astype(jnp.float32)
    out, _ = jax.lax.scan(body, acc0, jnp.arange(n_full))
    rem = e - n_full * chunk
    if rem:
        g = x[ov_col[n_full * chunk:]] * ov_val[n_full * chunk:, None]
        out = out + jax.ops.segment_sum(
            g, ov_row[n_full * chunk:], num_segments=n_rows,
            indices_are_sorted=True)
    return out


_UNROLL_K = 16    # unroll the slot sweeps up to this K (compile size)


def _ell_matmul(m: ELL, x: jax.Array) -> jax.Array:
    """out = M @ x via K gather-accumulate sweeps + overflow segment-sum.

    Multiplies in the table dtype (bf16 when built with
    ``dtype='bfloat16'``), accumulates in f32.

    Small K unrolls the sweeps into K independent gathers + one add
    chain: a ``lax.scan`` forces the [N, d] f32 accumulator through HBM
    every sweep (in + out, ~2/3 of the traffic), while the unrolled
    adds fuse — measured 4.03 → 1.94 ms on the elliptic-shaped matmul
    (K=8, d=300, round-5 micro). Large K keeps the scan (compile-time
    risk of a K-deep unroll).
    """
    xc = x.astype(m.val.dtype)

    if m.k <= _UNROLL_K:
        out = None
        for k in range(m.k):
            rows = xc.at[m.idx[k]].get(mode="promise_in_bounds")
            t = (rows * m.val[k][:, None]).astype(jnp.float32)
            out = t if out is None else out + t
    else:
        def body(acc, slot):
            idx_s, val_s = slot
            rows = xc.at[idx_s].get(mode="promise_in_bounds")
            return acc + (rows * val_s[:, None]).astype(jnp.float32), None

        # init derives from x so its varying-manual-axes type matches
        # the body output under shard_map (the halo-sharded ELL path)
        acc0 = jnp.zeros((m.n_rows, x.shape[1]), jnp.float32) \
            + 0.0 * xc[0, 0].astype(jnp.float32)
        out, _ = jax.lax.scan(body, acc0, (m.idx, m.val))
    if m.n_overflow:
        out = out + _overflow_spmm(m.ov_row, m.ov_col, m.ov_val, x,
                                   m.n_rows)
    return out


@jax.custom_vjp
def ell_spmm(pair: ELLPair, x: jax.Array) -> jax.Array:
    """out = A @ x; differentiable in x (Aᵀ g via the transposed table)."""
    return _matmul_any(pair.fwd, x)


def _ell_spmm_fwd(pair, x):
    return _matmul_any(pair.fwd, x), pair


def _ell_spmm_bwd(pair, g):
    return None, _matmul_any(pair.bwd, g)


ell_spmm.defvjp(_ell_spmm_fwd, _ell_spmm_bwd)


def _ell_colsum_raw(m_t: ELL, emb_n: jax.Array,
                    tgt: jax.Array | None = None) -> jax.Array:
    """num[u] = Σ_i A_iu ⟨n_i, tgt_u⟩ using the TRANSPOSED table m_t
    (rows of Aᵀ are columns of A) — K scatter-free sweeps (unrolled at
    small K like :func:`_ell_matmul`). ``tgt`` defaults to ``emb_n``
    (the square affinity case); the rect subset passes its own U-row
    target block."""
    if tgt is None:
        tgt = emb_n
    ec = emb_n.astype(m_t.val.dtype)
    tc = tgt.astype(m_t.val.dtype)

    if m_t.k <= _UNROLL_K:
        num = None
        for k in range(m_t.k):
            rows = ec.at[m_t.idx[k]].get(mode="promise_in_bounds")
            t = m_t.val[k].astype(jnp.float32) * jnp.einsum(
                "nd,nd->n", rows, tc,
                preferred_element_type=jnp.float32)
            num = t if num is None else num + t
    else:
        def body(num, slot):
            idx_s, val_s = slot
            rows = ec.at[idx_s].get(mode="promise_in_bounds")
            return num + val_s.astype(jnp.float32) * jnp.einsum(
                "nd,nd->n", rows, tc,
                preferred_element_type=jnp.float32), None

        num0 = jnp.zeros((m_t.n_rows,), jnp.float32) \
            + 0.0 * ec[0, 0].astype(jnp.float32)
        num, _ = jax.lax.scan(body, num0, (m_t.idx, m_t.val))
    if m_t.n_overflow:
        # overflow edges of Aᵀ: (row=u, col=i) pairs
        cos = jnp.einsum("ed,ed->e", emb_n[m_t.ov_col], tgt[m_t.ov_row],
                         preferred_element_type=jnp.float32) * m_t.ov_val
        num = num + jax.ops.segment_sum(
            cos, m_t.ov_row, num_segments=m_t.n_rows,
            indices_are_sorted=True)
    return num


def _colsum_any(m, emb_n: jax.Array, tgt: jax.Array) -> jax.Array:
    if isinstance(m, ELLSigma):
        return _sigma_colsum(m, emb_n, tgt)
    return _ell_colsum_raw(m, emb_n, tgt)


@jax.custom_vjp
def ell_affinity_colsum(pair: ELLPair, emb_n: jax.Array) -> jax.Array:
    """Column sums of A ∘ (N Nᵀ) for row-normalized embeddings N; [N].

    Differentiable in ``emb_n``: dN = A (g ⊙ N) + g ⊙ (Aᵀ N), two table
    sweeps (same identity as ``pallas_sddmm``).
    """
    return _colsum_any(pair.bwd, emb_n, emb_n)


def _ell_colsum_fwd(pair, emb_n):
    return _colsum_any(pair.bwd, emb_n, emb_n), (pair, emb_n)


def _ell_colsum_bwd(res, g):
    pair, emb_n = res
    term1 = _matmul_any(pair.fwd, g[:, None] * emb_n)
    term2 = g[:, None] * _matmul_any(pair.bwd, emb_n)
    return None, term1 + term2


ell_affinity_colsum.defvjp(_ell_colsum_fwd, _ell_colsum_bwd)


# --------------------------------------------------------------------------
# Column-subset affinity on ELL tables (the sparse-regime margin path)
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ELLAffinitySubset:
    """Rect ELL tables of ``A[:, uniq]`` ([N × U], columns renumbered)
    for the margin loss's column-subset affinity.

    Round-5 motivation: on the ELL route the margin ran the
    EDGE-PARALLEL subset (``ops.sddmm.AffinitySubset``) whose backward
    scatter-adds ~E_sub row contributions into the [N, d] embedding —
    TPU scatters measured ~20× slower than gathers (elliptic ablation:
    2.37 ms of a 10.3 ms step). Both directions here are scatter-free
    slot sweeps: the forward gathers U-row slices (U ≪ N), the backward
    is a rect ELL matmul into the N-row output plus one U-row
    ``.at[uniq].add`` — measured 2.37 → ~0.5 ms. Identical values at
    the read nodes (value + gradient tested against the edge path).

    ``fwd``: [N × U] table — ``idx`` entries address a [U, d] operand.
    ``bwd``: [U × N] table — ``idx`` entries address the [N, d] embedding.
    """

    fwd: object           # rect table [N × U] (ELLSigma)
    bwd: object           # rect table [U × N] (ELLSigma)
    uniq: jax.Array       # [U] unique subset node ids
    gather: jax.Array     # [S] position of idx[k] in uniq
    inv_den: jax.Array    # [U] 1/column-sum (0 where isolated)
    umask: jax.Array      # [N] bool: node is in uniq (host-precomputed)
    upos: jax.Array       # [N] int32: its position in uniq (0 elsewhere)
    n_uniq: int = dataclasses.field(metadata=dict(static=True))


def ell_affinity_subset(g: Graph, idx, *, dtype="float32",
                        **kw) -> ELLAffinitySubset:
    """Host-side: restrict ``g`` to columns in ``idx`` (renumbered) and
    build both rect ELL orientations."""
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
    umask = np.zeros(g.n_nodes, bool)
    umask[uniq] = True
    upos = np.zeros(g.n_nodes, np.int32)
    upos[uniq] = np.arange(len(uniq))
    return ELLAffinitySubset(
        fwd=ell_sigma_from_coo(r, c, v, g.n_nodes, dtype=dtype, **kw),
        bwd=ell_sigma_from_coo(c, r, v, len(uniq), dtype=dtype, **kw),
        uniq=jnp.asarray(uniq, jnp.int32),
        umask=jnp.asarray(umask), upos=jnp.asarray(upos),
        gather=jnp.asarray(gather, jnp.int32),
        inv_den=jnp.asarray(
            np.where(den != 0, 1.0 / np.maximum(den, 1e-30), 0.0),
            jnp.float32),
        n_uniq=len(uniq))


@jax.custom_vjp
def ell_subset_colsum(sub: ELLAffinitySubset,
                      emb_n: jax.Array) -> jax.Array:
    """Column sums of R ∘ (N tgtᵀ) for R = A[:, uniq]; [U].

    Differentiable in ``emb_n`` (tgt = emb_n[uniq] is derived inside):
    d emb = R (g ⊙ tgt) + at[uniq] += g ⊙ (Rᵀ emb) — two rect table
    matmuls, no edge scatters.
    """
    return _colsum_any(sub.bwd, emb_n, emb_n[sub.uniq])


def _ell_subset_fwd(sub, emb_n):
    return _colsum_any(sub.bwd, emb_n, emb_n[sub.uniq]), (sub, emb_n)


def _ell_subset_bwd(res, g):
    sub, emb_n = res
    tgt = emb_n[sub.uniq]
    z = g[:, None] * tgt                           # [U, d]
    term1 = _matmul_any(sub.fwd, z)                # R z → [N, d]
    w = g[:, None] * _matmul_any(sub.bwd, emb_n)   # g ⊙ (Rᵀ emb) [U, d]
    # scatter-free accumulate at the uniq rows: mask + gather fuses into
    # the add (the .at[uniq].add scatter it replaces cost ~0.4 ms)
    w_full = w.at[sub.upos].get(mode="promise_in_bounds")
    return None, term1 + jnp.where(sub.umask[:, None], w_full, 0.0)


ell_subset_colsum.defvjp(_ell_subset_fwd, _ell_subset_bwd)


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
    """``layout='sigma'`` (the single-device trainer route) buckets rows
    by degree — scatter-free; the default flat layout keeps the fixed-K
    tables the shared-structure (TAM) and halo paths rely on."""
    return ELLGraph(graph=g, tables=ell_pair_from_graph(g, **kw))
