"""Explicit edge-partitioned distributed SpMM/affinity via shard_map.

The scaling analog of sequence parallelism for graphs (SURVEY.md §5):
CSR row-blocks are assigned to devices; node-indexed arrays shard their
node axis over the same mesh axis.

Two comm schedules are provided:

**Boundary halo exchange** (:func:`spmm_halo` / :func:`affinity_halo`,
the production path): each device precomputes, per peer, exactly which
of its feature rows the peer's edges reference (the *boundary set*), and
one ``all_to_all`` moves only those rows — comm volume is
O(max-boundary · d) per device instead of O(N · d). The affinity's
per-column reduction runs the same exchange in reverse (scalar
partial sums back to the owner). Built host-side once per
(graph, mesh-size) into a :class:`HaloPlan`.

**Full all-gather** (:func:`spmm_sharded` / :func:`affinity_sharded`,
the reference implementation): all-gather the whole H and aggregate
locally. Simple and kept as the correctness oracle, but memory and comm
are O(N·d) per device — it cannot scale to DGraph (3.7M × 300 f32 ≈
4.4 GB per device).

Backward passes are handled by shard_map's autodiff: the transpose of
``all_gather`` is ``psum_scatter``, the transpose of ``all_to_all`` is
the reverse ``all_to_all``, and gathers transpose to scatter-adds — no
hand-written VJPs.

This module is the explicit-collective counterpart of the GSPMD path in
``ggad_tpu.parallel.full_batch`` — same math, deterministic comm schedule.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggad_tpu.graph import Graph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgePartition:
    """Row-partitioned edge blocks with equal padded sizes per shard.

    Shapes: row_local/col/val are [D·E_shard] arrays laid out so that
    shard d owns slice [d·E_shard, (d+1)·E_shard) — i.e. shardable with
    ``P('nodes')``. ``row_local`` is the row index *within* the shard's
    row block. Padding edges have val == 0 and row_local == 0.
    """

    row_local: jax.Array
    col: jax.Array
    val: jax.Array
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    e_shard: int = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))  # unpadded
    # local aggregation processes edges in this many lax.scan chunks:
    # bounds the materialized [e_shard/chunks, d] gather buffer (the
    # edge-parallel SpMM would otherwise allocate O(e_shard·d) — 46 GB
    # at 0.1×-DGraph scale). 1 = single-shot (maximum exchange overlap).
    edge_chunks: int = dataclasses.field(
        default=1, metadata=dict(static=True))

    @property
    def n_pad(self) -> int:
        return self.n_shards * self.rows_per_shard


def partition_edges(g: Graph, n_shards: int, *,
                    edge_chunks: int | None = None,
                    chunk_budget_bytes: int = 2 << 30,
                    feat_dim_hint: int = 300) -> EdgePartition:
    """Host-side: split edges into per-device row blocks (balanced pad).

    ``edge_chunks``: explicit chunk count for the local aggregation
    (None = auto: smallest count keeping the per-chunk [chunk, d] gather
    buffer under ``chunk_budget_bytes`` at ``feat_dim_hint`` features).
    """
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]

    rows_per = _round_up(g.n_nodes, n_shards) // n_shards
    owner = row // rows_per
    e_shard = 0
    blocks = []
    for d in range(n_shards):
        sel = owner == d
        blocks.append((row[sel] - d * rows_per, col[sel], val[sel]))
        e_shard = max(e_shard, int(sel.sum()))
    if edge_chunks is None:
        per_edge = feat_dim_hint * 4
        edge_chunks = max(1, -(-e_shard * per_edge // chunk_budget_bytes))
    e_shard = max(_round_up(e_shard, 8 * edge_chunks), 8 * edge_chunks)

    rl = np.zeros((n_shards, e_shard), np.int32)
    cc = np.zeros((n_shards, e_shard), np.int32)
    vv = np.zeros((n_shards, e_shard), np.float32)
    for d, (r, c, v) in enumerate(blocks):
        rl[d, : len(r)] = r
        cc[d, : len(c)] = c
        vv[d, : len(v)] = v

    return EdgePartition(
        row_local=jnp.asarray(rl.reshape(-1)),
        col=jnp.asarray(cc.reshape(-1)),
        val=jnp.asarray(vv.reshape(-1)),
        n_shards=n_shards,
        rows_per_shard=rows_per,
        e_shard=e_shard,
        n_nodes=g.n_nodes,
        edge_chunks=edge_chunks,
    )


def place_partition(part: EdgePartition, mesh: Mesh,
                    axis: str = "nodes") -> EdgePartition:
    sh = NamedSharding(mesh, P(axis))
    return dataclasses.replace(
        part,
        row_local=jax.device_put(part.row_local, sh),
        col=jax.device_put(part.col, sh),
        val=jax.device_put(part.val, sh),
    )


def pad_nodes(x: jax.Array, part: EdgePartition) -> jax.Array:
    """Pad a [N, ...] node array to the partition's padded node count."""
    pad = part.n_pad - x.shape[0]
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def spmm_sharded(part: EdgePartition, h: jax.Array, mesh: Mesh,
                 axis: str = "nodes") -> jax.Array:
    """out = A @ h with explicit collectives. ``h``: [N_pad, d] sharded
    (or global under jit — GSPMD splits it). Returns [N_pad, d] sharded.
    """

    def local(row_local, col, val, h_local):
        h_full = jax.lax.all_gather(h_local, axis, tiled=True)
        gathered = h_full[col] * val[:, None]
        return jax.ops.segment_sum(gathered, row_local,
                                   num_segments=part.rows_per_shard)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(part.row_local, part.col, part.val, h)


# ---------------------------------------------------------------------------
# Boundary halo exchange
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Precomputed boundary-exchange schedule for one (graph, D) pair.

    Two wire schedules share the same buffer/remap layout contract:

    **dense** (``dist_widths == ()``): one ``all_to_all`` with every
    ordered peer pair padded to the GLOBAL max boundary width B.
    ``send_idx`` [D, D·B]: row s holds, per requester d, the B local row
    ids shard s must send to d. Recv buffer layout: source s's chunk at
    ``s·B``.

    **ring** (``dist_widths = (B_1, …, B_{D-1})``): D−1 ``ppermute``
    hops; hop k ships shard s's chunk for destination (s+k) mod D,
    padded only to B_k = max over shards of that DISTANCE's boundary
    (zero-width distances are skipped entirely). Comm per device is
    Σ_k B_k rows instead of (D−1)·B — on graphs whose partition
    boundaries are skewed across peer pairs this is the
    "variable-size exchange" lever (docs/PERF.md). Send and recv
    buffers are both laid out by hop: chunk k at ``offset_k =
    Σ_{j<k} B_j``; on shard d hop k's recv chunk comes from source
    (d−k) mod D.

    ``col_remap`` [D·E_shard] (sharded like the edge arrays): for each
    edge, the position of its column's feature row in the local combined
    buffer ``[recv(buf_width rows) ‖ h_local(rows_per rows)]`` — remote
    columns map to their source chunk's offset + rank-in-request, local
    columns to ``buf_width + local_id``, padding edges to ``buf_width``
    (row 0 · val 0).

    ``den`` [D·rows_per] (sharded): per-node column-sum of edge values
    (the affinity denominator), precomputed so the affinity needs no
    extra reduction.

    ``boundary`` = B = max over ordered peer pairs of the unique remote
    columns requested — the dense schedule's halo width.
    """

    send_idx: jax.Array
    col_remap: jax.Array
    den: jax.Array
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    boundary: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))
    dist_widths: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))
    # per-round destination permutations (round r: src s → dist_perms[r][s]).
    # Empty with dist_widths set = the ring default (s+k) mod D; set by
    # schedule='sched' (matched rounds: per-round max-weight matchings —
    # beats fixed distance pairing when boundary widths are skewed
    # across peer pairs).
    dist_perms: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))

    @property
    def buf_width(self) -> int:
        """Rows in the packed send/recv exchange buffers."""
        if self.dist_widths:
            return int(sum(self.dist_widths))
        return self.n_shards * self.boundary

    def round_perm(self, r: int) -> list:
        """Destination of each source shard in exchange round r."""
        D = self.n_shards
        if self.dist_perms:
            return list(self.dist_perms[r])
        return [(s + r + 1) % D for s in range(D)]


def _halo_exchange(plan: HaloPlan, send: jax.Array, axis: str) -> jax.Array:
    """Wire the packed [buf_width, ...] send buffer to its peers; returns
    the packed recv buffer (same layout contract as ``HaloPlan``). Runs
    inside a shard_map body. Differentiable: shard_map transposes
    ``all_to_all``/``ppermute`` to their inverses."""
    D = plan.n_shards
    tail = send.shape[1:]
    if not plan.dist_widths:
        B = plan.boundary
        recv = jax.lax.all_to_all(send.reshape((D, B) + tail), axis, 0, 0,
                                  tiled=True)
        return recv.reshape((D * B,) + tail)
    parts, off = [], 0
    for r, bk in enumerate(plan.dist_widths):
        if bk == 0:
            continue
        dest = plan.round_perm(r)
        perm = [(s, dest[s]) for s in range(D)]
        parts.append(jax.lax.ppermute(send[off:off + bk], axis, perm))
        off += bk
    if not parts:
        return jnp.zeros((0,) + tail, send.dtype)
    return jnp.concatenate(parts, axis=0)


def _halo_exchange_rev(plan: HaloPlan, buf: jax.Array,
                       axis: str) -> jax.Array:
    """Reverse wire: ship a recv-layout [buf_width, ...] buffer back so
    each shard gets chunks aligned with its OWN send layout (used by the
    affinity's per-column partial-sum return trip)."""
    D = plan.n_shards
    tail = buf.shape[1:]
    if not plan.dist_widths:
        B = plan.boundary
        rev = jax.lax.all_to_all(buf.reshape((D, B) + tail), axis, 0, 0,
                                 tiled=True)
        return rev.reshape((D * B,) + tail)
    parts, off = [], 0
    for r, bk in enumerate(plan.dist_widths):
        if bk == 0:
            continue
        dest = plan.round_perm(r)
        perm = [(dest[s], s) for s in range(D)]   # inverse permutation
        parts.append(jax.lax.ppermute(buf[off:off + bk], axis, perm))
        off += bk
    if not parts:
        return jnp.zeros((0,) + tail, buf.dtype)
    return jnp.concatenate(parts, axis=0)


def _matched_rounds(req, D):
    """Decompose the D·(D−1) ordered peer pairs into D−1 permutation
    rounds by repeated max-weight perfect matching (Hungarian), grouping
    the widest pairs into the same rounds so Σ_r max-width shrinks.

    The unused-pair graph stays regular bipartite after each extraction,
    so a diagonal-free perfect matching always exists.
    """
    import scipy.optimize as so

    w = np.array([[len(req[d][s]) for d in range(D)] for s in range(D)],
                 np.int64)
    BIG = int(w.sum()) + 1
    used = np.zeros((D, D), bool)
    np.fill_diagonal(used, True)
    rounds = []
    for _ in range(D - 1):
        cost = np.where(used, BIG, -w)
        rs, cs = so.linear_sum_assignment(cost)
        perm = np.empty(D, np.int64)
        perm[rs] = cs
        rounds.append([int(perm[s]) for s in range(D)])
        used[rs, perm[rs]] = True
    return rounds


def build_halo_plan(part: EdgePartition,
                    schedule: str = "dense") -> HaloPlan:
    """Host-side: per-peer boundary sets + edge remap for ``part``.

    ``schedule``:
      * ``'dense'`` — one all_to_all, every ordered pair padded to the
        global max boundary B;
      * ``'ring'`` — D−1 ppermute rounds paired by DISTANCE (round k:
        s → s+k mod D), each padded to that round's max width — ships
        Σ_k B_k rows ≤ (D−1)·B;
      * ``'sched'`` — D−1 ppermute rounds paired by max-weight MATCHING
        (``_matched_rounds``): when boundary widths are skewed across
        peer pairs, grouping wide pairs into the same rounds drops
        Σ_r B_r toward the per-device lower bound max_s Σ_d |req|;
        falls back to the ring pairing when not strictly better.
    """
    D, E, R = part.n_shards, part.e_shard, part.rows_per_shard
    col = np.asarray(part.col).reshape(D, E)
    val = np.asarray(part.val).reshape(D, E)

    req = [[np.zeros(0, np.int64)] * D for _ in range(D)]
    B = 1
    for d in range(D):
        live = val[d] != 0
        owner = col[d] // R
        for s in range(D):
            if s == d:
                continue
            u = np.unique(col[d][live & (owner == s)])
            req[d][s] = u
            B = max(B, len(u))

    if schedule in ("ring", "sched") and D == 1:
        schedule = "dense"   # no peers, no wire — schedules coincide
    if schedule in ("ring", "sched"):
        # Exact per-round packing (no alignment padding): the wire/lane
        # dim is the feature axis, so any chunk row count works, and
        # Σ_r max-width ≤ (D−1)·B makes both ≤ dense by construction.
        def round_widths(perms):
            return [max(len(req[p[s]][s]) for s in range(D))
                    for p in perms]

        ring_perms = [[(s + k) % D for s in range(D)]
                      for k in range(1, D)]
        perms, dist_perms = ring_perms, ()
        if schedule == "sched" and D > 2:
            cand = _matched_rounds(req, D)
            if sum(round_widths(cand)) < sum(round_widths(ring_perms)):
                perms, dist_perms = cand, tuple(
                    tuple(p) for p in cand)
        widths = round_widths(perms)
        if not any(widths):
            widths[0] = 8   # degenerate block-diagonal graph
        offsets = np.zeros(len(perms), np.int64)
        acc = 0
        for r in range(len(perms)):
            offsets[r] = acc
            acc += widths[r]
        W = acc

        send_idx = np.zeros((D, W), np.int32)
        for r, p in enumerate(perms):
            o = offsets[r]
            for s in range(D):
                u = req[p[s]][s]
                send_idx[s, o: o + len(u)] = u - s * R

        col_remap = np.full((D, E), W, np.int32)
        for d in range(D):
            live = val[d] != 0
            owner = col[d] // R
            m = live & (owner == d)
            col_remap[d, m] = W + (col[d][m] - d * R)
            for r, p in enumerate(perms):
                s = list(p).index(d)   # the source sending to d in round r
                if s == d:
                    continue
                m = live & (owner == s)
                if not m.any():
                    continue
                col_remap[d, m] = offsets[r] + np.searchsorted(
                    req[d][s], col[d][m])
        dist_widths = tuple(int(w) for w in widths)
    elif schedule == "dense":
        send_idx = np.zeros((D, D, B), np.int32)
        for d in range(D):
            for s in range(D):
                if s == d:
                    continue
                u = req[d][s]
                send_idx[s, d, : len(u)] = u - s * R
        send_idx = send_idx.reshape(D, D * B)

        col_remap = np.full((D, E), D * B, np.int32)  # padding slot
        for d in range(D):
            live = val[d] != 0
            owner = col[d] // R
            m = live & (owner == d)
            col_remap[d, m] = D * B + (col[d][m] - d * R)
            for s in range(D):
                if s == d:
                    continue
                m = live & (owner == s)
                if not m.any():
                    continue
                col_remap[d, m] = s * B + np.searchsorted(
                    req[d][s], col[d][m])
        dist_widths = ()
        dist_perms = ()
    else:
        raise ValueError(f"unknown halo schedule: {schedule!r}")

    den = np.zeros(part.n_pad, np.float32)
    np.add.at(den, col.reshape(-1), val.reshape(-1))

    return HaloPlan(
        send_idx=jnp.asarray(send_idx),
        col_remap=jnp.asarray(col_remap.reshape(-1)),
        den=jnp.asarray(den),
        n_shards=D, boundary=B, rows_per_shard=R,
        dist_widths=dist_widths,
        dist_perms=dist_perms,
    )


def place_halo_plan(plan: HaloPlan, mesh: Mesh,
                    axis: str = "nodes") -> HaloPlan:
    sh = NamedSharding(mesh, P(axis))
    return dataclasses.replace(
        plan,
        send_idx=jax.device_put(plan.send_idx, sh),
        col_remap=jax.device_put(plan.col_remap, sh),
        den=jax.device_put(plan.den, sh),
    )


def halo_comm_stats(plan: HaloPlan, feat_dim: int,
                    dtype_bytes: int = 4) -> dict:
    """Per-device, per-call comm volume of the halo schedule vs the full
    all-gather (documentation + the comm-volume test's oracle)."""
    D, B, R = plan.n_shards, plan.boundary, plan.rows_per_shard
    if plan.dist_widths:
        wire_rows = int(sum(plan.dist_widths))   # Σ_k B_k per device
    else:
        wire_rows = (D - 1) * B
    return {
        "n_shards": D,
        "boundary_rows": B,
        "wire_rows": wire_rows,
        "schedule": ("sched" if plan.dist_perms
                     else "ring" if plan.dist_widths else "dense"),
        "spmm_halo_bytes": wire_rows * feat_dim * dtype_bytes,
        "affinity_halo_bytes": wire_rows * (feat_dim + 1) * dtype_bytes
        + D * R * dtype_bytes,   # + the [N] result all-gather
        "allgather_bytes": (D - 1) * R * feat_dim * dtype_bytes * D,
    }


def spmm_halo(part: EdgePartition, plan: HaloPlan, h: jax.Array,
              mesh: Mesh, axis: str = "nodes") -> jax.Array:
    """out = A @ h exchanging only boundary rows. ``h``: [N_pad, d]
    sharded over ``axis``. Returns [N_pad, d] sharded.

    The local-column contribution is computed as a SEPARATE term that
    does not depend on the received buffer, so XLA's latency-hiding
    scheduler can overlap it with the exchange. When
    ``part.edge_chunks > 1`` the aggregation runs as a lax.scan over
    edge chunks instead — the materialized [chunk, d] gather buffer is
    bounded (huge-E shards would otherwise OOM: the single-shot gather
    is O(e_shard·d) HBM), at the cost of exchange overlap.
    """
    R, W = plan.rows_per_shard, plan.buf_width
    C = part.edge_chunks

    def local(send_idx, col_remap, row_local, val, h_local):
        send = h_local[send_idx.reshape(-1)]            # [W, f]
        buf = _halo_exchange(plan, send, axis)          # [W, f]
        is_local = col_remap >= W
        local_cols = jnp.where(is_local, col_remap - W, 0)
        lv = jnp.where(is_local, val, 0.0)
        remote_cols = jnp.where(is_local, 0, col_remap)
        rv = jnp.where(is_local, 0.0, val)
        if C == 1:
            # local term first: no dependence on the received buffer →
            # overlaps the exchange
            out = jax.ops.segment_sum(h_local[local_cols] * lv[:, None],
                                      row_local, num_segments=R)
            out = out + jax.ops.segment_sum(
                buf[remote_cols] * rv[:, None], row_local, num_segments=R)
            return out

        # remat: without it the scan's backward stacks each chunk's
        # gathered [chunk, d] residuals — re-materializing the full
        # O(e_shard·d) buffer the chunking exists to avoid
        @jax.checkpoint
        def body(out, sl):
            rl, lc, lvc, rc, rvc = sl
            out = out + jax.ops.segment_sum(
                h_local[lc] * lvc[:, None], rl, num_segments=R)
            out = out + jax.ops.segment_sum(
                buf[rc] * rvc[:, None], rl, num_segments=R)
            return out, None

        chunks = jax.tree.map(
            lambda a: a.reshape(C, -1),
            (row_local, local_cols, lv, remote_cols, rv))
        # init must carry the same varying-manual-axes type as the body
        # output (h_local is device-varying inside shard_map)
        out, _ = jax.lax.scan(body, h_local * 0.0, chunks)
        return out

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(plan.send_idx, plan.col_remap, part.row_local, part.val, h)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloBCSR:
    """Per-shard BCSR tile sets for the halo-local SpMM (MXU path).

    Shard d's local sparse matrix maps the combined [recv(D·B) ‖ local(R)]
    buffer onto its R rows; ``fwd_*``/``bwd_*`` hold the forward and
    transposed tile sets stacked on a leading device axis (sharded with
    ``P(axis)``), tile counts padded to the max across shards.

    ``loc_*``/``locT_*``: the LOCAL-column tiles ([R × R], columns
    inside the shard's own block, + transpose) split out so their
    matmul/SDDMM does not depend on the ``all_to_all`` result — XLA
    overlaps it with the exchange. ``fwd_*``/``bwd_*`` cover only the
    remote columns ([R × D·B] and its transpose).
    """

    loc_rows: jax.Array   # [D, Tl]
    loc_cols: jax.Array   # [D, Tl]
    loc_vals: jax.Array   # [D, Tl, TILE, TILE]
    locT_rows: jax.Array  # [D, Tlt]  (local-block transpose)
    locT_cols: jax.Array  # [D, Tlt]
    locT_vals: jax.Array  # [D, Tlt, TILE, TILE]
    fwd_rows: jax.Array   # [D, Tf]   (remote: [R × D·B])
    fwd_cols: jax.Array   # [D, Tf]
    fwd_vals: jax.Array   # [D, Tf, TILE, TILE]
    bwd_rows: jax.Array   # [D, Tb]   (remote transpose: [D·B × R])
    bwd_cols: jax.Array   # [D, Tb]
    bwd_vals: jax.Array   # [D, Tb, TILE, TILE]
    # row pads are tile_rows multiples (tall tiles), col pads 128-wide:
    r_row_pad: int = dataclasses.field(metadata=dict(static=True))
    r_col_pad: int = dataclasses.field(metadata=dict(static=True))
    w_row_pad: int = dataclasses.field(metadata=dict(static=True))
    w_col_pad: int = dataclasses.field(metadata=dict(static=True))


def build_halo_bcsr(part: EdgePartition, plan: HaloPlan,
                    dtype=np.float32,
                    tile_rows: int | None = None,
                    mem_budget_bytes: int = 8 << 30) -> HaloBCSR | None:
    """Host-side: per-shard rectangular BCSR of the remapped edge blocks
    (``dtype=bfloat16`` for the 1-pass MXU fast mode).

    ``tile_rows``: tile height for all four sets (None = auto via
    :func:`ggad_tpu.ops.pallas_spmm.pick_tile_rows` on the remapped
    coordinates — tall tiles cut the per-tile H slab traffic ∝ 1/height
    on tile-dense shards; see docs/PERF.md round 3).

    Returns ``None`` when the four tile sets would exceed
    ``mem_budget_bytes`` (tile-SPARSE huge shards: the 0.1×-DGraph
    shard occupies ~1M tiles — a 256 GiB store at 1024-tall; callers
    degrade to the XLA gather/segment path, which is also the faster
    one in that occupancy regime).
    """
    from ggad_tpu.ops.pallas_spmm import (
        TILE,
        bcsr_rect_from_coo,
        pick_tile_rows,
    )

    D, E, R, W = (part.n_shards, part.e_shard, part.rows_per_shard,
                  plan.buf_width)
    rl = np.asarray(part.row_local).reshape(D, E)
    cr = np.asarray(plan.col_remap).reshape(D, E)
    vv = np.asarray(part.val).reshape(D, E)

    # occupancy over the per-shard remapped blocks: offset shard d's
    # rows by d·R_pad so tiles never merge across shards
    live = vv.reshape(-1) != 0
    r_off = _round_up(R, 512)
    rows_all = (rl + (np.arange(D) * r_off)[:, None]).reshape(-1)[live]
    cols_all = cr.reshape(-1)[live]
    if tile_rows is None:
        tile_rows = pick_tile_rows(rows_all, cols_all, D * r_off)
    # the remapped column space spans the combined [recv ‖ local] buffer
    # (cr ∈ [0, W+R)) — an n_ct from W alone collides keys and silently
    # undercounts occupancy by orders of magnitude
    n_ct = _round_up(max(W + R, TILE), TILE) // TILE
    occ = np.unique((rows_all // tile_rows).astype(np.int64) * n_ct
                    + cols_all // TILE).shape[0]
    itemsize = 2 if dtype in ("bfloat16", jnp.bfloat16) else 4
    est_bytes = 4 * occ * tile_rows * TILE * itemsize  # 4 tile sets
    if est_bytes > mem_budget_bytes:
        import sys
        print(f"[halo] BCSR tile store would need ~{est_bytes / 2**30:.0f}"
              f" GiB ({occ} occupied tiles @ {tile_rows}-tall) — over the"
              f" {mem_budget_bytes / 2**30:.0f} GiB budget; degrading to"
              f" the XLA spmm path", file=sys.stderr, flush=True)
        return None

    np_dtype = np.float32 if dtype in (np.float32, "float32") \
        else jnp.bfloat16

    loc, locT, fwd, bwd = [], [], [], []
    for d in range(D):
        is_local = cr[d] >= W
        lc = np.where(is_local, cr[d] - W, 0)
        lv = np.where(is_local, vv[d], 0.0).astype(np.float32)
        rv = np.where(is_local, 0.0, vv[d]).astype(np.float32)
        loc.append(bcsr_rect_from_coo(rl[d], lc, lv, R, R,
                                      dtype=np_dtype,
                                      tile_rows=tile_rows))
        locT.append(bcsr_rect_from_coo(lc, rl[d], lv, R, R,
                                       dtype=np_dtype,
                                       tile_rows=tile_rows))
        fwd.append(bcsr_rect_from_coo(rl[d], cr[d], rv, R, W,
                                      dtype=np_dtype,
                                      tile_rows=tile_rows))
        bwd.append(bcsr_rect_from_coo(cr[d], rl[d], rv, W, R,
                                      dtype=np_dtype,
                                      tile_rows=tile_rows))

    def stack(blocks):
        t_max = max(b.tile_rows.shape[0] for b in blocks)
        rows = np.zeros((D, t_max), np.int32)
        cols = np.zeros((D, t_max), np.int32)
        vals = np.zeros((D, t_max, tile_rows, TILE), np_dtype)
        for d, b in enumerate(blocks):
            t = b.tile_rows.shape[0]
            rows[d, :t] = np.asarray(b.tile_rows)
            cols[d, :t] = np.asarray(b.tile_cols)
            vals[d, :t] = np.asarray(b.values)
            rows[d, t:] = rows[d, t - 1]
            cols[d, t:] = cols[d, t - 1]
        return (jnp.asarray(rows.reshape(-1)),
                jnp.asarray(cols.reshape(-1)),
                jnp.asarray(vals.reshape(D * t_max, tile_rows, TILE)))

    lr_, lc_, lv_ = stack(loc)
    ltr, ltc, ltv = stack(locT)
    fr, fc, fv = stack(fwd)
    br, bc, bv = stack(bwd)
    return HaloBCSR(loc_rows=lr_, loc_cols=lc_, loc_vals=lv_,
                    locT_rows=ltr, locT_cols=ltc, locT_vals=ltv,
                    fwd_rows=fr, fwd_cols=fc, fwd_vals=fv,
                    bwd_rows=br, bwd_cols=bc, bwd_vals=bv,
                    r_row_pad=loc[0].n_rows, r_col_pad=loc[0].n_cols,
                    w_row_pad=bwd[0].n_rows, w_col_pad=fwd[0].n_cols)


def place_halo_bcsr(tiles: HaloBCSR, mesh: Mesh,
                    axis: str = "nodes") -> HaloBCSR:
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tiles)


def _as_pair(rows, cols, vals, n_rows, n_cols, n_rows_t, n_cols_t,
             rows_t, cols_t, vals_t, R):
    """Rebuild a BCSRPair from flattened per-device tile leaves."""
    from ggad_tpu.ops.pallas_spmm import BCSR, BCSRPair

    t, tt = rows.shape[0], rows_t.shape[0]
    return BCSRPair(
        fwd=BCSR(rows.reshape(t), cols.reshape(t),
                 vals.reshape(t, *vals.shape[-2:]),
                 n_rows=n_rows, n_cols=n_cols),
        bwd=BCSR(rows_t.reshape(tt), cols_t.reshape(tt),
                 vals_t.reshape(tt, *vals_t.shape[-2:]),
                 n_rows=n_rows_t, n_cols=n_cols_t),
        n_nodes=R)


def spmm_halo_bcsr(part: EdgePartition, plan: HaloPlan, tiles: HaloBCSR,
                   h: jax.Array, mesh: Mesh,
                   axis: str = "nodes") -> jax.Array:
    """out = A @ h: boundary all_to_all + per-shard Pallas BCSR matmuls
    on the MXU (the sharded counterpart of ``ops.pallas_spmm``).

    The local-block matmul takes ``h_local`` directly (no dependence on
    the exchange), so XLA overlaps it with the ``all_to_all``; the
    remote-tile matmul consumes only the received boundary rows.
    """
    from ggad_tpu.ops.pallas_spmm import bcsr_spmm_rect

    R = plan.rows_per_shard

    def local(send_idx, lr, lc, lv, ltr, ltc, ltv, fr, fc, fv, br, bc,
              bv, h_local):
        send = h_local[send_idx.reshape(-1)]
        buf = _halo_exchange(plan, send, axis)
        pair_loc = _as_pair(lr, lc, lv, tiles.r_row_pad, tiles.r_col_pad,
                            tiles.r_row_pad, tiles.r_col_pad, ltr, ltc,
                            ltv, R)
        out = bcsr_spmm_rect(pair_loc, h_local, R)   # overlaps the wire
        pair_rem = _as_pair(fr, fc, fv, tiles.r_row_pad, tiles.w_col_pad,
                            tiles.w_row_pad, tiles.r_col_pad, br, bc,
                            bv, R)
        return out + bcsr_spmm_rect(pair_rem, buf, R)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 14,
        out_specs=P(axis),
        # pallas_call can't declare varying-mesh-axes metadata yet
        check_vma=False,
    )(plan.send_idx, tiles.loc_rows, tiles.loc_cols, tiles.loc_vals,
      tiles.locT_rows, tiles.locT_cols, tiles.locT_vals,
      tiles.fwd_rows, tiles.fwd_cols, tiles.fwd_vals,
      tiles.bwd_rows, tiles.bwd_cols, tiles.bwd_vals, h)


def affinity_halo(part: EdgePartition, plan: HaloPlan, emb: jax.Array,
                  mesh: Mesh, axis: str = "nodes") -> jax.Array:
    """Per-node local affinity with boundary exchange: normalized rows
    ride the forward halo; per-column scalar partials ride it back to
    the column's owner. Returns a REPLICATED [N_pad] vector (the final
    all-gather moves N scalars, not N·d)."""
    D, R, W = plan.n_shards, plan.rows_per_shard, plan.buf_width

    def local(send_idx, col_remap, row_local, val, den_local, emb_local):
        # guard inside the sqrt: zero rows (node padding) must not NaN
        # the gradient (sqrt'(0) = inf, and 0·inf = NaN in the VJP)
        sq = jnp.sum(jnp.square(emb_local), axis=-1, keepdims=True)
        pos = sq > 0
        nrm = jnp.sqrt(jnp.where(pos, sq, 1.0))
        emb_n = emb_local * jnp.where(pos, 1.0 / nrm, 0.0)
        send = emb_n[send_idx.reshape(-1)]
        recv = _halo_exchange(plan, send, axis)
        buf = jnp.concatenate([recv, emb_n], axis=0)
        cos = jnp.einsum("ed,ed->e", emb_n[row_local], buf[col_remap]) * val
        partial = jax.ops.segment_sum(cos, col_remap,
                                      num_segments=W + R)
        rev = _halo_exchange_rev(plan, partial[:W], axis)
        num = partial[W:]
        # pad send slots point at row 0 but their rev entries are 0
        num = num.at[send_idx.reshape(-1)].add(rev)
        aff = num * jnp.where(den_local != 0, 1.0 / den_local, 0.0)
        # replicate the [N] result (N scalars, not N·d): place the local
        # slice and all-reduce — psum is statically replication-safe
        my = jax.lax.axis_index(axis)
        full = jnp.zeros((D * R,), aff.dtype)
        full = jax.lax.dynamic_update_slice(full, aff, (my * R,))
        return jax.lax.psum(full, axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )(plan.send_idx, plan.col_remap, part.row_local, part.val, plan.den,
      emb)


def affinity_halo_bcsr(part: EdgePartition, plan: HaloPlan,
                       tiles: HaloBCSR, emb: jax.Array, mesh: Mesh,
                       axis: str = "nodes") -> jax.Array:
    """Per-node local affinity with boundary exchange where the local
    SDDMM numerator runs on the MXU (``bcsr_sddmm_colsum_rect`` over the
    per-shard tile sets of the RAW adjacency). Same collectives as
    :func:`affinity_halo`; returns a replicated [N_pad] vector."""
    from ggad_tpu.ops.pallas_sddmm import bcsr_sddmm_colsum_rect

    D, R, W = plan.n_shards, plan.rows_per_shard, plan.buf_width

    def local(send_idx, lr, lc, lv, ltr, ltc, ltv, fr, fc, fv, br, bc,
              bv, den_local, emb_local):
        sq = jnp.sum(jnp.square(emb_local), axis=-1, keepdims=True)
        pos = sq > 0
        nrm = jnp.sqrt(jnp.where(pos, sq, 1.0))
        emb_n = emb_local * jnp.where(pos, 1.0 / nrm, 0.0)

        send = emb_n[send_idx.reshape(-1)]
        recv = _halo_exchange(plan, send, axis)

        # local-column SDDMM (independent of the exchange — overlaps it)
        pair_loc = _as_pair(lr, lc, lv, tiles.r_row_pad, tiles.r_col_pad,
                            tiles.r_row_pad, tiles.r_col_pad, ltr, ltc,
                            ltv, R)
        num = bcsr_sddmm_colsum_rect(pair_loc, emb_n, emb_n)
        # remote-column SDDMM over the received boundary rows → [W]
        pair_rem = _as_pair(fr, fc, fv, tiles.r_row_pad, tiles.w_col_pad,
                            tiles.w_row_pad, tiles.r_col_pad, br, bc,
                            bv, R)
        partial = bcsr_sddmm_colsum_rect(pair_rem, recv, emb_n)

        rev = _halo_exchange_rev(plan, partial[:W], axis)
        num = num.at[send_idx.reshape(-1)].add(rev)
        aff = num * jnp.where(den_local != 0, 1.0 / den_local, 0.0)
        my = jax.lax.axis_index(axis)
        full = jnp.zeros((D * R,), aff.dtype)
        full = jax.lax.dynamic_update_slice(full, aff, (my * R,))
        return jax.lax.psum(full, axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 15,
        out_specs=P(),
        check_vma=False,   # pallas_call can't declare vma metadata yet
    )(plan.send_idx, tiles.loc_rows, tiles.loc_cols, tiles.loc_vals,
      tiles.locT_rows, tiles.locT_cols, tiles.locT_vals,
      tiles.fwd_rows, tiles.fwd_cols, tiles.fwd_vals,
      tiles.bwd_rows, tiles.bwd_cols, tiles.bwd_vals, plan.den, emb)


# ---------------------------------------------------------------------------
# ELL halo path (sparse-regime shards: DGraph-scale full-batch)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloELL:
    """Per-shard ELL tables of the remapped local matrix.

    Shard d's sparse matrix maps the combined [recv(W) ‖ local(R)]
    buffer onto its R rows (``plan.col_remap`` already encodes that
    layout: cols < W are recv positions, cols ≥ W local ones). Tables
    are slot-major per shard, stacked on a leading device axis; the
    forward orientation has ``R`` rows, the transposed one ``W+R``.

    This is the big-sparse-graph halo path: at 0.1×-DGraph scale the
    BCSR tile store explodes (~1M occupied tiles → 1 TiB) and the XLA
    gather/segment path costs 1.9 s/step; the ELL local aggregation
    matches the single-device ELL trainer (~0.75 s) and needs no
    ``edge_chunks`` scan (per-sweep memory is O(R·d)).
    """

    fwd_idx: jax.Array     # [D, Kf, R] int32
    fwd_val: jax.Array     # [D, Kf, R]
    fwd_ov_row: jax.Array  # [D, Ef] int32
    fwd_ov_col: jax.Array  # [D, Ef]
    fwd_ov_val: jax.Array  # [D, Ef] float32
    bwd_idx: jax.Array     # [D, Kb, W+R] int32
    bwd_val: jax.Array
    bwd_ov_row: jax.Array  # [D, Eb]
    bwd_ov_col: jax.Array
    bwd_ov_val: jax.Array
    r_rows: int = dataclasses.field(metadata=dict(static=True))   # R
    b_rows: int = dataclasses.field(metadata=dict(static=True))   # W+R


def build_halo_ell(part: EdgePartition, plan: HaloPlan,
                   dtype=np.float32) -> HaloELL:
    """Host-side per-shard ELL construction of the remapped blocks.

    K is forced equal across shards (max of the per-shard cost-model
    picks) so the slot planes stack; overflow widths pad to the max
    (padding repeats the last row id with zero values — the same
    convention as ``ell_from_coo``).
    """
    from ggad_tpu.ops.ell_spmm import ell_from_coo

    D, E, R, W = (part.n_shards, part.e_shard, part.rows_per_shard,
                  plan.buf_width)
    rl = np.asarray(part.row_local).reshape(D, E)
    cr = np.asarray(plan.col_remap).reshape(D, E)
    vv = np.asarray(part.val).reshape(D, E)

    def build(rows, cols, vals, n_rows, k=None):
        live = vals != 0
        return ell_from_coo(rows[live], cols[live], vals[live], n_rows,
                            dtype=dtype, k=k)

    # pass 1: per-shard auto K; pass 2: rebuild at the shared max
    kf = max(build(rl[d], cr[d], vv[d], R).k for d in range(D))
    kb = max(build(cr[d], rl[d], vv[d], W + R).k for d in range(D))
    fwd = [build(rl[d], cr[d], vv[d], R, k=kf) for d in range(D)]
    bwd = [build(cr[d], rl[d], vv[d], W + R, k=kb) for d in range(D)]

    def stack(blocks):
        e_max = max(b.ov_row.shape[0] for b in blocks)
        idx = np.stack([np.asarray(b.idx) for b in blocks])
        val = np.stack([np.asarray(b.val) for b in blocks])
        ovr = np.zeros((len(blocks), e_max), np.int32)
        ovc = np.zeros((len(blocks), e_max), np.int32)
        ovv = np.zeros((len(blocks), e_max), np.float32)
        for d, b in enumerate(blocks):
            e = b.ov_row.shape[0]
            if e:
                ovr[d, :e] = np.asarray(b.ov_row)
                ovc[d, :e] = np.asarray(b.ov_col)
                ovv[d, :e] = np.asarray(b.ov_val)
                ovr[d, e:] = ovr[d, e - 1]   # sorted-segment promise
        return (jnp.asarray(idx), jnp.asarray(val), jnp.asarray(ovr),
                jnp.asarray(ovc), jnp.asarray(ovv))

    fi, fv, fr, fc, fvv = stack(fwd)
    bi, bv, br, bc, bvv = stack(bwd)
    return HaloELL(fwd_idx=fi, fwd_val=fv, fwd_ov_row=fr, fwd_ov_col=fc,
                   fwd_ov_val=fvv, bwd_idx=bi, bwd_val=bv, bwd_ov_row=br,
                   bwd_ov_col=bc, bwd_ov_val=bvv, r_rows=R, b_rows=W + R)


def place_halo_ell(ells: HaloELL, mesh: Mesh,
                   axis: str = "nodes") -> HaloELL:
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), ells)


def spmm_halo_ell(part: EdgePartition, plan: HaloPlan, ells: HaloELL,
                  h: jax.Array, mesh: Mesh,
                  axis: str = "nodes") -> jax.Array:
    """out = A @ h: boundary exchange + per-shard ELL sweeps.

    The per-shard aggregation is the single-device ``ell_spmm`` custom
    VJP over the combined [recv ‖ local] operand — the backward runs on
    the transposed tables (scatter-free) and shard_map transposes the
    exchange collectives.
    """
    from ggad_tpu.ops.ell_spmm import ELL, ELLPair, ell_spmm

    R, W = plan.rows_per_shard, plan.buf_width

    def local(send_idx, fi, fv, fr, fc, fvv, bi, bv, br, bc, bvv,
              h_local):
        send = h_local[send_idx.reshape(-1)]
        buf = _halo_exchange(plan, send, axis)
        combined = jnp.concatenate([buf, h_local], axis=0)   # [W+R, d]
        pair = ELLPair(
            fwd=ELL(idx=fi[0], val=fv[0], ov_row=fr[0], ov_col=fc[0],
                    ov_val=fvv[0], n_rows=R),
            bwd=ELL(idx=bi[0], val=bv[0], ov_row=br[0], ov_col=bc[0],
                    ov_val=bvv[0], n_rows=W + R),
            n_nodes=R)
        return ell_spmm(pair, combined)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 11 + (P(axis),),
        out_specs=P(axis),
    )(plan.send_idx, ells.fwd_idx, ells.fwd_val, ells.fwd_ov_row,
      ells.fwd_ov_col, ells.fwd_ov_val, ells.bwd_idx, ells.bwd_val,
      ells.bwd_ov_row, ells.bwd_ov_col, ells.bwd_ov_val, h)


# ---------------------------------------------------------------------------
# Subset affinity + seed-row aggregation (the margin/generator fast paths)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloAffinitySubset:
    """Distributed restriction of the affinity to a fixed column subset.

    GGAD's margin loss reads the per-node affinity ONLY at the labeled
    normals and seeds (reference ``run.py:190-205``) — the distributed
    counterpart of :class:`ggad_tpu.ops.sddmm.AffinitySubset`. Each shard
    keeps only its edges whose COLUMNS fall in the subset; the exchange
    collapses from a boundary halo (wire ≈ Σ_k B_k·(d+1) rows) to two
    small ``psum``s: the [U, d] normalized target rows and the [U]
    numerator partials, U = |labeled set| ≪ N. Compute is O(E_sub·d)
    per shard forward AND backward. Identical values at the read nodes
    (tested against the full-affinity halo path).

    ``row_local``/``col_sub``/``val``: [D·E_sub] sharded like the edge
    arrays (``P(axis)``); ``col_sub`` is the column's position in
    ``uniq``. ``uniq``/``gather``/``den`` are replicated.
    """

    row_local: jax.Array  # [D·E_sub] local row id of each restricted edge
    col_sub: jax.Array    # [D·E_sub] position of the column in `uniq`
    val: jax.Array        # [D·E_sub] edge values (0 on padding)
    uniq: jax.Array       # [U] unique subset node ids (global)
    gather: jax.Array     # [S] position of idx[k] in `uniq`
    den: jax.Array        # [U] column-sum of val (affinity denominator)
    n_uniq: int = dataclasses.field(metadata=dict(static=True))
    e_sub: int = dataclasses.field(metadata=dict(static=True))
    # optional per-shard RECT tile sets of the restricted [R × U] blocks
    # (round 4): the local SDDMM numerator then runs on the MXU
    # (bcsr_sddmm_colsum_rect) instead of the edge-parallel gather —
    # the sharded counterpart of ops.sddmm.TileAffinitySubset.
    t_fwd_rows: jax.Array | None = None   # [D·T]
    t_fwd_cols: jax.Array | None = None
    t_fwd_vals: jax.Array | None = None   # [D·T, tr, 128]
    t_bwd_rows: jax.Array | None = None
    t_bwd_cols: jax.Array | None = None
    t_bwd_vals: jax.Array | None = None
    f_row_pad: int = dataclasses.field(default=0,
                                       metadata=dict(static=True))
    f_col_pad: int = dataclasses.field(default=0,
                                       metadata=dict(static=True))
    b_row_pad: int = dataclasses.field(default=0,
                                       metadata=dict(static=True))
    b_col_pad: int = dataclasses.field(default=0,
                                       metadata=dict(static=True))


def build_halo_affinity_subset(part: EdgePartition, idx,
                               tiles_dtype=None) -> HaloAffinitySubset:
    """Host-side: restrict ``part``'s edges to columns in ``idx``.

    ``tiles_dtype``: also build per-shard rect BCSR tile sets of the
    restricted blocks so the local numerator runs on the MXU
    (``'bfloat16'`` for the 1-pass fast mode)."""
    D, E, R = part.n_shards, part.e_shard, part.rows_per_shard
    idx = np.asarray(idx, np.int64)
    uniq, gather = np.unique(idx, return_inverse=True)
    U = len(uniq)
    lookup = np.full(part.n_pad, -1, np.int64)
    lookup[uniq] = np.arange(U)

    rl = np.asarray(part.row_local).reshape(D, E)
    cc = np.asarray(part.col).reshape(D, E)
    vv = np.asarray(part.val).reshape(D, E)

    blocks = []
    e_sub = 0
    den = np.zeros(U, np.float32)
    for d in range(D):
        live = (vv[d] != 0) & (lookup[cc[d]] >= 0)
        r, c, v = rl[d][live], lookup[cc[d][live]], vv[d][live]
        np.add.at(den, c, v)
        blocks.append((r, c, v))
        e_sub = max(e_sub, len(r))
    e_sub = max(_round_up(e_sub, 8), 8)

    rs = np.zeros((D, e_sub), np.int32)
    cs = np.zeros((D, e_sub), np.int32)
    vs = np.zeros((D, e_sub), np.float32)
    for d, (r, c, v) in enumerate(blocks):
        rs[d, : len(r)] = r
        cs[d, : len(c)] = c
        vs[d, : len(v)] = v

    tile_kw: dict = {}
    if tiles_dtype is not None:
        from ggad_tpu.ops.pallas_spmm import (
            TILE,
            bcsr_rect_from_coo,
            pick_tile_rows,
        )

        np_dtype = (jnp.bfloat16 if tiles_dtype in ("bfloat16",
                                                    jnp.bfloat16)
                    else np.float32)
        r_off = _round_up(R, 1024)
        rows_all = np.concatenate(
            [b[0] + d * r_off for d, b in enumerate(blocks)])
        cols_all = np.concatenate([b[1] for b in blocks])
        tr = pick_tile_rows(rows_all, cols_all, D * r_off)
        fwd = [bcsr_rect_from_coo(b[0], b[1], b[2], R, U,
                                  dtype=np_dtype, tile_rows=tr)
               for b in blocks]
        bwd = [bcsr_rect_from_coo(b[1], b[0], b[2], U, R,
                                  dtype=np_dtype, tile_rows=tr)
               for b in blocks]

        def stack(bl):
            t_max = max(b.tile_rows.shape[0] for b in bl)
            rr = np.zeros((D, t_max), np.int32)
            cc2 = np.zeros((D, t_max), np.int32)
            vv2 = np.zeros((D, t_max, tr, TILE), np_dtype)
            for d, b in enumerate(bl):
                t = b.tile_rows.shape[0]
                rr[d, :t] = np.asarray(b.tile_rows)
                cc2[d, :t] = np.asarray(b.tile_cols)
                vv2[d, :t] = np.asarray(b.values)
                rr[d, t:] = rr[d, t - 1]
                cc2[d, t:] = cc2[d, t - 1]
            return (jnp.asarray(rr.reshape(-1)),
                    jnp.asarray(cc2.reshape(-1)),
                    jnp.asarray(vv2.reshape(D * t_max, tr, TILE)))

        fr, fc, fv = stack(fwd)
        br, bc, bv = stack(bwd)
        tile_kw = dict(
            t_fwd_rows=fr, t_fwd_cols=fc, t_fwd_vals=fv,
            t_bwd_rows=br, t_bwd_cols=bc, t_bwd_vals=bv,
            f_row_pad=fwd[0].n_rows, f_col_pad=fwd[0].n_cols,
            b_row_pad=bwd[0].n_rows, b_col_pad=bwd[0].n_cols)

    return HaloAffinitySubset(
        row_local=jnp.asarray(rs.reshape(-1)),
        col_sub=jnp.asarray(cs.reshape(-1)),
        val=jnp.asarray(vs.reshape(-1)),
        uniq=jnp.asarray(uniq, jnp.int32),
        gather=jnp.asarray(gather, jnp.int32),
        den=jnp.asarray(den),
        n_uniq=U, e_sub=e_sub, **tile_kw)


def place_halo_affinity_subset(sub: HaloAffinitySubset, mesh: Mesh,
                               axis: str = "nodes") -> HaloAffinitySubset:
    sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    tile_kw = {}
    if sub.t_fwd_rows is not None:
        tile_kw = {k: jax.device_put(getattr(sub, k), sh)
                   for k in ("t_fwd_rows", "t_fwd_cols", "t_fwd_vals",
                             "t_bwd_rows", "t_bwd_cols", "t_bwd_vals")}
    return dataclasses.replace(
        sub,
        row_local=jax.device_put(sub.row_local, sh),
        col_sub=jax.device_put(sub.col_sub, sh),
        val=jax.device_put(sub.val, sh),
        uniq=jax.device_put(sub.uniq, repl),
        gather=jax.device_put(sub.gather, repl),
        den=jax.device_put(sub.den, repl), **tile_kw)


def affinity_halo_subset(plan: HaloPlan, sub: HaloAffinitySubset,
                         emb: jax.Array, mesh: Mesh,
                         axis: str = "nodes") -> jax.Array:
    """affinity[k] at the k-th requested node — identical values to the
    full ``affinity_halo(...)[idx]`` (tested), with two tiny ``psum``s
    instead of the boundary exchange. Returns a replicated [S] vector.

    When the subset carries per-shard rect tile sets
    (``build_halo_affinity_subset(..., tiles_dtype=...)``) the local
    numerator runs on the MXU (``bcsr_sddmm_colsum_rect``) instead of
    the edge-parallel gather — the sharded tile-subset margin."""
    R, U = plan.rows_per_shard, sub.n_uniq

    def normalize_and_targets(uniq, emb_local):
        # zero-guard inside the sqrt (see affinity_halo)
        sq = jnp.sum(jnp.square(emb_local), axis=-1, keepdims=True)
        pos = sq > 0
        nrm = jnp.sqrt(jnp.where(pos, sq, 1.0))
        emb_n = emb_local * jnp.where(pos, 1.0 / nrm, 0.0)
        # assemble the normalized TARGET rows: each shard contributes the
        # uniq rows it owns, one [U, d] all-reduce replicates them
        my = jax.lax.axis_index(axis)
        loc = uniq - my * R
        own = (loc >= 0) & (loc < R)
        tgt = jnp.where(own[:, None],
                        emb_n[jnp.clip(loc, 0, R - 1)], 0.0)
        return emb_n, jax.lax.psum(tgt, axis)

    if sub.t_fwd_rows is not None:
        def local_tiles(fr, fc, fv, br, bc, bv, uniq, gather, den,
                        emb_local):
            emb_n, tgt = normalize_and_targets(uniq, emb_local)
            from ggad_tpu.ops.pallas_sddmm import bcsr_sddmm_colsum_rect

            pair = _as_pair(fr, fc, fv, sub.f_row_pad, sub.f_col_pad,
                            sub.b_row_pad, sub.b_col_pad, br, bc, bv, R)
            num = jax.lax.psum(
                bcsr_sddmm_colsum_rect(pair, tgt, emb_n), axis)
            aff = num * jnp.where(den != 0, 1.0 / den, 0.0)
            return aff[gather]

        return jax.shard_map(
            local_tiles, mesh=mesh,
            in_specs=(P(axis),) * 6 + (P(), P(), P(), P(axis)),
            out_specs=P(),
            check_vma=False,   # pallas_call can't declare vma metadata
        )(sub.t_fwd_rows, sub.t_fwd_cols, sub.t_fwd_vals,
          sub.t_bwd_rows, sub.t_bwd_cols, sub.t_bwd_vals, sub.uniq,
          sub.gather, sub.den, emb)

    def local(row_local, col_sub, val, uniq, gather, den, emb_local):
        emb_n, tgt = normalize_and_targets(uniq, emb_local)
        cos = jnp.einsum("ed,ed->e", emb_n[row_local], tgt[col_sub],
                         preferred_element_type=jnp.float32) * val
        num = jax.lax.psum(
            jax.ops.segment_sum(cos, col_sub, num_segments=U), axis)
        aff = num * jnp.where(den != 0, 1.0 / den, 0.0)
        return aff[gather]

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(axis)),
        out_specs=P(),
    )(sub.row_local, sub.col_sub, sub.val, sub.uniq, sub.gather, sub.den,
      emb)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloSeedRows:
    """Distributed row-subgraph for ``(A @ emb)[seed]``: the sharded
    counterpart of :func:`ggad_tpu.graph.rows_subgraph`.

    GGAD's generator aggregation reads only the S seed rows of the SpMM
    (reference ``model.py:151-156``), so the full halo SpMM (+ a full
    transposed SpMM on a mostly-zero cotangent in the backward) is pure
    waste. The seed rows' edges are re-bucketed by COLUMN owner: each
    shard sums ``val · emb_local[col]`` partials over its own columns
    and one [S, d] ``psum`` replicates the aggregate — O(E_seed·d)
    compute per shard, S·d wire per device, both ways.
    """

    seed_pos: jax.Array   # [D·E_seed] position of the edge's row in the
                          # seed list (order given at build time)
    col_local: jax.Array  # [D·E_seed] column id within the shard's block
    val: jax.Array        # [D·E_seed] edge values (0 on padding)
    n_seed: int = dataclasses.field(metadata=dict(static=True))
    e_seed: int = dataclasses.field(metadata=dict(static=True))


def build_halo_seed_rows(part: EdgePartition, seed_idx) -> HaloSeedRows:
    """Host-side: bucket the seed rows' edges by column owner."""
    D, E, R = part.n_shards, part.e_shard, part.rows_per_shard
    seed_idx = np.asarray(seed_idx, np.int64)
    S = len(seed_idx)
    lookup = np.full(part.n_pad, -1, np.int64)
    lookup[seed_idx] = np.arange(S)

    rl = np.asarray(part.row_local).reshape(D, E)
    cc = np.asarray(part.col).reshape(D, E)
    vv = np.asarray(part.val).reshape(D, E)

    # flatten the seed rows' edges with global row ids, then re-bucket
    rows_g = np.concatenate(
        [rl[d] + d * R for d in range(D)])
    cols = cc.reshape(-1)
    vals = vv.reshape(-1)
    live = (vals != 0) & (lookup[rows_g] >= 0)
    pos, cols, vals = lookup[rows_g[live]], cols[live], vals[live]
    owner = cols // R

    blocks = []
    e_seed = 0
    for d in range(D):
        m = owner == d
        blocks.append((pos[m], cols[m] - d * R, vals[m]))
        e_seed = max(e_seed, int(m.sum()))
    e_seed = max(_round_up(e_seed, 8), 8)

    ps = np.zeros((D, e_seed), np.int32)
    cs = np.zeros((D, e_seed), np.int32)
    vs = np.zeros((D, e_seed), np.float32)
    for d, (p, c, v) in enumerate(blocks):
        ps[d, : len(p)] = p
        cs[d, : len(c)] = c
        vs[d, : len(v)] = v

    return HaloSeedRows(
        seed_pos=jnp.asarray(ps.reshape(-1)),
        col_local=jnp.asarray(cs.reshape(-1)),
        val=jnp.asarray(vs.reshape(-1)),
        n_seed=S, e_seed=e_seed)


def place_halo_seed_rows(sub: HaloSeedRows, mesh: Mesh,
                         axis: str = "nodes") -> HaloSeedRows:
    sh = NamedSharding(mesh, P(axis))
    return dataclasses.replace(
        sub,
        seed_pos=jax.device_put(sub.seed_pos, sh),
        col_local=jax.device_put(sub.col_local, sh),
        val=jax.device_put(sub.val, sh))


def spmm_halo_seed_rows(sub: HaloSeedRows, emb: jax.Array, mesh: Mesh,
                        axis: str = "nodes") -> jax.Array:
    """``(A @ emb)[seed]`` as per-shard column partials + one [S, d]
    ``psum``; identical values to slicing the full halo SpMM (tested).
    Returns a replicated [S, d] aggregate."""

    def local(seed_pos, col_local, val, emb_local):
        gathered = emb_local[col_local] * val[:, None]
        agg = jax.ops.segment_sum(gathered, seed_pos,
                                  num_segments=sub.n_seed)
        return jax.lax.psum(agg, axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )(sub.seed_pos, sub.col_local, sub.val, emb)


def affinity_sharded(part: EdgePartition, emb: jax.Array, mesh: Mesh,
                     axis: str = "nodes") -> jax.Array:
    """Per-node local affinity with explicit collectives (the SDDMM +
    column-reduction of ``ggad_tpu.ops.sddmm.node_affinity``).

    Returns a REPLICATED [N_pad] affinity vector (padded nodes get 0).
    """

    def local(row_local, col, val, emb_local):
        emb_full = jax.lax.all_gather(emb_local, axis, tiled=True)
        sq = jnp.sum(jnp.square(emb_full), axis=-1, keepdims=True)
        pos = sq > 0
        nrm = jnp.sqrt(jnp.where(pos, sq, 1.0))
        emb_n = emb_full * jnp.where(pos, 1.0 / nrm, 0.0)
        my = jax.lax.axis_index(axis)
        row_global = row_local + my * part.rows_per_shard
        cos = jnp.einsum("ed,ed->e", emb_n[row_global], emb_n[col]) * val
        num = jax.ops.segment_sum(cos, col, num_segments=part.n_pad)
        den = jax.ops.segment_sum(val, col, num_segments=part.n_pad)
        num = jax.lax.psum(num, axis)
        den = jax.lax.psum(den, axis)
        return num * jnp.where(den != 0, 1.0 / den, 0.0)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )(part.row_local, part.col, part.val, emb)
