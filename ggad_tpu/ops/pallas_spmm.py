"""Block-sparse (BCSR) SpMM Pallas kernel — the MXU path for Â @ H.

Motivation: the GAD benchmark graphs are small-N / high-density (photo:
7.5K nodes, 457K edges → nearly every 128×128 adjacency tile is occupied;
Amazon: 12K nodes, 4.4M edges). On such graphs scatter-add SpMM wastes the
MXU entirely. This kernel stores only the *occupied* 128×128 adjacency
tiles (tile-COO sorted by tile-row) and contracts each against the
matching 128-row slab of H on the MXU:

    out[tile_row] += A_tile[t] @ H[tile_col[t]]

Grid layout: ``(d_tiles, n_tiles)`` — the flat tile axis varies fastest, so
all revisits of an output block are consecutive (Mosaic requirement); the
accumulator is zeroed whenever the tile-row changes. Tile row/col indices
are scalar-prefetched so the H and out BlockSpec index_maps can read them
(``pltpu.PrefetchScalarGridSpec``).

The backward pass reuses the same kernel with the transposed tile set
(precomputed once); ``val`` gradients are not needed (the adjacency is not
trained), so the op exposes a custom VJP in H only.

Reference equivalence: this computes exactly ``torch.bmm(adj, seq_fts)``
of the reference (``model.py:29-31``) for the sparse adjacency.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 128  # MXU-native tile edge


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSR:
    """Tile-COO block-sparse matrix (tiles sorted by (tile_row, tile_col))."""

    tile_rows: jax.Array  # [T] int32
    tile_cols: jax.Array  # [T] int32
    values: jax.Array     # [T, TILE, TILE] float32
    n_rows: int = dataclasses.field(metadata=dict(static=True))   # padded
    n_cols: int = dataclasses.field(metadata=dict(static=True))   # padded

    @property
    def n_tiles(self) -> int:
        return self.tile_rows.shape[0]


def bcsr_from_coo(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                  n_nodes: int, dtype=np.float32,
                  tile_rows: int = TILE) -> BCSR:
    """Host-side BCSR construction (native C++ when available).

    ``tile_rows``: tile HEIGHT (a multiple of 128). The forward kernel
    reads one [TILE, d] H slab per occupied tile, so on tile-dense
    graphs total H traffic is ∝ 1/tile_rows — measured 2.5× faster SpMM
    at 512 vs 128 on the photo-shaped graph (scripts/tile_rows_study.py)
    with the same tile-store bytes. Lane (column) width stays 128.
    """
    n_row_pad = _round_up(max(n_nodes, tile_rows), tile_rows)
    n_col_pad = _round_up(max(n_nodes, TILE), TILE)
    from ggad_tpu import native
    if native.available() and dtype == np.float32 and tile_rows == TILE:
        t_rows, t_cols, values = native.bcsr_build(
            row, col, val, n_col_pad // TILE)
    else:
        trow = row // tile_rows
        tcol = col // TILE
        tkey = trow.astype(np.int64) * (n_col_pad // TILE) + tcol
        uniq, inv = np.unique(tkey, return_inverse=True)
        n_tiles = len(uniq)
        values = np.zeros((n_tiles, tile_rows, TILE), dtype)
        np.add.at(values, (inv, row % tile_rows, col % TILE), val)
        t_rows = (uniq // (n_col_pad // TILE)).astype(np.int32)
        t_cols = (uniq % (n_col_pad // TILE)).astype(np.int32)
    # np.unique returns sorted keys → already (tile_row, tile_col) sorted.
    return BCSR(
        tile_rows=jnp.asarray(t_rows),
        tile_cols=jnp.asarray(t_cols),
        values=jnp.asarray(values),
        n_rows=n_row_pad,
        n_cols=n_col_pad,
    )


def _bcsr_matmul_kernel(tile_rows_ref, tile_cols_ref, vals_ref, h_ref,
                        out_ref):
    t = pl.program_id(1)

    @pl.when((t == 0) | (tile_rows_ref[t] != tile_rows_ref[
        jnp.maximum(t - 1, 0)]))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    a = vals_ref[0]
    h = h_ref[...]
    if a.dtype == jnp.bfloat16:
        # 1-pass bf16 MXU multiply, f32 accumulation (opt-in fast mode)
        out_ref[...] += jax.lax.dot(
            a, h.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    else:
        # HIGHEST keeps true-f32 accuracy on the MXU (default is
        # bf16-level, which breaks 1e-4 parity with the reference math).
        out_ref[...] += jax.lax.dot(
            a, h, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _bcsr_matmul_raw(m: BCSR, h: jax.Array, d_tile: int = 512) -> jax.Array:
    """out = M @ h, h: [n_cols_pad, D_pad]; D_pad % d_tile == 0.

    Tile shape is read from the value store ([T, tr, tc]) — tall tiles
    (tr > 128) amortize each H slab over more output rows.
    """
    from jax.experimental.pallas import tpu as pltpu

    d_pad = h.shape[1]
    assert h.shape[0] == m.n_cols, (h.shape, m.n_cols)
    assert d_pad % d_tile == 0
    n_d = d_pad // d_tile
    n_t = m.n_tiles
    tr, tc = m.values.shape[-2:]

    if m.values.dtype == jnp.bfloat16:
        # operands are rounded to bf16 on the MXU either way — casting
        # BEFORE the kernel halves the dominant HBM traffic (each H slab
        # is re-read once per occupied tile in its column block); XLA
        # fuses the convert into the producer. Bit-identical result.
        h = h.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_d, n_t),
        in_specs=[
            pl.BlockSpec((1, tr, tc),
                         lambda d, t, rows, cols: (t, 0, 0)),
            pl.BlockSpec((tc, d_tile),
                         lambda d, t, rows, cols: (cols[t], d)),
        ],
        out_specs=pl.BlockSpec((tr, d_tile),
                               lambda d, t, rows, cols: (rows[t], d)),
    )
    flops = 2 * n_t * tr * tc * d_pad
    out = pl.pallas_call(
        _bcsr_matmul_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m.n_rows, d_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_t * tr * tc * m.values.dtype.itemsize
            + n_t * tc * d_pad * h.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(m.tile_rows, m.tile_cols, m.values, h)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSRPair:
    """Forward + transposed tile sets for differentiable SpMM."""

    fwd: BCSR
    bwd: BCSR
    n_nodes: int = dataclasses.field(metadata=dict(static=True))


def bcsr_pair_from_graph(g, dtype=np.float32,
                         tile_rows: int = TILE) -> BCSRPair:
    """Build forward/backward BCSR from a :class:`ggad_tpu.graph.Graph`.

    ``dtype=jnp.bfloat16`` stores tiles in bf16 and switches the kernels
    to 1-pass bf16 MXU multiplies (≈6× MXU throughput; breaks 1e-4
    activation parity by construction — opt-in). ``tile_rows``: tile
    height for BOTH orientations (see :func:`bcsr_from_coo`).
    """
    row = np.asarray(g.row)[: g.n_edges]
    col = np.asarray(g.col)[: g.n_edges]
    val = np.asarray(g.val)[: g.n_edges]
    fwd = bcsr_from_coo(row, col, val, g.n_nodes, np.float32,
                        tile_rows=tile_rows)
    bwd = bcsr_from_coo(col, row, val, g.n_nodes, np.float32,
                        tile_rows=tile_rows)
    if dtype in (jnp.bfloat16, "bfloat16"):
        fwd = dataclasses.replace(fwd, values=fwd.values.astype(jnp.bfloat16))
        bwd = dataclasses.replace(bwd, values=bwd.values.astype(jnp.bfloat16))
    return BCSRPair(fwd=fwd, bwd=bwd, n_nodes=g.n_nodes)


def _pad_h(h: jax.Array, n_rows: int, d_tile: int) -> jax.Array:
    d_pad = _round_up(h.shape[1], d_tile)
    return jnp.pad(h, ((0, n_rows - h.shape[0]), (0, d_pad - h.shape[1])))


@jax.custom_vjp
def bcsr_spmm(pair: BCSRPair, h: jax.Array) -> jax.Array:
    """out = A @ h with the BCSR Pallas kernel; differentiable in h.

    The backward pass is Aᵀ @ g via the transposed tile set; the adjacency
    itself is not trained, so its cotangent is symbolically zero.
    """
    return _bcsr_spmm_fwd_only(pair, h)


def _pick_d_tile(d: int) -> int:
    """Widest feature tile ≤ 1024 lanes that divides the padded width
    (amortizes each A-tile load across the most columns of H)."""
    d_pad = _round_up(d, 128)
    for cand in (d_pad, 1024, 768, 512, 384, 256, 128):
        if cand <= 1024 and d_pad % cand == 0:
            return cand
    return 128


def _bcsr_spmm_fwd_only(pair: BCSRPair, h: jax.Array) -> jax.Array:
    n, d = h.shape
    d_tile = _pick_d_tile(d)
    hp = _pad_h(h, pair.fwd.n_cols, d_tile)
    out = _bcsr_matmul_raw(pair.fwd, hp, d_tile)
    return out[:n, :d]


def _bcsr_spmm_vjp_fwd(pair, h):
    return _bcsr_spmm_fwd_only(pair, h), (pair, h.shape)


def _bcsr_spmm_vjp_bwd(res, g):
    pair, (n, d) = res
    d_tile = _pick_d_tile(d)
    gp = _pad_h(g, pair.bwd.n_cols, d_tile)
    dh = _bcsr_matmul_raw(pair.bwd, gp, d_tile)
    return None, dh[:n, :d]


bcsr_spmm.defvjp(_bcsr_spmm_vjp_fwd, _bcsr_spmm_vjp_bwd)


# --------------------------------------------------------------------------
# Rectangular BCSR matmul (sharded halo path: local [R × (D·B+R)] blocks)
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def bcsr_spmm_rect(pair: BCSRPair, buf: jax.Array, n_out: int) -> jax.Array:
    """out[:n_out] = M @ buf for a RECTANGULAR tile set (fwd: n_rows ×
    n_cols, bwd: the transpose). Differentiable in ``buf``; used by the
    halo-sharded SpMM where the local matrix maps the combined
    [recv ‖ local] buffer onto the shard's rows."""
    return _bcsr_rect_fwd_only(pair, buf, n_out)


def _bcsr_rect_fwd_only(pair, buf, n_out):
    d = buf.shape[1]
    d_tile = _pick_d_tile(d)
    hp = _pad_h(buf, pair.fwd.n_cols, d_tile)
    return _bcsr_matmul_raw(pair.fwd, hp, d_tile)[:n_out, :d]


def _bcsr_rect_vjp_fwd(pair, buf, n_out):
    return _bcsr_rect_fwd_only(pair, buf, n_out), (pair, buf.shape)


def _bcsr_rect_vjp_bwd(n_out, res, g):
    pair, (n_buf, d) = res
    d_tile = _pick_d_tile(d)
    gp = _pad_h(g, pair.bwd.n_cols, d_tile)
    dbuf = _bcsr_matmul_raw(pair.bwd, gp, d_tile)[:n_buf, :d]
    return None, dbuf


bcsr_spmm_rect.defvjp(_bcsr_rect_vjp_fwd, _bcsr_rect_vjp_bwd)


def bcsr_rect_from_coo(row: np.ndarray, col: np.ndarray, val: np.ndarray,
                       n_rows: int, n_cols: int, n_tiles_pad: int = 0,
                       dtype=np.float32, tile_rows: int = TILE) -> BCSR:
    """Host-side rectangular tile-COO build.

    Every output row block gets at least one (zero) tile — Pallas out
    blocks no tile visits would otherwise hold UNINITIALIZED memory
    (the square graph path is immune only because +I self-loops occupy
    every diagonal tile). ``n_tiles_pad`` pads the tile count with zero
    tiles REPEATING THE LAST key so the kernel's row-change zeroing
    never re-fires. ``tile_rows``: tile height (see
    :func:`bcsr_from_coo` — tall tiles cut H traffic on dense shards).
    """
    tr = tile_rows
    rp, cp = _round_up(max(n_rows, tr), tr), _round_up(
        max(n_cols, TILE), TILE)
    nrt, nct = rp // tr, cp // TILE
    live = val != 0
    row, col, val = row[live], col[live], val[live]
    tkey = (row // tr).astype(np.int64) * nct + col // TILE
    # cover every row block: a zero tile at (block, col 0) where absent
    missing = np.setdiff1d(np.arange(nrt, dtype=np.int64),
                           np.unique(row // tr))
    tkey = np.concatenate([tkey, missing * nct])
    uniq, inv = np.unique(tkey, return_inverse=True)
    inv = inv[: len(row)]           # the cover keys carry no values
    n_pad = max(n_tiles_pad, len(uniq))
    values = np.zeros((n_pad, tr, TILE), dtype)
    np.add.at(values, (inv, row % tr, col % TILE), val.astype(dtype))
    t_rows = np.zeros(n_pad, np.int32)
    t_cols = np.zeros(n_pad, np.int32)
    t_rows[: len(uniq)] = uniq // nct
    t_cols[: len(uniq)] = uniq % nct
    t_rows[len(uniq):] = t_rows[len(uniq) - 1]
    t_cols[len(uniq):] = t_cols[len(uniq) - 1]
    return BCSR(tile_rows=jnp.asarray(t_rows),
                tile_cols=jnp.asarray(t_cols),
                values=jnp.asarray(values), n_rows=rp, n_cols=cp)


# --------------------------------------------------------------------------
# Graph-level wrapper with cached tiles
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSRGraph:
    """A Graph plus its BCSR tiles; drop-in for ops.spmm dispatch."""

    graph: "object"          # ggad_tpu.graph.Graph (itself a pytree)
    tiles: BCSRPair

    # delegate the Graph interface so SDDMM/affinity work unchanged
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


def pick_tile_rows(row: np.ndarray, col: np.ndarray, n_nodes: int,
                   *, max_growth: float = 1.35,
                   candidates=(1024, 512, 256)) -> int:
    """Choose the tallest tile height whose tile-store bytes stay within
    ``max_growth`` of the 128-tall store (tall tiles cut H traffic
    ∝ 1/tile_rows but waste storage on row-sparse graphs).

    Height changes the schedule only, not the math: per output element
    the same column tiles accumulate in the same order — outputs are
    BIT-IDENTICAL across heights (verified on TPU, round-4 study; an
    earlier 4% discrepancy was a row-padding artifact in the study's own
    normalization). 1024 wins on the dense amazon regime (0.81 ms vs
    1.08 @512, 2.75 @128 — scripts/tile_rows_study.py --graph amazon)."""
    nct = _round_up(max(n_nodes, TILE), TILE) // TILE

    def occupied(tr):
        return len(np.unique((row // tr).astype(np.int64) * nct
                             + col // TILE))

    base = occupied(TILE) * TILE
    for tr in candidates:
        if occupied(tr) * tr <= max_growth * base:
            return tr
    return TILE


def as_bcsr_graph(g, dtype=np.float32,
                  tile_rows: int | None = None) -> BCSRGraph:
    """``tile_rows=None`` auto-picks the tallest profitable tile height
    (measured 2.5×/1.3× faster bf16/f32 SpMM at 512 on photo-shaped
    graphs — scripts/tile_rows_study.py)."""
    if tile_rows is None:
        row = np.asarray(g.row)[: g.n_edges]
        col = np.asarray(g.col)[: g.n_edges]
        tile_rows = pick_tile_rows(row, col, g.n_nodes)
    return BCSRGraph(graph=g,
                     tiles=bcsr_pair_from_graph(g, dtype,
                                                tile_rows=tile_rows))


def bcsr_spmm_graph(g, x: jax.Array) -> jax.Array:
    if isinstance(g, BCSRGraph):
        return bcsr_spmm(g.tiles, x)
    raise TypeError(
        "spmm(impl='pallas') needs a BCSRGraph (see as_bcsr_graph); "
        f"got {type(g).__name__}")


def bcsr_memory_bytes(n_edges: int, n_nodes: int) -> int:
    """Upper bound on tile storage if every edge hits a distinct tile."""
    n_pad = _round_up(max(n_nodes, TILE), TILE)
    max_tiles = min(n_edges, (n_pad // TILE) ** 2)
    return max_tiles * TILE * TILE * 4
