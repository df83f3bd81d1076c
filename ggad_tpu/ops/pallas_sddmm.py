"""BCSR SDDMM column-sum Pallas kernel — the MXU path for the affinity
numerator.

The GGAD affinity loss needs, per node j,

    num_j = Σ_i a_ij · ⟨n_i, n_j⟩       (n = row-normalized embeddings)

i.e. the column sums of A ∘ (N Nᵀ). The XLA edge-parallel formulation
(gather two [E, d] operand sets, dot, scatter-add) moves ~1 GB of HBM per
call and dominates the training step (profiled: ~2/3 of step time). On
the tile-dense GAD graphs the same quantity is a per-tile MXU contraction:

    for each occupied 128×128 tile t of Aᵀ (sorted by tile-row = original
    column block):   out[trow] += Σ_c (Aᵀ_t ∘ (N[trow] @ N[tcol]ᵀ))[:, c]

The backward pass needs no new kernel: with cotangent g on num,

    dN = A @ (g ⊙ N) + g ⊙ (Aᵀ @ N)

— two calls of the existing BCSR SpMM matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ggad_tpu.ops.pallas_spmm import (
    TILE,
    BCSRPair,
    _bcsr_matmul_raw,
    _pad_h,
    _pick_d_tile,
    _round_up,
)


def _sddmm_colsum_kernel(tile_rows_ref, tile_cols_ref, vals_ref,
                         e_row_ref, e_col_ref, out_ref):
    t = pl.program_id(0)

    @pl.when((t == 0) | (tile_rows_ref[t] != tile_rows_ref[
        jnp.maximum(t - 1, 0)]))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    vals = vals_ref[0]
    er, ec = e_row_ref[...], e_col_ref[...]
    if vals.dtype == jnp.bfloat16:
        m = jax.lax.dot_general(
            er.astype(jnp.bfloat16), ec.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        vals = vals.astype(jnp.float32)
    else:
        m = jax.lax.dot_general(
            er, ec,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    # out block is (1, 8, TILE) to satisfy Mosaic's (8, 128) tiling; the
    # row-block result lives in sublane 0.
    out_ref[0, 0:1, :] += jnp.sum(vals * m, axis=1)[None, :]


def _sddmm_colsum_raw(tiles, emb_rows: jax.Array,
                      emb_cols: jax.Array | None = None) -> jax.Array:
    """Row sums of (M ∘ (E_r E_cᵀ)) for a BCSR matrix M; [n_rows].
    ``emb_cols`` defaults to ``emb_rows`` (the square affinity case);
    passing a different matrix gives the rectangular halo case (rows
    index the combined buffer, cols the local embeddings)."""
    from jax.experimental.pallas import tpu as pltpu

    if emb_cols is None:
        emb_cols = emb_rows
    if tiles.values.dtype == jnp.bfloat16:
        # pre-cast: same rounding as the in-kernel astype, half the HBM
        # traffic on the operand slabs (see pallas_spmm._bcsr_matmul_raw)
        emb_rows = emb_rows.astype(jnp.bfloat16)
        emb_cols = emb_cols.astype(jnp.bfloat16)
    n_t = tiles.n_tiles
    d_pad = emb_rows.shape[1]
    tr, tc = tiles.values.shape[-2:]
    n_blocks = tiles.n_rows // tr

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((1, tr, tc), lambda t, rows, cols: (t, 0, 0)),
            pl.BlockSpec((tr, d_pad), lambda t, rows, cols: (rows[t], 0)),
            pl.BlockSpec((tc, d_pad), lambda t, rows, cols: (cols[t], 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, tr), lambda t, rows, cols:
                               (rows[t], 0, 0)),
    )
    out = pl.pallas_call(
        _sddmm_colsum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, tr), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_t * tr * tc * d_pad,
            bytes_accessed=n_t * (
                tr * tc * tiles.values.dtype.itemsize
                + (tr + tc) * d_pad * emb_rows.dtype.itemsize),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(tiles.tile_rows, tiles.tile_cols, tiles.values, emb_rows, emb_cols)
    return out[:, 0, :].reshape(-1)


@jax.custom_vjp
def bcsr_sddmm_colsum(pair: BCSRPair, emb_n: jax.Array) -> jax.Array:
    """num_j = Σ_i A_ij ⟨n_i, n_j⟩ over the BCSR matrix; returns [N].

    Differentiable in ``emb_n``; the matrix is constant.
    """
    return _colsum_fwd_only(pair, emb_n)


def _colsum_fwd_only(pair: BCSRPair, emb_n: jax.Array) -> jax.Array:
    n, d = emb_n.shape
    d_pad = _round_up(max(d, TILE), TILE)
    ep = jnp.pad(emb_n, ((0, pair.bwd.n_rows - n), (0, d_pad - d)))
    # column sums of A == row sums of Aᵀ → iterate the bwd tile set
    return _sddmm_colsum_raw(pair.bwd, ep)[:n]


def _colsum_vjp_fwd(pair, emb_n):
    return _colsum_fwd_only(pair, emb_n), (pair, emb_n)


def _colsum_vjp_bwd(res, g):
    pair, emb_n = res
    n, d = emb_n.shape
    d_tile = _pick_d_tile(d)
    gn = _pad_h(g[:, None] * emb_n, pair.fwd.n_cols, d_tile)
    term1 = _bcsr_matmul_raw(pair.fwd, gn, d_tile)[:n, :d]
    ep = _pad_h(emb_n, pair.bwd.n_cols, d_tile)
    term2 = g[:, None] * _bcsr_matmul_raw(pair.bwd, ep, d_tile)[:n, :d]
    return None, term1 + term2


bcsr_sddmm_colsum.defvjp(_colsum_vjp_fwd, _colsum_vjp_bwd)


# --------------------------------------------------------------------------
# Rectangular variant (halo-sharded affinity: M [R × C], two operand sets)
# --------------------------------------------------------------------------

@jax.custom_vjp
def bcsr_sddmm_colsum_rect(pair: BCSRPair, buf: jax.Array,
                           emb_local: jax.Array) -> jax.Array:
    """partial_c = Σ_r M[r,c] ⟨emb_local_r, buf_c⟩ for a rectangular
    BCSR (fwd: [R_pad × C_pad], bwd: the transpose) — the halo-local
    affinity numerator on the MXU. Differentiable in both operands:

        d_buf       = g ⊙ (Mᵀ emb_local)
        d_emb_local = M (g ⊙ buf)
    """
    return _rect_colsum_fwd_only(pair, buf, emb_local)


def _rect_embpad(x, n_rows):
    d_pad = _round_up(max(x.shape[1], TILE), TILE)
    return jnp.pad(x, ((0, n_rows - x.shape[0]), (0, d_pad - x.shape[1])))


def _rect_colsum_fwd_only(pair, buf, emb_local):
    c = buf.shape[0]
    bp = _rect_embpad(buf, pair.bwd.n_rows)
    ep = _rect_embpad(emb_local, pair.bwd.n_cols)
    return _sddmm_colsum_raw(pair.bwd, bp, ep)[:c]


def _rect_colsum_vjp_fwd(pair, buf, emb_local):
    return _rect_colsum_fwd_only(pair, buf, emb_local), (pair, buf,
                                                         emb_local)


def _rect_colsum_vjp_bwd(res, g):
    pair, buf, emb_local = res
    c, d = buf.shape
    r = emb_local.shape[0]
    d_tile = _pick_d_tile(d)
    ep = _pad_h(emb_local, pair.bwd.n_cols, d_tile)
    d_buf = g[:, None] * _bcsr_matmul_raw(pair.bwd, ep, d_tile)[:c, :d]
    gb = _pad_h(g[:, None] * buf, pair.fwd.n_cols, d_tile)
    d_emb = _bcsr_matmul_raw(pair.fwd, gb, d_tile)[:r, :d]
    return None, d_buf, d_emb


bcsr_sddmm_colsum_rect.defvjp(_rect_colsum_vjp_fwd, _rect_colsum_vjp_bwd)
