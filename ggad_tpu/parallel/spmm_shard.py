"""Explicit edge-partitioned distributed SpMM/affinity via shard_map.

The scaling analog of sequence parallelism for graphs (SURVEY.md §5):
CSR row-blocks are assigned to devices; node-indexed arrays shard their
node axis over the same mesh axis. For ``out = A @ H``:

  1. all-gather the local H shard over the ``nodes`` axis (ICI ring);
  2. locally gather + segment-sum the device's own edge block.

The backward pass is handled by shard_map's autodiff: the transpose of
``all_gather`` is ``psum_scatter``, which is exactly the reduce-scatter
of partial Aᵀg contributions — no hand-written VJP needed.

The per-column affinity reduction additionally needs cross-device
combination because a device's edges may point at any column;
partial [N] sums are ``psum``'d (one ICI all-reduce of N floats).

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

    @property
    def n_pad(self) -> int:
        return self.n_shards * self.rows_per_shard


def partition_edges(g: Graph, n_shards: int) -> EdgePartition:
    """Host-side: split edges into per-device row blocks (balanced pad)."""
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
    e_shard = max(_round_up(e_shard, 8), 8)

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


def affinity_sharded(part: EdgePartition, emb: jax.Array, mesh: Mesh,
                     axis: str = "nodes") -> jax.Array:
    """Per-node local affinity with explicit collectives (the SDDMM +
    column-reduction of ``ggad_tpu.ops.sddmm.node_affinity``).

    Returns a REPLICATED [N_pad] affinity vector (padded nodes get 0).
    """

    def local(row_local, col, val, emb_local):
        emb_full = jax.lax.all_gather(emb_local, axis, tiled=True)
        norm = jnp.linalg.norm(emb_full, axis=-1, keepdims=True)
        emb_n = emb_full * jnp.where(norm > 0, 1.0 / norm, 0.0)
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
