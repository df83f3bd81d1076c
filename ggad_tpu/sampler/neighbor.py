"""TPU-resident fixed-fanout neighbor sampling.

The reference's mini-batch path does Python-level set unions over a pickled
adjacency-list dict per batch (``src/graphsage.py:302-307`` — a host-side
hot loop). Here the CSR adjacency lives on device as two int32 arrays and
sampling is a pure jittable function: for each query node draw K uniform
offsets into its CSR row and gather the neighbor ids — static [B, K]
shapes, no host round-trips, differentiating downstream aggregation freely.

Sampling is with replacement (for d ≥ 1); rows with d = 0 return the node
itself with a validity mask. The reference samples *without* replacement
when d ≥ K (``random.sample``, ``src/graphsage.py:74-78``) and keeps all
neighbors otherwise; with-replacement uniform sampling has the same
expectation for mean aggregation and keeps shapes static — the standard
accelerator-friendly choice.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ggad_tpu.graph import Graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborTable:
    """Device-resident CSR adjacency for sampling (no edge values)."""

    indptr: jax.Array   # [N+1] int32
    indices: jax.Array  # [E_pad] int32 (row-sorted neighbor ids)
    n_nodes: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_graph(cls, g: Graph) -> "NeighborTable":
        return cls(indptr=g.indptr, indices=g.col, n_nodes=g.n_nodes)

    @classmethod
    def from_scipy(cls, mat) -> "NeighborTable":
        csr = mat.tocsr()
        indices = csr.indices
        if indices.shape[0] == 0:   # empty graph: keep gathers in-range
            indices = np.zeros(1, np.int32)
        return cls(indptr=jnp.asarray(csr.indptr, jnp.int32),
                   indices=jnp.asarray(indices, jnp.int32),
                   n_nodes=mat.shape[0])

    def degrees_of(self, nodes: jax.Array) -> jax.Array:
        return self.indptr[nodes + 1] - self.indptr[nodes]


def sample_neighbors(table: NeighborTable, nodes: jax.Array, fanout: int,
                     rng: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sample ``fanout`` neighbors for each node in ``nodes``.

    Returns (neigh [B, K] int32, mask [B, K] float32). Zero-degree nodes
    get themselves with mask 0.
    """
    start = table.indptr[nodes]                       # [B]
    deg = table.indptr[nodes + 1] - start             # [B]
    u = jax.random.uniform(rng, (nodes.shape[0], fanout))
    offs = jnp.floor(u * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
    offs = jnp.minimum(offs, jnp.maximum(deg - 1, 0)[:, None])
    idx = start[:, None] + offs
    neigh = table.indices[idx]
    has = (deg > 0)[:, None]
    neigh = jnp.where(has, neigh, nodes[:, None])
    mask = has.astype(jnp.float32) * jnp.ones((1, fanout), jnp.float32)
    return neigh, mask


def sample_two_hop(table: NeighborTable, nodes: jax.Array, k1: int, k2: int,
                   rng: jax.Array):
    """Two-hop fixed-fanout sampling.

    Returns (n1 [B,K1], m1 [B,K1], n2 [B,K1,K2], m2 [B,K1,K2]). Replaces
    the reference's frontier-exploding 2-hop set expansion
    (``src/graphsage.py:331-358``) with a bounded sample.
    """
    r1, r2 = jax.random.split(rng)
    n1, m1 = sample_neighbors(table, nodes, k1, r1)
    flat = n1.reshape(-1)
    n2, m2 = sample_neighbors(table, flat, k2, r2)
    b, = nodes.shape
    return n1, m1, n2.reshape(b, k1, k2), m2.reshape(b, k1, k2)
