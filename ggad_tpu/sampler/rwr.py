"""Random-walk-with-restart subgraph sampling, device-resident.

Reference counterpart: ``utils.py:151-172`` (``generate_rwr_subgraph``)
— DEAD CODE there (built in every driver via ``adj_to_dgl_graph`` but
never consumed by GGAD training); carried here for capability parity
with a TPU-native design: fixed-length walks under ``lax.scan`` with a
restart Bernoulli per step, static [S, walk_len] trace shapes, and a
padded unique-visited subgraph per seed (the dynamic Python `while`
retry loop of the reference becomes a fixed walk budget — zero-degree
or tiny components simply yield shorter unique sets, marked by a mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ggad_tpu.sampler.neighbor import NeighborTable


def rwr_traces(table: NeighborTable, seeds: jax.Array, walk_len: int,
               restart_prob: float, rng: jax.Array) -> jax.Array:
    """[S, walk_len] node traces: uniform neighbor steps with restart.

    Zero-degree walkers stay in place (matching the reference's walks
    that return only the seed).
    """
    seeds = seeds.astype(jnp.int32)

    def body(cur, key):
        k1, k2 = jax.random.split(key)
        deg = table.indptr[cur + 1] - table.indptr[cur]
        offs = (jax.random.uniform(k1, cur.shape)
                * jnp.maximum(deg, 1)).astype(jnp.int32)
        nxt = table.indices[table.indptr[cur] + jnp.minimum(
            offs, jnp.maximum(deg - 1, 0))]
        nxt = jnp.where(deg > 0, nxt, cur)
        restart = jax.random.uniform(k2, cur.shape) < restart_prob
        nxt = jnp.where(restart, seeds, nxt)
        return nxt, nxt

    keys = jax.random.split(rng, walk_len)
    _, trace = jax.lax.scan(body, seeds, keys)
    return trace.T                      # [S, walk_len]


def rwr_subgraphs(table: NeighborTable, seeds: jax.Array, *,
                  subgraph_size: int, restart_prob: float = 0.5,
                  walk_len: int | None = None,
                  rng: jax.Array | None = None
                  ) -> tuple[jax.Array, jax.Array]:
    """Per-seed RWR subgraph node sets (reference ``utils.py:151-172``).

    Returns (nodes [S, subgraph_size] int32, mask [S, subgraph_size]
    float32): the first unique nodes visited by a restart walk from each
    seed, seed guaranteed in slot 0; unfilled slots repeat the seed with
    mask 0. ``walk_len`` defaults to 3× the subgraph size like the
    reference's ``max_nodes_per_seed = subgraph_size * 3``.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    walk_len = walk_len or subgraph_size * 3
    trace = rwr_traces(table, seeds, walk_len, restart_prob, rng)
    seeds = seeds.astype(jnp.int32)

    def uniq_fill(seed, walk):
        # first-occurrence unique scan with static output size
        nodes = jnp.full((subgraph_size,), seed, jnp.int32)
        mask = jnp.zeros((subgraph_size,), jnp.float32).at[0].set(1.0)

        def step(carry, v):
            nodes, mask, count = carry
            seen = jnp.any((nodes == v) & (mask > 0))
            take = (~seen) & (count < subgraph_size)
            idx = jnp.minimum(count, subgraph_size - 1)
            nodes = jnp.where(take, nodes.at[idx].set(v), nodes)
            mask = jnp.where(take, mask.at[idx].set(1.0), mask)
            count = count + take.astype(jnp.int32)
            return (nodes, mask, count), None

        (nodes, mask, _), _ = jax.lax.scan(
            step, (nodes, mask, jnp.int32(1)), walk)
        return nodes, mask

    return jax.vmap(uniq_fill)(seeds, trace)


def pick_step(idx_train: jax.Array, y_train: jax.Array,
              degrees: jax.Array, size: int,
              rng: jax.Array) -> jax.Array:
    """Degree-weighted label-balanced training-id sampler (reference
    ``src/utils.py:133-137`` — unused there; carried for parity).

    smp_prob_i = degree_i / lf_i with
    lf_i = (Σy − |y|)·y_i + |y| — positives are downweighted by the
    class imbalance.
    """
    y = y_train.astype(jnp.float32)
    lf = (jnp.sum(y) - y.shape[0]) * y + y.shape[0]
    probs = degrees.astype(jnp.float32) / lf
    probs = probs / jnp.sum(probs)
    return idx_train[jax.random.choice(
        rng, idx_train.shape[0], shape=(size,), replace=True, p=probs)]
