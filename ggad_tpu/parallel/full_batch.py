"""Multi-device full-batch GGAD training via GSPMD node/edge partitioning.

Layout:
  * node-indexed arrays (features, embeddings) shard their node axis over
    the ``nodes`` mesh axis;
  * the edge list (row/col/val) shards over the same axis (edge
    partition);
  * parameters are replicated (they are tiny: two n_h×n_h GCN weights and
    a few MLP heads).

XLA's SPMD partitioner inserts the boundary-feature collectives for the
gather (``x[col]``) and the scatter (``segment_sum``) — the graph analog
of ring/sequence parallelism (SURVEY.md §5 "long-context" row). Losses
are scalars, all-reduced automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggad_tpu.graph import Graph
from ggad_tpu.models.ggad import GGAD
from ggad_tpu.train.losses import ggad_losses


def shard_graph(g: Graph, mesh: Mesh, axis: str = "nodes") -> Graph:
    """Place the edge arrays sharded over ``axis``; indptr replicated."""
    edge_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return Graph(
        row=jax.device_put(g.row, edge_sh),
        col=jax.device_put(g.col, edge_sh),
        val=jax.device_put(g.val, edge_sh),
        indptr=jax.device_put(g.indptr, repl),
        n_nodes=g.n_nodes,
        n_edges=g.n_edges,
    )


def shard_node_array(x: jax.Array, mesh: Mesh, axis: str = "nodes") -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def shard_params_2d(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel parameter placement: 2-D weight kernels shard
    their OUTPUT feature dim over ``axis`` (when divisible), 1-D biases
    likewise; everything else (PReLU alphas, scalar heads) replicates.

    NB at the reference's widths (n_h = 300, features ≤ 745) TP is a
    capability, not a win: the largest weight is 745×300 f32 ≈ 0.9 MB,
    so sharding saves <1 MB/device while adding an all-reduce per layer
    — see docs/TRACEABILITY.md (TP row) for the arithmetic. The same
    placement pays at transformer-scale widths.
    """
    import flax

    m = dict(mesh.shape)[axis]
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        if v.ndim >= 1 and v.shape[-1] % m == 0 and v.shape[-1] >= m:
            spec = P(*([None] * (v.ndim - 1) + [axis]))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return flax.traverse_util.unflatten_dict(out)


def sharded_train_step_2d(mesh: Mesh, dataset, *, n_h: int = 64,
                          lr: float = 1e-3, seed: int = 0,
                          n_steps: int = 1):
    """GGAD training on a 2-D ('nodes', 'model') mesh: node/edge arrays
    shard over 'nodes', weight/embedding feature dims over 'model'
    (GSPMD inserts the matmul collectives). Returns the final loss."""
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference

    g = from_scipy(dataset.adj)
    adj, raw_adj = normalize_adj_reference(g)
    adj = shard_graph(adj, mesh, axis="nodes")
    raw_adj = shard_graph(raw_adj, mesh, axis="nodes")
    features = jax.device_put(
        jnp.asarray(dataset.features, jnp.float32),
        NamedSharding(mesh, P("nodes", None)))
    seed_idx = replicate(jnp.asarray(dataset.abnormal_label_idx,
                                     jnp.int32), mesh)
    normal_idx = replicate(jnp.asarray(dataset.normal_label_idx,
                                       jnp.int32), mesh)

    model = GGAD(n_h=n_h, noise_mean=0.02, noise_std=0.01)
    tx = optax.adam(lr)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng, noise_rng = jax.random.split(rng, 3)
    params = model.init({"params": init_rng, "noise": noise_rng},
                        adj, features, seed_idx, normal_idx, train=True)
    params = shard_params_2d(params, mesh)
    opt_state = jax.tree.map(
        lambda a: a, tx.init(params))  # inherits param shardings

    step = make_sharded_train_step(model, tx)
    losses = None
    for _ in range(n_steps):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, losses = step(params, opt_state, step_rng,
                                         adj, raw_adj, features,
                                         seed_idx, normal_idx)
    jax.block_until_ready(losses.total)
    return float(losses.total)


def make_sharded_train_step(
    model: GGAD,
    tx: optax.GradientTransformation,
    *,
    confidence_margin: float = 0.7,
    pos_weight: float = 1.0,
) -> Callable:
    """Return a jitted ``(params, opt_state, rng, adj, raw_adj, features,
    seed_idx, normal_idx) -> (params, opt_state, losses)`` step.

    Graph/feature arrays enter as jit ARGUMENTS (the repo's payload
    rule, CLAUDE.md): closed-over arrays would be embedded in the
    compile payload and shipped through the remote-TPU tunnel."""

    def step(params, opt_state, rng, adj, raw_adj, features, seed_idx,
             normal_idx):
        def loss_fn(p):
            out = model.apply(p, adj, features, seed_idx, normal_idx,
                              train=True, rngs={"noise": rng})
            losses = ggad_losses(out, raw_adj, seed_idx, normal_idx,
                                 confidence_margin=confidence_margin,
                                 pos_weight=pos_weight)
            return losses.total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return jax.jit(step, donate_argnums=(0, 1))


def sharded_train_step(mesh: Mesh, dataset, *, n_h: int = 64,
                       lr: float = 1e-3, seed: int = 0, n_steps: int = 1):
    """Build + run a fully sharded GGAD train step on ``mesh``.

    Used by the multi-chip dry-run harness and the scaling tests. Returns
    the final loss value (a replicated scalar).
    """
    from ggad_tpu.graph import from_scipy
    from ggad_tpu.ops.normalize import normalize_adj_reference

    g = from_scipy(dataset.adj)
    adj, raw_adj = normalize_adj_reference(g)
    adj = shard_graph(adj, mesh)
    raw_adj = shard_graph(raw_adj, mesh)
    features = shard_node_array(jnp.asarray(dataset.features), mesh)
    seed_idx = replicate(jnp.asarray(dataset.abnormal_label_idx,
                                     jnp.int32), mesh)
    normal_idx = replicate(jnp.asarray(dataset.normal_label_idx,
                                       jnp.int32), mesh)

    model = GGAD(n_h=n_h, noise_mean=0.02, noise_std=0.01)
    tx = optax.adam(lr)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng, noise_rng = jax.random.split(rng, 3)
    params = model.init({"params": init_rng, "noise": noise_rng},
                        adj, features, seed_idx, normal_idx, train=True)
    params = replicate(params, mesh)
    opt_state = replicate(tx.init(params), mesh)

    step = make_sharded_train_step(model, tx)
    losses = None
    for _ in range(n_steps):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, losses = step(params, opt_state, step_rng,
                                         adj, raw_adj, features,
                                         seed_idx, normal_idx)
    jax.block_until_ready(losses.total)
    return float(losses.total)
