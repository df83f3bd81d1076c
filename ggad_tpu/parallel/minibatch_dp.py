"""Data-parallel mini-batch GGAD training over a device mesh.

The DGraph-scale scaling story (SURVEY.md §2.3 "graph minibatch
parallelism"): the batch axis shards over the mesh (each device samples,
aggregates and scores its slice of the 150+50 batch against the
replicated feature/adjacency tables); GSPMD inserts the psum for the
batch-mean losses and the gradient all-reduce. Feature tables stay
replicated here (DGraph's 3.7M×17 table is ~250 MB); a node-sharded
table variant rides the same ``nodes`` axis when memory demands it.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ggad_tpu.models.sage import MiniBatchGGAD, minibatch_ggad_losses
from ggad_tpu.sampler.neighbor import NeighborTable


def make_dp_minibatch_step(model: MiniBatchGGAD,
                           tx: optax.GradientTransformation,
                           mesh: Mesh, n_anom: int,
                           axis: str = "nodes") -> Callable:
    """Jitted DP step: (params, opt_state, feats, table, batch, rng).

    ``batch`` [B] shards over ``axis`` (B divisible by mesh size; the
    anomaly slots are the last ``n_anom`` — keep n_anom divisible too so
    every shard carries the same slot layout).
    """
    batch_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, feats, table, batch, rng):
        def loss_fn(p):
            out = model.apply(p, feats, table, batch, n_anom, True,
                              rngs={"sample": rng})
            return minibatch_ggad_losses(out, n_anom).total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        # params/opt/feats/table replicate; batch ids shard over the mesh
        in_shardings=(repl, repl, repl, repl, batch_sh, repl),
        donate_argnums=(0, 1),
    )


def run_dp_minibatch_demo(mesh: Mesh, adj, features, batch_ids,
                          *, n_anom: int = 8, emb_dim: int = 16,
                          seed: int = 0) -> float:
    """Build + run one DP minibatch step; returns the loss (replicated)."""
    model = MiniBatchGGAD(emb_dim=emb_dim, fanout1=4, fanout2=3)
    tx = optax.adam(1e-3)
    table = NeighborTable.from_scipy(adj)
    feats = jnp.asarray(features, jnp.float32)
    batch = jnp.asarray(batch_ids, jnp.int32)

    rng = jax.random.PRNGKey(seed)
    rng, ik, sk = jax.random.split(rng, 3)
    params = model.init({"params": ik, "sample": sk}, feats, table, batch,
                        n_anom, True)
    opt_state = tx.init(params)
    step = make_dp_minibatch_step(model, tx, mesh, n_anom)
    params, opt_state, loss = step(params, opt_state, feats, table, batch,
                                   rng)
    jax.block_until_ready(loss)
    return float(loss)
