"""OCGNN baseline (one-class GNN / Deep-SVDD on GCN embeddings).

Reference (``ocgnn.py:80-113``, ``model_ocgnn.py:109-131``): a 2-layer GCN
encoder; hypersphere loss on labeled-normal embeddings

    dist_i = ‖emb_i − c‖²,   score_i = dist_i − r²,
    loss   = r² + (1/β)·mean(relu(score))        β = 0.5

NB the reference's ``loss_func`` re-creates ``r = 0`` and ``c = 0`` locally
on every call, so its warmup block (quantile radius, mean center) never
takes effect — effectively c = 0, r = 0. We reproduce that default and also
expose the *intended* center/radius warmup as state (``use_warmup=True``).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.nn.layers import GCNLayer


class OCGNNEncoder(nn.Module):
    n_h: int = 300

    @nn.compact
    def __call__(self, adj: Graph, x: jax.Array) -> jax.Array:
        h = GCNLayer(self.n_h, act="prelu", name="gcn1")(adj, x)
        return GCNLayer(self.n_h, act="prelu", name="gcn2")(adj, h)


class OCGNNState(NamedTuple):
    center: jax.Array   # [n_h]
    radius: jax.Array   # scalar
    warmup_left: jax.Array  # int32 scalar


def init_ocgnn_state(n_h: int, warmup: int = 2) -> OCGNNState:
    return OCGNNState(center=jnp.zeros(n_h), radius=jnp.zeros(()),
                      warmup_left=jnp.asarray(warmup, jnp.int32))


def ocgnn_loss(emb_train: jax.Array, state: OCGNNState,
               beta: float = 0.5, eps: float = 1e-3,
               use_warmup: bool = False):
    """Returns (loss, scores, new_state)."""
    dist = jnp.sum(jnp.square(emb_train - state.center), axis=1)
    score = dist - jnp.square(state.radius)
    loss = jnp.square(state.radius) + (1.0 / beta) * jnp.mean(
        jax.nn.relu(score))

    if not use_warmup:
        return loss, score, state

    def do_warmup(st):
        r = jnp.quantile(jnp.sqrt(dist), 1.0 - beta)
        c = jnp.mean(emb_train, axis=0)
        c = jnp.where((jnp.abs(c) < eps) & (c < 0), -eps, c)
        c = jnp.where((jnp.abs(c) < eps) & (c > 0), eps, c)
        return OCGNNState(center=jax.lax.stop_gradient(c),
                          radius=jax.lax.stop_gradient(r),
                          warmup_left=st.warmup_left - 1)

    new_state = jax.lax.cond(state.warmup_left > 0, do_warmup,
                             lambda st: st, state)
    return loss, score, new_state


def ocgnn_scores(emb: jax.Array, state: OCGNNState) -> jax.Array:
    dist = jnp.sum(jnp.square(emb - state.center), axis=1)
    return dist - jnp.square(state.radius)
