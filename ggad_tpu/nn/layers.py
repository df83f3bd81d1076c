"""Neural layers shared by all models, built on the sparse op layer.

Semantics match the reference component-for-component:

  * :class:`GCNLayer` — reference ``model.py:6-35`` (Linear no-bias with
    Xavier-uniform init, SpMM aggregation, additive bias init 0, PReLU).
    The dense ``torch.bmm(adj, h)`` becomes a sparse :func:`ggad_tpu.ops.spmm`.
  * :class:`PReLU` — torch's single-shared-parameter PReLU (init 0.25).
  * :class:`MLPHead` — the fc1→fc2→fc3 one-class scoring head
    (reference ``model.py:115-117, 176-181``).
  * :class:`BilinearDiscriminator` — reference ``model.py:76-105``
    (constructed by the reference Model but unused in its forward; carried
    for capability parity).
  * :func:`readout` — avg/max/min/weighted-sum readouts
    (reference ``model.py:38-73``; unused by GGAD's forward).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.ops.spmm import spmm

xavier_uniform = nn.initializers.xavier_uniform()


class PReLU(nn.Module):
    """Single-shared-parameter PReLU, torch-default init 0.25."""

    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(self.init_alpha),
                           (), jnp.float32)
        return jnp.where(x >= 0, x, alpha * x)


class DenseNoBias(nn.Module):
    """Linear layer without bias, Xavier-uniform init (torch parity)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("kernel", xavier_uniform,
                       (x.shape[-1], self.features), jnp.float32)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)


class GCNLayer(nn.Module):
    """h' = act(Â @ (h W) + b)   — reference ``model.py:26-35``.

    ``W`` has no bias; a separate additive bias (init 0) is applied after
    aggregation; activation is PReLU by default.
    """

    features: int
    use_bias: bool = True
    act: str = "prelu"
    spmm_impl: str = "auto"

    @nn.compact
    def __call__(self, adj: Graph, x: jax.Array,
                 pre_agg: Optional[jax.Array] = None) -> jax.Array:
        """``pre_agg``: optional precomputed ``Â @ x``. When the layer
        input is CONSTANT across steps (the first GCN layer's features),
        ``Â(xW) = (Âx)W`` lets the aggregation hoist out of the training
        loop entirely — the per-step compute reduces to one dense matmul
        (no SpMM forward or backward). Same parameters, same math."""
        if pre_agg is not None:
            out = DenseNoBias(self.features, name="fc")(pre_agg)
        else:
            h = DenseNoBias(self.features, name="fc")(x)
            out = spmm(adj, h, impl=self.spmm_impl)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            out = out + b
        if self.act == "prelu":
            return PReLU(name="prelu")(out)
        elif self.act == "relu":
            return jax.nn.relu(out)
        elif self.act is None or self.act == "none":
            return out
        raise ValueError(f"unknown act {self.act!r}")


class MLPHead(nn.Module):
    """fc1→ReLU→fc2→ReLU→fc3 one-class scoring head.

    Reference ``model.py:115-117`` (n_h → n_h/2 → n_h/4 → 1, all bias-free).
    """

    hidden: Sequence[int]
    out: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, h in enumerate(self.hidden):
            x = jax.nn.relu(DenseNoBias(h, name=f"fc{i + 1}")(x))
        return DenseNoBias(self.out, name=f"fc{len(self.hidden) + 1}")(x)


class BilinearDiscriminator(nn.Module):
    """Bilinear critic with rotate-the-batch negatives.

    Reference ``model.py:76-105``: scores f(h, c) = h^T W c + b; negatives
    are built by rotating the context batch. The reference constructs this
    (``model.py:131``) but never calls it in the GGAD forward; carried here
    for component parity (it is the standard CoLA-style discriminator).
    """

    negsamp_rounds: int = 1

    @nn.compact
    def __call__(self, c: jax.Array, h: jax.Array) -> jax.Array:
        d1, d2 = h.shape[-1], c.shape[-1]
        w = self.param("kernel", xavier_uniform, (d1, d2), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (), jnp.float32)

        def score(ctx):
            return jnp.einsum("nd,de,ne->n", h, w, ctx) + b

        scores = [score(c)]
        c_mi = c
        for _ in range(self.negsamp_rounds):
            # rotate: prepend the second-to-last row, drop the last
            c_mi = jnp.concatenate([c_mi[-2:-1], c_mi[:-1]], axis=0)
            scores.append(score(c_mi))
        return jnp.concatenate(scores, axis=0)[:, None]


class GATLayer(nn.Module):
    """Single-head graph attention layer (GATConv semantics, used by the
    AnomalyDAE baseline — reference ``model_AnomalyDAE.py:123``).

    α_ij = softmax_j( LeakyReLU(a_src·Wh_j + a_dst·Wh_i) ) over incoming
    edges j→i (self-loops added by the caller's graph); out_i = Σ α_ij Wh_j
    + bias. Computed edge-parallel: SDDMM-style logits + segment-softmax +
    weighted SpMM — never materializes N×N attention.
    """

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array) -> jax.Array:
        d = self.features
        w = self.param("kernel", xavier_uniform, (x.shape[-1], d),
                       jnp.float32)
        a_src = self.param("att_src", xavier_uniform, (1, d), jnp.float32)
        a_dst = self.param("att_dst", xavier_uniform, (1, d), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)

        h = jnp.dot(x, w, preferred_element_type=jnp.float32)
        alpha_src = jnp.sum(h * a_src, axis=-1)   # [N]
        alpha_dst = jnp.sum(h * a_dst, axis=-1)   # [N]
        # edge (row → col): message from row, aggregated at col
        logits = jax.nn.leaky_relu(
            alpha_src[g.row] + alpha_dst[g.col], self.negative_slope)
        # padding edges (val == 0) must not join the softmax
        valid = g.val != 0
        logits = jnp.where(valid, logits, -jnp.inf)
        seg_max = jax.ops.segment_max(logits, g.col,
                                      num_segments=g.n_nodes)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.where(valid, jnp.exp(logits - seg_max[g.col]), 0.0)
        denom = jax.ops.segment_sum(ex, g.col, num_segments=g.n_nodes)
        att = ex / jnp.maximum(denom[g.col], 1e-16)
        out = jax.ops.segment_sum(h[g.row] * att[:, None], g.col,
                                  num_segments=g.n_nodes)
        return out + b


def readout(seq: jax.Array, mode: str = "avg",
            query: Optional[jax.Array] = None) -> jax.Array:
    """Graph readout over the node axis (reference ``model.py:38-73``)."""
    if mode == "avg":
        return jnp.mean(seq, axis=-2)
    if mode == "max":
        return jnp.max(seq, axis=-2)
    if mode == "min":
        return jnp.min(seq, axis=-2)
    if mode == "weighted_sum":
        assert query is not None
        sim = jax.nn.softmax(jnp.einsum("...nd,...d->...n", seq, query),
                             axis=-1)
        return jnp.einsum("...nd,...n->...d", seq, sim)
    raise ValueError(f"unknown readout {mode!r}")
