"""GGAD: generative semi-supervised graph anomaly detection (full-batch).

TPU-native re-design of the reference centerpiece (``model.py:108-191``):

  * 2-layer GCN encoder (n_in → n_h → n_h, PReLU) over a *sparse* Â.
  * Outlier generation: for each "sacrificial" seed node s,
      - target   emb_abnormal[s] = emb[s] + N(mean, std)        (``model.py:141-144``)
      - generated emb_con[s]     = ReLU(fc4((Â @ emb)[s]))      (``model.py:151-156``)
    i.e. the generated outlier is the transformed aggregate of s's
    neighborhood in embedding space.
  * One-class MLP head scores [emb[normal] ‖ emb_con]            (``model.py:159,176-181``)
  * The seed rows of the returned embedding are functionally replaced by
    the generated outliers (the reference does this with an in-place write
    at ``model.py:182``; here it is `emb.at[seed].set(...)`, which carries
    the identical gradient).

The reference Model also declares gcn3 / fc5 / fc6 / readouts / a bilinear
discriminator that its forward never uses (dead code, see SURVEY.md §2);
those components live in ``ggad_tpu.nn.layers`` but are intentionally not
part of this module.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.nn.layers import DenseNoBias, GCNLayer, MLPHead
from ggad_tpu.ops.spmm import spmm


def _replace_rows_impl(emb, values, rows):
    n = emb.shape[0]
    # FMA form, not a select: jnp.where over the scattered mask (bool OR
    # f32-compare) makes the remote TPU compiler fault at some shapes
    # ("TPU worker crashed", reproduced at reddit-quick 2196x300 inside
    # the full train step; the where-free a + m*(b-a) compiles and runs
    # everywhere). Replaced rows differ from an exact select by <= 1 ulp
    # of emb (v + (emb - emb) rounding); mask-0 rows are exact.
    mask = jnp.zeros((n,), jnp.float32).at[rows].set(1.0)
    pos = jnp.zeros((n,), jnp.int32).at[rows].set(
        jnp.arange(rows.shape[0], dtype=jnp.int32))
    vals_full = values.at[pos].get(mode="promise_in_bounds")
    return emb + mask[:, None] * (vals_full - emb)


@jax.custom_vjp
def replace_rows(emb: jax.Array, values: jax.Array,
                 rows: jax.Array) -> jax.Array:
    """out = emb with out[rows[k]] = values[k] (``rows`` unique) —
    value- and gradient-identical to ``emb.at[rows].set(values)``.

    Implemented as mask + gather instead of XLA scatter: the scatter
    lowering materializes a [N, n_h] u32 index plane plus an operand
    copy (~0.7 ms of the elliptic step, round-5 trace); here the only
    full-size work is one [N]-row gather from the [S, n_h] values and a
    fused select. The backward is the exact transpose: zero the
    replaced rows' cotangent, gather the values' cotangent.
    """
    return _replace_rows_impl(emb, values, rows)


def _replace_rows_fwd(emb, values, rows):
    return _replace_rows_impl(emb, values, rows), rows


def _replace_rows_bwd(rows, g):
    import numpy as np

    # arithmetic mask for the same codegen reason as the forward
    mask = jnp.zeros((g.shape[0],), jnp.float32).at[rows].set(1.0)
    d_emb = g * (1.0 - mask[:, None])
    d_vals = g.at[rows].get(mode="promise_in_bounds")
    return d_emb, d_vals, np.zeros(rows.shape, jax.dtypes.float0)


replace_rows.defvjp(_replace_rows_fwd, _replace_rows_bwd)


class GGADOutput(NamedTuple):
    emb: jax.Array           # [N, n_h] embeddings (seed rows replaced in train)
    emb_combine: jax.Array   # [Nn+S, n_h] (train) — head input
    logits: jax.Array        # [Nn+S, 1] (train) / [N, 1] (eval)
    emb_con: jax.Array       # [S, n_h] generated outliers (train)
    emb_abnormal: jax.Array  # [S, n_h] perturbed seed embeddings


def init_ggad_params(model: "GGAD", feat_dim: int, rngs: dict):
    """Initialize the GGAD parameter tree on a TINY dummy graph.

    Flax parameter values depend only on the RNGs and the input SHAPES
    (here: ``feat_dim``), not on the graph — so this produces exactly
    the params ``model.init(rngs, real_adj, real_x, ...)`` would, without
    tracing a full-size forward (whose [E, n_h] SpMM gather OOMs at
    DGraph scale just to build parameters).
    """
    import numpy as np

    from ggad_tpu.graph import from_coo

    g = from_coo(np.array([0, 1]), np.array([1, 0]), None, 2)
    x = jnp.zeros((2, feat_dim), jnp.float32)
    si = jnp.zeros((1,), jnp.int32)
    ni = jnp.ones((1,), jnp.int32)
    return model.init(rngs, g, x, si, ni, train=True)


class GGAD(nn.Module):
    """Flagship model. ``n_h`` defaults to the reference's 300."""

    n_h: int = 300
    noise_mean: float = 0.0
    noise_std: float = 0.0   # reference calls this "var" but multiplies it
                             # directly as a scale (``model.py:143``)
    spmm_impl: str = "auto"

    def setup(self):
        self.gcn1 = GCNLayer(self.n_h, act="prelu", spmm_impl=self.spmm_impl)
        self.gcn2 = GCNLayer(self.n_h, act="prelu", spmm_impl=self.spmm_impl)
        self.head = MLPHead(hidden=(self.n_h // 2, self.n_h // 4), out=1)
        self.fc4 = DenseNoBias(self.n_h)

    def encode(self, adj: Graph, x: jax.Array,
               ax: Optional[jax.Array] = None) -> jax.Array:
        return self.gcn2(adj, self.gcn1(adj, x, pre_agg=ax))

    def __call__(self, adj: Graph, x: jax.Array, seed_idx: jax.Array,
                 normal_idx: jax.Array, train: bool = True,
                 seed_adj: Optional[Graph] = None,
                 ax: Optional[jax.Array] = None) -> GGADOutput:
        """``seed_adj``: optional precomputed row-subgraph of ``adj`` at
        ``seed_idx`` (see :func:`ggad_tpu.graph.rows_subgraph`) — the
        generator aggregation then costs O(E_seed) forward AND backward
        instead of a full SpMM each way. ``ax``: optional precomputed
        ``Â @ x`` — hoists the first layer's aggregation out of the step
        (features are constant; ``Â(xW₁) = (Âx)W₁``). Same math."""
        emb = self.encode(adj, x, ax=ax)

        # Perturbed seed embeddings (the ego-closeness target).
        noise = (jax.random.normal(self.make_rng("noise"),
                                   (seed_idx.shape[0], self.n_h))
                 * self.noise_std + self.noise_mean)
        emb_abnormal = emb[seed_idx] + noise

        if train:
            # Generated outliers from neighborhood aggregates:
            # (Â @ emb)[seed] == adj[seed, :] @ emb  (reference model.py:151-156)
            if seed_adj is not None:
                # "auto": a plain rect Graph takes the edge-parallel
                # path; an ELLGraph (sparse-regime trainer) its
                # scatter-free sigma tables
                agg = spmm(seed_adj, emb, impl="auto")
            else:
                agg = spmm(adj, emb, impl=self.spmm_impl)[seed_idx]
            emb_con = jax.nn.relu(self.fc4(agg))
            emb_combine = jnp.concatenate([emb[normal_idx], emb_con], axis=0)
            logits = self.head(emb_combine)
            # Functional replacement; gradient flows into fc4 and the encoder
            # exactly like the reference's in-place write (model.py:182).
            # replace_rows = scatter-free .at[seed].set (see its docstring).
            emb = replace_rows(emb, emb_con, seed_idx)
        else:
            emb_con = jnp.zeros((seed_idx.shape[0], self.n_h), emb.dtype)
            emb_combine = jnp.zeros((0, self.n_h), emb.dtype)
            logits = self.head(emb)

        return GGADOutput(emb, emb_combine, logits, emb_con, emb_abnormal)
