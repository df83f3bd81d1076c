"""GAAN baseline (generative adversarial attributed network AD).

Reference (``model_gaan.py``, ``gaan.py``):
  * generator: MLP noise(16)→…→n_in producing fake features x_;
  * encoder/discriminator: MLP x→z (no graph convolution!);
  * edge probabilities a_ij = σ(z_i·z_j), a_ij' = σ(z_i'·z_j');
  * discriminator loss over the *train-node* edges
    (``model_gaan.py:266-270, 318-322``):
       loss = ½·[BCE(a_E, 1) + BCE(a_E'.detach(), 0)]
  * generator loss: per-row feature reconstruction L2 over train rows
    (``model_gaan.py:324-326``);
  * anomaly score (weight = 1): attribute reconstruction error of the test
    rows (``model_gaan.py:328-334``).

Edge terms are computed edge-parallel over the sparse adjacency's edges
restricted to rows in ``idx_train`` — the reference's Python double loop
(``model_gaan.py:18-23``) becomes a boolean edge mask.

Both MLPs are PyG-2.1.0-faithful (:class:`ggad_tpu.models.aegis.PyGMLP`):
``torch_geometric.nn.MLP`` defaults ``batch_norm=True``, so generator and
encoder each contain a train-mode BatchNorm1d between the hidden Linear
and ReLU — verified by EXECUTING ``gaan.py`` through
``scripts/reference_oracle.py``. The two encoder calls (real x,
generated x_) are separate forwards with separate batch statistics,
matching ``model_gaan.py:296-298``.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.models.aegis import PyGMLP as MLP
from ggad_tpu.ops.dense_blocks import attr_row_error


class GAANOutput(NamedTuple):
    z: jax.Array        # encoded real features [N, h]
    z_gen: jax.Array    # encoded fake features [N, h]
    x_gen: jax.Array    # generated features [N, n_in]


class GAAN(nn.Module):
    noise_dim: int = 16
    hid_dim: int = 64

    @nn.compact
    def __call__(self, x: jax.Array,
                 noise: jax.Array | None = None) -> GAANOutput:
        n_in = x.shape[-1]
        generator = MLP(self.hid_dim, n_in, act="relu", name="generator")
        encoder = MLP(self.hid_dim, self.hid_dim, act="relu",
                      name="discriminator")
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"),
                                      (x.shape[0], self.noise_dim))
        x_gen = generator(noise)
        z = encoder(x)
        z_gen = encoder(x_gen)
        return GAANOutput(z, z_gen, x_gen)


def train_edge_mask(g: Graph, train_mask_nodes: jax.Array) -> jax.Array:
    """Edges whose source row is a train node (reference
    ``neighList_to_edgeList_train``) and that are not padding."""
    return train_mask_nodes[g.row] & (g.val != 0)


def gaan_losses(out: GAANOutput, g: Graph, x: jax.Array,
                train_node_mask: jax.Array, train_idx: jax.Array):
    """(loss_dis, loss_g). ``train_node_mask``: [N] bool.

    BCE terms use torch ``binary_cross_entropy`` semantics (log clamped
    at -100, NO probability clipping — :func:`ggad_tpu.ops.bce.bce_probs`):
    under discriminator saturation the reference's loss keeps growing at
    100/edge, which an eps-clipped mirror silently caps (caught by the
    executed ``gaan.py`` oracle leg)."""
    from ggad_tpu.ops.bce import bce_probs

    emask = train_edge_mask(g, train_node_mask)
    w = emask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)

    def edge_sigmoid(z):
        return jax.nn.sigmoid(
            jnp.einsum("ed,ed->e", z[g.row], z[g.col],
                       preferred_element_type=jnp.float32))

    a_real = edge_sigmoid(out.z)
    a_fake = edge_sigmoid(jax.lax.stop_gradient(out.z_gen))
    loss_r = jnp.sum(w * bce_probs(a_real, 1.0)) / denom
    loss_f = jnp.sum(w * bce_probs(a_fake, 0.0)) / denom
    loss_dis = 0.5 * (loss_r + loss_f)

    loss_g = jnp.mean(attr_row_error(x, out.x_gen)[train_idx])
    return loss_dis, loss_g


def gaan_scores(out: GAANOutput, x: jax.Array) -> jax.Array:
    """score_i = ‖x_i − x̂_i‖₂ (weight = 1 ⇒ attribute-only,
    reference ``model_gaan.py:328-334``)."""
    return attr_row_error(x, out.x_gen)
