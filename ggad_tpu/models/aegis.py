"""AEGIS baseline (GAE + GAN on embeddings).

Reference (``model_AEGIS.py:126-240``, ``aegis.py:96-140``):
  * GCN autoencoder: enc (n_in→n_h→n_h), dec (n_h→n_h→n_in), AE loss =
    per-row L2 recon error over the training ids;
  * MLP generator: noise(16)→64→n_in producing fake node features, encoded
    with the same GCN encoder → z_gen;
  * MLP discriminator2 (n_h→64→1, sigmoid activations) separates real (0)
    from generated (1) embeddings;
  * anomaly score = discriminator2(z) — the fake-probability of a node.

Training phases (reference ``aegis.py:118-140``): ``recon_num_epoch``
epochs of AE pretraining, then an adversarial phase. NB the reference's
forward returns ``loss_ae`` in the slot its driver unpacks as
``loss_dis`` (``model_AEGIS.py:240``), so its discriminator loss never
drives a gradient. The model exposes all three losses; the driver
(``ggad_tpu.train.baselines.run_aegis``) implements the intended
adversarial objective by default and a ``faithful=True`` mode
reproducing the reference's effective behavior (loss_ae-in-dis-slot,
missing pretrain zero_grad, double generator step) exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.nn.layers import GCNLayer
from ggad_tpu.ops.dense_blocks import attr_row_error


class MLP(nn.Module):
    hidden: int
    out: int
    act: str = "relu"   # hidden/intermediate activation

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden, name="lin1")(x)
        h = jax.nn.relu(h) if self.act == "relu" else jax.nn.sigmoid(h)
        return nn.Dense(self.out, name="lin2")(h)


class AEGISOutput(NamedTuple):
    z: jax.Array          # real embeddings [N, n_h]
    z_gen: jax.Array      # generated embeddings [N, n_h]
    x_dec: jax.Array      # decoded features [N, n_in]
    prob_real: jax.Array  # sigmoid disc output on real [N]
    prob_gen: jax.Array   # sigmoid disc output on generated [N]
    prob_gen_detached: jax.Array  # disc output on stop_grad(z_gen) [N]


class AEGIS(nn.Module):
    n_h: int = 300
    noise_dim: int = 16
    hid_dim: int = 64

    @nn.compact
    def __call__(self, adj: Graph, x: jax.Array,
                 noise: jax.Array | None = None) -> AEGISOutput:
        n_in = x.shape[-1]
        enc1 = GCNLayer(self.n_h, act="prelu", name="gcn_enc1")
        enc2 = GCNLayer(self.n_h, act="prelu", name="gcn_enc2")
        dec1 = GCNLayer(self.n_h, act="prelu", name="gcn_dec1")
        dec2 = GCNLayer(n_in, act="prelu", name="gcn_dec2")
        generator = MLP(self.hid_dim, n_in, act="relu", name="generator")
        disc2 = MLP(self.hid_dim, 1, act="sigmoid", name="discriminator2")

        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"),
                                      (x.shape[0], self.noise_dim))
        x_gen = generator(noise)
        z_gen = enc2(adj, enc1(adj, x_gen))
        z = enc2(adj, enc1(adj, x))
        x_dec = dec2(adj, dec1(adj, z))

        prob_real = jax.nn.sigmoid(disc2(z))[:, 0]
        prob_gen = jax.nn.sigmoid(disc2(z_gen))[:, 0]
        prob_gen_det = jax.nn.sigmoid(
            disc2(jax.lax.stop_gradient(z_gen)))[:, 0]
        return AEGISOutput(z, z_gen, x_dec, prob_real, prob_gen,
                           prob_gen_det)


def aegis_losses(out: AEGISOutput, x: jax.Array, train_idx: jax.Array):
    """(loss_ae, loss_dis, loss_g) — reference ``model_AEGIS.py:215-233``."""
    loss_ae = jnp.mean(attr_row_error(x, out.x_dec)[train_idx])

    eps = 1e-7
    p_real = jnp.clip(out.prob_real[train_idx], eps, 1 - eps)
    p_gen = jnp.clip(out.prob_gen, eps, 1 - eps)
    # discriminator: real → 0, generated → 1 (labels per reference); the
    # fake sample enters through stop_grad(z_gen), so loss_dis trains the
    # discriminator while the generator is driven only by loss_g
    p_gen_d = jnp.clip(out.prob_gen_detached, eps, 1 - eps)
    loss_dis = -(jnp.sum(jnp.log(1 - p_real)) + jnp.sum(jnp.log(p_gen_d))) \
        / (p_real.shape[0] + p_gen_d.shape[0])
    # generator: make generated look real (label 0)
    loss_g = -jnp.mean(jnp.log(1 - p_gen))
    return loss_ae, loss_dis, loss_g


def aegis_scores(out: AEGISOutput) -> jax.Array:
    """Anomaly score = discriminator fake-probability of the real node
    (reference ``model_AEGIS.py:237-239``)."""
    return out.prob_real
