"""AEGIS baseline (GAE + GAN on embeddings).

Reference (``model_AEGIS.py:126-240``, ``aegis.py:96-140``):
  * GCN autoencoder: enc (n_in→n_h→n_h), dec (n_h→n_h→n_in), AE loss =
    per-row L2 recon error over the training ids;
  * PyG-``MLP`` generator: noise(16)→64→n_in producing fake node
    features, encoded with the same GCN encoder → z_gen;
  * PyG-``MLP`` discriminator2 (n_h→64→1, sigmoid hidden activation)
    separates real (0) from generated (1) embeddings;
  * anomaly score = sigmoid(discriminator2(z)) — the fake-probability of
    a node, read from the CONCATENATED forward (see below).

PyG 2.1.0 ``MLP`` defaults ``batch_norm=True`` (verified by EXECUTING
the reference through :mod:`scripts.pyg_shim` /
:mod:`scripts.reference_oracle`), so both MLPs contain a train-mode
BatchNorm1d between the hidden Linear and its activation
(:class:`PyGMLP`). That makes discriminator outputs batch-coupled: the
reference calls ``discriminator2(cat([z, z_gen]))`` (BN statistics over
2N rows — scores and loss_dis read from this) and separately
``discriminator2(z_gen)`` (statistics over N rows — loss_g reads this),
``model_AEGIS.py:215-220``. Both calls are materialized in
:class:`AEGISOutput`.

Training phases (reference ``aegis.py:118-140``): ``recon_num_epoch``
epochs of AE pretraining, then an adversarial phase. NB the reference's
forward returns ``loss_ae`` in the slot its driver unpacks as
``loss_dis`` (``model_AEGIS.py:240``), so its discriminator loss never
drives a gradient. The model exposes all three losses; the driver
(``ggad_tpu.train.baselines.run_aegis``) implements the intended
adversarial objective by default and a ``faithful=True`` mode
reproducing the reference's effective behavior (loss_ae-in-dis-slot,
missing pretrain zero_grad, double generator step) exactly —
executed-oracle-pinned in ``tests/test_reference_oracle.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.graph import Graph
from ggad_tpu.nn.layers import GCNLayer
from ggad_tpu.ops.dense_blocks import attr_row_error


class PyGMLP(nn.Module):
    """2-layer MLP with torch_geometric 2.1.0 ``MLP`` semantics:
    Linear → BatchNorm1d → act → Linear (hidden BN by default,
    ``batch_norm=True``; final layer plain).

    BatchNorm uses the batch statistics of the CURRENT input (train
    mode, biased variance, eps 1e-5) — the reference drivers never score
    in eval mode, so running statistics are never consumed and are not
    tracked here.
    """

    hidden: int
    out: int
    act: str = "relu"   # hidden/intermediate activation

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden, name="lin1")(x)
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.hidden,), jnp.float32)
        shift = self.param("bn_bias", nn.initializers.zeros,
                           (self.hidden,), jnp.float32)
        mean = jnp.mean(h, axis=0)
        var = jnp.var(h, axis=0)           # biased, like torch BN
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + shift
        h = jax.nn.relu(h) if self.act == "relu" else jax.nn.sigmoid(h)
        return nn.Dense(self.out, name="lin2")(h)


# Backwards-compatible alias: the pre-oracle rounds exported a no-BN
# ``MLP``; the executed reference proved BN is present, so the faithful
# module is now the only implementation.
MLP = PyGMLP


class AEGISOutput(NamedTuple):
    z: jax.Array          # real embeddings [N, n_h]
    z_gen: jax.Array      # generated embeddings [N, n_h]
    x_dec: jax.Array      # decoded features [N, n_in]
    probs_all: jax.Array  # sigmoid disc on cat([z, z_gen]) [2N] — BN
    #                       stats over 2N rows (model_AEGIS.py:215-219)
    prob_gen: jax.Array   # sigmoid disc on z_gen alone [N] — BN stats
    #                       over N rows (model_AEGIS.py:218-220)
    probs_all_detached: jax.Array  # disc on stop_grad(cat) [2N]


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
        generator = PyGMLP(self.hid_dim, n_in, act="relu",
                           name="generator")
        disc2 = PyGMLP(self.hid_dim, 1, act="sigmoid",
                       name="discriminator2")

        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"),
                                      (x.shape[0], self.noise_dim))
        x_gen = generator(noise)
        z_gen = enc2(adj, enc1(adj, x_gen))
        z = enc2(adj, enc1(adj, x))
        x_dec = dec2(adj, dec1(adj, z))

        emb_all = jnp.concatenate([z, z_gen], axis=0)
        probs_all = jax.nn.sigmoid(disc2(emb_all))[:, 0]
        prob_gen = jax.nn.sigmoid(disc2(z_gen))[:, 0]
        probs_all_det = jax.nn.sigmoid(
            disc2(jax.lax.stop_gradient(emb_all)))[:, 0]
        return AEGISOutput(z, z_gen, x_dec, probs_all, prob_gen,
                           probs_all_det)


def aegis_losses(out: AEGISOutput, x: jax.Array, train_idx: jax.Array):
    """(loss_ae, loss_dis, loss_g) — reference ``model_AEGIS.py:215-237``.

    ``loss_g = BCE(sigmoid(disc2(z_gen)), 0)`` — the separate-forward
    probabilities (BN over N generated rows), NOT detached: it drives
    generator, encoder, and discriminator alike (the reference never
    detaches it). ``loss_dis`` is the intended discriminator objective
    (real→0 over the train rows, generated→1 over all rows of the
    concatenated forward, inputs stop-gradded so only the discriminator
    trains); the reference computes an analog and discards it
    (``model_AEGIS.py:222-224,240``).
    """
    from ggad_tpu.ops.bce import bce_probs

    n = x.shape[0]
    loss_ae = jnp.mean(attr_row_error(x, out.x_dec)[train_idx])

    # torch F.binary_cross_entropy semantics (log clamp -100, no prob
    # clip) — see ggad_tpu.ops.bce
    p_real_d = out.probs_all_detached[:n][train_idx]
    p_gen_d = out.probs_all_detached[n:]
    loss_dis = (jnp.sum(bce_probs(p_real_d, 0.0))
                + jnp.sum(bce_probs(p_gen_d, 1.0))) \
        / (p_real_d.shape[0] + p_gen_d.shape[0])
    # generator objective: make generated look real (label 0)
    loss_g = jnp.mean(bce_probs(out.prob_gen, 0.0))
    return loss_ae, loss_dis, loss_g


def aegis_scores(out: AEGISOutput) -> jax.Array:
    """Anomaly score = discriminator fake-probability of the real nodes,
    read from the concatenated forward (reference ``model_AEGIS.py:239``
    scores ``logits[idx_test]`` where logits span ``cat([z, z_gen])``
    and test ids index the first N rows)."""
    n = out.z.shape[0]
    return out.probs_all[:n]
