"""Mini-batch reconstruction / adversarial baselines (C27–C29).

Sampled-neighborhood variants of DOMINANT, AnomalyDAE and AEGIS for the
DGraph-scale path (reference ``src/graphsage_dominant.py``,
``src/graphsage_anomalydae.py``, ``src/graphsage_aegis.py``): the same
sqrt(deg)·mean aggregation as :class:`~ggad_tpu.models.sage.MiniBatchGGAD`,
an encoder ReLU(W·agg), and:

  * DOMINANT-mb: feature decoder ReLU(fc(enc)); train loss =
    mean_f sqrt(Σ_batch (x − x̂)²) (the reference sums over the *batch*
    axis — ``src/graphsage_dominant.py:157-158`` — reproduced);
    score = per-node recon error (``test_recon``, ``src/utils.py:159-160``).
  * AnomalyDAE-mb: same with the 0.5/0.5 positive weighting
    (``src/graphsage_anomalydae.py:155-163`` — branchless ×0.5).
  * AEGIS-mb: a fixed per-node noise table aggregated with the same mask,
    encoded by the shared weights; an MLP discriminator separates real (0)
    from noise (1); score = discriminator output on the real embedding
    (``src/graphsage_aegis.py:280-323``).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ggad_tpu.models.aegis import MLP
from ggad_tpu.models.sage import masked_mean
from ggad_tpu.nn.layers import DenseNoBias, xavier_uniform
from ggad_tpu.sampler.neighbor import NeighborTable, sample_neighbors


def _gcn_aggregate(feats, table, batch, fanout, rng):
    n1, m1 = sample_neighbors(table, batch, fanout, rng)
    deg = table.degrees_of(batch).astype(jnp.float32)
    return masked_mean(feats[n1], m1, axis=1) \
        * jnp.sqrt(jnp.maximum(deg, 1.0))[:, None]


class MiniBatchRecon(nn.Module):
    """DOMINANT-mb / AnomalyDAE-mb shared skeleton."""

    emb_dim: int = 64
    fanout: int = 16
    pos_weighted: bool = False   # True → AnomalyDAE variant

    @nn.compact
    def __call__(self, feats: jax.Array, table: NeighborTable,
                 batch: jax.Array):
        f = feats.shape[-1]
        w_enc = self.param("w_enc", xavier_uniform, (f, self.emb_dim),
                           jnp.float32)
        dec = DenseNoBias(f, name="fc_dec")
        agg = _gcn_aggregate(feats, table, batch, self.fanout,
                             self.make_rng("sample"))
        enc = jax.nn.relu(agg @ w_enc)
        x_rec = jax.nn.relu(dec(enc))
        return x_rec

    def train_loss(self, x_rec: jax.Array, x_batch: jax.Array) -> jax.Array:
        diff = jnp.square(x_batch - x_rec)
        if self.pos_weighted:
            diff = jnp.where(x_batch > 0, diff * 0.5, diff * 0.5)
        # reference sums over the BATCH axis then means over features
        return jnp.mean(jnp.sqrt(jnp.sum(diff, axis=0)))

    @staticmethod
    def scores(x_rec: jax.Array, x_batch: jax.Array) -> jax.Array:
        return jnp.sqrt(jnp.sum(jnp.square(x_batch - x_rec), axis=1))


class AEGISMbOutput(NamedTuple):
    probs_all: jax.Array   # [2B] sigmoid disc over cat([z, z_noise]) —
    #                        BN stats over 2B (src/graphsage_aegis.py:315-320)
    prob_noise: jax.Array  # [B] sigmoid disc over z_noise alone

    @property
    def prob_real(self) -> jax.Array:
        """Real-half fake-probabilities (the anomaly score,
        ``src/utils.py:175-204``)."""
        return self.probs_all[: self.prob_noise.shape[0]]


class MiniBatchAEGIS(nn.Module):
    """Faithful to the reference's PyG-MLP discriminator: the dis loss
    and scores read ``disc(cat([z, z_noise]))`` (one forward, BN batch
    statistics over 2B rows) while the generator loss reads
    ``disc(z_noise)`` (separate forward) — ``src/graphsage_aegis.py:
    315-321``. Nothing is detached: the single shared optimizer
    backprops both losses through encoder and discriminator
    (``src/model_handler_aegis.py:159-161``)."""

    emb_dim: int = 64
    fanout: int = 16
    hid_dim: int = 64

    @nn.compact
    def __call__(self, feats: jax.Array, noise_table: jax.Array,
                 table: NeighborTable, batch: jax.Array) -> AEGISMbOutput:
        f = feats.shape[-1]
        w_enc = self.param("w_enc", xavier_uniform, (f, self.emb_dim),
                           jnp.float32)
        disc = MLP(self.hid_dim, 1, act="sigmoid", name="discriminator2")
        rng = self.make_rng("sample")
        n1, m1 = sample_neighbors(table, batch, self.fanout, rng)
        deg = jnp.sqrt(jnp.maximum(
            table.degrees_of(batch).astype(jnp.float32), 1.0))[:, None]
        agg_real = masked_mean(feats[n1], m1, axis=1) * deg
        agg_noise = masked_mean(noise_table[n1], m1, axis=1) * deg
        z = jax.nn.relu(agg_real @ w_enc)
        z_noise = jax.nn.relu(agg_noise @ w_enc)
        emb_all = jnp.concatenate([z, z_noise], axis=0)
        probs_all = jax.nn.sigmoid(disc(emb_all))[:, 0]
        p_noise = jax.nn.sigmoid(disc(z_noise))[:, 0]
        return AEGISMbOutput(probs_all, p_noise)


def aegis_mb_losses(out: AEGISMbOutput):
    """loss_dis = BCE(disc(cat), [0…0, 1…1]), loss_g = BCE(disc(z_noise),
    0) — torch ``F.binary_cross_entropy`` semantics
    (``src/graphsage_aegis.py:168-172``), neither detached."""
    from ggad_tpu.ops.bce import bce_probs

    b = out.prob_noise.shape[0]
    labels = jnp.concatenate([jnp.zeros(b), jnp.ones(b)])
    loss_dis = jnp.mean(bce_probs(out.probs_all, labels))
    loss_g = jnp.mean(bce_probs(out.prob_noise, 0.0))
    return loss_dis, loss_g
