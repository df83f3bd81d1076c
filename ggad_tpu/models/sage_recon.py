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
    prob_real: jax.Array
    prob_noise: jax.Array
    prob_noise_detached: jax.Array


class MiniBatchAEGIS(nn.Module):
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
        p_real = jax.nn.sigmoid(disc(z))[:, 0]
        p_noise = jax.nn.sigmoid(disc(z_noise))[:, 0]
        p_noise_det = jax.nn.sigmoid(
            disc(jax.lax.stop_gradient(z_noise)))[:, 0]
        return AEGISMbOutput(p_real, p_noise, p_noise_det)


def aegis_mb_losses(out: AEGISMbOutput):
    eps = 1e-7
    pr = jnp.clip(out.prob_real, eps, 1 - eps)
    pn = jnp.clip(out.prob_noise_detached, eps, 1 - eps)
    loss_dis = -(jnp.mean(jnp.log(1 - pr)) + jnp.mean(jnp.log(pn))) / 2
    png = jnp.clip(out.prob_noise, eps, 1 - eps)
    loss_g = -jnp.mean(jnp.log(1 - png))
    return loss_dis, loss_g
