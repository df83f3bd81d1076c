"""torch-faithful binary cross-entropy on PROBABILITIES.

``torch.nn.functional.binary_cross_entropy`` (used by the reference's
adversarial baselines: ``model_gaan.py:263-270``,
``model_AEGIS.py:223-225``) does NOT clip the input probabilities — it
clamps the elementwise LOG at -100:

    loss_i = -[ y_i · max(log p_i, -100) + (1-y_i) · max(log(1-p_i), -100) ]

Under discriminator saturation (p → 0 on a positive target) each
saturated element contributes 100, not ``-log(eps)`` of whatever clip a
re-implementation picked — an executed-oracle-caught divergence: a
1e-7 probability clip (log ≥ -16.1) underestimates the reference's GAAN
discriminator loss by 6× once saturated.

The backward pass replicates torch's closed form
``dL/dp = (p - y) / max(p(1-p), 1e-12)`` via a custom VJP — the naive
``grad(max(log p, -100))`` is NaN at p = 0 exactly (0 · ∞ through the
clamped branch), where torch returns the large-but-finite
``-1/1e-12``; downstream sigmoid derivatives then cancel it the same
way on both sides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_value(p, y):
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1p = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(y * logp + (1.0 - y) * log1p)


@jax.custom_vjp
def bce_probs(p: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Elementwise torch-semantics BCE on probabilities (no reduction).
    ``y`` is a constant target (no gradient is propagated to it)."""
    return _bce_value(p, y)


def _bce_fwd(p, y):
    return _bce_value(p, y), (p, y)


def _bce_bwd(res, g):
    p, y = res
    yb = jnp.broadcast_to(jnp.asarray(y, p.dtype), p.shape)
    # torch BCELoss backward: (p - y) / clamp(p(1-p), min=1e-12)
    dp = (p - yb) / jnp.maximum(p * (1.0 - p), 1e-12)
    return (g * dp, jnp.zeros_like(jnp.asarray(y, p.dtype)))


bce_probs.defvjp(_bce_fwd, _bce_bwd)
