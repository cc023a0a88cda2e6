"""Focal loss for foreground segmentation.

Reference: models/loss.py:15-46 (FocalLoss, gamma=2, no alpha in the
geoMatch config — models/geoMatch.py:29).  Fixed-shape masked mean instead
of the reference's flatten-and-gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    gamma: float = 2.0,
    weight: jax.Array | None = None,
) -> jax.Array:
    """Mean focal loss.

    Args:
      logits: [..., n_cls].
      targets: [...] int class ids.
      gamma: focusing exponent.
      weight: optional [...] per-element weights (masked mean).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(
        logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    loss = -((1.0 - pt) ** gamma) * logpt
    if weight is None:
        return jnp.mean(loss)
    w = weight.astype(loss.dtype)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)
