"""Masked circle loss over the scene x mesh similarity matrix.

Reference: models/loss.py:433-494 (CircleLoss, gamma=16, margin m=0.2 at
geoMatch.py:27,81).  Formulation per row (one scene point, columns = mesh
vertices + padding column):

    ap      = stop_grad(relu(1 + m - sim)) on positive entries
    an      = stop_grad(relu(sim + m))     on negative entries
    logit_p = -ap * (sim - (1 - m)) * gamma
    logit_n =  an * (sim - m) * gamma
    loss    = softplus(mLSE_pos(logit_p) + mLSE_neg(logit_n))

The reference evaluates this only on dynamically-selected foreground rows
(geoMatch.py:127-131); TPU-side we evaluate all rows at fixed shape and
take a masked mean over valid rows — identical value, no host round trip,
and it vmaps over the batch instead of the reference's python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_logsumexp(logits: jax.Array, mask: jax.Array,
                     axis: int = -1) -> jax.Array:
    """log(sum(exp(logits) * mask)) — numerically stable, finite even for
    empty masks (those rows must be excluded by the caller)."""
    mask = mask.astype(jnp.bool_)
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    masked = jnp.where(mask, logits, neg_inf)
    mx = jnp.max(masked, axis=axis, keepdims=True)
    mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
    s = jnp.sum(jnp.where(mask, jnp.exp(logits - mx_safe), 0.0), axis=axis)
    return jnp.squeeze(mx_safe, axis) + jnp.log(jnp.maximum(s, 1e-30))


def circle_loss(
    sim: jax.Array,
    pos_mask: jax.Array,
    row_valid: jax.Array | None = None,
    m: float = 0.2,
    gamma: float = 16.0,
    reduce: bool = True,
) -> jax.Array:
    """Masked circle loss.

    Args:
      sim: [..., n_rows, n_cols] cosine similarities.
      pos_mask: same shape, bool — positive columns per row; negatives are
        the complement.
      row_valid: optional [..., n_rows] weights; invalid rows excluded
        from the mean.
      m, gamma: margin and scale (reference: 0.2, 16).
      reduce: if False, return the per-row [..., n_rows] softplus terms
        (callers wanting the reference's per-sample-then-batch mean
        weighting reduce themselves).

    Returns:
      scalar masked mean of per-row softplus terms (or per-row terms).
    """
    pos = pos_mask.astype(jnp.bool_)
    neg = ~pos
    ap = jax.lax.stop_gradient(jnp.maximum(1.0 + m - sim, 0.0))
    an = jax.lax.stop_gradient(jnp.maximum(sim + m, 0.0))
    logit_p = -ap * (sim - (1.0 - m)) * gamma
    logit_n = an * (sim - m) * gamma
    lse_p = masked_logsumexp(logit_p, pos)
    lse_n = masked_logsumexp(logit_n, neg)
    per_row = jax.nn.softplus(lse_p + lse_n)
    if not reduce:
        return per_row
    if row_valid is None:
        return jnp.mean(per_row)
    w = row_valid.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
