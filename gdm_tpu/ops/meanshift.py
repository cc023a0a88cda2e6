"""Mean-shift mode seeking on device.

TPU-native replacement for the reference ``utils/meanshift_pytorch.py``
(MeanShiftTorch.fit / BatchMeanShiftTorch.fit, used by the legacy eval
helpers in utils/pvn3d_eval_utils_kpls.py to cluster per-point translation
votes).  Gaussian-kernel shift iterated a fixed number of times under
``lax.while_loop`` with the reference's convergence criterion
(max displacement < bandwidth * 1e-3, capped iterations), then the densest
shifted point is returned together with its in-bandwidth membership labels.

Supports a validity mask so padded points neither move the estimate nor win
the density vote — the fixed-shape formulation TPUs need.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_iter",))
def mean_shift(
    pts: jax.Array,
    bandwidth: float = 0.05,
    mask: jax.Array | None = None,
    max_iter: int = 50,
):
    """Find the densest mode of a point set.

    Args:
      pts: [n, c] points.
      bandwidth: gaussian kernel bandwidth (reference default 0.05).
      mask: optional [n] 0/1 validity.
      max_iter: iteration cap (reference uses 300; modes converge in
        far fewer, and the while_loop exits early on device).

    Returns:
      (center [c], labels [n] bool — in-bandwidth membership of the mode)
    """
    n = pts.shape[0]
    m = jnp.ones(n, jnp.float32) if mask is None else mask.astype(jnp.float32)
    stop = bandwidth * 1e-3
    inv2b2 = 0.5 / (bandwidth * bandwidth)

    def shift_once(A):
        d2 = jnp.sum(jnp.square(A[:, None, :] - pts[None, :, :]), axis=-1)
        w = jnp.exp(-d2 * inv2b2) * m[None, :]
        num = w @ pts
        den = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        return num / den

    def cond(state):
        _, moved, it = state
        return (moved > stop) & (it < max_iter)

    def body(state):
        A, _, it = state
        A2 = shift_once(A)
        moved = jnp.max(jnp.linalg.norm((A2 - A) * m[:, None], axis=1))
        return A2, moved, it + 1

    A, _, _ = jax.lax.while_loop(
        cond, body, (pts, jnp.float32(jnp.inf), jnp.int32(0)))

    # densest shifted point (masked)
    d = jnp.linalg.norm(A[:, None, :] - A[None, :, :], axis=-1)
    num_in = jnp.sum((d < bandwidth) * m[None, :], axis=1) * m
    best = jnp.argmax(num_in)
    center = A[best]
    labels = (jnp.linalg.norm(pts - center[None, :], axis=1) < bandwidth) & (
        m > 0)
    return center, labels
