"""Vectorized RANSAC pose fitting.

TPU-native replacement for the reference's sequential host loop
(``best_fit_transform_with_RANSAC``, utils/pvn3d_eval_utils_kpls.py:79-124:
20 iterations of 4-point resampling with early exit at 70% inliers).

Sequential early-exit loops are hostile to XLA; instead we draw all
hypotheses up front, fit them with a vmapped Kabsch (one batched 3x3 SVD),
score inliers in one [h, n] distance computation, pick the best hypothesis,
and refit on its inlier set with weighted Kabsch — the same "refit on
consensus" the reference performs when it exits early, but unconditional
and branch-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gdm_tpu.ops.kabsch import kabsch, weighted_kabsch, transform_pts


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_kabsch(
    A: jax.Array,
    B: jax.Array,
    w: jax.Array,
    key: jax.Array,
    n_hyp: int = 32,
    inlier_th: float = 0.015,
) -> jax.Array:
    """RANSAC rigid fit A -> B over weighted (maskable) correspondences.

    Args:
      A, B: [n, 3] corresponding point sets.
      w:    [n] validity weights in {0,1} (soft weights also work).
      key:  PRNG key for hypothesis sampling.
      n_hyp: number of 4-point hypotheses (reference: max_iter=20).
      inlier_th: inlier distance threshold in metres (reference match_err).

    Returns:
      [3, 4] pose.
    """
    n = A.shape[0]
    # Sample 4 indices per hypothesis, biased to valid rows via Gumbel-max
    # over log-weights (uniform over valid entries).
    logw = jnp.log(jnp.maximum(w, 1e-9))
    g = jax.random.gumbel(key, (n_hyp, n)) + logw[None, :]
    _, idx = jax.lax.top_k(g, 4)                          # [h, 4]

    def fit(one_idx):
        return kabsch(A[one_idx], B[one_idx])

    hyps = jax.vmap(fit)(idx)                             # [h, 3, 4]
    # include the all-inlier LS fit as hypothesis 0, like the reference's
    # initial curr_RT = best_fit_transform(A, B)
    hyps = jnp.concatenate(
        [weighted_kabsch(A, B, w)[None], hyps], axis=0)

    def score(RT):
        err = jnp.linalg.norm(transform_pts(A, RT) - B, axis=1)
        return jnp.sum((err <= inlier_th) * w)

    scores = jax.vmap(score)(hyps)
    best = hyps[jnp.argmax(scores)]
    err = jnp.linalg.norm(transform_pts(A, best) - B, axis=1)
    inl = (err <= inlier_th) * w
    # Refit on the consensus set; fall back to the best hypothesis when the
    # consensus is degenerate (<4 points).
    refit = weighted_kabsch(A, B, inl)
    return jnp.where(jnp.sum(inl) >= 4.0, refit, best)
