"""Least-squares rigid-pose fitting (Kabsch / Umeyama without scale).

TPU-native replacement for the reference's host-side numpy SVD fit
(``best_fit_transform``, utils/pvn3d_eval_utils_kpls.py:43-76), which the
reference runs per frame on a thread pool (evaluator.py:294-303).  Here it is
a pure jnp function — vmap it over the batch and the whole eval step stays
on device.

The weighted variant supports the fixed-shape masking the TPU needs: instead
of slicing out the segmented foreground points (dynamic shape), pass all N
correspondences with weight 0/1.  Weighted Kabsch on the masked set is
mathematically identical to plain Kabsch on the subset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_kabsch(A: jax.Array, B: jax.Array, w: jax.Array) -> jax.Array:
    """Best-fit RT mapping points A -> B under nonnegative weights.

    Args:
      A: [n, 3] source points (model points in the pipeline).
      B: [n, 3] target points (camera-frame scene points).
      w: [n] weights; zero rows are ignored.

    Returns:
      [3, 4] transform [R | t] with det(R) = +1 (reflection corrected as in
      the reference at pvn3d_eval_utils_kpls.py:67-70).
    """
    # float32 matmul precision throughout: these are tiny [n,3] and [3,3]
    # contractions; the TPU's default bf16 MXU path costs ~0.1 deg of
    # rotation accuracy for zero speedup at this size.
    with jax.default_matmul_precision("float32"):
        w = w.astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1e-9)
        wn = (w / wsum)[:, None]
        ca = jnp.sum(A * wn, axis=0)
        cb = jnp.sum(B * wn, axis=0)
        AA = (A - ca) * jnp.sqrt(wn)
        BB = (B - cb) * jnp.sqrt(wn)
        H = jax.lax.dot_general(
            AA, BB, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [3, 3] = AA^T BB
        # Scale-normalise H before the SVD.  U/Vt are scale-invariant,
        # and the TPU's BATCHED (vmapped) SVD returns a grossly
        # non-orthonormal U for specific near-rank-1 matrices with
        # ~1e-19-magnitude entries — the exact H a degenerate
        # correspondence set produces (all points matched to one mesh
        # vertex, e.g. untrained features): measured U@U.T off identity
        # by 0.94 on v5e, while the same H normalised to O(1) is exact
        # to 1e-7 (2026-08-18; single-matrix SVD of the same H was fine
        # — only the batched path misbehaves).  The 1e-30 floor keeps
        # H=0 well-defined (SVD(0) = identity factors).
        H = H / jnp.maximum(jnp.max(jnp.abs(H)), 1e-30)
        U, _, Vt = jnp.linalg.svd(H, full_matrices=True)
        det = jnp.linalg.det(Vt.T @ U.T)
        sign = jnp.where(det < 0, -1.0, 1.0)
        d = jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * sign
        R = (Vt.T * d[None, :]) @ U.T
        t = cb - R @ ca
        return jnp.concatenate([R, t[:, None]], axis=1)


def kabsch(A: jax.Array, B: jax.Array) -> jax.Array:
    """Unweighted best-fit [R|t]; numerics match best_fit_transform."""
    return weighted_kabsch(A, B, jnp.ones(A.shape[0], jnp.float32))


def transform_pts(pts: jax.Array, RT: jax.Array) -> jax.Array:
    """Apply [3,4] transform to [n,3] points."""
    return pts @ RT[:, :3].T + RT[:, 3][None, :]
