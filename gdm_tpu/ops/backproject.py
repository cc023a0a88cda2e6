"""Depth-map -> organized point cloud backprojection.

TPU-native replacement for the reference's per-frame numpy loop
(datasets/lm/linemod_pbr.py:398-411 ``dpt_2_pcld``).  Note the reference
swaps the usual x/y convention: its "row" channel uses (ymap - cx)/fx and
"col" uses (xmap - cy)/fy where ymap varies along image *columns* and xmap
along rows — i.e. channel0 = (u - cx) z / fx, channel1 = (v - cy) z / fy with
u the column index and v the row index.  We reproduce exactly that layout so
descriptors and GT correspondences agree with reference checkpoints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def depth_to_xyz(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Backproject a depth map to camera-frame xyz.

    Args:
      depth: [h, w] metric depth (0 where invalid).
      K:     [3, 3] camera intrinsics.

    Returns:
      [h, w, 3] xyz; rows with invalid depth are all-zero, matching
      linemod_pbr.py:404-410 (msk multiply).
    """
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)   # row index
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)   # col index
    z = depth.astype(jnp.float32)
    msk = (z > 1e-8).astype(jnp.float32)
    # Reference convention (linemod_pbr.py:405-406): xmap==col idx broadcast
    # over rows is the iota along axis=1; ymap is the iota along axis=0... in
    # the reference, xmap[j][i]=j (row), ymap[j][i]=i (col).  row-ch uses
    # (ymap - K[0,2])*z/K[0,0]; col-ch uses (xmap - K[1,2])*z/K[1,1].
    x = (u - K[0, 2]) * z / K[0, 0]
    y = (v - K[1, 2]) * z / K[1, 1]
    xyz = jnp.stack([x, y, z], axis=-1)
    return xyz * msk[..., None]


def project_xyz(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Project camera-frame points [n,3] to pixel coords [n,2] (u, v)."""
    z = jnp.maximum(pts[:, 2:3], 1e-9)
    u = pts[:, 0:1] * K[0, 0] / z + K[0, 2]
    v = pts[:, 1:2] * K[1, 1] / z + K[1, 2]
    return jnp.concatenate([u, v], axis=1)
