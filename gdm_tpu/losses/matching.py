"""Dense correspondence matching loss (circle loss over scene x mesh).

Reference: models/geoMatch.py:55-157 (matching_loss, matching_loss_sys,
pointwise_feature_matching).  Fixed-shape re-design:

  * The reference loops over batch elements in python, dynamically slicing
    foreground rows (geoMatch.py:125-131).  Here the similarity matrix is
    computed for all N rows per element and invalid rows are masked — the
    whole loss is one vmap over the batch (4x faster than a lax.scan of
    per-element matmuls on TPU: one [B*N, C] x [C, M+1] MXU contraction
    instead of B serialized small ones).  `batch_chunk` bounds the [N, M]
    temporaries for very large B*N*M by scanning vmapped chunks.
  * Per-element losses are averaged only over elements with >= 3 foreground
    points, like the reference's `len(idxs) < 3: continue` skip.
  * The symmetric branch implements the *intent* of matching_loss_sys:
    positives at match_idx[i] and at sym_idx[match_idx[i]].  (The reference
    indexes the mesh symmetry table by scene-point index —
    geoMatch.py:93 `match_idx[sys_cor[idxs]]` — which conflates point and
    vertex index spaces; do not copy.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gdm_tpu.losses.circle import circle_loss
from gdm_tpu.ops.knn import pairwise_sqdist


def matching_positive_mask(
    match_idx: jax.Array,
    mesh_xyz: jax.Array,
    vis_flag: jax.Array,
    positive_r: float | jax.Array,
) -> jax.Array:
    """Positive-pair mask for one element (geoMatch.py:55-78).

    Args:
      match_idx: [n] int — matched mesh vertex per scene point, n_mesh for
        "no match".
      mesh_xyz:  [m, 3] mesh vertices (metres).
      vis_flag:  [m] 0/1 visibility of each vertex under the GT pose.
      positive_r: radius: vertices within it of the GT match are positives.

    Returns:
      [n, m + 1] bool; the last (padding) column is positive exactly for
      unmatched points.
    """
    n_mesh = mesh_xyz.shape[0]
    in_mesh = match_idx != n_mesh
    safe = jnp.clip(match_idx, 0, n_mesh - 1)
    gt_pt = jnp.take(mesh_xyz, safe, axis=0)              # [n, 3]
    d2 = pairwise_sqdist(gt_pt, mesh_xyz)                 # [n, m]
    near = d2 < jnp.square(positive_r)
    pos = near & (vis_flag > 0)[None, :] & in_mesh[:, None]
    pad = (~in_mesh)[:, None]
    return jnp.concatenate([pos, pad], axis=1)


def matching_positive_mask_depth_scaled(
    match_idx: jax.Array,
    mesh_xyz: jax.Array,
    vis_flag: jax.Array,
    RT: jax.Array,
    r_mm: float | jax.Array,
) -> jax.Array:
    """DGCNN-variant positive mask with depth-proportional radius.

    geoMatch_DGCNN.py:62-65: radius for mesh column j is
    (r_mm/1000) * z_j where z_j is the camera-frame depth of vertex j under
    the GT pose.
    """
    n_mesh = mesh_xyz.shape[0]
    in_mesh = match_idx != n_mesh
    safe = jnp.clip(match_idx, 0, n_mesh - 1)
    gt_pt = jnp.take(mesh_xyz, safe, axis=0)
    d2 = pairwise_sqdist(gt_pt, mesh_xyz)
    z = mesh_xyz @ RT[:, :3].T[:, 2:3] + RT[2, 3]         # [m, 1]
    radius = (r_mm / 1000.0) * z[:, 0]
    near = d2 < jnp.square(radius)[None, :]
    pos = near & (vis_flag > 0)[None, :] & in_mesh[:, None]
    pad = (~in_mesh)[:, None]
    return jnp.concatenate([pos, pad], axis=1)


def matching_positive_mask_sym(
    match_idx: jax.Array,
    sym_idx: jax.Array,
    n_mesh: int,
) -> jax.Array:
    """Symmetry-aware positive mask: the matched vertex and its symmetric
    counterpart (intent of geoMatch.py:86-100)."""
    in_mesh = match_idx != n_mesh
    safe = jnp.clip(match_idx, 0, n_mesh - 1)
    sym = jnp.take(sym_idx, safe)
    cols = jnp.arange(n_mesh + 1)[None, :]
    pos = (cols == safe[:, None]) | (cols == sym[:, None])
    pos = pos & in_mesh[:, None]
    pad = jnp.concatenate(
        [jnp.zeros((match_idx.shape[0], n_mesh), bool),
         (~in_mesh)[:, None]], axis=1)
    return pos | pad


def pointwise_matching_loss(
    rgbd_features: jax.Array,
    mesh_features: jax.Array,
    mesh_xyz: jax.Array,
    labels: jax.Array,
    match_idx: jax.Array,
    visible_flag: jax.Array,
    positive_r: float,
    sym_idx: jax.Array | None = None,
    m: float = 0.2,
    gamma: float = 16.0,
    pad_onehot: bool = False,
    rt: jax.Array | None = None,
    depth_scaled_r_mm: float | None = None,
    batch_chunk: int | None = None,
) -> jax.Array:
    """Batch matching loss (pointwise_feature_matching parity).

    Args:
      rgbd_features: [B, N, C] scene descriptors (pre-normalisation).
      mesh_features: [M, C] mesh descriptors.
      mesh_xyz:      [M, 3].
      labels:        [B, N] fg labels (row validity; the RandLA variant
        passes refined labels, the DGCNN variant origin labels).
      match_idx:     [B, N] GT correspondence (M = unmatched).
      visible_flag:  [B, M] per-element vertex visibility.
      positive_r:    neighbor_dis_th * diameter_m (geoMatch.py:24).
      sym_idx:       optional [M] symmetry table; switches to the
        symmetric-positive mask like geoMatch.py:138-141.
      pad_onehot:    pad column e0 instead of -1s (geoMatch_DGCNN.py:95-98).
      rt, depth_scaled_r_mm: enable the DGCNN depth-proportional radius
        (rt: [B, 3, 4] GT poses).
      batch_chunk:   elements held in memory at once (None = whole batch;
        peak temp is chunk * N * (M+1) floats x ~3).

    Returns:
      scalar: mean over valid elements of per-element masked row means.
    """
    n_mesh = mesh_features.shape[0]
    if pad_onehot:
        pad = jnp.zeros((1, mesh_features.shape[1]), mesh_features.dtype)
        pad = pad.at[0, 0].set(1.0)
    else:
        # pad column of -1s, then column-normalise (geoMatch.py:117-119)
        pad = -jnp.ones((1, mesh_features.shape[1]), mesh_features.dtype)
    mesh_padded = jnp.concatenate([mesh_features, pad], axis=0)
    mesh_padded = mesh_padded / jnp.maximum(
        jnp.linalg.norm(mesh_padded, axis=1, keepdims=True), 1e-12)

    if rt is None:
        rt = jnp.zeros((rgbd_features.shape[0], 3, 4), jnp.float32)

    def one_element(feats, lab, midx, vis, pose):
        f = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        sim = jax.lax.dot_general(
            f, mesh_padded, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [N, M+1]
        if sym_idx is not None:
            pos = matching_positive_mask_sym(midx, sym_idx, n_mesh)
        elif depth_scaled_r_mm is not None:
            pos = matching_positive_mask_depth_scaled(
                midx, mesh_xyz, vis, pose, depth_scaled_r_mm)
        else:
            pos = matching_positive_mask(midx, mesh_xyz, vis, positive_r)
        row_valid = (lab == 1)
        per_row = circle_loss(sim, pos, m=m, gamma=gamma, reduce=False)
        n_fg = jnp.sum(row_valid)
        elem_loss = jnp.sum(per_row * row_valid) / jnp.maximum(n_fg, 1)
        elem_w = (n_fg >= 3).astype(jnp.float32)
        return elem_loss, elem_w

    b = rgbd_features.shape[0]
    if batch_chunk is None or batch_chunk >= b:
        losses, ws = jax.vmap(one_element)(
            rgbd_features, labels, match_idx, visible_flag, rt)
    else:
        assert b % batch_chunk == 0, (b, batch_chunk)
        packed = [
            x.reshape(b // batch_chunk, batch_chunk, *x.shape[1:])
            for x in (rgbd_features, labels, match_idx, visible_flag, rt)]

        def step(carry, inp):
            return carry, jax.vmap(one_element)(*inp)

        _, (losses, ws) = jax.lax.scan(step, 0, tuple(packed))
        losses, ws = losses.ravel(), ws.ravel()
    return jnp.sum(losses * ws) / jnp.maximum(jnp.sum(ws), 1.0)
