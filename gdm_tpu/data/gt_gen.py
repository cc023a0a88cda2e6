"""Ground-truth correspondence generation (host side).

Reference: datasets/lm/linemod_pbr.py:602-655 (get_pose_gt_info): hidden-
point-removal visibility of the mesh under the GT pose, nearest-neighbour
matching of foreground scene points to visible transformed vertices,
rejection of matches beyond `nn_dist_th`, and label refinement.

Kept on the host per SURVEY.md section 7 "hard parts" (convex hull is data
dependent); deterministic given its inputs.
"""

from __future__ import annotations

import numpy as np

from gdm_tpu import native
from gdm_tpu.ops.visibility import visible_points


def pose_visibility(pose: np.ndarray, mesh_pts: np.ndarray,
                    radius_param: float = 2.0) -> np.ndarray:
    """Visible-vertex flag [m] uint8 for a GT pose (HPR hull).

    Depends only on (pose, mesh_pts, radius_param) — NOT on the sampled
    scene points — so for a fixed annotation it is constant across
    epochs and cacheable (the convex hull is the dominant GT-gen host
    cost; see PoseDataset._visibility).  `radius_param` = the HPR flip
    exponent (data.hpr_radius_param; pi reproduces the reference's
    visible set, see ops/visibility.visible_points).
    """
    R, t = pose[:, :3], pose[:, 3:4]
    cam_center_model = -R.T @ t                       # inverse-pose origin
    vis_idx = visible_points(mesh_pts, cam_center_model.ravel(),
                             radius_param=radius_param)
    visible_flag = np.zeros(len(mesh_pts), np.uint8)
    visible_flag[vis_idx] = 1
    return visible_flag


def pose_gt_info(
    cld: np.ndarray,
    pt_labels: np.ndarray,
    pose: np.ndarray,
    mesh_pts: np.ndarray,
    nn_dist_th: float = 0.01,
    visible_flag: np.ndarray | None = None,
):
    """Compute correspondence GT for one sample.

    Args:
      cld: [n, 3] sampled scene points (camera frame, metres).
      pt_labels: [n] raw fg labels.
      pose: [3, 4] GT object pose.
      mesh_pts: [m, 3] object vertices (metres).
      nn_dist_th: outlier rejection distance (reference hardcodes 0.01 at
        linemod_pbr.py:641; ycbv_pbr.py:643 uses the config value).
      visible_flag: optional precomputed pose_visibility(pose, mesh_pts)
        array, or a zero-arg callable returning one (a cache lookup).
        Resolved only AFTER the empty-foreground check so invalid samples
        never pay the hull; computed here when None.

    Returns:
      (labels_refined [n], match_idx [n] with m = no-match,
       visible_flag [m] uint8, valid bool — the flag is all-zeros on the
       empty-foreground invalid path, matching the reference which fills
       it only after that check, linemod_pbr.py:612-631)
    """
    n, m = len(cld), len(mesh_pts)
    match_idx = np.full(n, m, np.int32)
    labels = pt_labels.copy()

    fg = pt_labels > 0
    obj_cld = cld[fg]
    if obj_cld.shape[0] == 0:
        return labels, match_idx, np.zeros(m, np.uint8), False

    if visible_flag is None:
        visible_flag = pose_visibility(pose, mesh_pts)
    elif callable(visible_flag):
        visible_flag = visible_flag()

    R, t = pose[:, :3], pose[:, 3:4]
    vis_idx = np.nonzero(visible_flag)[0]
    vis_proj = mesh_pts[vis_idx] @ R.T + t.T

    # radius-bounded NN (voxel grid, -1 = no match within nn_dist_th):
    # identical to knn(k=1) + dist>th rejection (linemod_pbr.py:636-646)
    # but skips the per-sample KD-tree — the dominant warm loader cost
    nn = native.radius_nn(vis_proj, obj_cld, nn_dist_th)
    bad = nn < 0
    if bad.all():
        return labels, match_idx, visible_flag, False
    matched = vis_idx[np.where(bad, 0, nn)].astype(np.int32)
    matched[bad] = m
    fg_idx = np.where(fg)[0]
    labels[fg_idx[bad]] = 0
    match_idx[fg] = matched
    return labels, match_idx, visible_flag, True
