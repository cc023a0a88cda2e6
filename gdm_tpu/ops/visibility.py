"""Hidden-point-removal visibility (Katz spherical flip + convex hull).

Host-side replacement for reference ``utils/compute_visibility.py``
(sphericalFlip :25, convexHull :41, VisiblePoints :128-134).  This runs only
during ground-truth correspondence generation inside the input pipeline
(linemod_pbr.py:633), is inherently data-dependent (hull size varies), and
is therefore kept on the host per SURVEY.md section 7 "hard parts".
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import ConvexHull


def spherical_flip(points: np.ndarray, center: np.ndarray, radius_param: float):
    """Katz et al. spherical flip of `points` around camera `center`."""
    pts = points - center.reshape(1, 3)
    norm = np.linalg.norm(pts, axis=1, keepdims=True)
    radius = np.max(norm) * (10.0 ** radius_param)
    return pts + 2.0 * (radius - norm) * pts / np.maximum(norm, 1e-12)


def visible_points(
    points: np.ndarray, cam_center: np.ndarray, radius_param: float = 2.0
) -> np.ndarray:
    """Indices of mesh vertices visible from the camera centre.

    Mirrors VisiblePoints(model_pts, inv_t.T) at linemod_pbr.py:633: the
    camera centre is the model-frame camera position (inverse pose
    translation); flipped cloud + origin -> convex hull; hull vertices that
    are original points are visible.

    Deliberate deviations from the reference:
      * compute_visibility.py:131 uses param=pi, i.e. a flip radius of
        10**pi * max_norm.  At that scale qhull's fixed precision marks
        large parts of self-occluded geometry visible (measured: ~50% of a
        sphere's back cap).  param=2.0 is numerically robust and yields the
        geometrically correct visible set; pass pi to reproduce the
        reference's artifacts bit-for-bit if needed.
      * the reference drops `hull.vertices[-1]` assuming the appended
        origin is listed last — qhull does not guarantee that; we filter
        by index instead.
    """
    flipped = spherical_flip(points, np.asarray(cam_center).reshape(3),
                             radius_param)
    cloud = np.concatenate([flipped, np.zeros((1, 3))], axis=0)
    hull = ConvexHull(cloud)
    idx = np.unique(hull.vertices)
    return idx[idx < points.shape[0]]
