"""Result-visualisation helpers: project points, draw overlays.

Capability parity with the reference's drawing utilities
(`utils/basic_utils.py:355-440`: ``project_p3d``, ``draw_p2ds``,
``draw_bbox``, ``paste_p2ds``, ``draw_p2ds_lb``), which its debug
scripts use to overlay predicted poses on the input RGB.  Host-side
numpy/cv2 by design — visualisation is an offline debugging aid, never
on the jit path.

Deviations from the reference:
- free functions instead of methods on a config-bound ``Basic_Utils``
  object, and ``K`` is always an explicit argument (the reference
  defaults it to a hardcoded YCB intrinsic matrix);
- inputs are never mutated (the reference's ``draw_p2ds``/``paste_p2ds``
  clip the caller's ``p2ds`` array in place);
- clipping is to ``w-1``/``h-1`` — the reference clips to ``w``/``h``,
  so a right/bottom-edge point indexes out of bounds in ``paste_p2ds``;
- ``draw_pose`` is new: one call projecting a model under an estimated
  pose onto the frame, the overlay the reference assembles by hand in
  `test_lm.py:78-84` (commented-out debug block).
"""

from __future__ import annotations

import numpy as np

# 22 visually-distinct colours, one per YCB-V object id (1-based); id 0 /
# background gets grey.  Same role as the reference's get_label_color.
_LABEL_COLORS = np.array(
    [
        (128, 128, 128), (255, 0, 0), (0, 255, 0), (0, 0, 255),
        (255, 255, 0), (255, 0, 255), (0, 255, 255), (128, 0, 0),
        (0, 128, 0), (0, 0, 128), (128, 128, 0), (128, 0, 128),
        (0, 128, 128), (255, 128, 0), (255, 0, 128), (128, 255, 0),
        (0, 255, 128), (128, 0, 255), (0, 128, 255), (255, 128, 128),
        (128, 255, 128), (128, 128, 255),
    ],
    dtype=np.uint8,
)


def label_color(label: int) -> tuple[int, int, int]:
    """RGB colour for an integer class label (wraps past the table)."""
    return tuple(int(c) for c in _LABEL_COLORS[label % len(_LABEL_COLORS)])


def project_p3d(p3d: np.ndarray, K: np.ndarray,
                cam_scale: float = 1.0) -> np.ndarray:
    """Project [N,3] camera-frame points to rounded [N,2] pixel coords.

    Mirrors `utils/basic_utils.py:355-364`: scale by ``cam_scale``,
    multiply by K, guard z < 1e-8 against division blow-up, round to int.
    """
    p3d = np.asarray(p3d, np.float64) * cam_scale
    p2d = p3d @ np.asarray(K, np.float64).T
    z = np.where(p2d[:, 2] < 1e-8, 1.0, p2d[:, 2])
    return np.around(p2d[:, :2] / z[:, None]).astype(np.int32)


def _clip_p2ds(p2ds: np.ndarray, h: int, w: int) -> np.ndarray:
    p2ds = np.asarray(p2ds, np.int32).copy()
    p2ds[:, 0] = np.clip(p2ds[:, 0], 0, w - 1)
    p2ds[:, 1] = np.clip(p2ds[:, 1], 0, h - 1)
    return p2ds


def draw_points(img: np.ndarray, p2ds: np.ndarray, r: int = 1,
                color=(255, 0, 0)) -> np.ndarray:
    """Stamp filled circles of radius ``r`` at [N,2] (x, y) pixel coords.

    ``color`` is one RGB tuple or a length-N sequence (reference
    `draw_p2ds`, `:370-383`).  Returns a new image.
    """
    import cv2

    img = np.ascontiguousarray(img).copy()
    p2ds = _clip_p2ds(p2ds, img.shape[0], img.shape[1])
    if isinstance(color, tuple):
        color = [color] * len(p2ds)
    elif len(color) != len(p2ds):
        color = [color[0]] * len(p2ds)
    for (x, y), c in zip(p2ds, color):
        cv2.circle(img, (int(x), int(y)), r, tuple(int(v) for v in c), -1)
    return img


def draw_points_label(img: np.ndarray, p2ds: np.ndarray,
                      labels: np.ndarray, r: int = 1) -> np.ndarray:
    """Per-point label-coloured variant (reference `draw_p2ds_lb`)."""
    return draw_points(img, p2ds, r,
                       [label_color(int(l)) for l in np.asarray(labels)])


def paste_points(img: np.ndarray, p2ds: np.ndarray,
                 color=(255, 0, 0)) -> np.ndarray:
    """Single-pixel scatter paste (reference `paste_p2ds`, `:407-416`)."""
    img = np.ascontiguousarray(img).copy()
    p2ds = _clip_p2ds(p2ds, img.shape[0], img.shape[1])
    if isinstance(color, tuple):
        col = np.broadcast_to(np.asarray(color, img.dtype), (len(p2ds), 3))
    else:
        col = np.asarray(color, img.dtype)
        if len(col) != len(p2ds):
            col = np.broadcast_to(col[0], (len(p2ds), 3))
    img[p2ds[:, 1], p2ds[:, 0]] = col
    return img


def draw_bbox_3d(img: np.ndarray, corners_2d: np.ndarray,
                 color=(255, 0, 0), thickness: int = 1) -> np.ndarray:
    """Wireframe of a projected 3-D box from its 8 corners.

    Corner order matches the reference's `draw_bbox` edge lists
    (`:385-405`): corners of an axis-aligned box enumerated as the
    binary expansion of (x±, y±, z±).
    """
    import cv2

    img = np.ascontiguousarray(img).copy()
    c = np.asarray(corners_2d, np.int32)
    loop1 = c[[0, 1, 3, 2, 0, 4, 6, 2]].reshape(-1, 1, 2)
    loop2 = c[[5, 4, 6, 7, 5, 1, 3, 7]].reshape(-1, 1, 2)
    col = tuple(int(v) for v in color)
    cv2.polylines(img, [loop1], True, col, thickness=thickness)
    cv2.polylines(img, [loop2], True, col, thickness=thickness)
    return img


def box_corners(pts: np.ndarray) -> np.ndarray:
    """[8,3] axis-aligned bounding-box corners of a model point cloud,
    ordered for :func:`draw_bbox_3d`."""
    lo, hi = np.min(pts, 0), np.max(pts, 0)
    return np.array([[x, y, z]
                     for x in (lo[0], hi[0])
                     for y in (lo[1], hi[1])
                     for z in (lo[2], hi[2])], np.float32)


def draw_pose(img: np.ndarray, model_pts: np.ndarray, R: np.ndarray,
              t: np.ndarray, K: np.ndarray, color=(0, 255, 0),
              r: int = 1, bbox: bool = True) -> np.ndarray:
    """Overlay a model under pose (R, t) onto the frame.

    Projects ``model_pts @ R.T + t`` (metres, camera frame) through K,
    scatters them in ``color`` and optionally adds the 3-D bounding-box
    wireframe — the standard qualitative pose-check figure.
    """
    cam = np.asarray(model_pts, np.float64) @ np.asarray(R, np.float64).T \
        + np.asarray(t, np.float64)
    img = paste_points(img, project_p3d(cam, K), color)
    if bbox:
        corners = box_corners(model_pts) @ np.asarray(R, np.float64).T \
            + np.asarray(t, np.float64)
        img = draw_bbox_3d(img, project_p3d(corners, K), color)
    return img
