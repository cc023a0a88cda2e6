"""Visualisation helpers (gdm_tpu/utils/viz.py) — pure host numpy/cv2.

Mirrors the reference's drawing surface (utils/basic_utils.py:355-440).
"""

import numpy as np

from gdm_tpu.utils import viz


def _K():
    return np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]],
                    np.float32)


def test_project_p3d_pinhole():
    # a point on the optical axis lands on the principal point; one metre
    # right at z=1 lands fx pixels right of it
    pts = np.array([[0, 0, 1.0], [0.1, 0, 1.0], [0, -0.05, 0.5]])
    p2d = viz.project_p3d(pts, _K())
    np.testing.assert_array_equal(p2d[0], [32, 32])
    np.testing.assert_array_equal(p2d[1], [42, 32])
    np.testing.assert_array_equal(p2d[2], [32, 22])
    # cam_scale multiplies xyz jointly => projection is scale-invariant
    np.testing.assert_array_equal(viz.project_p3d(pts, _K(), 1000.0), p2d)


def test_project_p3d_z_guard():
    # z below 1e-8 is replaced by 1.0 instead of dividing by ~0
    p2d = viz.project_p3d(np.array([[2.0, 3.0, 0.0]]), _K())
    assert np.all(np.abs(p2d) < 1e4)


def test_draw_and_paste_points():
    img = np.zeros((64, 64, 3), np.uint8)
    p2ds = np.array([[10, 20], [63, 63], [-5, 70]])  # incl. out-of-frame
    out = viz.draw_points(img, p2ds, r=1, color=(255, 0, 0))
    assert out.shape == img.shape and img.sum() == 0  # input not mutated
    assert tuple(out[20, 10]) == (255, 0, 0)
    pasted = viz.paste_points(img, p2ds, color=(0, 128, 0))
    assert tuple(pasted[20, 10]) == (0, 128, 0)
    assert tuple(pasted[63, 63]) == (0, 128, 0)   # edge point clipped in
    assert tuple(pasted[63, 0]) == (0, 128, 0)    # out-of-frame clipped
    # per-point colours
    multi = viz.paste_points(img, p2ds[:2], color=[(1, 2, 3), (4, 5, 6)])
    assert tuple(multi[20, 10]) == (1, 2, 3)
    assert tuple(multi[63, 63]) == (4, 5, 6)


def test_draw_points_label_uses_label_colors():
    img = np.zeros((32, 32, 3), np.uint8)
    out = viz.draw_points_label(img, np.array([[5, 5], [10, 10]]),
                                np.array([1, 2]), r=0)
    assert tuple(out[5, 5]) == viz.label_color(1)
    assert tuple(out[10, 10]) == viz.label_color(2)


def test_draw_pose_overlay_lands_on_projection():
    # a small model at z=1: overlay pixels appear where projection says
    rng = np.random.RandomState(0)
    model = (rng.rand(50, 3).astype(np.float32) - 0.5) * 0.1
    R, t = np.eye(3), np.array([0, 0, 1.0])
    img = np.zeros((64, 64, 3), np.uint8)
    out = viz.draw_pose(img, model, R, t, _K(), color=(0, 255, 0))
    p2d = viz.project_p3d(model @ R.T + t, _K())
    assert tuple(out[p2d[0, 1], p2d[0, 0]]) == (0, 255, 0)
    assert out.sum() > 0
    # bbox wireframe adds pixels beyond the scatter
    no_box = viz.draw_pose(img, model, R, t, _K(), bbox=False)
    assert (out > 0).sum() > (no_box > 0).sum()


def test_box_corners_ordering_matches_bbox_edges():
    pts = np.array([[0, 0, 0], [1, 2, 3.0]], np.float32)
    c = viz.box_corners(pts)
    assert c.shape == (8, 3)
    # binary (x,y,z) enumeration: corner 0 = lo, corner 7 = hi
    np.testing.assert_array_equal(c[0], [0, 0, 0])
    np.testing.assert_array_equal(c[7], [1, 2, 3])
    img = viz.draw_bbox_3d(np.zeros((64, 64, 3), np.uint8),
                           viz.project_p3d(c + [0, 0, 2], _K()))
    assert img.sum() > 0
