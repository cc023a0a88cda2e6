"""Synthetic RGB-D sample generation for tests and benchmarks.

Renders a random colored blob object into a depth/rgb/mask frame by
z-buffer point splatting, then runs the *same* host pipeline as the real
readers (point sampling with wrap-pad+shuffle, GT correspondence
generation) so the end-to-end pose test exercises production code paths
with a known ground-truth pose.  No counterpart in the reference — it has
no test data generator (SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np

from gdm_tpu.data.gt_gen import pose_gt_info
from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD


def make_object(n_pts: int, rng: np.random.RandomState,
                radius: float = 0.05) -> np.ndarray:
    """Random star-shaped object as an fps-style [n, 9] array
    (xyz mm | rgb | normal) — the obj_XXXXXX_fps.npy layout."""
    dirs = rng.randn(n_pts, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bump = 1.0 + 0.3 * np.sin(5 * dirs[:, 0]) * np.cos(5 * dirs[:, 1])
    pts = dirs * (radius * bump[:, None])
    rgb = ((dirs + 1) * 127.5).clip(0, 255)
    nrm = dirs
    return np.concatenate(
        [pts * 1000.0, rgb, nrm], axis=1).astype(np.float32)


def render_sample(
    mesh_fps: np.ndarray,
    pose: np.ndarray,
    K: np.ndarray,
    im_size: int = 256,
    n_sample: int = 4096,
    bg_depth: float = 1.5,
    rng: np.random.RandomState | None = None,
    nn_dist_th: float = 0.01,
    splat: int = 2,
    render_pts: np.ndarray | None = None,
):
    """Render one training-style sample dict (host side).

    Args:
      mesh_fps: [m, 9] object (xyz mm | rgb | normal).
      pose: [3, 4] GT pose, camera frame, metres.
      K: [3, 3] intrinsics for the im_size crop.

    Returns:
      dict with rgb [S,S,3] (imagenet-normalised), cld_rgb_nrm [N,9],
      choose [N], xyz_img [S,S,3], labels [N], match_idx [N],
      visible_flag [m], RT [3,4] — the model input contract.
    """
    rng = rng or np.random.RandomState(0)
    m = mesh_fps.shape[0]
    pts = mesh_fps[:, :3] / 1000.0
    # rasterise a denser sampling of the same surface when provided (the
    # fps mesh is a sparse keypoint set; real depth images are dense)
    render = mesh_fps if render_pts is None else render_pts
    rpts = render[:, :3] / 1000.0
    colors = render[:, 3:6]

    cam_pts = rpts @ pose[:, :3].T + pose[:, 3][None, :]
    z = cam_pts[:, 2]
    u = (cam_pts[:, 0] * K[0, 0] / z + K[0, 2]).round().astype(int)
    v = (cam_pts[:, 1] * K[1, 1] / z + K[1, 2]).round().astype(int)

    depth = np.full((im_size, im_size), bg_depth, np.float32)
    rgb = np.full((im_size, im_size, 3), 128.0, np.float32)
    mask = np.zeros((im_size, im_size), np.uint8)
    order = np.argsort(-z)                                # far to near
    for du in range(splat):
        for dv in range(splat):
            uu = np.clip(u[order] + du, 0, im_size - 1)
            vv = np.clip(v[order] + dv, 0, im_size - 1)
            inside = (u[order] + du >= 0) & (u[order] + du < im_size) & \
                     (v[order] + dv >= 0) & (v[order] + dv < im_size)
            depth[vv[inside], uu[inside]] = z[order][inside]
            rgb[vv[inside], uu[inside]] = colors[order][inside]
            mask[vv[inside], uu[inside]] = 1

    # backproject full crop (host mirror of ops.backproject)
    vv_g, uu_g = np.mgrid[:im_size, :im_size].astype(np.float32)
    x = (uu_g - K[0, 2]) * depth / K[0, 0]
    y = (vv_g - K[1, 2]) * depth / K[1, 1]
    xyz_img = np.stack([x, y, depth], axis=-1).astype(np.float32)

    # normals: cheap cross-product for synthetic data
    gy, gx = np.gradient(depth)
    nrm_img = np.stack([-gx, -gy, -np.ones_like(depth)], axis=-1)
    nrm_img /= np.linalg.norm(nrm_img, axis=-1, keepdims=True)

    # sample points like linemod_pbr.py:476-503 (wrap-pad + shuffle)
    choose = np.nonzero((depth > 1e-6).ravel())[0]
    if len(choose) > n_sample:
        c_mask = np.zeros(len(choose), int)
        c_mask[:n_sample] = 1
        rng.shuffle(c_mask)
        choose = choose[c_mask.nonzero()[0]]
    else:
        choose = np.pad(choose, (0, n_sample - len(choose)), "wrap")
    rng.shuffle(choose)

    cld = xyz_img.reshape(-1, 3)[choose]
    rgb_n = ((rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).astype(
        np.float32)
    rgb_pt = rgb_n.reshape(-1, 3)[choose]
    nrm_pt = nrm_img.reshape(-1, 3)[choose]
    labels_pt = mask.ravel()[choose].astype(np.int32)

    labels, match_idx, visible_flag, valid = pose_gt_info(
        cld, labels_pt, pose, pts, nn_dist_th=nn_dist_th)

    return {
        "rgb": rgb_n.astype(np.float32),
        "cld_rgb_nrm": np.concatenate(
            [cld, rgb_pt, nrm_pt], axis=1).astype(np.float32),
        "choose": choose.astype(np.int32),
        "xyz_img": xyz_img,
        "labels": labels.astype(np.int32),
        "origin_labels": labels_pt,
        "match_idx": match_idx.astype(np.int32),
        "visible_flag": visible_flag,
        "RT": pose.astype(np.float32),
        "valid": valid,
    }


def make_batch(
    mesh_fps: np.ndarray,
    batch: int,
    K: np.ndarray,
    im_size: int = 256,
    n_sample: int = 4096,
    seed: int = 0,
    nn_dist_th: float = 0.01,
):
    """Stacked batch of synthetic samples with random poses.

    Returns (host_arrays dict, poses [B, 3, 4]).
    """
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(seed)
    # dense rasterisation set on the same analytic surface (make_object's
    # radius is a pure function of direction, so fresh directions sample
    # the same shape)
    radius = float(np.linalg.norm(mesh_fps[:, :3], axis=1).max()) / 1300.0
    render_pts = make_object(
        max(16 * mesh_fps.shape[0], 8192), rng, radius=radius)
    samples = []
    for i in range(batch):
        R = Rotation.random(random_state=seed * 1000 + i).as_matrix()
        t = np.array([rng.uniform(-0.03, 0.03), rng.uniform(-0.03, 0.03),
                      rng.uniform(0.35, 0.5)])
        pose = np.hstack([R, t[:, None]]).astype(np.float32)
        s = render_sample(mesh_fps, pose, K, im_size, n_sample, rng=rng,
                          nn_dist_th=nn_dist_th, render_pts=render_pts)
        samples.append(s)
    keys = [k for k in samples[0] if k != "valid"]
    batch_dict = {k: np.stack([s[k] for s in samples]) for k in keys}
    return batch_dict, batch_dict["RT"]
