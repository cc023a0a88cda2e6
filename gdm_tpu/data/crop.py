"""CenterNet-style affine crop (host side, cv2).

Reference: utils/dataset_utils.py:108-187 (crop_resize_by_warp_affine /
get_affine_transform).  For rot=0 and square scale — the only way the
pipeline calls it (linemod_pbr.py:468-473) — the transform is a pure
scale+translate mapping the square window [center - s/2, center + s/2]
onto the output crop.
"""

from __future__ import annotations

import cv2
import numpy as np


def get_affine_transform(center, scale, rot, output_size,
                         shift=(0.0, 0.0), inv: bool = False) -> np.ndarray:
    center = np.asarray(center, np.float32)
    if np.isscalar(scale):
        scale = np.array([scale, scale], np.float32)
    else:
        scale = np.asarray(scale, np.float32)
    if np.isscalar(output_size):
        output_size = (output_size, output_size)
    shift = np.asarray(shift, np.float32)

    src_w = scale[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn,
                        0 * sn + (-0.5 * src_w) * cs], np.float32)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale * shift
    src[1] = center + src_dir + scale * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


def crop_resize_by_warp_affine(img, center, scale, output_size, rot=0,
                               interpolation=cv2.INTER_LINEAR):
    if np.isscalar(output_size):
        output_size = (output_size, output_size)
    trans = get_affine_transform(center, scale, rot, output_size)
    return cv2.warpAffine(
        img, trans, (int(output_size[0]), int(output_size[1])),
        flags=interpolation)


def crop_affine_matrix(center, scale, output_size) -> np.ndarray:
    """The rot=0 crop transform as a 3x3 homogeneous matrix, suitable for
    adjusting camera intrinsics: K_crop = crop_affine_matrix(...) @ K."""
    A = np.eye(3, dtype=np.float32)
    A[:2] = get_affine_transform(center, scale, 0, output_size)
    return A
