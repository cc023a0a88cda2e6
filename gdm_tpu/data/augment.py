"""Photometric / background augmentation (host side, train only).

Reference behaviours re-implemented:
  * rgb_add_noise — HSV jitter, sharpen, motion blur, gaussian blur,
    gaussian noise (datasets/lm/linemod_pbr.py:269-333);
  * add_real_back — paste a random real frame's RGB-D background behind a
    synthetic object crop (datasets/ycbv/ycbv_pbr.py:352-387, applied at
    :468-475 for img_type 'synt').

These run inside loader workers on numpy arrays; they never touch the
accelerator.  Randomness comes from the caller's RandomState so samples
are reproducible given a seed (the reference uses the global np.random).
"""

from __future__ import annotations

import cv2
import numpy as np


def _rand_range(rng, lo, hi):
    return rng.rand() * (hi - lo) + lo


def _gaussian_noise(rng, img, sigma):
    return np.clip(
        img + rng.randn(*img.shape) * sigma, 0, 255).astype(np.uint8)


def _linear_motion_blur(img, angle_deg, length):
    rad = np.deg2rad(angle_deg)
    dx, dy = np.cos(rad), np.sin(rad)
    a = int(max(abs(dx), abs(dy)) * length * 2)
    if a <= 0:
        return img
    kern = np.zeros((a, a))
    c = a // 2
    cv2.line(kern, (c, c), (int(dx * length + c), int(dy * length + c)), 1.0)
    s = kern.sum()
    if s == 0:
        kern[c, c] = 1.0
    else:
        kern /= s
    return cv2.filter2D(img, -1, kern)


def rgb_add_noise(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Apply the reference's photometric augmentation chain to a uint8
    [h, w, 3] image (probabilities per linemod_pbr.py:297-333)."""
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.uint16)
    hsv[:, :, 1] = np.clip(hsv[:, :, 1] * _rand_range(rng, 1.25, 1.45),
                           0, 255)
    hsv[:, :, 2] = np.clip(hsv[:, :, 2] * _rand_range(rng, 1.15, 1.35),
                           0, 255)
    img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)

    if rng.rand() > 0.8:  # sharpen
        kernel = -np.ones((3, 3))
        kernel[1, 1] = rng.rand() * 3 + 9
        kernel /= kernel.sum()
        img = cv2.filter2D(img, -1, kernel)

    if rng.rand() > 0.8:  # motion blur
        img = _linear_motion_blur(
            img, int(rng.rand() * 360), int(rng.rand() * 15) + 1)

    if rng.rand() > 0.8:
        k = 3 if rng.rand() > 0.2 else 5
        img = cv2.GaussianBlur(img, (k, k), rng.rand())

    sigma = rng.randint(15) if rng.rand() > 0.2 else rng.randint(25)
    img = _gaussian_noise(rng, img, sigma)

    if rng.rand() > 0.8:
        img = img + rng.normal(0.0, 7.0, img.shape)

    return np.clip(img, 0, 255).astype(np.uint8)


def add_real_background(
    rgb: np.ndarray,
    labels: np.ndarray,
    dpt: np.ndarray,
    dpt_msk: np.ndarray,
    real_records,
    rng: np.random.RandomState,
    in_size: int,
    im_hw=(480, 640),
):
    """Composite a random real frame behind the object (ycbv_pbr.py:352-387).

    Args:
      rgb: [S, S, 3] uint8 synthetic crop.
      labels: [S, S] object mask of the crop (>0 = foreground).
      dpt: [S, S] float metres.
      dpt_msk: [S, S] valid-depth mask.
      real_records: list of bop.Record with real RGB-D frames.

    Returns (rgb, dpt) with background pixels replaced.
    """
    from gdm_tpu.data.imio import imread_mask, imread_rgb, imread_u16

    im_h, im_w = im_hw
    rnd_h = rng.randint(0, im_h - in_size - 1)
    rnd_w = rng.randint(0, im_w - in_size - 1)
    rec = real_records[rng.randint(0, len(real_records))]

    real_dpt = imread_u16(rec.depth_file) / 1000.0
    bk_label = imread_mask(rec.mask_file)
    bk_rgb = imread_rgb(rec.rgb_file)

    sl = np.s_[rnd_h:rnd_h + in_size, rnd_w:rnd_w + in_size]
    bk_clip = (bk_label[sl] < 255).astype(rgb.dtype)
    if bk_clip.ndim > 2:
        bk_clip = bk_clip[:, :, 0]
    back = bk_rgb[sl] * bk_clip[:, :, None]
    dpt_back = real_dpt[sl].astype(np.float32) * bk_clip.astype(np.float32)

    msk_back = (labels <= 0).astype(rgb.dtype)[:, :, None]
    rgb = rgb * (msk_back == 0).astype(rgb.dtype) + back * msk_back
    dpt = dpt * (dpt_msk > 0).astype(dpt.dtype) + \
        dpt_back * (dpt_msk <= 0).astype(dpt.dtype)
    return rgb, dpt


def fill_depth_fast(
    dpt_m: np.ndarray,
    max_depth: float = 3.0,
    blur: bool = True,
) -> np.ndarray:
    """Host morphological depth completion on a crop.

    cv2 port of ip_basic's fast fill (utils/ip_basic/ip_basic/
    depth_map_utils_ycb.py:67-130: invert, diamond dilate, close, fill
    small/large holes, blur, un-invert).  The JAX twin for on-device use is
    gdm_tpu.ops.depth_fill.fill_in_fast; this one runs in loader workers
    where no accelerator is available.
    """
    d = dpt_m.astype(np.float32).copy()
    valid = d > 0.1
    d[valid] = max_depth - d[valid]                       # invert

    diamond5 = cv2.getStructuringElement(cv2.MORPH_CROSS, (5, 5))
    d = cv2.dilate(d, diamond5)
    d = cv2.morphologyEx(d, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))

    empty = d < 0.1
    dilated = cv2.dilate(d, np.ones((7, 7), np.uint8))
    d[empty] = dilated[empty]

    if blur:
        valid = d > 0.1
        blurred = cv2.medianBlur(d, 5)
        d[valid] = blurred[valid]
        blurred = cv2.bilateralFilter(d, 5, 1.5, 2.0)
        d[valid] = blurred[valid]

    valid = d > 0.1
    d[valid] = max_depth - d[valid]                       # un-invert
    return d
