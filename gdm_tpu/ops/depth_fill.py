"""Morphological depth hole-filling (ip_basic), fused on device.

TPU-native replacement for the reference's OpenCV pipeline
``utils/ip_basic/ip_basic/depth_map_utils_ycb.py`` (``fill_in_fast`` :67 and
``fill_in_multiscale`` :290), which the YCB-V dataset applies to every
cropped depth map on CPU (datasets/ycbv/ycbv_pbr.py:80-100,477).

Grayscale dilation becomes max-pooling over shifted copies (XLA fuses the
shifts), median blur a 25-way sort, and the bilateral filter an explicit
5x5 gated convolution.  Everything is static-shape and jit-compatible, so
the whole fill runs inside the preprocessing jit instead of per-frame host
code.  Semantics (thresholds, kernel shapes, step order, depth bins) mirror
the reference file exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel_offsets(kernel: np.ndarray):
    """(dy, dx) offsets of the nonzero entries of a structuring element."""
    r_y, r_x = kernel.shape[0] // 2, kernel.shape[1] // 2
    ys, xs = np.nonzero(kernel)
    return [(int(y) - r_y, int(x) - r_x) for y, x in zip(ys, xs)]


def _shift2d(img: jax.Array, dy: int, dx: int, fill: float) -> jax.Array:
    """Shift with constant fill (no wraparound)."""
    h, w = img.shape
    out = jnp.roll(img, (dy, dx), axis=(0, 1))
    if dy:
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        out = jnp.where((row - dy >= 0) & (row - dy < h), out, fill)
    if dx:
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out = jnp.where((col - dx >= 0) & (col - dx < w), out, fill)
    return out


def _dilate(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Grayscale dilation; cv2.dilate equivalent.

    All structuring elements used here contain the centre, so the output is
    always >= img and the -inf border fill never escapes.
    """
    parts = [_shift2d(img, dy, dx, -jnp.inf) for dy, dx in _kernel_offsets(kernel)]
    return jnp.max(jnp.stack(parts), axis=0)


def _erode(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    parts = [_shift2d(img, dy, dx, jnp.inf) for dy, dx in _kernel_offsets(kernel)]
    return jnp.min(jnp.stack(parts), axis=0)


def _close(img: jax.Array, kernel: np.ndarray) -> jax.Array:
    return _erode(_dilate(img, kernel), kernel)


def _median5(img: jax.Array) -> jax.Array:
    """5x5 median (cv2.medianBlur(k=5) equivalent, border replicate)."""
    h, w = img.shape
    row = jnp.clip(jax.lax.broadcasted_iota(jnp.int32, (h, w), 0), 0, h - 1)
    col = jnp.clip(jax.lax.broadcasted_iota(jnp.int32, (h, w), 1), 0, w - 1)
    parts = []
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            ys = jnp.clip(row + dy, 0, h - 1)
            xs = jnp.clip(col + dx, 0, w - 1)
            parts.append(img[ys, xs])
    stack = jnp.stack(parts, axis=-1)
    return jnp.sort(stack, axis=-1)[..., 12]


def _bilateral5(img: jax.Array, sigma_color: float, sigma_space: float) -> jax.Array:
    """5x5 bilateral filter (cv2.bilateralFilter(d=5) equivalent).

    Border is reflect-101 like cv2's BORDER_DEFAULT: a constant-0 border
    pulls the denominator up with near-zero-value taps and biased the
    2-px border ring by up to ~10% on flat depth."""
    h, wid = img.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h, wid), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, wid), 1)

    def _reflect101(p, n):
        p = jnp.abs(p)
        return jnp.where(p > n - 1, 2 * (n - 1) - p, p)

    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    inv2sc = 1.0 / (2.0 * sigma_color * sigma_color)
    inv2ss = 1.0 / (2.0 * sigma_space * sigma_space)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            nb = img[_reflect101(row + dy, h), _reflect101(col + dx, wid)]
            w_space = np.exp(-(dy * dy + dx * dx) * inv2ss)
            w = w_space * jnp.exp(-jnp.square(nb - img) * inv2sc)
            num = num + w * nb
            den = den + w
    return num / jnp.maximum(den, 1e-12)


FULL_KERNEL_5 = np.ones((5, 5), np.uint8)
FULL_KERNEL_7 = np.ones((7, 7), np.uint8)
FULL_KERNEL_9 = np.ones((9, 9), np.uint8)
CROSS_KERNEL_3 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
CROSS_KERNEL_5 = np.array(
    [[0, 0, 1, 0, 0]] * 2 + [[1] * 5] + [[0, 0, 1, 0, 0]] * 2, np.uint8)
CROSS_KERNEL_7 = np.array(
    [[0, 0, 0, 1, 0, 0, 0]] * 3 + [[1] * 7] + [[0, 0, 0, 1, 0, 0, 0]] * 3,
    np.uint8)
DIAMOND_KERNEL_5 = np.array(
    [[0, 0, 1, 0, 0], [0, 1, 1, 1, 0], [1, 1, 1, 1, 1],
     [0, 1, 1, 1, 0], [0, 0, 1, 0, 0]], np.uint8)


@functools.partial(jax.jit, static_argnames=("max_depth", "blur_type"))
def fill_in_fast(depth: jax.Array, max_depth: float = 100.0,
                 blur_type: str = "bilateral") -> jax.Array:
    """ip_basic fill_in_fast (depth_map_utils_ycb.py:67-126), no extrapolate."""
    valid = depth > 0.1
    d = jnp.where(valid, max_depth - depth, depth)
    d = jnp.maximum(_dilate(d, DIAMOND_KERNEL_5), 0.0)
    d = jnp.maximum(_close(d, FULL_KERNEL_5), 0.0)
    dil = jnp.maximum(_dilate(d, FULL_KERNEL_7), 0.0)
    d = jnp.where(d < 0.1, dil, d)
    d = _median5(d)
    if blur_type == "bilateral":
        d = _bilateral5(d, 1.5, 2.0)
    else:
        raise NotImplementedError(blur_type)
    return jnp.where(d > 0.1, max_depth - d, d)


@functools.partial(jax.jit, static_argnames=("max_depth", "blur_type"))
def fill_in_multiscale(depth: jax.Array, max_depth: float = 3.0,
                       blur_type: str = "bilateral") -> jax.Array:
    """ip_basic fill_in_multiscale (depth_map_utils_ycb.py:290-421).

    Depth bins (near <=1m, med 1-2m, far >2m) and the YCB max_depth=3.0
    match the reference call at datasets/lm/linemod_pbr.py:77-82.
    extrapolate=False path only (the reference never passes True).
    """
    d_in = depth.astype(jnp.float32)
    near = (d_in > 0.01) & (d_in <= 1.0)
    med = (d_in > 1.0) & (d_in <= 2.0)
    far = d_in > 2.0

    s1 = jnp.where(d_in > 0.01, max_depth - d_in, d_in)

    dil_far = jnp.maximum(_dilate(s1 * far, CROSS_KERNEL_3), 0.0)
    dil_med = jnp.maximum(_dilate(s1 * med, CROSS_KERNEL_5), 0.0)
    dil_near = jnp.maximum(_dilate(s1 * near, CROSS_KERNEL_7), 0.0)

    s2 = s1
    s2 = jnp.where(dil_far > 0.01, dil_far, s2)
    s2 = jnp.where(dil_med > 0.01, dil_med, s2)
    s2 = jnp.where(dil_near > 0.01, dil_near, s2)

    s3 = jnp.maximum(_close(s2, FULL_KERNEL_5), 0.0)
    s4 = jnp.where(s3 > 0.01, _median5(s3), s3)

    # top mask: pixels above the first valid pixel in each column are frozen
    h = s4.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, s4.shape, 0)
    first_valid = jnp.argmax(s4 > 0.01, axis=0)[None, :]
    top_mask = row >= first_valid
    empty = (~(s4 > 0.01)) & top_mask
    s5 = jnp.where(empty, jnp.maximum(_dilate(s4, FULL_KERNEL_9), 0.0), s4)

    first_valid5 = jnp.argmax(s5 > 0.01, axis=0)[None, :]
    top_mask = row >= first_valid5

    s7 = s5
    for _ in range(6):
        empty = (s7 < 0.01) & top_mask
        s7 = jnp.where(empty, jnp.maximum(_dilate(s7, FULL_KERNEL_5), 0.0), s7)

    valid = (s7 > 0.01) & top_mask
    s7 = jnp.where(valid, _median5(s7), s7)
    if blur_type == "bilateral":
        s7 = jnp.where(valid, _bilateral5(s7, 0.5, 2.0), s7)
    elif blur_type == "gaussian":
        g = _bilateral5(s7, 1e9, 1.1)  # ~gaussian when color sigma -> inf
        s7 = jnp.where((s7 > 0.01) & top_mask, g, s7)

    return jnp.where(s7 > 0.01, max_depth - s7, s7)
