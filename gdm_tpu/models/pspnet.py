"""PSPNet pieces used by the FFB6D CNN branch (flax, NHWC).

Mirrors reference ``models/cnn/pspnet.py`` (PSPNet class — psp_models
instantiates PSPNet, not Modified_PSPNet, pspnet.py:140-144) with the
resnet18 config: psp_size=512, sizes=(1,2,3,6).

Faithful quirks preserved because trained checkpoints bake them in:
  * `cnn.final` is Conv2d(64,64,1) followed by nn.LogSoftmax() with no dim,
    which torch resolves to the channel dim for 4-D tensors
    (pspnet.py:108-112).  FFB6D applies this `final` both at 128x128
    (up-stage 2) and after up_3 at 256x256, with shared weights
    (ffb6d.py:76-81).
  * bilinear resizes use align_corners=True — implemented here as exact
    static interpolation matrices applied as matmuls (MXU-friendly, and
    bit-faithful to torch's align_corners semantics, which differ from
    jax.image.resize's half-pixel convention).
  * adaptive average pooling uses torch's uneven bin split
    floor(i*h/s) .. ceil((i+1)*h/s).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gdm_tpu.models.layers import BatchNorm


@functools.lru_cache(maxsize=None)
def _interp_matrix_ac(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix, align_corners=True."""
    M = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        M[:, 0] = 1.0
        return M
    if n_out == 1:
        M[0, 0] = 1.0
        return M
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        f = src - lo
        M[i, lo] += 1.0 - f
        M[i, hi] += f
    return M


def resize_bilinear_ac(x: jax.Array, out_hw) -> jax.Array:
    """align_corners=True bilinear resize of NHWC via two matmuls."""
    h_out, w_out = out_hw
    _, h_in, w_in, _ = x.shape
    Rh = jnp.asarray(_interp_matrix_ac(h_in, h_out), dtype=x.dtype)
    Rw = jnp.asarray(_interp_matrix_ac(w_in, w_out), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", Rh, x)
    return jnp.einsum("ow,bhwc->bhoc", Rw, x)


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] averaging matrix of torch AdaptiveAvgPool bins."""
    M = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)       # ceil
        M[i, lo:hi] = 1.0 / (hi - lo)
    return M


def adaptive_avg_pool(x: jax.Array, out_hw) -> jax.Array:
    """torch AdaptiveAvgPool2d on NHWC via two matmuls."""
    h_out, w_out = out_hw
    _, h_in, w_in, _ = x.shape
    Ph = jnp.asarray(_adaptive_pool_matrix(h_in, h_out))
    Pw = jnp.asarray(_adaptive_pool_matrix(w_in, w_out))
    x = jnp.einsum("oh,bhwc->bowc", Ph, x)
    return jnp.einsum("ow,bhwc->bhoc", Pw, x)


def channel_log_softmax(x: jax.Array) -> jax.Array:
    """torch nn.LogSoftmax() on 4-D input resolves to the channel dim."""
    return jax.nn.log_softmax(x, axis=-1)


class PReLU(nn.Module):
    """torch nn.PReLU(): single learned slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class PSPModule(nn.Module):
    """Pyramid scene parsing head (pspnet.py:7-31)."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        h, w = x.shape[1], x.shape[2]
        priors = []
        for s in self.sizes:
            p = adaptive_avg_pool(x, (s, s))
            p = nn.Conv(x.shape[-1], (1, 1), use_bias=False,
                        name=f"stage_{s}", dtype=self.dtype)(p)
            priors.append(resize_bilinear_ac(p, (h, w)))
        priors.append(x)
        y = nn.Conv(self.out_features, (1, 1), name="bottleneck",
                    dtype=self.dtype)(
            jnp.concatenate(priors, axis=-1))
        return nn.relu(y)


class PSPUpsample(nn.Module):
    """x2 bilinear upsample + conv3x3 + BN + PReLU (pspnet.py:34-45)."""

    features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        h, w = x.shape[1], x.shape[2]
        x = resize_bilinear_ac(x, (2 * h, 2 * w))
        x = nn.Conv(self.features, (3, 3), padding="SAME", name="conv",
                    dtype=self.dtype)(x)
        x = BatchNorm(name="bn", dtype=self.dtype)(x, train, momentum)
        return PReLU(name="prelu")(x)


class PSPNetFeats(nn.Module):
    """The PSPNet sub-modules FFB6D composes (not the full classifier).

    Exposes: feats (ResNetFeats), psp, up_1/up_2/up_3, final — matching
    the slicing in ffb6d.py:22-81.  Dropout2d placements follow
    ffb6d.py:36,77-78 (drop_1 after psp, drop_2 after up_1/up_2).
    """

    backend_layers: Sequence[int] = (2, 2, 2, 2)
    psp_out: int = 1024
    dtype: object = jnp.float32

    def setup(self):
        from gdm_tpu.models.resnet import ResNetFeats

        self.feats = ResNetFeats(self.backend_layers, name="feats",
                                 dtype=self.dtype)
        self.psp = PSPModule(self.psp_out, name="psp", dtype=self.dtype)
        self.up_1 = PSPUpsample(256, name="up_1", dtype=self.dtype)
        self.up_2 = PSPUpsample(64, name="up_2", dtype=self.dtype)
        self.up_3 = PSPUpsample(64, name="up_3", dtype=self.dtype)
        self.final_conv = nn.Conv(64, (1, 1), name="final_conv",
                                  dtype=self.dtype)

    def final(self, x):
        return channel_log_softmax(self.final_conv(x))
