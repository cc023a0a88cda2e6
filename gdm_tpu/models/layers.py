"""Shared flax building blocks.

Replaces the reference's ``models/pytorch_utils.py`` Seq/Conv1d/Conv2d/FC
helpers (and its BNMomentumScheduler at :486-507).  Differences by design:

* Batch norm takes its momentum as a *call argument* so the training loop
  can schedule it like the reference's BNMomentumScheduler without
  rebuilding modules.  Momentum follows the torch convention used by the
  reference: ``new_running = (1 - m) * old + m * batch`` with the schedule
  ``max(0.9 * 0.5**(it*bs/2e5), 0.01)`` (train_lm.py:448-451).
* Under jit + NamedSharding over a `data` mesh axis, batch statistics are
  computed over the *global* batch automatically (GSPMD inserts the
  cross-chip reductions), so SyncBatchNorm (train_lm.py:412) needs no
  special module here.
* 1x1 "convolutions" over points are plain Dense layers on channels-last
  tensors — exactly what the MXU wants.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BatchNorm(nn.Module):
    """Batch normalisation with torch-convention scheduled momentum.

    Normalises over all axes except the last (feature) axis.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(feat, jnp.float32))

        if train:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(
            x.dtype)
        return y.astype(self.dtype)


class ConvBNAct(nn.Module):
    """Conv (any spatial rank, NHWC/N..C) + BN + activation.

    Mirrors pytorch_utils._ConvBase semantics: bias is dropped when BN is
    on; default activation ReLU.
    """

    features: int
    kernel_size: Sequence[int] = (1, 1)
    strides: Sequence[int] | None = None
    bn: bool = True
    act: Callable | None = nn.relu
    bias: bool = True
    dilation: Sequence[int] | None = None
    padding: str | Sequence = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, momentum=0.1):
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            kernel_dilation=self.dilation,
            padding=self.padding,
            use_bias=self.bias and not self.bn,
            dtype=self.dtype,
        )(x)
        if self.bn:
            x = BatchNorm(dtype=self.dtype)(x, train, momentum)
        if self.act is not None:
            x = self.act(x)
        return x


class DenseBNAct(nn.Module):
    """Dense + BN + activation over channels-last point tensors.

    The TPU-native form of the reference's 1x1 Conv1d/Conv2d-over-points
    stacks (pytorch_utils.Seq.conv1d chains).
    """

    features: int
    bn: bool = True
    act: Callable | None = nn.relu
    bias: bool = True
    bn_eps: float = 1e-5   # RandLA blocks use the reference's 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, momentum=0.1):
        x = nn.Dense(
            self.features, use_bias=self.bias and not self.bn,
            dtype=self.dtype)(x)
        if self.bn:
            x = BatchNorm(epsilon=self.bn_eps,
                          dtype=self.dtype)(x, train, momentum)
        if self.act is not None:
            x = self.act(x)
        return x


class MLPHead(nn.Module):
    """A chain of DenseBNAct layers; final layer configurable.

    Replaces pt_utils.Seq(...).conv1d(...)... chains such as the seg head
    (models/geoMatch.py:34-40) and feature encoding head (:41-47).
    """

    widths: Sequence[int]
    final_act: Callable | None = None
    final_bn: bool = False
    final_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, momentum=0.1):
        for w in self.widths[:-1]:
            x = DenseBNAct(w, dtype=self.dtype)(x, train, momentum)
        x = DenseBNAct(
            self.widths[-1], bn=self.final_bn, act=self.final_act,
            bias=self.final_bias, dtype=self.dtype,
        )(x, train, momentum)
        return x


def leaky_relu02(x):
    """LeakyReLU(0.2) — the RandLA/DGCNN activation."""
    return nn.leaky_relu(x, negative_slope=0.2)


def gather_neighbours(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """[N, C] features gathered by [M, K] (or [M]) indices -> [M, K, C].

    The functional core of the reference's gather_neighbour
    (RandLANet.py:729-738) and random_sample/nearest_interpolation gathers
    (ffb6d.py:128-163) — a single take per call, vmapped over batch by the
    caller.
    """
    return jnp.take(feats, idx, axis=0)
