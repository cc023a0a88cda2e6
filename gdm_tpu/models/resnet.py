"""ResNet feature extractor (flax, NHWC).

Mirrors reference ``models/cnn/extractors.py`` resnet18/34 as *actually
executed*, not as advertised: `_make_layer` passes `self.current_dilation`
to blocks (extractors.py:173) and with the default output_stride=32 that
value never leaves 1 — the `dilation=2/4` arguments at :133-134 are dead.
Layers 3 and 4 therefore run stride-1, dilation-1, giving feature stride 8.
We reproduce that exact topology for checkpoint parity.

Returns (x32s, x_3): layer4 and layer3 outputs (extractors.py:200).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from gdm_tpu.models.layers import BatchNorm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        residual = x
        # explicit (1,1) padding: torch Conv2d(3x3, padding=1) pads both
        # sides; XLA "SAME" at stride 2 pads (0,1), which shifts the
        # sampling grid and breaks checkpoint parity in layer2
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        y = BatchNorm(name="bn1", dtype=self.dtype)(y, train, momentum)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2", dtype=self.dtype)(y)
        y = BatchNorm(name="bn2", dtype=self.dtype)(y, train, momentum)
        if self.use_downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
                dtype=self.dtype)(x)
            residual = BatchNorm(name="downsample_bn",
                                 dtype=self.dtype)(residual, train,
                                                   momentum)
        return nn.relu(y + residual)


class ResNetFeats(nn.Module):
    """ResNet18/34 trunk exposing the stage outputs FFB6D consumes.

    Stages (all NHWC, input [B, 256, 256, 3] in the default config):
      stem:   conv7x7 s2 + bn + relu       -> [B, 128, 128, 64]
      pool:   maxpool 3x3 s2               -> [B, 64, 64, 64]
      layer1: 64, s1                       -> [B, 64, 64, 64]
      layer2: 128, s2                      -> [B, 32, 32, 128]
      layer3: 256, s1 (see module doc)     -> [B, 32, 32, 256]
      layer4: 512, s1                      -> [B, 32, 32, 512]
    """

    layers: Sequence[int] = (2, 2, 2, 2)   # resnet18; (3,4,6,3) = resnet34
    dtype: object = jnp.float32

    def setup(self):
        self.stem_conv = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                                 use_bias=False, name="conv1",
                                 dtype=self.dtype)
        self.stem_bn = BatchNorm(name="bn1", dtype=self.dtype)
        planes = (64, 128, 256, 512)
        strides = (1, 2, 1, 1)
        blocks = []
        in_planes = 64
        for li, (p, s, n) in enumerate(zip(planes, strides, self.layers)):
            stage = []
            for bi in range(n):
                stride = s if bi == 0 else 1
                ds = bi == 0 and (stride != 1 or in_planes != p)
                stage.append(BasicBlock(p, stride, ds, dtype=self.dtype,
                                        name=f"layer{li + 1}_{bi}"))
                in_planes = p
            blocks.append(stage)
        self.stages = blocks

    def stem(self, x, train: bool, momentum=0.1):
        x = self.stem_conv(x)
        x = self.stem_bn(x, train, momentum)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x

    def stage(self, i: int, x, train: bool, momentum=0.1):
        for block in self.stages[i]:
            x = block(x, train, momentum)
        return x

    def __call__(self, x, train: bool = False, momentum=0.1):
        x = self.stem(x, train, momentum)
        x = self.stage(0, x, train, momentum)
        x = self.stage(1, x, train, momentum)
        x_3 = self.stage(2, x, train, momentum)
        x32s = self.stage(3, x_3, train, momentum)
        return x32s, x_3
