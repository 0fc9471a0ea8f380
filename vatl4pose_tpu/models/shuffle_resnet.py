"""ShuffleResnet backbone — Flax linen, NHWC.

Parity: alphapose/models/layers/ShuffleResnet.py:19-200 — an SE-ResNet
variant whose strided Bottlenecks replace the stride-2 3x3 conv with
PixelUnshuffle(stride) (space-to-depth, lossless downsampling) followed by a
stride-1 3x3 conv; downsample shortcuts stay strided 1x1 convs; SE in the
downsampling block of each stage.  Available but unused by the shipped
configs (SURVEY §2.2) — capability parity.
"""

from __future__ import annotations

from flax import linen as nn

from .layers import (SELayer, max_pool_same_torch, pixel_unshuffle,
                     torch_batchnorm)
from .resnet import RESNET_SPECS


class ShuffleBottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    use_se: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(torch_batchnorm("bn1", not self.train)(out))
        if self.stride > 1:
            out = pixel_unshuffle(out, self.stride)   # planes*s² channels
            out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, name="conv2")(out)
        else:
            out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                          use_bias=False, name="conv2")(out)
        out = nn.relu(torch_batchnorm("bn2", not self.train)(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = torch_batchnorm("bn3", not self.train)(out)
        if self.use_se:
            out = SELayer(self.planes * 4, name="se")(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv")(x)
            identity = torch_batchnorm("downsample_bn",
                                       not self.train)(identity)
        return nn.relu(out + identity)


class ShuffleResnet(nn.Module):
    depth: int = 50
    train: bool = False

    @nn.compact
    def __call__(self, x):
        _, layers = RESNET_SPECS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(torch_batchnorm("bn1", not self.train)(x))
        x = max_pool_same_torch(x, 3, 2, 1)
        in_ch = 64
        for li, (p, n_blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                has_ds = (bi == 0) and (s != 1 or in_ch != p * 4)
                x = ShuffleBottleneck(p, s, has_ds, use_se=has_ds,
                                      train=self.train,
                                      name=f"layer{li + 1}_{bi}")(x)
                in_ch = p * 4
        return x
