"""SimplePose (SimpleBaseline) — Flax linen, NHWC.

Parity: alphapose/models/simplepose.py:12-91 — ResNet backbone, three
(ConvTranspose 4x4/2 + BN + ReLU) deconv stages, 1x1 final conv to K joint
heatmaps; get_embedding = global-average-pooled 2048-d backbone feature.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchConvTranspose, torch_batchnorm
from .resnet import ResNet


class SimplePose(nn.Module):
    num_joints: int = 17
    num_layers: int = 50
    deconv_dim: Sequence[int] = (256, 256, 256)
    train: bool = False
    # serving-only: fused Pallas bottleneck chains in the backbone
    # (kernels/fused_bottleneck.py) — identical param tree, eval-BN folded
    fused_eval: bool = False

    def setup(self):
        self.preact = ResNet(depth=self.num_layers, train=self.train,
                             fused_eval=self.fused_eval)
        self.deconv1 = TorchConvTranspose(self.deconv_dim[0])
        self.bn_d1 = torch_batchnorm(None, not self.train)
        self.deconv2 = TorchConvTranspose(self.deconv_dim[1])
        self.bn_d2 = torch_batchnorm(None, not self.train)
        self.deconv3 = TorchConvTranspose(self.deconv_dim[2])
        self.bn_d3 = torch_batchnorm(None, not self.train)
        self.final_layer = nn.Conv(self.num_joints, (1, 1),
                                   kernel_init=nn.initializers.normal(0.001))

    def backbone(self, x):
        return self.preact(x)

    def head(self, feat):
        out = nn.relu(self.bn_d1(self.deconv1(feat)))
        out = nn.relu(self.bn_d2(self.deconv2(out)))
        out = nn.relu(self.bn_d3(self.deconv3(out)))
        return self.final_layer(out)

    def __call__(self, x, return_embedding: bool = False):
        """x: (N, H, W, 3) NHWC.  Returns heatmaps (N, h, w, K) NHWC
        (and the 2048-d GAP embedding when requested — one backbone pass
        serves both, unlike the reference's separate get_embedding call)."""
        feat = self.backbone(x)
        hm = self.head(feat)
        if return_embedding:
            return hm, jnp.mean(feat, axis=(1, 2))
        return hm

    def get_embedding(self, x):
        return jnp.mean(self.backbone(x), axis=(1, 2))
