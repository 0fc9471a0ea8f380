"""FastPose — Flax linen, NHWC.

Parity: alphapose/models/fastpose.py:14-73 — SE-ResNet backbone →
PixelShuffle(2) → DUC(512→1024) → DUC(256→512 or 1024 for conv_dim 256) →
3x3 conv to K heatmaps; optional DCN stages; get_embedding like SimplePose.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import DUC, pixel_shuffle
from .resnet import ResNet


class FastPose(nn.Module):
    num_joints: int = 17
    num_layers: int = 50
    conv_dim: int = 128
    train: bool = False
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    # serving-only folded-BN stage tails (SE applies only to each stage's
    # downsampling block, so the fused tails are plain bottlenecks here too)
    fused_eval: bool = False

    def setup(self):
        self.preact = ResNet(depth=self.num_layers, train=self.train,
                             use_se=True, dcn=self.dcn,
                             stage_with_dcn=tuple(self.stage_with_dcn),
                             fused_eval=self.fused_eval)
        self.duc1 = DUC(1024, 2, self.train)
        duc2_planes = 1024 if self.conv_dim == 256 else 512
        self.duc2 = DUC(duc2_planes, 2, self.train)
        self.conv_out = nn.Conv(self.num_joints, (3, 3),
                                padding=((1, 1), (1, 1)),
                                kernel_init=nn.initializers.normal(0.001))

    def backbone(self, x):
        return self.preact(x)

    def head(self, feat):
        out = pixel_shuffle(feat, 2)       # 2048 -> 512 ch, 2x upsample
        out = self.duc1(out)               # -> 256 ch, 2x
        out = self.duc2(out)               # -> conv_dim ch, 2x
        return self.conv_out(out)

    def __call__(self, x, return_embedding: bool = False):
        feat = self.backbone(x)
        hm = self.head(feat)
        if return_embedding:
            return hm, jnp.mean(feat, axis=(1, 2))
        return hm

    def get_embedding(self, x):
        return jnp.mean(self.backbone(x), axis=(1, 2))
