"""ResNet backbones (Flax linen, NHWC), torchvision-layout compatible.

Parity: alphapose/models/layers/Resnet.py:57-211 (Bottleneck/BasicBlock with
stride on the 3x3 conv, stride-32 output, 2048 channels for depth>=50).
Optional per-stage deformable conv (DCN) mirrors Resnet.py:68-97; the DCN op
itself is the TPU gather-based kernel in kernels/deform_conv.py.

Param naming is chosen so torch state_dict keys map mechanically:
  torch `layer2.3.conv1.weight` -> flax params["layer2_3"]["conv1"]["kernel"].
"""

from __future__ import annotations

from typing import Optional, Sequence

from flax import linen as nn

from .layers import max_pool_same_torch, torch_batchnorm, SELayer

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

__all__ = ["ResNet", "RESNET_SPECS"]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    train: bool = False
    # override for families whose torch _initialize() re-inits every conv
    # (HRNet uses normal(0.001), hrnet.py:459-462); None = flax default
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        kw = {} if self.kernel_init is None else \
            {"kernel_init": self.kernel_init}
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
                      **kw)(x)
        out = torch_batchnorm("bn1", not self.train)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2", **kw)(out)
        out = torch_batchnorm("bn2", not self.train)(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv",
                               **kw)(x)
            identity = torch_batchnorm("downsample_bn", not self.train)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    train: bool = False
    use_se: bool = False
    dcn: Optional[dict] = None
    kernel_init: Optional[object] = None   # see BasicBlock.kernel_init

    @nn.compact
    def __call__(self, x):
        kw = {} if self.kernel_init is None else \
            {"kernel_init": self.kernel_init}
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1",
                      **kw)(x)
        out = torch_batchnorm("bn1", not self.train)(out)
        out = nn.relu(out)
        if self.dcn is not None:
            from ..kernels.deform_conv import DeformConv2d
            deform_groups = self.dcn.get("DEFORM_GROUP", 1)
            modulated = self.dcn.get("MODULATED", False)
            off_ch = (27 if modulated else 18) * deform_groups
            offset = nn.Conv(off_ch, (3, 3), strides=(self.stride,) * 2,
                             padding=((1, 1), (1, 1)),
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="conv2_offset")(out)
            out = DeformConv2d(self.planes, kernel_size=3, stride=self.stride,
                               padding=1, deform_groups=deform_groups,
                               modulated=modulated, name="conv2")(out, offset)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                          padding=((1, 1), (1, 1)), use_bias=False,
                          name="conv2", **kw)(out)
        out = torch_batchnorm("bn2", not self.train)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3",
                      **kw)(out)
        out = torch_batchnorm("bn3", not self.train)(out)
        if self.use_se:
            out = SELayer(self.planes * 4, name="se")(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv", **kw)(x)
            identity = torch_batchnorm("downsample_bn", not self.train)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Stride-32 feature extractor.  Input NHWC float32, output NHWC."""
    depth: int = 50
    train: bool = False
    use_se: bool = False               # SE-ResNet variant (SE_Resnet.py)
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)

    @nn.compact
    def __call__(self, x):
        block_kind, layers = RESNET_SPECS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = torch_batchnorm("bn1", not self.train)(x)
        x = nn.relu(x)
        x = max_pool_same_torch(x, 3, 2, 1)
        planes = (64, 128, 256, 512)
        expansion = 4 if block_kind == "bottleneck" else 1
        in_ch = 64
        for li, (p, n_blocks) in enumerate(zip(planes, layers)):
            stride = 1 if li == 0 else 2
            stage_dcn = self.dcn if (self.dcn is not None
                                     and self.stage_with_dcn[li]) else None
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                has_ds = (bi == 0) and (s != 1 or in_ch != p * expansion)
                name = f"layer{li + 1}_{bi}"
                if block_kind == "bottleneck":
                    # SE-ResNet applies SE only in the downsampling block of
                    # each stage (SE_Resnet.py:199-207, reduction=True iff
                    # downsample is not None).
                    x = Bottleneck(p, s, has_ds, self.train,
                                   self.use_se and has_ds,
                                   stage_dcn, name=name)(x)
                else:
                    x = BasicBlock(p, s, has_ds, self.train, name=name)(x)
                in_ch = p * expansion
        return x
