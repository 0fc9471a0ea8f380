"""ResNet backbones (Flax linen, NHWC), torchvision-layout compatible.

Parity: alphapose/models/layers/Resnet.py:57-211 (Bottleneck/BasicBlock with
stride on the 3x3 conv, stride-32 output, 2048 channels for depth>=50).
Optional per-stage deformable conv (DCN) mirrors Resnet.py:68-97; the DCN op
itself is the TPU gather-based kernel in kernels/deform_conv.py.

Param naming is chosen so torch state_dict keys map mechanically:
  torch `layer2.3.conv1.weight` -> flax params["layer2_3"]["conv1"]["kernel"].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
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


class _ConvKernel(nn.Module):
    """Declares an nn.Conv-shaped kernel param without computing the conv
    (same name/shape/init, so checkpoints and the torch converter see an
    identical tree whether the exact or fused path built the model)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        from flax.linen.linear import default_kernel_init
        return self.param("kernel", default_kernel_init, self.shape)


class _BNFold(nn.Module):
    """Declares nn.BatchNorm's param/batch_stats tree and returns the
    eval-mode fold (s, b): y = x*s + b."""
    ch: int

    @nn.compact
    def __call__(self):
        from ..kernels.fused_bottleneck import fold_bn
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return fold_bn(scale, bias, mean.value, var.value)


class _FoldedBottleneck(nn.Module):
    """The param tree of a plain Bottleneck (stride 1, no downsample /
    SE / DCN), returned as folded serving weights for the fused chain
    kernel instead of being computed block-by-block."""
    in_ch: int
    planes: int

    @nn.compact
    def __call__(self):
        p = self.planes
        w1 = _ConvKernel((1, 1, self.in_ch, p), name="conv1")()
        s1, b1 = _BNFold(p, name="bn1")()
        w2 = _ConvKernel((3, 3, p, p), name="conv2")()
        s2, b2 = _BNFold(p, name="bn2")()
        w3 = _ConvKernel((1, 1, p, p * 4), name="conv3")()
        s3, b3 = _BNFold(p * 4, name="bn3")()
        return (w1[0, 0], s1, b1, w2, s2, b2, w3[0, 0], s3, b3)


# per-chunk VMEM cap for chain weights (bytes): chains whose folded weights
# exceed it are split into consecutive sub-chains (one extra HBM round trip
# of the residual stream each — cheap at the deep stages where this bites)
_FUSE_WEIGHT_LIMIT = 7 * 2 ** 20

# chain implementation: "conv" = folded-BN math with 1x1 convs (same math
# as "xla", compiles ~100x faster inside lax loop bodies — the einsum form
# took ~406 s to compile in the r4 bench score loop, exp/profile_compile.py);
# "xla" = the einsum form (kept for A-Bs); "pallas" = the VMEM-resident
# chain kernel (measured slower than XLA end-to-end on v5e — the early
# stages' P=64/128 channel matmuls underfill the MXU, FUSED_BOTTLENECK.md)
import os as _os
FUSE_IMPL = _os.environ.get("FUSE_IMPL", "conv")


class ResNet(nn.Module):
    """Stride-32 feature extractor.  Input NHWC float32, output NHWC.

    `fused_eval=True` (serving only): every stride-1 non-downsampling
    bottleneck runs through the fused Pallas chain kernel
    (kernels/fused_bottleneck.py) — same param tree, same math with
    eval-BN folded; the exact Flax graph remains the default and the
    training path.  On CPU backends the chain falls back to the plain-XLA
    reference implementation (pallas CPU would need interpret mode, and
    the SPMD partitioner can't shard the custom kernel on test meshes).
    """
    depth: int = 50
    train: bool = False
    use_se: bool = False               # SE-ResNet variant (SE_Resnet.py)
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    fused_eval: bool = False

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
            fuse_tail = (self.fused_eval and not self.train
                         and block_kind == "bottleneck"
                         and stage_dcn is None and n_blocks > 1)
            for bi in range(n_blocks):
                if fuse_tail and bi == 1:
                    x = self._fused_tail(x, li, p, n_blocks)
                    in_ch = p * expansion
                    break
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

    def _fused_tail(self, x, li, p, n_blocks):
        """Blocks 1..n-1 of stage li+1 through the fused chain kernel."""
        from ..kernels.fused_bottleneck import (bottleneck_chain_conv,
                                                bottleneck_chain_reference,
                                                chain_weight_bytes,
                                                fused_bottleneck_chain)
        folded = [_FoldedBottleneck(p * 4, p, name=f"layer{li + 1}_{bi}")()
                  for bi in range(1, n_blocks)]
        itemsize = x.dtype.itemsize
        per_block = chain_weight_bytes(1, p * 4, p, itemsize)
        group = max(1, _FUSE_WEIGHT_LIMIT // per_block)
        # CPU backends can't run the custom kernel (and test meshes can't
        # shard it); stages whose single-block weights bust VMEM (layer4
        # f32) take the same folded math through plain XLA — as does the
        # default FUSE_IMPL="xla" (see the switch above).
        if (FUSE_IMPL == "pallas" and jax.default_backend() != "cpu"
                and per_block <= _FUSE_WEIGHT_LIMIT):
            run = fused_bottleneck_chain
        elif FUSE_IMPL == "xla":
            run = bottleneck_chain_reference
        else:
            run = bottleneck_chain_conv
        for s in range(0, len(folded), group):
            ws = folded[s:s + group]
            stacked = [jnp.stack(col) for col in zip(*ws)]
            # conv kernels ride in the stream dtype; folded BN stays f32
            stacked = [w.astype(x.dtype) if i in (0, 3, 6) else w
                       for i, w in enumerate(stacked)]
            x = run(x, *stacked)
        return x
