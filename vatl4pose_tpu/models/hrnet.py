"""PoseHighResolutionNet (HRNet-W32) — Flax linen, NHWC.

Parity: alphapose/models/hrnet.py:25-494 — stem of two stride-2 3x3 convs,
layer1 of 4 Bottlenecks, three multi-branch high-resolution stages with
transition layers and SUM-fusion, final 1x1 conv on the highest-resolution
branch.  Config-driven branch/block/channel counts (STAGE2/3/4 sections of
configs/posetrack21/hrnetw32_posetrack21.yaml:36-57).

The reference's HRNet has no get_embedding (SURVEY §2.2) — this build adds
one (GAP over the concatenated multi-scale features pooled to the coarsest
grid) so representativeness/filter strategies work with HRNet too; the
reference would AttributeError on that path.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from flax import linen as _nn

from .layers import torch_batchnorm
from .resnet import BasicBlock, Bottleneck

# The torch reference re-initializes EVERY conv with normal(std=0.001)
# (hrnet.py:457-472 _initialize) — without it a from-scratch HRNet starts
# with ~N(0,6) heatmap outputs (branch-sum fusion amplifies the default
# fan-in init) and spends hundreds of epochs deflating before localizing.
HRNET_CONV_INIT = _nn.initializers.normal(0.001)

DEFAULT_STAGES = {
    "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "NUM_BLOCKS": [4, 4],
               "NUM_CHANNELS": [32, 64], "BLOCK": "BASIC"},
    "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "NUM_BLOCKS": [4, 4, 4],
               "NUM_CHANNELS": [32, 64, 128], "BLOCK": "BASIC"},
    "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "NUM_BLOCKS": [4, 4, 4, 4],
               "NUM_CHANNELS": [32, 64, 128, 256], "BLOCK": "BASIC"},
}


def _upsample_nearest(x, factor: int):
    """torch nn.Upsample(scale_factor=2**k, mode='nearest') on NHWC."""
    N, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (N, H, factor, W, factor, C))
    return x.reshape(N, H * factor, W * factor, C)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((p, p), (p, p)), use_bias=False,
                    kernel_init=HRNET_CONV_INIT, name="conv")(x)
        x = torch_batchnorm("bn", not self.train)(x)
        return nn.relu(x) if self.relu else x


class HighResolutionModule(nn.Module):
    """One HR module: per-branch residual blocks + all-to-all SUM fusion.
    Parity: hrnet.py:98-260."""
    num_branches: int
    block: str                     # 'BASIC' | 'BOTTLENECK'
    num_blocks: Sequence[int]
    num_inchannels: Sequence[int]  # channels entering each branch
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    train: bool = False

    @nn.compact
    def __call__(self, xs):
        expansion = 4 if self.block == "BOTTLENECK" else 1
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            out_ch = self.num_channels[i] * expansion
            for b in range(self.num_blocks[i]):
                has_ds = (b == 0) and (self.num_inchannels[i] != out_ch)
                name = f"branch{i}_{b}"
                if self.block == "BOTTLENECK":
                    x = Bottleneck(self.num_channels[i], 1, has_ds,
                                   self.train, kernel_init=HRNET_CONV_INIT,
                                   name=name)(x)
                else:
                    x = BasicBlock(self.num_channels[i], 1, has_ds,
                                   self.train, kernel_init=HRNET_CONV_INIT,
                                   name=name)(x)
            outs.append(x)
        if self.num_branches == 1:
            return outs
        chans = [self.num_channels[i] * expansion
                 for i in range(self.num_branches)]
        n_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            y = outs[0] if i == 0 else None
            for j in range(self.num_branches):
                if j == i:
                    t = outs[j]
                elif j > i:
                    t = _ConvBN(chans[i], kernel=1, relu=False,
                                train=self.train, name=f"fuse{i}_{j}")(outs[j])
                    t = _upsample_nearest(t, 2 ** (j - i))
                else:
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = chans[i] if last else chans[j]
                        t = _ConvBN(ch, kernel=3, stride=2, relu=not last,
                                    train=self.train,
                                    name=f"fuse{i}_{j}_{k}")(t)
                if i == 0 and j == 0:
                    y = t
                else:
                    y = y + t if y is not None else t
            fused.append(nn.relu(y))
        return fused


class PoseHighResolutionNet(nn.Module):
    num_joints: int = 17
    final_conv_kernel: int = 1
    stages: Dict[str, Any] = None
    train: bool = False

    @nn.compact
    def __call__(self, x, return_embedding: bool = False):
        stages = self.stages or DEFAULT_STAGES
        x = _ConvBN(64, 3, 2, True, self.train, name="stem1")(x)
        x = _ConvBN(64, 3, 2, True, self.train, name="stem2")(x)
        for b in range(4):
            x = Bottleneck(64, 1, b == 0, self.train,
                           kernel_init=HRNET_CONV_INIT,
                           name=f"layer1_{b}")(x)

        pre_channels = [256]
        ys = [x]
        for si, key in enumerate(("STAGE2", "STAGE3", "STAGE4")):
            scfg = stages[key]
            expansion = 4 if scfg["BLOCK"] == "BOTTLENECK" else 1
            cur_channels = [c * expansion for c in scfg["NUM_CHANNELS"]]
            nb = scfg["NUM_BRANCHES"]
            # transition (hrnet.py:329-369): channel-adapt existing branches,
            # downsample chains growing new ones from the last branch.
            xs = []
            for i in range(nb):
                if i < len(pre_channels):
                    if cur_channels[i] != pre_channels[i]:
                        src = ys[-1] if si > 0 else ys[0]
                        xs.append(_ConvBN(cur_channels[i], 3, 1, True,
                                          self.train,
                                          name=f"transition{si + 1}_{i}")(src))
                    else:
                        xs.append(ys[i] if si > 0 else ys[0])
                else:
                    t = ys[-1]
                    for j in range(i + 1 - len(pre_channels)):
                        out_ch = (cur_channels[i]
                                  if j == i - len(pre_channels)
                                  else pre_channels[-1])
                        t = _ConvBN(out_ch, 3, 2, True, self.train,
                                    name=f"transition{si + 1}_{i}_{j}")(t)
                    xs.append(t)
            last_stage = key == "STAGE4"
            inch = list(cur_channels)
            for m in range(scfg["NUM_MODULES"]):
                mso = not (last_stage and m == scfg["NUM_MODULES"] - 1)
                xs = HighResolutionModule(
                    nb, scfg["BLOCK"], scfg["NUM_BLOCKS"], tuple(inch),
                    tuple(scfg["NUM_CHANNELS"]), mso, self.train,
                    name=f"stage{si + 2}_{m}")(xs)
                inch = [c * expansion for c in scfg["NUM_CHANNELS"]][:len(xs)]
            ys = xs
            pre_channels = cur_channels

        p = 1 if self.final_conv_kernel == 3 else 0
        hm = nn.Conv(self.num_joints,
                     (self.final_conv_kernel,) * 2,
                     padding=((p, p), (p, p)), kernel_init=HRNET_CONV_INIT,
                     name="final_layer")(ys[0])
        if return_embedding:
            # New capability (absent in the reference): GAP of the
            # highest-resolution stage-4 feature, zero-padded to the 2048-d
            # embedding slot the selection stack expects.
            emb = jnp.mean(ys[0], axis=(1, 2))
            emb = jnp.pad(emb, ((0, 0), (0, max(0, 2048 - emb.shape[-1]))))
            return hm, emb
        return hm

    def get_embedding(self, x):
        _, emb = self(x, return_embedding=True)
        return emb
