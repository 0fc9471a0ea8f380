"""Shared NN building blocks (Flax linen, NHWC).

Torch-semantics-compatible primitives so pretrained reference checkpoints
convert exactly:
  - TorchConvTranspose == nn.ConvTranspose2d(k=4, s=2, p=1) (simplepose.py:40-48)
  - pixel_shuffle / pixel_unshuffle == torch.nn.PixelShuffle / (PixelUnshuffle.py:9-28)
  - SELayer == alphapose/models/layers/SE_module.py:9-24
  - DUC == alphapose/models/layers/DUC.py:9-29
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["TorchConvTranspose", "pixel_shuffle", "pixel_unshuffle",
           "SELayer", "DUC", "torch_batchnorm", "max_pool_same_torch"]


def torch_batchnorm(name: str = None, use_running_average: bool = True):
    """BatchNorm with torch defaults (momentum 0.1 torch == 0.9 flax, eps 1e-5).
    `name` must be None when assigned as a setup() attribute (linen names it
    from the attribute)."""
    return nn.BatchNorm(use_running_average=use_running_average,
                        momentum=0.9, epsilon=1e-5, name=name)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with exact torch semantics via input-dilated conv.

    torch ConvTranspose2d(in, out, k, s, p) == conv_general_dilated with
    lhs_dilation=s, padding=(k-1-p) on each side, and the kernel flipped
    spatially with in/out channel axes swapped.  The parameter is stored in
    HWIO (flax Conv layout) so converters treat it like a normal conv kernel.
    """
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.001),
            (k, k, in_ch, self.features))
        pad = k - 1 - self.padding
        # conv with flipped kernel over the dilated input == transposed conv.
        flipped = jnp.flip(kernel, axis=(0, 1))
        out = jax.lax.conv_general_dilated(
            x, flipped,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias
        return out


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle matching torch.nn.PixelShuffle channel ordering:
    out[..., c] at offset (i, j) reads in[..., c*r*r + i*r + j]."""
    N, H, W, C = x.shape
    c_out = C // (r * r)
    x = x.reshape(N, H, W, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # N, H, i, W, j, C
    return x.reshape(N, H * r, W * r, c_out)


def pixel_unshuffle(x, r: int):
    """Inverse of pixel_shuffle (space-to-depth, torch ordering)."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # N, H', W', C, i, j
    return x.reshape(N, H // r, W // r, C * r * r)


class SELayer(nn.Module):
    """Squeeze-and-Excitation (SE_module.py:9-24): GAP → fc/red → ReLU →
    fc → Sigmoid → channel scale."""
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.channel // self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channel, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class DUC(nn.Module):
    """Dense Upsampling Convolution (DUC.py:9-29): 3x3 conv → BN → ReLU →
    PixelShuffle(upscale)."""
    planes: int
    upscale_factor: int = 2
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv")(x)
        x = torch_batchnorm("bn", not self.train)(x)
        x = nn.relu(x)
        return pixel_shuffle(x, self.upscale_factor)


def max_pool_same_torch(x, window: int = 3, stride: int = 2, padding: int = 1):
    """torch MaxPool2d(window, stride, padding) — pads with -inf."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)))
