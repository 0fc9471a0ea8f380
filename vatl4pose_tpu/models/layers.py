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

    `subpixel=True` offers an alternative exact lowering for the
    (k=4, s=2, p=1) config: one dense 2x2 conv producing 4*features
    channels (one per output phase) followed by a phase interleave —
    output O[2u+py, 2v+px] only ever reads kernel taps F[py::2, px::2]
    (F = spatially-flipped kernel), so the four phase kernels partition
    the 4x4 taps exactly.  MEASURED SLOWER on v5e (13.4 -> 28.2 ms for
    the 3-deconv head at batch 512 f32, exp/FORWARD_PROFILE.md): the TPU
    conv engine executes lhs_dilation natively at full MXU rate, while
    the subpixel form pays extra HBM traffic for the (H+1, W+1, 4C)
    intermediate + slice/stack/reshape.  Default stays the dilated form;
    the subpixel path is kept as the documented experiment (exact-match
    tested in test_models.py::test_subpixel_equals_dilated).
    """
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    subpixel: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.normal(0.001),
            (k, k, in_ch, self.features))
        flipped = jnp.flip(kernel, axis=(0, 1))
        if (self.subpixel and k == 4 and self.stride == 2
                and self.padding == 1):
            out = self._subpixel(x, flipped)
        else:
            pad = k - 1 - self.padding
            # conv with flipped kernel over the dilated input == transposed
            # conv.
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

    def _subpixel(self, x, flipped):
        """Exact ConvTranspose(4,2,1) as a dense 2x2 conv + phase interleave.

        Derivation (1-D, pad=k-1-p=2, dilated input Xd[2m+2]=I[m]):
          out[2u+0] = I[u-1]*F[0] + I[u]*F[2]   -> taps F[0::2], starts u
          out[2u+1] = I[u]  *F[1] + I[u+1]*F[3] -> taps F[1::2], starts u+1
        over the 1-padded input, so one conv with padding ((1,1),(1,1))
        yields every phase as a shifted slice of the same output.
        """
        N, H, W, _ = x.shape
        C = self.features
        # combined kernel (2,2,in,4C): phase (py,px) -> F[py::2, px::2]
        comb = jnp.concatenate(
            [flipped[py::2, px::2]
             for py in range(2) for px in range(2)], axis=-1)
        y = jax.lax.conv_general_dilated(
            x, comb, window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (N,H+1,W+1,4C)
        phases = [y[:, py:py + H, px:px + W, i * C:(i + 1) * C]
                  for i, (py, px) in enumerate(
                      (a, b) for a in range(2) for b in range(2))]
        out = jnp.stack(phases, axis=3)            # (N,H,W,4,C)
        out = out.reshape(N, H, W, 2, 2, C)
        out = out.transpose(0, 1, 3, 2, 4, 5)      # N,H,py,W,px,C
        return out.reshape(N, 2 * H, 2 * W, C)


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
