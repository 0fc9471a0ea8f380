"""Fused ResNet bottleneck chain — a Pallas TPU kernel that runs every
stride-1, non-downsampling bottleneck of a stage back-to-back while the
residual stream stays resident in VMEM.

Why: the serving forward is HBM-bound in the early stages
(exp/FORWARD_PROFILE.md — layer1 runs at 21% MFU and ~75% of HBM
speed-of-light because XLA materializes every conv's input/output in HBM:
~3.2 GB/block at batch 512 bf16).  Fusing a chain of n blocks into one
kernel reduces the stage's HBM traffic to ONE read + ONE write of the
residual stream (805 MB total for layer1's blocks 1-2 instead of ~6.4 GB):
the 1x1 convs become MXU matmuls over the channel axis, the 3x3 conv is
nine shifted matmuls accumulated in f32, and eval-mode BatchNorm folds into
a per-channel scale+bias applied in-register.

Parity: the math is the reference bottleneck
(alphapose/models/layers/Resnet.py:99-128 — conv1x1/bn/relu, conv3x3/bn/
relu, conv1x1/bn, +identity, relu) with eval-mode BN folded:
  s = gamma / sqrt(var + eps),  b = beta - mean * s.

Used by models/resnet.py when `fused_eval=True` (serving path; the exact
Flax graph stays the default and is what training uses).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fold_bn", "fused_bottleneck_chain", "bottleneck_chain_reference",
           "bottleneck_chain_conv"]

# VMEM budget for picking the per-program batch tile (bytes).  XLA's
# default scoped-vmem limit is 16 MB, which forces 1-image tiles whose grid
# overhead swamps the win — the kernel instead asks Mosaic for most of the
# physical VMEM (vmem_limit_bytes below) and sizes tiles against this.
_VMEM_BUDGET = 72 * 2 ** 20
_VMEM_LIMIT = 100 * 2 ** 20


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BatchNorm as per-channel (s, b): y = x*s + b (f32)."""
    scale = jnp.asarray(scale, jnp.float32)
    bias = jnp.asarray(bias, jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    var = jnp.asarray(var, jnp.float32)
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s


def _kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            w3_ref, s3_ref, b3_ref, out_ref, *, nb, H, W, C, P):
    """One batch tile through all nb blocks; stream never leaves VMEM."""
    T = x_ref.shape[0]
    rows = T * H * W
    cdt = x_ref.dtype

    def block(i, stream):
        # (T,H,W,C) -> rows x C; 1x1 conv == channel matmul on the MXU
        h = stream.reshape(rows, C)
        y = jnp.dot(h, w1_ref[i], preferred_element_type=jnp.float32)
        y = jnp.maximum(y * s1_ref[i] + b1_ref[i], 0.0).astype(cdt)
        y = y.reshape(T, H, W, P)
        # 3x3/s1/p1 conv: nine shifted matmuls, f32 accumulation.  The
        # whole spatial extent is in VMEM, so "shift" is a static slice of
        # the zero-padded tile — no halo exchange, no HBM.
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((rows, P), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += jnp.dot(
                    yp[:, dy:dy + H, dx:dx + W, :].reshape(rows, P),
                    w2_ref[i, dy, dx],
                    preferred_element_type=jnp.float32)
        y2 = jnp.maximum(acc * s2_ref[i] + b2_ref[i], 0.0).astype(cdt)
        y3 = jnp.dot(y2, w3_ref[i], preferred_element_type=jnp.float32)
        y3 = y3 * s3_ref[i] + b3_ref[i]
        out = jnp.maximum(y3 + h.astype(jnp.float32), 0.0)
        return out.astype(cdt).reshape(T, H, W, C)

    stream = x_ref[:]
    for i in range(nb):  # static unroll: nb is 2-5
        stream = block(i, stream)
    out_ref[:] = stream


def _batch_tile(N: int, H: int, W: int, C: int, P: int, itemsize: int) -> int:
    """Largest per-program batch tile whose working set fits the budget:
    double-buffered in/out blocks + stream + conv intermediates."""
    per_img = (H * W * C * itemsize * 5          # in x2 + out x2 + stream
               + (H + 2) * (W + 2) * P * itemsize
               + H * W * P * (itemsize + 4)      # y2 + f32 acc
               + H * W * C * 4)                  # f32 residual add
    t = max(1, _VMEM_BUDGET // per_img)
    while N % t:
        t -= 1
    return t


def chain_weight_bytes(nb: int, C: int, P: int, itemsize: int) -> int:
    """Folded weight bytes a chain keeps resident in VMEM."""
    return nb * itemsize * (C * P + 9 * P * P + P * C) + nb * 4 * (4 * P + 2 * C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck_chain(x, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                           interpret: bool = False):
    """Run nb chained bottlenecks over x: (N, H, W, C).

    w1: (nb, C, P); w2: (nb, 3, 3, P, P); w3: (nb, P, C) — conv kernels in
    the stream dtype; s*/b*: folded BN scale/bias (f32), shapes (nb, P) for
    s1/b1/s2/b2 and (nb, C) for s3/b3.
    """
    N, H, W, C = x.shape
    nb, _, P = w1.shape
    T = _batch_tile(N, H, W, C, P, x.dtype.itemsize)
    kern = functools.partial(_kernel, nb=nb, H=H, W=W, C=C, P=P)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * N * H * W * (C * P + 9 * P * P + P * C) * nb
    return pl.pallas_call(
        kern,
        grid=(N // T,),
        in_specs=[pl.BlockSpec((T, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [wspec] * 9,
        out_specs=pl.BlockSpec((T, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w1, s1, b1, w2, s2, b2, w3, s3, b3)


def bottleneck_chain_conv(x, w1, s1, b1, w2, s2, b2, w3, s3, b3):
    """The same folded math with the 1x1 matmuls expressed as
    conv_general_dilated instead of einsum.  Numerically identical layer
    by layer (same contraction, same f32 accumulation), but it compiles
    orders of magnitude faster on TPU: the einsum lowers to a
    reshape(N*H*W, C)->dot->reshape chain whose layout assignment blows up
    XLA compile time inside lax loop bodies (the r4 bench's fused score
    loop took ~406 s to compile; this form takes seconds —
    exp/profile_compile.py)."""
    nb = w1.shape[0]
    dn = ("NHWC", "HWIO", "NHWC")
    for i in range(nb):
        h = jax.lax.conv_general_dilated(
            x, w1[i][None, None], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        h = jnp.maximum(h * s1[i] + b1[i], 0.0).astype(x.dtype)
        h = jax.lax.conv_general_dilated(
            h, w2[i], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        h = jnp.maximum(h * s2[i] + b2[i], 0.0).astype(x.dtype)
        h = jax.lax.conv_general_dilated(
            h, w3[i][None, None], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        x = jnp.maximum(h * s3[i] + b3[i] + x.astype(jnp.float32),
                        0.0).astype(x.dtype)
    return x


def bottleneck_chain_reference(x, w1, s1, b1, w2, s2, b2, w3, s3, b3):
    """Plain-XLA reference of the same folded math (tests + CPU fallback)."""
    nb = w1.shape[0]
    for i in range(nb):
        h = jnp.einsum("nhwc,cp->nhwp", x, w1[i],
                       preferred_element_type=jnp.float32)
        h = jnp.maximum(h * s1[i] + b1[i], 0.0).astype(x.dtype)
        h = jax.lax.conv_general_dilated(
            h, w2[i], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(h * s2[i] + b2[i], 0.0).astype(x.dtype)
        h = jnp.einsum("nhwp,pc->nhwc", h, w3[i],
                       preferred_element_type=jnp.float32)
        x = jnp.maximum(h * s3[i] + b3[i] + x.astype(jnp.float32),
                        0.0).astype(x.dtype)
    return x
