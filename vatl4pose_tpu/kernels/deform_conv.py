"""Deformable convolution (v1/v2) — TPU-native.

Replaces the reference's CUDA extensions
(alphapose/models/layers/dcn/src/deform_conv_cuda.cpp + _kernel.cu, built by
setup.py:143-149): deformable im2col = per-output-location bilinear sampling
at offset taps, then a dense matmul (MXU).  The gather-based formulation
compiles to XLA gathers + one large dot; autodiff gives the backward pass
(the reference hand-writes bwd kernels).

Note: the shipped configs never enable DCN (SURVEY §7) — this is a
capability-parity component, correct-first.  modulated=True implements
ModulatedDeformConv (DCNv2): offsets (2*G*K*K) plus sigmoid masks (G*K*K),
matching the channel layout of dcn/deform_conv.py:113-188.
"""

from __future__ import annotations

from flax import linen as nn

import jax
import jax.numpy as jnp


def _bilinear_gather(img, ys, xs):
    """img (H, W, C); ys/xs (...,) float sample positions, zero out-of-range
    (matches the CUDA kernel's bilinear with zero padding)."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return v * inb[..., None]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (v00 * ((1 - fy) * (1 - fx))[..., None]
            + v01 * ((1 - fy) * fx)[..., None]
            + v10 * (fy * (1 - fx))[..., None]
            + v11 * (fy * fx)[..., None])


def deform_conv2d(x, offset, kernel, stride: int = 1, padding: int = 1,
                  mask=None, deform_groups: int = 1):
    """x: (N, H, W, Cin) NHWC; offset: (N, Ho, Wo, 2*G*K*K) with the CUDA
    kernel's (dy, dx) interleaving; kernel: (K, K, Cin, Cout) HWIO;
    mask: optional (N, Ho, Wo, G*K*K) already-sigmoided modulation.
    Returns (N, Ho, Wo, Cout)."""
    N, H, W, Cin = x.shape
    K = kernel.shape[0]
    Ho = (H + 2 * padding - K) // stride + 1
    Wo = (W + 2 * padding - K) // stride + 1
    G = deform_groups
    cpg = Cin // G

    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    ky = jnp.arange(K)
    kx = jnp.arange(K)
    # base tap positions (Ho, Wo, K, K)
    base_y = oy[:, None, None, None] + ky[None, None, :, None]
    base_x = ox[None, :, None, None] + kx[None, None, None, :]

    off = offset.reshape(N, Ho, Wo, G, K * K, 2)
    dy = off[..., 0].reshape(N, Ho, Wo, G, K, K)
    dx = off[..., 1].reshape(N, Ho, Wo, G, K, K)
    ys = base_y[None, :, :, None] + dy     # (N, Ho, Wo, G, K, K)
    xs = base_x[None, :, :, None] + dx

    def per_sample(xi, ysi, xsi, mi):
        # group-wise sampling: (Ho, Wo, G, K, K, cpg)
        cols = []
        for g in range(G):
            samp = _bilinear_gather(xi[..., g * cpg:(g + 1) * cpg],
                                    ysi[:, :, g], xsi[:, :, g])
            if mi is not None:
                samp = samp * mi[:, :, g][..., None]
            cols.append(samp)
        return jnp.stack(cols, axis=2)     # (Ho, Wo, G, K, K, cpg)

    if mask is not None:
        m = mask.reshape(N, Ho, Wo, G, K, K)
    else:
        m = None
    cols = jax.vmap(per_sample)(x, ys, xs,
                                m if m is not None else
                                jnp.ones((N, Ho, Wo, G, K, K), x.dtype))
    # (N, Ho, Wo, G*cpg*K*K) ordered (g, ky, kx, c) -> match kernel layout
    cols = jnp.transpose(cols, (0, 1, 2, 4, 5, 3, 6))  # N,Ho,Wo,K,K,G,cpg
    cols = cols.reshape(N, Ho, Wo, K * K * Cin)
    w = kernel.reshape(K * K * Cin, -1)
    return jnp.einsum("nhwc,co->nhwo", cols, w,
                      preferred_element_type=jnp.float32)


class DeformConv2d(nn.Module):
    """Flax module mirroring dcn/deform_conv.py DeformConv /
    ModulatedDeformConv: the offset (and mask) conv lives in the caller
    (Bottleneck.conv2_offset), matching the reference layout."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    deform_groups: int = 1
    modulated: bool = False

    @nn.compact
    def __call__(self, x, offset_and_mask):
        K = self.kernel_size
        G = self.deform_groups
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (K, K, x.shape[-1], self.features))
        if self.modulated:
            off = offset_and_mask[..., : 2 * G * K * K]
            mask = jax.nn.sigmoid(offset_and_mask[..., 2 * G * K * K:])
        else:
            off = offset_and_mask
            mask = None
        return deform_conv2d(x, off, kernel, self.stride, self.padding,
                             mask, G)
