"""Deformable PS-RoI pooling — TPU-native.

Replaces the reference's CUDA extension (dcn/src/deform_pool_cuda.cpp +
deform_pool_cuda_kernel.cu, wrapped by dcn/deform_pool.py:10-229): R-FCN
style position-sensitive RoI pooling where each output bin averages
sample_per_part² bilinear samples, optionally shifted by learned per-bin
offsets scaled by trans_std and the RoI size (DeformRoIPooling, Deformable
ConvNets v1).  no_trans=True degenerates to plain PS-RoI pooling.

Capability-parity component (nothing in the shipped configs uses it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .deform_conv import _bilinear_gather

__all__ = ["deform_roi_pool"]


def deform_roi_pool(data, rois, offset=None, spatial_scale: float = 1.0,
                    out_size: int = 7, out_channels: int = None,
                    no_trans: bool = True, group_size: int = 1,
                    sample_per_part: int = 4, trans_std: float = 0.0):
    """data: (N, H, W, C) with C == out_channels*group_size²;
    rois: (R, 5) = (batch_idx, x1, y1, x2, y2);
    offset: (R, out_size, out_size, 2) normalized bin shifts (dy, dx).
    Returns (R, out_size, out_size, out_channels)."""
    C = data.shape[-1]
    if out_channels is None:
        out_channels = C // (group_size * group_size)
    P = out_size
    s = sample_per_part

    def one(roi, off):
        b = roi[0].astype(jnp.int32)
        # the CUDA kernel rounds rois to a 0.5-offset grid
        x1 = jnp.round(roi[1]) * spatial_scale - 0.5
        y1 = jnp.round(roi[2]) * spatial_scale - 0.5
        x2 = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        y2 = (jnp.round(roi[4]) + 1.0) * spatial_scale - 0.5
        rw = jnp.maximum(x2 - x1, 0.1)
        rh = jnp.maximum(y2 - y1, 0.1)
        bin_w = rw / P
        bin_h = rh / P
        sub_w = bin_w / s
        sub_h = bin_h / s
        ii = jnp.arange(P)
        kk = jnp.arange(s)
        # per-bin start + per-sample sub-offsets
        ys = (y1 + ii[:, None, None, None] * bin_h
              + (kk[None, None, :, None] + 0.5) * sub_h)       # (P,1,s,1)
        xs = (x1 + ii[None, :, None, None] * bin_w
              + (kk[None, None, None, :] + 0.5) * sub_w)       # (1,P,1,s)
        ys = jnp.broadcast_to(ys, (P, P, s, s))
        xs = jnp.broadcast_to(xs, (P, P, s, s))
        if not no_trans and off is not None:
            ys = ys + (off[..., 0] * trans_std * rh)[..., None, None]
            xs = xs + (off[..., 1] * trans_std * rw)[..., None, None]
        samp = _bilinear_gather(data[b], ys, xs)               # (P,P,s,s,C)
        pooled = jnp.mean(samp, axis=(2, 3))                   # (P,P,C)
        # position-sensitive channel selection
        g = group_size
        gy = jnp.clip((ii * g) // P, 0, g - 1)
        gx = gy
        out = jnp.zeros((P, P, out_channels), pooled.dtype)
        for c in range(out_channels):
            # channel layout: (c*g + gy)*g + gx (R-FCN)
            ch = (c * g + gy[:, None]) * g + gx[None, :]
            out = out.at[:, :, c].set(
                jnp.take_along_axis(pooled, ch[..., None],
                                    axis=-1)[..., 0])
        return out

    if offset is None:
        offset = jnp.zeros((rois.shape[0], P, P, 2), data.dtype)
    return jax.vmap(one)(jnp.asarray(rois, jnp.float32), offset)
