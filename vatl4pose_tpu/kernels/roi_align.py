"""RoIAlign — TPU-native batched bilinear crop.

Replaces the reference's CUDA extension (alphapose/utils/roi_align/src/,
built by setup.py:139-142; python wrapper roi_align.py:9-60, used by
SimpleTransform.align_transform — a commented-out path, so capability
parity).  Mask-RCNN-style: each output cell averages `sample_num` bilinear
samples; sample_num=-1 uses ceil(roi_size/out_size) adaptive sampling
(fixed to 2 here for static shapes, the common adaptive result)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .deform_conv import _bilinear_gather

__all__ = ["roi_align"]


def roi_align(features, rois, out_size, spatial_scale: float = 1.0,
              sample_num: int = 2):
    """features: (N, H, W, C); rois: (R, 5) = (batch_idx, x1, y1, x2, y2);
    out_size: (oh, ow).  Returns (R, oh, ow, C)."""
    oh, ow = int(out_size[0]), int(out_size[1])
    s = max(sample_num, 1)

    def one(roi):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1] * spatial_scale, roi[2] * spatial_scale, \
            roi[3] * spatial_scale, roi[4] * spatial_scale
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bin_w = rw / ow
        bin_h = rh / oh
        iy = (jnp.arange(s) + 0.5) / s    # sample at (i + (k+.5)/s) * bin
        gy = y1 + (jnp.arange(oh)[:, None] * bin_h) + iy[None, :] * bin_h
        gx = x1 + (jnp.arange(ow)[:, None] * bin_w) + iy[None, :] * bin_w
        ys = gy[:, None, :, None]                       # (oh, 1, s, 1)
        xs = gx[None, :, None, :]                       # (1, ow, 1, s)
        ys = jnp.broadcast_to(ys, (oh, ow, s, s))
        xs = jnp.broadcast_to(xs, (oh, ow, s, s))
        samp = _bilinear_gather(features[b], ys, xs)    # (oh, ow, s, s, C)
        return jnp.mean(samp, axis=(2, 3))

    return jax.vmap(one)(jnp.asarray(rois, jnp.float32))
