"""Affine-crop geometry, fully batched in JAX.

Behavioral parity targets (reference, /root/reference):
  - alphapose/utils/bbox.py:197-228  (_box_to_center_scale, _center_scale_to_box)
  - alphapose/utils/transforms.py:753-792 (get_affine_transform, affine_transform)
  - alphapose/utils/transforms.py:704-708 (transform_preds)

The reference builds the 2x3 affine via three point correspondences solved by
cv2.getAffineTransform.  The correspondence set always encodes a *similarity*
transform (uniform scale + rotation + translation), so we construct the matrix
in closed form instead of solving a 6x6 system — identical math, no cv2.

Conventions:
  * bboxes are xyxy unless suffixed _xywh.
  * output_size is (w, h), matching the reference call sites
    (`[inp_w, inp_h]` and `[hm_w, hm_h]`).
  * all functions are jit/vmap-safe and shape-polymorphic over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "box_to_center_scale",
    "center_scale_to_box",
    "get_affine_transform",
    "affine_transform_points",
    "transform_preds",
    "bbox_xyxy_to_xywh",
    "bbox_xywh_to_xyxy",
]


def bbox_xyxy_to_xywh(box):
    """xyxy -> xywh (same math as alphapose/utils/bbox.py:75-107)."""
    box = jnp.asarray(box)
    x0, y0, x1, y1 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)


def bbox_xywh_to_xyxy(box):
    """xywh -> xyxy (reference adds w-1/h-1? No: bbox.py:40-74 uses w,h>=0 via
    x1 = x0 + max(0, w - 1) + 1 = x0 + w for w >= 1; we use x0 + w which matches
    the xyxy boxes the eval path produces)."""
    box = jnp.asarray(box)
    x0, y0, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([x0, y0, x0 + w, y0 + h], axis=-1)


def box_to_center_scale(x, y, w, h, aspect_ratio: float, scale_mult: float = 1.25):
    """Convert a bbox to (center, scale) with aspect correction and padding.

    Parity: alphapose/utils/bbox.py:197-216.  `scale` is a (.., 2) array of
    (w, h) in pixels (pixel_std == 1).  The `center[0] != -1` guard of the
    reference only matters for its dummy-invalid items; we apply the padding
    unconditionally and mask invalid rows upstream.
    """
    x, y, w, h = (jnp.asarray(v, jnp.float32) for v in (x, y, w, h))
    center = jnp.stack([x + w * 0.5, y + h * 0.5], axis=-1)
    too_wide = w > aspect_ratio * h
    too_tall = w < aspect_ratio * h
    h = jnp.where(too_wide, w / aspect_ratio, h)
    w = jnp.where(too_tall, h * aspect_ratio, w)
    scale = jnp.stack([w, h], axis=-1) * scale_mult
    return center, scale


def center_scale_to_box(center, scale):
    """(center, scale) -> xyxy box.  Parity: bbox.py:217-228."""
    center = jnp.asarray(center)
    scale = jnp.asarray(scale)
    w, h = scale[..., 0], scale[..., 1]
    xmin = center[..., 0] - w * 0.5
    ymin = center[..., 1] - h * 0.5
    return jnp.stack([xmin, ymin, xmin + w, ymin + h], axis=-1)


def get_affine_transform(center, scale, rot_deg, output_size, shift=(0.0, 0.0),
                         inv: bool = False):
    """Closed-form similarity transform equal to the reference's 3-point solve.

    Forward (inv=False):  dst = s * R(-rot) * (src - center - scale*shift) + d0
    with s = dst_w / scale[0] and d0 = (dst_w/2, dst_h/2).

    Parity: transforms.py:753-786 — the reference's three correspondences
    (center, center+src_dir, perpendicular third point) define exactly this
    similarity; verified against cv2.getAffineTransform in tests.

    Returns a (..., 2, 3) matrix. `output_size` is (w, h) and static.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot_rad = jnp.asarray(rot_deg, jnp.float32) * (np.pi / 180.0)
    shift = jnp.asarray(shift, jnp.float32)
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])

    src_w = scale[..., 0]
    s = dst_w / src_w
    cs, sn = jnp.cos(rot_rad), jnp.sin(rot_rad)
    # Rotation by -rot (src->dst), scaled.
    a = s * cs
    b = s * sn
    # Translation of the source anchor (center + scale*shift).
    src0x = center[..., 0] + scale[..., 0] * shift[..., 0]
    src0y = center[..., 1] + scale[..., 1] * shift[..., 1]
    # dst = [[a, b], [-b, a]] @ (p - src0) + (dst_w/2, dst_h/2)
    m00, m01 = a, b
    m10, m11 = -b, a
    m02 = dst_w * 0.5 - (m00 * src0x + m01 * src0y)
    m12 = dst_h * 0.5 - (m10 * src0x + m11 * src0y)
    fwd = jnp.stack(
        [jnp.stack([m00, m01, m02], axis=-1),
         jnp.stack([m10, m11, m12], axis=-1)], axis=-2)
    if not inv:
        return fwd
    # Inverse similarity: p = R(rot)/s * (d - d0) + src0
    inv_s = src_w / dst_w
    ia = inv_s * cs
    ib = inv_s * sn
    i00, i01 = ia, -ib
    i10, i11 = ib, ia
    i02 = src0x - (i00 * dst_w * 0.5 + i01 * dst_h * 0.5)
    i12 = src0y - (i10 * dst_w * 0.5 + i11 * dst_h * 0.5)
    return jnp.stack(
        [jnp.stack([i00, i01, i02], axis=-1),
         jnp.stack([i10, i11, i12], axis=-1)], axis=-2)


def affine_transform_points(pts, mat):
    """Apply (..., 2, 3) affine to (..., 2) points (transforms.py:789-792)."""
    pts = jnp.asarray(pts)
    x = pts[..., 0]
    y = pts[..., 1]
    nx = mat[..., 0, 0] * x + mat[..., 0, 1] * y + mat[..., 0, 2]
    ny = mat[..., 1, 0] * x + mat[..., 1, 1] * y + mat[..., 1, 2]
    return jnp.stack([nx, ny], axis=-1)


def transform_preds(coords, center, scale, output_size):
    """Heatmap-space coords -> image space via the inverse crop affine.

    Parity: transforms.py:704-708.  `output_size` = (hm_w, hm_h), static.
    coords: (..., 2); center/scale: (..., 2) broadcastable against coords'
    leading dims.
    """
    mat = get_affine_transform(center, scale, 0.0, output_size, inv=True)
    # mat has shape (..., 2, 3) matching center's leading dims; coords may have
    # extra per-joint dims — broadcast mat across them.
    extra = coords.ndim - center.ndim  # e.g. joints axis
    for _ in range(extra):
        mat = mat[..., None, :, :]
    return affine_transform_points(coords, mat)
