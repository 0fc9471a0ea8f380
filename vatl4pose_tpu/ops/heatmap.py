"""Heatmap targets, decoding, and normalization — batched JAX.

Behavioral parity targets (reference, /root/reference):
  - alphapose/utils/presets/simple_transform.py:122-158 (_target_generator)
  - alphapose/utils/transforms.py:550-583 (heatmap_to_coord_simple)
  - alphapose/utils/transforms.py:687-702 (norm_heatmap)
  - alphapose/utils/transforms.py:710-760 (get_max_pred / _batch)
  - alphapose/utils/transforms.py:486-518 (flip_heatmap)

Heatmap layout here is channels-last-free: (..., K, H, W) at the public API
(H=64, W=48 for the shipped configs).  All ops are jit/vmap-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .affine import transform_preds

__all__ = [
    "gaussian_target",
    "get_max_pred",
    "subpixel_refine",
    "heatmap_to_coord",
    "norm_heatmap",
    "flip_heatmap",
    "integral_coords",
]


def gaussian_target(joints_xy, joints_vis, hm_size, sigma: float,
                    feat_stride=(4.0, 4.0)):
    """Unnormalized Gaussian target heatmaps.

    joints_xy: (..., K, 2) keypoint coords in input-image space.
    joints_vis: (..., K) visibility in {0, 1}.
    hm_size: (H, W) static.  feat_stride: (sx, sy) static.

    Returns (target (..., K, H, W) float32, weight (..., K) float32).

    Parity with simple_transform.py:122-158: integer peak position
    mu = int(x/stride + 0.5), Gaussian evaluated on integer offsets from mu,
    truncated to the [mu-3σ, mu+3σ] window, weight zeroed when the window
    falls fully outside the map.  int() in the reference truncates toward
    zero; coords are non-negative in practice but we mirror trunc anyway.
    """
    H, W = int(hm_size[0]), int(hm_size[1])
    sigma = float(sigma)
    tmp = int(sigma * 3)
    joints_xy = jnp.asarray(joints_xy, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    mu_x = jnp.trunc(joints_xy[..., 0] / feat_stride[0] + 0.5).astype(jnp.int32)
    mu_y = jnp.trunc(joints_xy[..., 1] / feat_stride[1] + 0.5).astype(jnp.int32)
    # Window-outside test (reference: ul >= size or br < 0 ⇒ weight = 0).
    outside = ((mu_x - tmp >= W) | (mu_y - tmp >= H)
               | (mu_x + tmp + 1 < 0) | (mu_y + tmp + 1 < 0))
    weight = jnp.where(outside, 0.0, vis)

    xs = jnp.arange(W, dtype=jnp.int32)
    ys = jnp.arange(H, dtype=jnp.int32)
    dx = xs - mu_x[..., None]                      # (..., K, W)
    dy = ys - mu_y[..., None]                      # (..., K, H)
    in_win_x = (jnp.abs(dx) <= tmp)
    in_win_y = (jnp.abs(dy) <= tmp)
    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / (2 * sigma ** 2)) * in_win_x
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / (2 * sigma ** 2)) * in_win_y
    g = gy[..., :, None] * gx[..., None, :]        # (..., K, H, W)
    draw = (weight > 0.5).astype(jnp.float32)
    target = g * draw[..., None, None]
    return target.astype(jnp.float32), weight


def get_max_pred(hms):
    """Per-joint argmax decode.  hms: (..., K, H, W).

    Returns coords (..., K, 2) as float (x, y) and maxvals (..., K).
    Parity: transforms.py:710-727 — row-major flat argmax (first max wins),
    coords zeroed where maxval <= 0.
    """
    hms = jnp.asarray(hms)
    W = hms.shape[-1]
    flat = hms.reshape(hms.shape[:-2] + (-1,))
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / W)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0)[..., None]
    return coords, maxvals


def subpixel_refine(hms, coords):
    """±0.25 gradient-sign subpixel shift (transforms.py:561-568).

    Applied only when 1 < px < W-1 and 1 < py < H-1 (strict, matching the
    reference).  coords hold integer argmax positions.
    """
    hms = jnp.asarray(hms)
    H, W = hms.shape[-2], hms.shape[-1]
    px = jnp.round(coords[..., 0]).astype(jnp.int32)
    py = jnp.round(coords[..., 1]).astype(jnp.int32)
    ok = (px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)
    pxc = jnp.clip(px, 1, W - 2)
    pyc = jnp.clip(py, 1, H - 2)

    def gather(hm, yy, xx):
        return jnp.take_along_axis(
            hm.reshape(hm.shape[:-2] + (-1,)),
            (yy * W + xx)[..., None], axis=-1)[..., 0]

    dx = gather(hms, pyc, pxc + 1) - gather(hms, pyc, pxc - 1)
    dy = gather(hms, pyc + 1, pxc) - gather(hms, pyc - 1, pxc)
    shift = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + shift * ok[..., None].astype(coords.dtype)


def heatmap_to_coord(hms, bbox_xyxy):
    """Full decode: argmax → subpixel → inverse-affine back-projection.

    hms: (..., K, H, W); bbox_xyxy: (..., 4) crop box (the padded crop box the
    network input was warped from).  Returns (coords (..., K, 2) in image
    space, scores (..., K)).

    Parity: transforms.py:550-583 (heatmap_to_coord_simple) — the bbox is
    turned into center=(cx, cy), scale=(w, h) and inverted through
    get_affine_transform(..., [hm_w, hm_h], inv=1).

    Accepts bf16 heatmaps (the bf16 serving path hands the model output
    through without materializing an f32 copy); all arithmetic here runs in
    f32 — the upcast is exact and fuses into the first read.
    """
    hms = jnp.asarray(hms, jnp.float32)
    H, W = hms.shape[-2], hms.shape[-1]
    coords, maxvals = get_max_pred(hms)
    coords = subpixel_refine(hms, coords)
    bbox = jnp.asarray(bbox_xyxy, jnp.float32)
    w = bbox[..., 2] - bbox[..., 0]
    h = bbox[..., 3] - bbox[..., 1]
    center = jnp.stack([bbox[..., 0] + 0.5 * w, bbox[..., 1] + 0.5 * h], axis=-1)
    scale = jnp.stack([w, h], axis=-1)
    preds = transform_preds(coords, center, scale, (W, H))
    return preds, maxvals


def norm_heatmap(norm_type: str, heatmap):
    """softmax / sigmoid / divide_sum over flattened spatial dims
    (transforms.py:687-702).  heatmap: (N, K, ...)."""
    shape = heatmap.shape
    if norm_type == "softmax":
        flat = heatmap.reshape(shape[0], shape[1], -1)
        return jax.nn.softmax(flat, axis=2).reshape(shape)
    if norm_type == "sigmoid":
        return jax.nn.sigmoid(heatmap)
    if norm_type == "divide_sum":
        flat = heatmap.reshape(shape[0], shape[1], -1)
        flat = flat / jnp.sum(flat, axis=2, keepdims=True)
        return flat.reshape(shape)
    raise NotImplementedError(norm_type)


def flip_heatmap(hms, joint_pairs, shift: bool = True):
    """Horizontally flip heatmaps and swap left/right joint channels.

    Parity: transforms.py:486-518 — flips the W axis, swaps channel pairs,
    and (shift=True) shifts one pixel right (out[..., 1:] = flipped[..., :-1]).
    hms: (..., K, H, W).
    """
    hms = jnp.asarray(hms)
    out = jnp.flip(hms, axis=-1)
    K = hms.shape[-3]
    perm = np.arange(K)
    for a, b in joint_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    out = jnp.take(out, jnp.asarray(perm), axis=-3)
    if shift:
        out = out.at[..., 1:].set(out[..., :-1])
    return out


def integral_coords(hms, norm_type: str = "softmax"):
    """Soft-argmax (integral) decode of (N, K, H, W) heatmaps.

    Parity: transforms.py:645-684 (_integral_tensor with hm_depth=1):
    normalize → probability → marginal sums → expectation, returned in the
    [-0.5, 0.5) normalized space (x/W - 0.5, y/H - 0.5).
    Returns (coords (N, K, 2), maxvals (N, K)).
    """
    N, K, H, W = hms.shape
    p = norm_heatmap(norm_type, hms).reshape(N, K, -1)
    if norm_type == "sigmoid":
        maxvals = jnp.max(p, axis=2)
    else:
        maxvals = jnp.ones((N, K), hms.dtype)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    p = p.reshape(N, K, H, W)
    hm_x = p.sum(axis=2) * jnp.arange(W, dtype=p.dtype)
    hm_y = p.sum(axis=3) * jnp.arange(H, dtype=p.dtype)
    cx = hm_x.sum(axis=2) / W - 0.5
    cy = hm_y.sum(axis=2) / H - 0.5
    return jnp.stack([cx, cy], axis=-1), maxvals
