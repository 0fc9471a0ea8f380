"""Device-side affine crop + normalization — the TPU-native replacement for
the reference's CPU preprocessing (cv2.warpAffine in DataLoader workers,
simple_transform.py:81-98,228-249).

Whole batches of person crops are produced on-device from full frames with
one fused gather/elementwise XLA program: bilinear sampling with constant-0
border (cv2.INTER_LINEAR + BORDER_CONSTANT semantics, up to cv2's 5-bit
fixed-point coefficient quantization) followed by the /255 + RGB mean
subtraction of im_to_torch (simple_transform.py:93-97).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .affine import box_to_center_scale, center_scale_to_box, get_affine_transform

# peak-memory cap for the (chunk, H, W, C) gathered-frames buffer inside
# warp_axis_aligned_batch — large source frames sub-chunk under this
_WARP_BUDGET_BYTES = 256 * 2 ** 20

__all__ = ["warp_affine_bilinear", "warp_axis_aligned_batch", "crop_batch",
           "RGB_MEAN"]

# Channel means subtracted after /255 (simple_transform.py:94-96), RGB order.
RGB_MEAN = np.array([0.406, 0.457, 0.480], dtype=np.float32)


def warp_affine_bilinear(image, inv_mat, out_size):
    """Bilinear warp of one HxWxC image. `inv_mat` maps dst -> src (2x3).

    out_size: (out_h, out_w) static.  Out-of-bounds samples read 0
    (BORDER_CONSTANT).  cv2.warpAffine takes the forward (src->dst) matrix
    and inverts it internally; callers here pass the inverse directly
    (get_affine_transform(..., inv=True)).
    """
    image = jnp.asarray(image)
    out_h, out_w = int(out_size[0]), int(out_size[1])
    H, W = image.shape[0], image.shape[1]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)              # (out_h, out_w)
    sx = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    sy = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xxc = jnp.clip(xx, 0, W - 1)
        yyc = jnp.clip(yy, 0, H - 1)
        v = image[yyc, xxc]                    # (out_h, out_w, C)
        return v * inb[..., None].astype(image.dtype)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out


def warp_axis_aligned_batch(frames, frame_idx, inv_mats, out_size,
                            precision=None):
    """Rotation-free batched bilinear warp as two weight-matrix matmuls.

    For an axis-aligned affine (inv_mat off-diagonals zero — every eval /
    scoring crop, since get_affine_transform is called with rot=0) the
    bilinear warp is separable: out[n] = Wy[n] @ frames[fi[n]] @ Wx[n]^T
    with hat-kernel (tent) weight rows.  The two einsums run on the MXU,
    where the equivalent general gather formulation costs ~3 ms/crop on
    v5e (gathers don't vectorize) — this is the scoring pipeline's
    hot-path warp.  Out-of-range source coordinates get all-zero weight
    rows, which reproduces BORDER_CONSTANT-0 exactly.

    frames: (F, H, W, C) float; frame_idx: (N,); inv_mats: (N, 2, 3)
    dst->src.  Returns (N, out_h, out_w, C).
    """
    out_h, out_w = int(out_size[0]), int(out_size[1])
    H, W = frames.shape[1], frames.shape[2]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    sy = inv_mats[:, 1, 1, None] * ys + inv_mats[:, 1, 2, None]  # (N, oh)
    sx = inv_mats[:, 0, 0, None] * xs + inv_mats[:, 0, 2, None]  # (N, ow)

    def hat(s, size):
        i = jnp.arange(size, dtype=jnp.float32)
        return jnp.clip(1.0 - jnp.abs(s[..., None] - i), 0.0, 1.0)

    wy = hat(sy, H)                        # (N, oh, H)
    wx = hat(sx, W)                        # (N, ow, W)
    fi = jnp.asarray(frame_idx)
    if precision is None:
        # Each output pixel is a 2-tap convex combination per axis, so the
        # contraction needs far less than full f32: bf16x3 (HIGH) is ~1e-5
        # absolute on [0,255] intensities — below cv2.warpAffine's own
        # 5-bit fixed-point coefficient quantization (~0.25) and the 1e-3
        # gather-warp envelope the parity tests pin.  HIGHEST (6-pass f32
        # emulation) costs 2x the MXU passes for no observable benefit
        # (measured: exp/profile_warp_precision.py).
        precision = jax.lax.Precision.HIGH
    elif precision is jax.lax.Precision.DEFAULT:
        # bf16 SERVING warp: the warp is HBM-bound, not MXU-bound — at
        # batch 512 the gathered frames + separable intermediate + crop
        # output move ~2.5 GB f32.  Under bf16 serving the crops are
        # quantized to bf16 at the model input anyway, so storing the
        # gather/intermediate/output in bf16 loses nothing downstream
        # (~1 LSB of the model's own input quantization) and halves the
        # warp's HBM traffic (measured ~1.5 ms/batch on v5e —
        # exp/profile_extras_bf16.py).  Parity/f32 callers never pass
        # DEFAULT (al/scoring.py:92).
        frames = frames.astype(jnp.bfloat16)
        wy = wy.astype(jnp.bfloat16)
        wx = wx.astype(jnp.bfloat16)

    def warp_chunk(fi_c, wx_c, wy_c):
        imgs = frames[fi_c]                # (n, H, W, C) contiguous gather
        tmp = jnp.einsum("now,nhwc->nhoc", wx_c, imgs, precision=precision)
        return jnp.einsum("noh,nhxc->noxc", wy_c, tmp, precision=precision)

    # cap the materialized frames[fi] buffer: at large H*W (in-HBM 1080p
    # scoring) a full (N, H, W, C) gather peaks at multiple GB.  Sub-chunk
    # via lax.map so peak extra memory stays ~_WARP_BUDGET_BYTES; shapes are
    # static so the split is trace-time only.
    N = fi.shape[0]
    bytes_per_img = H * W * frames.shape[3] * frames.dtype.itemsize
    chunk = max(1, _WARP_BUDGET_BYTES // max(1, bytes_per_img))
    if N <= chunk:
        return warp_chunk(fi, wx, wy)
    k = -(-N // chunk)
    pad = k * chunk - N
    fi_p = jnp.concatenate([fi, jnp.zeros(pad, fi.dtype)])
    wx_p = jnp.concatenate([wx, jnp.zeros((pad,) + wx.shape[1:], wx.dtype)])
    wy_p = jnp.concatenate([wy, jnp.zeros((pad,) + wy.shape[1:], wy.dtype)])
    out = jax.lax.map(
        lambda t: warp_chunk(*t),
        (fi_p.reshape(k, chunk), wx_p.reshape(k, chunk, *wx.shape[1:]),
         wy_p.reshape(k, chunk, *wy.shape[1:])))
    return out.reshape(k * chunk, out_h, out_w, -1)[:N]


def crop_batch(frames, frame_idx, bboxes_xyxy, input_size, aspect_ratio=None,
               normalize: bool = True, precision=None):
    """Produce normalized person crops for a batch of boxes on-device.

    frames: (F, H, W, 3) float32 in [0, 255] (decoded full frames, RGB).
    frame_idx: (N,) int — which frame each box crops from.
    bboxes_xyxy: (N, 4) raw person boxes.
    input_size: (inp_h, inp_w) static, e.g. (256, 192).

    Returns (crops (N, inp_h, inp_w, 3) float32 NHWC, bbox_crop (N, 4) xyxy —
    the aspect-corrected 1.25-padded crop box, i.e. the `bbox_crop` the
    reference's test_transform returns for decode back-projection).
    """
    inp_h, inp_w = int(input_size[0]), int(input_size[1])
    if aspect_ratio is None:
        aspect_ratio = float(inp_w) / float(inp_h)
    bb = jnp.asarray(bboxes_xyxy, jnp.float32)
    center, scale = box_to_center_scale(
        bb[:, 0], bb[:, 1], bb[:, 2] - bb[:, 0], bb[:, 3] - bb[:, 1],
        aspect_ratio)
    inv_mats = get_affine_transform(center, scale, 0.0, (inp_w, inp_h), inv=True)
    bbox_crop = center_scale_to_box(center, scale)
    # rot=0 by construction → the separable MXU warp applies
    crops = warp_axis_aligned_batch(frames, jnp.asarray(frame_idx), inv_mats,
                                    (inp_h, inp_w), precision=precision)
    if normalize:
        # same-dtype mean keeps bf16 serving crops bf16 (the /255−mean
        # fuses into the warp's second einsum epilogue — free in HBM terms)
        crops = crops / 255.0 - jnp.asarray(RGB_MEAN, crops.dtype)
    return crops, bbox_crop
