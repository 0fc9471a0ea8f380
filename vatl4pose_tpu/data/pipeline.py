"""Input pipelines: whole-video device-side preprocessing.

Replaces the reference's DataLoader-worker CPU preprocessing
(simple_transform.py) with host-side lightweight geometry (per-sample affine
parameters, numpy) + fused on-device warp/normalize/target generation.

Eval path parity: test_transform (simple_transform.py:81-98) — no
augmentation, scale*1.0, rot 0.
Train path parity: __call__ train branch (simple_transform.py:179-251) —
half-body transform, scale jitter, rotation jitter, horizontal flip, then
warp + Gaussian targets on device.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

UPPER_BODY_IDS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
LOWER_BODY_IDS = (11, 12, 13, 14, 15, 16)


def np_affine_transform(center, scale, rot_deg, out_wh, inv=False):
    """Closed-form similarity affine in pure numpy — the host-side twin of
    ops/affine.get_affine_transform (device calls per sample through the
    remote tunnel cost ~50 ms each; the retrain loop computes hundreds of
    these per batch on the host)."""
    dst_w, dst_h = float(out_wh[0]), float(out_wh[1])
    rot = np.deg2rad(rot_deg)
    src_w = float(scale[0])
    s = dst_w / src_w
    cs, sn = np.cos(rot), np.sin(rot)
    if not inv:
        m00, m01 = s * cs, s * sn
        m10, m11 = -s * sn, s * cs
        m02 = dst_w * 0.5 - (m00 * center[0] + m01 * center[1])
        m12 = dst_h * 0.5 - (m10 * center[0] + m11 * center[1])
    else:
        inv_s = src_w / dst_w
        m00, m01 = inv_s * cs, -inv_s * sn
        m10, m11 = inv_s * sn, inv_s * cs
        m02 = center[0] - (m00 * dst_w * 0.5 + m01 * dst_h * 0.5)
        m12 = center[1] - (m10 * dst_w * 0.5 + m11 * dst_h * 0.5)
    return np.array([[m00, m01, m02], [m10, m11, m12]], np.float32)


@dataclasses.dataclass
class AugCfg:
    scale_factor: float = 0.3
    rot_factor: float = 40.0
    flip: bool = False
    num_joints_half_body: int = 8
    prob_half_body: float = -1.0
    add_dpg: bool = False             # DPG second-stage aug (transforms.py:43)


def add_dpg(bbox_xyxy, imgwidth, imght, rng):
    """DPG random crop / random shift augmentation of the person box
    (transforms.py:43-73 addDPG), numpy RNG instead of global random."""
    b = list(bbox_xyxy)
    patch_scale = rng.uniform()
    width = b[2] - b[0]
    ht = b[3] - b[1]
    if patch_scale > 0.85:
        ratio = ht / width
        if width < ht:
            patch_w = patch_scale * width
            patch_h = patch_w * ratio
        else:
            patch_h = patch_scale * ht
            patch_w = patch_h / ratio
        xmin = b[0] + rng.uniform() * (width - patch_w)
        ymin = b[1] + rng.uniform() * (ht - patch_h)
        xmax = xmin + patch_w + 1
        ymax = ymin + patch_h + 1
    else:
        xmin = max(1, min(b[0] + rng.normal(-0.0142, 0.1158) * width,
                          imgwidth - 3))
        ymin = max(1, min(b[1] + rng.normal(0.0043, 0.068) * ht, imght - 3))
        xmax = min(max(xmin + 2, b[2] + rng.normal(0.0154, 0.1337) * width),
                   imgwidth - 3)
        ymax = min(max(ymin + 2, b[3] + rng.normal(-0.0013, 0.0711) * ht),
                   imght - 3)
    return np.array([xmin, ymin, xmax, ymax], np.float32)


def _box_center_scale_np(bbox_xyxy, aspect_ratio, scale_mult=1.25):
    x0, y0, x1, y1 = bbox_xyxy
    w, h = x1 - x0, y1 - y0
    cx, cy = x0 + 0.5 * w, y0 + 0.5 * h
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    return np.array([cx, cy], np.float32), \
        np.array([w, h], np.float32) * scale_mult


def _half_body(joints_xy, joints_vis, aspect_ratio, rng):
    """simple_transform.py:253-296."""
    upper, lower = [], []
    for j in range(joints_xy.shape[0]):
        if joints_vis[j] > 0:
            (upper if j in UPPER_BODY_IDS else lower).append(joints_xy[j])
    if rng.standard_normal() < 0.5 and len(upper) > 2:
        sel = upper
    else:
        sel = lower if len(lower) > 2 else upper
    if len(sel) < 2:
        return None, None
    sel = np.asarray(sel, np.float32)
    center = sel.mean(axis=0)
    lt, rb = sel.min(axis=0), sel.max(axis=0)
    w, h = rb[0] - lt[0], rb[1] - lt[1]
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    return center, np.array([w, h], np.float32) * 1.5


def train_sample_geometry(bboxes_xyxy: np.ndarray, joints_xy: np.ndarray,
                          joints_vis: np.ndarray, img_wh: Tuple[int, int],
                          input_size: Tuple[int, int], aug: AugCfg,
                          joint_pairs, rng: np.random.Generator):
    # img_wh = (width, height)
    """Per-sample augmented crop geometry for a training batch.

    Returns (inv_mats (N,2,3) dst->src for the device warp, flip (N,) bool —
    applied as a final x-mirror of the source coordinate, target joints_xy in
    input space (N,K,2), joints_vis (N,K), fwd_mats (N,2,3) src->dst with the
    flip folded in — the cv2.warpAffine convention the host/native streaming
    warp consumes).
    """
    n, K = joints_xy.shape[0], joints_xy.shape[1]
    inp_h, inp_w = input_size
    ar = inp_w / inp_h
    # img_wh: (width, height) tuple, or (N, 2) per-sample sizes for batches
    # spanning videos of different resolutions (combined pre-training jsons)
    if np.ndim(img_wh) == 2:
        widths, heights = np.asarray(img_wh)[:, 0], np.asarray(img_wh)[:, 1]
    else:
        widths = np.full(n, img_wh[0])
        heights = np.full(n, img_wh[1])
    inv_mats = np.zeros((n, 2, 3), np.float32)
    fwd_mats = np.zeros((n, 2, 3), np.float32)
    out_joints = joints_xy.astype(np.float32).copy()
    out_vis = joints_vis.astype(np.float32).copy()
    flips = np.zeros(n, bool)
    for i in range(n):
        width, height = widths[i], heights[i]
        bb = bboxes_xyxy[i]
        if aug.add_dpg:
            bb = add_dpg(bb, width, height, rng)
        center, scale = _box_center_scale_np(bb, ar)
        jxy = joints_xy[i].astype(np.float32).copy()
        jv = joints_vis[i].astype(np.float32).copy()
        if (jv.sum() > aug.num_joints_half_body
                and rng.uniform() < aug.prob_half_body):
            c_h, s_h = _half_body(jxy, jv, ar, rng)
            if c_h is not None:
                center, scale = c_h, s_h
        sf = aug.scale_factor
        scale = scale * np.clip(rng.standard_normal() * sf + 1, 1 - sf, 1 + sf)
        rf = aug.rot_factor
        r = (np.clip(rng.standard_normal() * rf, -rf * 2, rf * 2)
             if rng.uniform() <= 0.6 else 0.0)
        if aug.flip and rng.uniform() > 0.5:
            flips[i] = True
            # flip joints (transforms.py:521-547): x' = w - x - 1, pair swap,
            # x *= vis
            jxy[:, 0] = width - jxy[:, 0] - 1
            for a, b in joint_pairs:
                jxy[[a, b]] = jxy[[b, a]]
                jv[[a, b]] = jv[[b, a]]
            jxy[:, 0] *= jv
            center[0] = width - center[0] - 1
        fwd = np_affine_transform(center, scale, r, (inp_w, inp_h))
        inv = np_affine_transform(center, scale, r, (inp_w, inp_h),
                                  inv=True)
        fwd_f = fwd.copy()
        if flips[i]:
            # fold the image flip into the dst->src map: the flipped image's
            # pixel sx reads the original at width-1-sx.
            inv[0, 0] = -inv[0, 0]
            inv[0, 1] = -inv[0, 1]
            inv[0, 2] = width - 1 - inv[0, 2]
            # and into the src->dst map: dst = fwd(w-1-x, y)
            fwd_f[:, 2] = fwd_f[:, 2] + fwd_f[:, 0] * (width - 1)
            fwd_f[:, 0] = -fwd_f[:, 0]
        inv_mats[i] = inv
        fwd_mats[i] = fwd_f
        for j in range(K):
            if jv[j] > 0:
                pt = np.array([jxy[j, 0], jxy[j, 1], 1.0], np.float32)
                jxy[j] = fwd @ pt
        out_joints[i] = jxy
        out_vis[i] = jv
    return inv_mats, flips, out_joints, out_vis, fwd_mats


def eval_sample_geometry(bboxes_xyxy: np.ndarray,
                         input_size: Tuple[int, int], want_fwd: bool = False):
    """Deterministic eval-crop geometry: (inv_mats (N,2,3), bbox_crop (N,4))
    — with want_fwd, also the src->dst mats the host/native warp uses."""
    inp_h, inp_w = input_size
    ar = inp_w / inp_h
    n = bboxes_xyxy.shape[0]
    inv_mats = np.zeros((n, 2, 3), np.float32)
    fwd_mats = np.zeros((n, 2, 3), np.float32)
    bbox_crop = np.zeros((n, 4), np.float32)
    for i in range(n):
        center, scale = _box_center_scale_np(bboxes_xyxy[i], ar)
        inv_mats[i] = np_affine_transform(center, scale, 0.0,
                                          (inp_w, inp_h), inv=True)
        if want_fwd:
            fwd_mats[i] = np_affine_transform(center, scale, 0.0,
                                              (inp_w, inp_h))
        bbox_crop[i] = [center[0] - scale[0] / 2, center[1] - scale[1] / 2,
                        center[0] + scale[0] / 2, center[1] + scale[1] / 2]
    if want_fwd:
        return inv_mats, bbox_crop, fwd_mats
    return inv_mats, bbox_crop


def pad_to(arr: np.ndarray, n: int, axis: int = 0):
    """Pad along axis to length n with zeros (static-shape batching)."""
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


def bucket_size(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048, 4096)):
    """Smallest bucket >= n (bounds recompilation across rounds/videos)."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + 1023) // 1024) * 1024
