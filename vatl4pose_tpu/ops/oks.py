"""Object Keypoint Similarity — batched JAX.

Parity: active_learning/al_metric.py:38-69 (compute_OKS) and
JRDB_toolkit/pose_eval.py:177-221 (get_oks_matrix).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# COCO sigmas (al_metric.py:38).
COCO_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
     1.07, 1.07, .87, .87, .89, .89], dtype=np.float64) / 10.0
COCO_VARS = (COCO_SIGMAS * 2) ** 2

# JRDB sigmas (pose_eval.py:127-130).
JRDB_SIGMAS = np.array(
    [0.079, 0.025, 0.025, 0.079, 0.026, 0.079, 0.072, 0.072, 0.107,
     0.062, 0.107, 0.107, 0.062, 0.087, 0.087, 0.089, 0.089], dtype=np.float64)
JRDB_VARS = (JRDB_SIGMAS * 2) ** 2

__all__ = ["COCO_SIGMAS", "COCO_VARS", "JRDB_SIGMAS", "JRDB_VARS", "oks_kpts_matrix",
           "compute_oks", "oks_matrix"]


def compute_oks(pred_kpts, gt_kpts, bbox_xywh, variances=None):
    """OKS between predicted and GT keypoints (batched).

    pred_kpts, gt_kpts: (..., 3K) interleaved (x, y, v) — same flat layout the
    reference feeds compute_OKS.  bbox_xywh: (..., 4) GT bbox.
    Parity: al_metric.py:42-69 — body_area = w*h (not the COCO 'area' field),
    no 'ignore region' fallback unless zero keypoints are visible, and the
    mean is over *visible* GT keypoints only.
    """
    if variances is None:
        variances = COCO_VARS
    var = jnp.asarray(variances, jnp.float64) if jnp.asarray(pred_kpts).dtype == jnp.float64 \
        else jnp.asarray(variances, jnp.float32)
    d = jnp.asarray(pred_kpts)
    g = jnp.asarray(gt_kpts)
    xd, yd = d[..., 0::3], d[..., 1::3]
    xg, yg, vg = g[..., 0::3], g[..., 1::3], g[..., 2::3]
    visible = vg > 0
    k1 = jnp.sum(visible, axis=-1)

    bb = jnp.asarray(bbox_xywh, d.dtype)
    x0 = bb[..., 0:1] - bb[..., 2:3]
    x1 = bb[..., 0:1] + bb[..., 2:3] * 2
    y0 = bb[..., 1:2] - bb[..., 3:4]
    y1 = bb[..., 1:2] + bb[..., 3:4] * 2
    area = bb[..., 2] * bb[..., 3]

    dx_vis = xd - xg
    dy_vis = yd - yg
    dx_inv = jnp.maximum(0, x0 - xd) + jnp.maximum(0, xd - x1)
    dy_inv = jnp.maximum(0, y0 - yd) + jnp.maximum(0, yd - y1)
    use_vis = (k1 > 0)[..., None]
    dx = jnp.where(use_vis, dx_vis, dx_inv)
    dy = jnp.where(use_vis, dy_vis, dy_inv)

    e = (dx ** 2 + dy ** 2) / var / (area[..., None] + np.spacing(1)) * 0.5
    exp_e = jnp.exp(-e)
    K = d.shape[-1] // 3
    # visible-only mean when k1>0, full mean otherwise.
    num_vis = jnp.sum(jnp.where(visible, exp_e, 0.0), axis=-1)
    cnt = jnp.maximum(k1, 1)
    oks_vis = num_vis / cnt
    oks_all = jnp.mean(exp_e, axis=-1)
    return jnp.where(k1 > 0, oks_vis, oks_all)


def oks_matrix(gt_kpts, gt_bbox_xywh, gt_area, pred_kpts, variances=None,
               force_visible: bool = False):
    """G x P OKS matrix (pose_eval.py:177-221 / pycocotools computeOks).

    gt_kpts: (G, 3K); pred_kpts: (P, 3K); gt_bbox_xywh: (G, 4);
    gt_area: (G,) — uses the annotation 'area' when present (reference falls
    back to w*h).  force_visible mirrors get_per_kp_oks_matrix's vg=ones.
    """
    if variances is None:
        variances = JRDB_VARS
    var = np.asarray(variances, np.float64)
    g = np.asarray(gt_kpts, np.float64)
    d = np.asarray(pred_kpts, np.float64)
    G, P = g.shape[0], d.shape[0]
    xg, yg, vg = g[:, 0::3], g[:, 1::3], g[:, 2::3]
    if force_visible:
        vg = np.ones_like(vg)
    xd, yd = d[:, 0::3], d[:, 1::3]
    bb = np.asarray(gt_bbox_xywh, np.float64)
    area = np.asarray(gt_area, np.float64)
    out = np.zeros((G, P), np.float64)
    for j in range(G):
        k1 = np.count_nonzero(vg[j] > 0)
        if k1 > 0:
            dx = xd - xg[j]
            dy = yd - yg[j]
        else:
            x0 = bb[j, 0] - bb[j, 2]
            x1 = bb[j, 0] + bb[j, 2] * 2
            y0 = bb[j, 1] - bb[j, 3]
            y1 = bb[j, 1] + bb[j, 3] * 2
            dx = np.maximum(0, x0 - xd) + np.maximum(0, xd - x1)
            dy = np.maximum(0, y0 - yd) + np.maximum(0, yd - y1)
        e = (dx ** 2 + dy ** 2) / var / (area[j] + np.spacing(1)) / 2
        if k1 > 0:
            e = e[:, vg[j] > 0]
        out[j] = np.sum(np.exp(-e), axis=1) / e.shape[1]
    return out


def oks_kpts_matrix(gt_kpts, gt_area, pred_kpts, variances=None):
    """(G, P, K) per-keypoint OKS terms over ALL joints
    (JRDB_toolkit/posetrack/datasets/jrdbpose.py:611-619: e = d²/vars/body/2,
    exp(-e), no visibility gating — 'JRDB assumption: all joints valid')."""
    if variances is None:
        variances = JRDB_VARS
    var = np.asarray(variances, np.float64)
    g = np.asarray(gt_kpts, np.float64)
    d = np.asarray(pred_kpts, np.float64)
    xg, yg = g[:, 0::3], g[:, 1::3]
    xd, yd = d[:, 0::3], d[:, 1::3]
    area = np.asarray(gt_area, np.float64)
    dx = xd[None, :, :] - xg[:, None, :]
    dy = yd[None, :, :] - yg[:, None, :]
    e = (dx ** 2 + dy ** 2) / var[None, None, :] \
        / (area[:, None, None] * 2.0)
    return np.exp(-e)
