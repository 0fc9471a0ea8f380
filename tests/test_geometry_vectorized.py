"""train_sample_geometry vectorization: bit-compat vs the per-sample loop.

The vectorized implementation must reproduce the original per-sample loop
EXACTLY — same rng draw order (so old seeds reproduce old geometry) and
same outputs to float32 round-off — across every augmentation branch
(dpg, half-body, scale/rot jitter, flip with pair swaps, per-sample sizes).
"""

import numpy as np
import pytest

from vatl4pose_tpu.data.pipeline import (AugCfg, _box_center_scale_np,
                                         _half_body, add_dpg,
                                         np_affine_transform,
                                         train_sample_geometry)


def _loop_geometry(bboxes_xyxy, joints_xy, joints_vis, img_wh, input_size,
                   aug, joint_pairs, rng):
    """The original per-sample implementation (pre-vectorization oracle)."""
    n, K = joints_xy.shape[0], joints_xy.shape[1]
    inp_h, inp_w = input_size
    ar = inp_w / inp_h
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
        scale = scale * np.clip(rng.standard_normal() * sf + 1,
                                1 - sf, 1 + sf)
        rf = aug.rot_factor
        r = (np.clip(rng.standard_normal() * rf, -rf * 2, rf * 2)
             if rng.uniform() <= 0.6 else 0.0)
        if aug.flip and rng.uniform() > 0.5:
            flips[i] = True
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
            inv[0, 0] = -inv[0, 0]
            inv[0, 1] = -inv[0, 1]
            inv[0, 2] = width - 1 - inv[0, 2]
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


def _mkdata(n, rng, wide=False):
    bb = np.stack([10 + rng.uniform(0, 5, n), 12 + rng.uniform(0, 5, n),
                   100 + rng.uniform(0, 80, n),
                   200 + rng.uniform(0, 60, n)], 1).astype(np.float32)
    jxy = rng.uniform(10, 90, (n, 17, 2)).astype(np.float32)
    jv = (rng.uniform(size=(n, 17)) > (0.6 if wide else 0.2)).astype(
        np.float32)
    return bb, jxy, jv


PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14],
         [15, 16]]


@pytest.mark.parametrize("aug,pairs", [
    (AugCfg(scale_factor=0.0, rot_factor=0, flip=False), []),
    (AugCfg(scale_factor=0.3, rot_factor=40, flip=False), []),
    (AugCfg(scale_factor=0.3, rot_factor=40, flip=True), PAIRS),
    (AugCfg(scale_factor=0.3, rot_factor=40, flip=True,
            num_joints_half_body=8, prob_half_body=0.5), PAIRS),
    (AugCfg(scale_factor=0.25, rot_factor=30, flip=True,
            num_joints_half_body=8, prob_half_body=0.4, add_dpg=True),
     PAIRS),
])
def test_vectorized_matches_loop(aug, pairs):
    data_rng = np.random.default_rng(42)
    bb, jxy, jv = _mkdata(64, data_rng)
    a = _loop_geometry(bb, jxy, jv, (640, 480), (256, 192), aug, pairs,
                       np.random.default_rng(7))
    b = train_sample_geometry(bb, jxy, jv, (640, 480), (256, 192), aug,
                              pairs, np.random.default_rng(7))
    names = ("inv_mats", "flips", "out_joints", "out_vis", "fwd_mats")
    for name, x, y in zip(names, a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-6, atol=2e-4, err_msg=name)


def test_rng_stream_identical_after_call():
    """Draw-count parity: after one batch the rng stream position matches
    the loop's, so multi-step sequences reproduce bit-identically."""
    aug = AugCfg(scale_factor=0.3, rot_factor=40, flip=True,
                 num_joints_half_body=8, prob_half_body=0.5)
    data_rng = np.random.default_rng(1)
    bb, jxy, jv = _mkdata(32, data_rng, wide=True)
    r1, r2 = np.random.default_rng(3), np.random.default_rng(3)
    _loop_geometry(bb, jxy, jv, (640, 480), (256, 192), aug, PAIRS, r1)
    train_sample_geometry(bb, jxy, jv, (640, 480), (256, 192), aug, PAIRS,
                          r2)
    assert r1.uniform() == r2.uniform()


def test_per_sample_sizes():
    aug = AugCfg(scale_factor=0.3, rot_factor=40, flip=True)
    data_rng = np.random.default_rng(5)
    bb, jxy, jv = _mkdata(16, data_rng)
    sizes = np.stack([data_rng.integers(320, 640, 16),
                      data_rng.integers(240, 480, 16)], 1)
    a = _loop_geometry(bb, jxy, jv, sizes, (256, 192), aug, PAIRS,
                       np.random.default_rng(11))
    b = train_sample_geometry(bb, jxy, jv, sizes, (256, 192), aug, PAIRS,
                              np.random.default_rng(11))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-6, atol=2e-4)
