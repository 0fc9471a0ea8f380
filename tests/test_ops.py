"""Golden tests: core numerics vs plain-numpy/cv2/scipy replicas of the
reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vatl4pose_tpu import ops
from tests import reference_impl as ref

RNG = np.random.default_rng(166)


def rand_center_scale(n):
    centers = RNG.uniform(10, 800, size=(n, 2)).astype(np.float32)
    w = RNG.uniform(5, 300, size=n).astype(np.float32)
    h = w * 4 / 3 * RNG.uniform(0.8, 1.2, size=n).astype(np.float32)
    return centers, np.stack([w, h], 1)


class TestAffine:
    @pytest.mark.parametrize("inv", [0, 1])
    @pytest.mark.parametrize("rot", [0.0, 15.0, -40.0])
    def test_matches_cv2_three_point_solve(self, inv, rot):
        centers, scales = rand_center_scale(16)
        out_size = (192, 256)
        ours = np.asarray(ops.get_affine_transform(
            centers, scales, rot, out_size, inv=bool(inv)))
        for i in range(16):
            golden = ref.ref_get_affine_transform(
                centers[i], scales[i], rot, out_size, inv=inv)
            np.testing.assert_allclose(ours[i], golden, rtol=1e-4, atol=1e-3)

    def test_box_to_center_scale(self):
        for _ in range(50):
            x, y = RNG.uniform(0, 500, 2)
            w, h = RNG.uniform(1, 300, 2)
            ar = 192.0 / 256.0
            c_ref, s_ref = ref.ref_box_to_center_scale(x, y, w, h, ar)
            c, s = ops.box_to_center_scale(x, y, w, h, ar)
            np.testing.assert_allclose(np.asarray(c), c_ref, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-5)

    def test_center_scale_roundtrip(self):
        centers, scales = rand_center_scale(8)
        box = np.asarray(ops.center_scale_to_box(centers, scales))
        assert box.shape == (8, 4)
        np.testing.assert_allclose(box[:, 2] - box[:, 0], scales[:, 0], rtol=1e-5)

    def test_transform_preds_inverts_forward(self):
        centers, scales = rand_center_scale(4)
        # forward-map a point into the 48x64 heatmap, then back.
        pts = RNG.uniform(0, 40, size=(4, 17, 2)).astype(np.float32)
        out = np.asarray(ops.transform_preds(
            jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(scales), (48, 64)))
        fwd = np.asarray(ops.get_affine_transform(centers, scales, 0.0, (48, 64)))
        for i in range(4):
            back = (fwd[i, :, :2] @ out[i].T + fwd[i, :, 2:]).T
            np.testing.assert_allclose(back, pts[i], rtol=1e-3, atol=1e-2)


class TestHeatmapDecode:
    def _rand_hms(self, n=6, k=17, h=64, w=48):
        return RNG.normal(0.1, 0.5, size=(n, k, h, w)).astype(np.float32)

    def test_decode_matches_reference(self):
        hms = self._rand_hms()
        boxes = []
        for _ in range(hms.shape[0]):
            x0, y0 = RNG.uniform(0, 400, 2)
            w = RNG.uniform(30, 200)
            boxes.append([x0, y0, x0 + w, y0 + w * 4 / 3])
        boxes = np.array(boxes, dtype=np.float32)
        coords, scores = ops.heatmap_to_coord(jnp.asarray(hms), jnp.asarray(boxes))
        coords, scores = np.asarray(coords), np.asarray(scores)
        for i in range(hms.shape[0]):
            pref, sref = ref.ref_heatmap_to_coord_simple(hms[i], boxes[i])
            np.testing.assert_allclose(coords[i], pref, rtol=1e-3, atol=2e-2)
            np.testing.assert_allclose(scores[i], sref[:, 0], rtol=1e-5)

    def test_decode_zero_maxval_masks_coords(self):
        hms = -np.abs(self._rand_hms(n=1))
        coords, _ = ops.get_max_pred(jnp.asarray(hms))
        np.testing.assert_array_equal(np.asarray(coords), 0.0)

    def test_gaussian_target_matches_reference(self):
        n_j = 17
        for _ in range(8):
            joints = np.zeros((n_j, 3, 2), dtype=np.float32)
            joints[:, 0, 0] = RNG.uniform(-30, 230, n_j)   # x
            joints[:, 1, 0] = RNG.uniform(-30, 300, n_j)   # y
            vis = (RNG.uniform(size=n_j) > 0.3).astype(np.float32)
            joints[:, 0, 1] = vis
            joints[:, 1, 1] = vis
            t_ref, w_ref = ref.ref_target_generator(
                joints, n_j, (64, 48), 2, (4.0, 4.0))
            t, w = ops.gaussian_target(
                joints[:, :2, 0][:, ::1][:, :, ], vis, (64, 48), 2.0)
            # joints_xy expected as (K, 2) = (x, y)
            t2, w2 = ops.gaussian_target(
                np.stack([joints[:, 0, 0], joints[:, 1, 0]], -1), vis,
                (64, 48), 2.0)
            np.testing.assert_allclose(np.asarray(t2), t_ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(w2), w_ref[:, 0], rtol=1e-6)

    def test_flip_heatmap(self):
        hms = self._rand_hms(n=2)
        pairs = [[5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]
        out = np.asarray(ops.flip_heatmap(jnp.asarray(hms), pairs, shift=True))
        golden = hms[:, :, :, ::-1].copy()
        for a, b in pairs:
            golden[:, [a, b]] = golden[:, [b, a]]
        shifted = golden.copy()
        shifted[..., 1:] = golden[..., :-1]
        np.testing.assert_allclose(out, shifted, rtol=1e-6)


class TestOKS:
    def test_matches_reference(self):
        for _ in range(30):
            kp_g = RNG.uniform(0, 500, size=51)
            kp_g[2::3] = (RNG.uniform(size=17) > 0.3).astype(float)
            kp_d = kp_g + RNG.normal(0, 10, size=51)
            bb = [100.0, 80.0, 150.0, 200.0]
            golden = ref.ref_compute_oks(bb, kp_d, kp_g, ops.COCO_VARS)
            got = float(ops.compute_oks(
                jnp.asarray(kp_d, jnp.float32), jnp.asarray(kp_g, jnp.float32),
                jnp.asarray(bb, jnp.float32)))
            np.testing.assert_allclose(got, golden, rtol=1e-4)

    def test_no_visible_keypoints_branch(self):
        kp_g = RNG.uniform(0, 500, size=51)
        kp_g[2::3] = 0.0
        kp_d = RNG.uniform(0, 600, size=51)
        bb = [100.0, 80.0, 150.0, 200.0]
        golden = ref.ref_compute_oks(bb, kp_d, kp_g, ops.COCO_VARS)
        got = float(ops.compute_oks(
            jnp.asarray(kp_d, jnp.float32), jnp.asarray(kp_g, jnp.float32),
            jnp.asarray(bb, jnp.float32)))
        np.testing.assert_allclose(got, golden, rtol=1e-4)


class TestPeaks:
    def test_localpeak_mean(self):
        hms = RNG.normal(0.2, 0.4, size=(4, 17, 64, 48)).astype(np.float32)
        got = np.asarray(ops.localpeak_mean(jnp.asarray(hms)))
        for i in range(4):
            golden = ref.ref_localpeak_mean(hms[i])
            np.testing.assert_allclose(got[i], golden, rtol=1e-4)

    def test_mpe_and_margin(self):
        # smooth heatmaps with a few distinct bumps (the realistic regime)
        hms = np.zeros((2, 3, 64, 48), dtype=np.float32)
        for i in range(2):
            for j in range(3):
                for _ in range(4):
                    cy, cx = RNG.integers(6, 58), RNG.integers(6, 42)
                    yy, xx = np.mgrid[0:64, 0:48]
                    hms[i, j] += np.exp(
                        -((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0
                    ).astype(np.float32) * RNG.uniform(0.3, 1.0)
        got_mpe = np.asarray(ops.compute_mpe(jnp.asarray(hms)))
        got_margin = np.asarray(ops.compute_margin(jnp.asarray(hms)))
        for i in range(2):
            np.testing.assert_allclose(got_mpe[i], ref.ref_compute_mpe(hms[i]),
                                       rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(got_margin[i],
                                       ref.ref_compute_margin(hms[i]),
                                       rtol=1e-3, atol=1e-5)

    def test_entropy_matches_scipy(self):
        from scipy.stats import entropy as sp_entropy
        hms = np.abs(RNG.normal(0.2, 0.4, size=(2, 5, 16, 12))).astype(np.float32)
        got = np.asarray(ops.compute_entropy(jnp.asarray(hms)))
        for i in range(2):
            golden = sum(sp_entropy(hms[i, j].flatten()) for j in range(5))
            np.testing.assert_allclose(got[i], golden, rtol=1e-4)


class TestTemporal:
    def test_thc_matches_reference(self):
        n, k = 10, 17
        hms = RNG.normal(0, 1, size=(n, k, 16, 12)).astype(np.float32)
        is_prev = RNG.uniform(size=n) > 0.3
        is_next = RNG.uniform(size=n) > 0.3
        got = np.asarray(ops.thc_scores(jnp.asarray(hms), is_prev, is_next))
        for i in range(n):
            thc = 0.0
            if is_prev[i]:
                thc += np.sum(np.abs(hms[i] - hms[i - 1])) / k
            if is_next[i]:
                thc += np.sum(np.abs(hms[i] - hms[(i + 1) % n])) / k
                if not is_prev[i]:
                    thc *= 2
            elif is_prev[i]:
                thc *= 2
            np.testing.assert_allclose(got[i], thc, rtol=1e-4)

    def test_tpc_decodes_neighbor_with_current_bbox(self):
        n, k = 6, 17
        hms = RNG.normal(0.1, 0.5, size=(n, k, 64, 48)).astype(np.float32)
        boxes = np.zeros((n, 4), dtype=np.float32)
        boxes[:, 0] = RNG.uniform(0, 100, n)
        boxes[:, 1] = RNG.uniform(0, 100, n)
        boxes[:, 2] = boxes[:, 0] + RNG.uniform(50, 150, n)
        boxes[:, 3] = boxes[:, 1] + RNG.uniform(70, 200, n)
        is_prev = np.array([False, True, True, False, True, True])
        is_next = np.array([True, True, False, True, True, False])
        coords, _ = ops.heatmap_to_coord(jnp.asarray(hms), jnp.asarray(boxes))
        got = np.asarray(ops.tpc_scores(
            jnp.asarray(hms), coords, jnp.asarray(boxes), is_prev, is_next))
        coords = np.asarray(coords)
        for i in range(n):
            thresh = 0.01 * np.sqrt((boxes[i, 2] - boxes[i, 0])
                                    * (boxes[i, 3] - boxes[i, 1]))
            tpc = 0.0
            if is_prev[i]:
                adj, _ = ref.ref_heatmap_to_coord_simple(hms[i - 1], boxes[i])
                tpc += np.count_nonzero(
                    np.linalg.norm(coords[i] - adj, axis=1) > thresh)
            if is_next[i]:
                adj, _ = ref.ref_heatmap_to_coord_simple(hms[(i + 1) % n], boxes[i])
                tpc += np.count_nonzero(
                    np.linalg.norm(coords[i] - adj, axis=1) > thresh)
                if not is_prev[i]:
                    tpc *= 2
            elif is_prev[i]:
                tpc *= 2
            np.testing.assert_allclose(got[i], tpc)


class TestHybrid:
    def test_38d_matches_reference_15kp_convention(self):
        # 15-keypoint triangles in the dropped-ear indexing (the documented
        # intent — old table at hybrid_feature.py:43).
        tri_15 = [[6, 4, 10], [4, 6, 8], [3, 5, 7], [5, 3, 9],
                  [9, 10, 12], [10, 9, 11], [10, 12, 14], [9, 11, 13]]
        for _ in range(10):
            kp = RNG.uniform(10, 500, size=51)
            kp[2::3] = RNG.uniform(0.1, 1.0, size=17)
            bb = [50.0, 60.0, 120.0, 240.0]
            kp15 = np.concatenate([kp[:9], kp[15:]])
            golden = ref.ref_compute_hybrid(bb, kp15, tri_15)
            got = np.asarray(ops.compute_hybrid(
                jnp.asarray(bb, jnp.float32), jnp.asarray(kp, jnp.float32)))
            assert got.shape == (38,)
            np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-5)

    def test_42d_variant(self):
        kp = RNG.uniform(10, 500, size=51)
        kp[2::3] = RNG.uniform(0.1, 1.0, size=17)
        bb = [50.0, 60.0, 120.0, 240.0]
        golden = ref.ref_compute_hybrid(bb, kp, ops.ANGLE_TRIANGLES_17)
        got = np.asarray(ops.compute_hybrid(
            jnp.asarray(bb, jnp.float32), jnp.asarray(kp, jnp.float32),
            drop_ears=False))
        assert got.shape == (42,)
        np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-5)


class TestWarp:
    def test_matches_cv2_warp_affine(self):
        import cv2
        img = RNG.integers(0, 255, size=(200, 300, 3)).astype(np.uint8)
        center = np.array([150.0, 100.0], np.float32)
        scale = np.array([90.0, 120.0], np.float32)
        trans = ref.ref_get_affine_transform(center, scale, 0, [192, 256])
        golden = cv2.warpAffine(img, trans, (192, 256), flags=cv2.INTER_LINEAR)
        inv = ops.get_affine_transform(center, scale, 0.0, (192, 256), inv=True)
        got = np.asarray(ops.warp_affine_bilinear(
            jnp.asarray(img, jnp.float32), inv, (256, 192)))
        # cv2 uses 5-bit fixed-point interpolation coefficients.
        assert np.abs(got - golden.astype(np.float32)).max() <= 4.0
        assert np.abs(got - golden.astype(np.float32)).mean() < 0.6

    def test_separable_matmul_warp_matches_gather_warp(self):
        """warp_axis_aligned_batch (two MXU einsums) must reproduce the
        general gather warp on rot=0 affines, including out-of-frame
        borders (constant 0)."""
        frames = RNG.uniform(0, 255, size=(4, 120, 160, 3)).astype(np.float32)
        n = 8
        fidx = RNG.integers(0, 4, n)
        # scale/translate-only dst->src matrices, some sampling far outside
        mats = np.zeros((n, 2, 3), np.float32)
        mats[:, 0, 0] = RNG.uniform(0.3, 1.5, n)
        mats[:, 1, 1] = RNG.uniform(0.3, 1.5, n)
        mats[:, 0, 2] = RNG.uniform(-60, 140, n)
        mats[:, 1, 2] = RNG.uniform(-60, 110, n)
        got = np.asarray(ops.warp_axis_aligned_batch(
            jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(mats),
            (64, 48)))
        golden = np.stack([
            np.asarray(ops.warp_affine_bilinear(
                jnp.asarray(frames[fidx[i]]), jnp.asarray(mats[i]), (64, 48)))
            for i in range(n)])
        np.testing.assert_allclose(got, golden, rtol=1e-4, atol=2e-3)

    def test_separable_warp_chunked_path_exact(self, monkeypatch):
        """Forcing a tiny _WARP_BUDGET_BYTES must route through the
        lax.map sub-chunk path (incl. ragged tail padding) and reproduce
        the unchunked result bit-exactly."""
        from vatl4pose_tpu.ops import warp as warp_mod
        frames = RNG.uniform(0, 255, size=(4, 120, 160, 3)).astype(np.float32)
        n = 7                                   # odd: exercises tail padding
        fidx = RNG.integers(0, 4, n)
        mats = np.zeros((n, 2, 3), np.float32)
        mats[:, 0, 0] = RNG.uniform(0.3, 1.5, n)
        mats[:, 1, 1] = RNG.uniform(0.3, 1.5, n)
        mats[:, 0, 2] = RNG.uniform(-60, 140, n)
        mats[:, 1, 2] = RNG.uniform(-60, 110, n)
        args = (jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(mats),
                (64, 48))
        full = np.asarray(ops.warp_axis_aligned_batch(*args))
        # budget for exactly 2 images per chunk -> k=4 chunks, 1 pad slot
        monkeypatch.setattr(warp_mod, "_WARP_BUDGET_BYTES",
                            2 * 120 * 160 * 3 * 4)
        chunked = np.asarray(ops.warp_axis_aligned_batch(*args))
        np.testing.assert_array_equal(chunked, full)

    def test_bf16_serving_warp_close_to_f32(self):
        """Precision.DEFAULT routes the warp through bf16 storage (the bf16
        serving path, ops/warp.py) — crops must come back bf16 and within
        bf16 quantization of the f32 reference path on normalized units."""
        frames = RNG.uniform(0, 255, size=(4, 120, 160, 3)).astype(np.float32)
        boxes = np.stack([RNG.uniform(0, 60, 6), RNG.uniform(0, 50, 6),
                          RNG.uniform(80, 150, 6), RNG.uniform(70, 110, 6)],
                         1).astype(np.float32)
        fidx = RNG.integers(0, 4, 6)
        ref_crops, bb_f32 = ops.crop_batch(jnp.asarray(frames), fidx, boxes,
                                           (64, 48))
        got, bb = ops.crop_batch(jnp.asarray(frames), fidx, boxes, (64, 48),
                                 precision=jax.lax.Precision.DEFAULT)
        assert got.dtype == jnp.bfloat16
        # normalized crops live in [-0.5, 0.6]; bf16 eps there is ~4e-3 and
        # the 2-tap x 2-axis combination at bf16 stays within a few ulps
        err = np.abs(np.asarray(got, np.float32) - np.asarray(ref_crops))
        assert err.max() < 2e-2, err.max()
        assert err.mean() < 3e-3, err.mean()
        # crop-box geometry is host/f32 — unchanged by the serving dtype
        np.testing.assert_array_equal(np.asarray(bb), np.asarray(bb_f32))

    def test_crop_batch_shapes_and_bbox(self):
        frames = RNG.uniform(0, 255, size=(3, 120, 160, 3)).astype(np.float32)
        boxes = np.array([[10, 10, 60, 100], [30, 20, 90, 110]], np.float32)
        fidx = np.array([0, 2])
        crops, bbox_crop = ops.crop_batch(
            jnp.asarray(frames), fidx, boxes, (256, 192))
        assert crops.shape == (2, 256, 192, 3)
        bc = np.asarray(bbox_crop)
        for i in range(2):
            c_ref, s_ref = ref.ref_box_to_center_scale(
                boxes[i, 0], boxes[i, 1], boxes[i, 2] - boxes[i, 0],
                boxes[i, 3] - boxes[i, 1], 0.75)
            np.testing.assert_allclose(bc[i, 2] - bc[i, 0], s_ref[0], rtol=1e-4)
