"""JRDB keypoint AP, deform pooling, ANN, StoppingCriteria tests."""

import numpy as np
import pytest

import jax.numpy as jnp


def _gt_with_poses(num_images=2, persons=2, seed=3):
    rng = np.random.default_rng(seed)
    images, anns = [], []
    aid = 1
    for i in range(num_images):
        images.append({"id": 100 + i, "width": 640, "height": 480})
        for p in range(persons):
            kp = np.zeros(51)
            kp[0::3] = rng.uniform(50, 600, 17)
            kp[1::3] = rng.uniform(50, 430, 17)
            kp[2::3] = 1.0
            x, y = kp[0::3].min(), kp[1::3].min()
            w = kp[0::3].max() - x
            h = kp[1::3].max() - y
            anns.append({"id": aid, "image_id": 100 + i, "category_id": 1,
                         "bbox": [x, y, w, h], "area": float(w * h),
                         "keypoints": kp.tolist()})
            aid += 1
    return {"images": images,
            "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}


class TestJrdbAP:
    def test_perfect_predictions(self):
        from vatl4pose_tpu.eval.jrdb_ap import average_precision_for_loc
        gt = _gt_with_poses()
        ap, rec = average_precision_for_loc(gt, list(gt["annotations"]))
        assert abs(ap[-1] - 100.0) < 1e-6
        assert abs(rec[-1] - 100.0) < 1e-6

    def test_garbage_predictions(self):
        from vatl4pose_tpu.eval.jrdb_ap import average_precision_for_loc
        gt = _gt_with_poses()
        bad = []
        for a in gt["annotations"]:
            b = dict(a)
            kp = np.asarray(a["keypoints"]).copy()
            kp[0::3] = 1.0
            kp[1::3] = 1.0
            b["keypoints"] = kp.tolist()
            bad.append(b)
        ap, _ = average_precision_for_loc(gt, bad)
        assert ap[-1] < 5.0

    def test_noise_monotonic(self):
        from vatl4pose_tpu.eval.jrdb_ap import average_precision_for_loc
        rng = np.random.default_rng(0)
        gt = _gt_with_poses(3, 3)
        aps = []
        for noise in (0.0, 15.0, 80.0):
            prs = []
            for a in gt["annotations"]:
                b = dict(a)
                kp = np.asarray(a["keypoints"]).copy()
                kp[0::3] += rng.normal(0, noise, 17)
                kp[1::3] += rng.normal(0, noise, 17)
                b["keypoints"] = kp.tolist()
                prs.append(b)
            aps.append(average_precision_for_loc(gt, prs)[0][-1])
        assert aps[0] >= aps[1] >= aps[2]


class TestDeformPool:
    def test_plain_psroi_constant(self):
        from vatl4pose_tpu.kernels.deform_pool import deform_roi_pool
        g = 1
        data = np.full((1, 16, 16, 4), 3.0, np.float32)
        rois = np.array([[0, 2, 2, 10, 10]], np.float32)
        out = np.asarray(deform_roi_pool(jnp.asarray(data), rois,
                                         out_size=4, group_size=g))
        assert out.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(out, 3.0, rtol=1e-5)

    def test_position_sensitive_channels(self):
        from vatl4pose_tpu.kernels.deform_pool import deform_roi_pool
        # 1 out-channel, group 2: input 4 channels each constant 0..3; the
        # PS layout picks channel (gy*2+gx) per quadrant.
        data = np.zeros((1, 16, 16, 4), np.float32)
        for c in range(4):
            data[..., c] = c
        rois = np.array([[0, 0, 0, 15, 15]], np.float32)
        out = np.asarray(deform_roi_pool(jnp.asarray(data), rois,
                                         out_size=4, group_size=2,
                                         out_channels=1))[0, :, :, 0]
        assert out[0, 0] == 0 and out[0, 3] == 1
        assert out[3, 0] == 2 and out[3, 3] == 3


class TestAnn:
    def test_lsh_recall(self):
        from vatl4pose_tpu.al.ann import test_transformers
        assert test_transformers() > 0.6


class TestStoppingCriteria:
    def test_api(self):
        from vatl4pose_tpu.al.stopping import StoppingCriteria
        sc = StoppingCriteria("num_of_queries", value=3)
        sc._current_iter = 3
        assert sc.is_stop()
        sc.reset()
        assert not sc.is_stop()
        with pytest.raises(ValueError):
            StoppingCriteria("bogus")
