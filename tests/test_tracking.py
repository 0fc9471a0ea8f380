"""Tracking-eval tests (HOTA/CLEAR/IDF1/OSPA2) with hand-checkable cases."""

import numpy as np
import pytest

from vatl4pose_tpu.eval.tracking import (clear, evaluate_tracking, hota,
                                         identity, ospa2)

RNG = np.random.default_rng(21)


def make_tracked_gt(num_frames=5, tracks=2):
    images, anns = [], []
    aid = 1
    base = RNG.uniform([100, 100], [400, 300], size=(tracks, 2))
    vel = RNG.uniform(-5, 5, size=(tracks, 2))
    for f in range(num_frames):
        images.append({"id": f, "width": 640, "height": 480})
        for t in range(tracks):
            xy = base[t] + vel[t] * f
            kp = np.zeros(51)
            kp[0::3] = xy[0] + RNG.uniform(0, 80, 17)
            kp[1::3] = xy[1] + RNG.uniform(0, 160, 17)
            kp[2::3] = 1.0
            x, y = kp[0::3].min(), kp[1::3].min()
            w = kp[0::3].max() - x
            h = kp[1::3].max() - y
            anns.append({"id": aid, "image_id": f, "track_id": t,
                         "bbox": [x, y, w, h], "area": float(w * h),
                         "keypoints": kp.tolist(), "category_id": 1})
            aid += 1
    return {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}


class TestTracking:
    def test_perfect_tracking(self):
        gt = make_tracked_gt()
        res = evaluate_tracking(gt, list(gt["annotations"]))
        assert abs(res["HOTA"] - 1.0) < 1e-6
        assert abs(res["MOTA"] - 1.0) < 1e-6
        assert abs(res["IDF1"] - 1.0) < 1e-6
        assert res["OSPA"] < 1e-9
        assert res["IDSW"] == 0

    def test_id_swap_detected(self):
        gt = make_tracked_gt(num_frames=6, tracks=2)
        pr = []
        for a in gt["annotations"]:
            b = dict(a)
            # swap ids halfway through
            if a["image_id"] >= 3:
                b["track_id"] = 1 - a["track_id"]
            pr.append(b)
        res = evaluate_tracking(gt, pr)
        assert res["IDSW"] >= 2            # one switch per track
        assert res["IDF1"] < 0.75          # identity broken at half point
        assert abs(res["MOTA"] - (1 - 2 / 12)) < 1e-6
        assert res["AssA"] < 0.8

    def test_missing_track_cardinality(self):
        gt = make_tracked_gt(num_frames=4, tracks=2)
        pr = [a for a in gt["annotations"] if a["track_id"] == 0]
        res = evaluate_tracking(gt, pr)
        assert abs(res["OSPA_CARD"] - 0.5) < 1e-9
        assert abs(res["MOTA"] - 0.5) < 1e-6
        assert res["HOTA"] < 0.85

    def test_empty_predictions(self):
        gt = make_tracked_gt(2, 1)
        res = evaluate_tracking(gt, [])
        assert res["MOTA"] == 0.0 or res["MOTA"] < 0 + 1e-9
        assert res["HOTA"] == 0.0
        assert res["OSPA"] == 1.0
