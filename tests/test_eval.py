"""COCO keypoint mAP + OSPA evaluation tests (hand-computable goldens)."""

import numpy as np

from vatl4pose_tpu.eval.cocoeval import evaluate_map
from vatl4pose_tpu.eval.ospa import get_ospa, ospa_for_loc

RNG = np.random.default_rng(7)


def make_gt(num_images=3, persons=2):
    images, anns = [], []
    aid = 1
    for i in range(num_images):
        images.append({"id": 100 + i, "width": 640, "height": 480})
        for p in range(persons):
            kp = np.zeros(51)
            kp[0::3] = RNG.uniform(50, 600, 17)
            kp[1::3] = RNG.uniform(50, 430, 17)
            kp[2::3] = 1.0
            x, y = kp[0::3].min(), kp[1::3].min()
            w = kp[0::3].max() - x
            h = kp[1::3].max() - y
            anns.append({"id": aid, "image_id": 100 + i, "category_id": 1,
                         "bbox": [x, y, w, h], "area": float(w * h),
                         "iscrowd": 0,
                         "keypoints": kp.tolist(),
                         "track_id": p})
            aid += 1
    cats = [{"id": 1, "name": "person"}]
    return {"images": images, "annotations": anns, "categories": cats}


def dt_from_gt(gt, noise=0.0, score=0.9):
    dts = []
    for a in gt["annotations"]:
        kp = np.array(a["keypoints"])
        kp[0::3] += RNG.normal(0, noise, 17)
        kp[1::3] += RNG.normal(0, noise, 17)
        dts.append({"image_id": a["image_id"], "category_id": 1,
                    "id": a["id"], "score": score,
                    "bbox": a["bbox"], "keypoints": kp.tolist()})
    return dts


class TestCocoEval:
    def test_perfect_predictions_give_ap_1(self):
        gt = make_gt()
        res = evaluate_map(dt_from_gt(gt, 0.0), gt)
        assert abs(res["AP"] - 1.0) < 1e-6
        assert abs(res["AR"] - 1.0) < 1e-6          # key 'AR' = AR(L) slot
        assert abs(res["AP .5"] - 1.0) < 1e-6

    def test_garbage_predictions_give_ap_0(self):
        gt = make_gt()
        dts = dt_from_gt(gt, 0.0)
        for d in dts:
            kp = np.array(d["keypoints"])
            kp[0::3] = 5.0   # far away
            kp[1::3] = 5.0
            d["keypoints"] = kp.tolist()
        res = evaluate_map(dts, gt)
        assert res["AP"] < 0.02

    def test_noise_degrades_monotonically(self):
        gt = make_gt(num_images=4, persons=3)
        ap = [evaluate_map(dt_from_gt(gt, n), gt)["AP"]
              for n in (0.0, 8.0, 40.0)]
        assert ap[0] >= ap[1] >= ap[2]
        assert ap[0] > 0.99

    def test_missing_detection_halves_recall(self):
        gt = make_gt(num_images=1, persons=2)
        dts = dt_from_gt(gt, 0.0)[:1]    # detect only one of two
        res = evaluate_map(dts, gt)
        # precision 1 up to recall 0.5, 0 beyond → AP ≈ mean over 101 pts
        assert 0.4 < res["AP"] < 0.55

    def test_returns_reference_key_names(self):
        gt = make_gt(1, 1)
        res = evaluate_map(dt_from_gt(gt, 0), gt)
        assert list(res) == ["AP", "AP .5", "AP .6", "AP .7", "AP .75",
                             "AP .8", "AP .95", "AP (M)", "AP (L)", "AR"]


class TestOspa:
    def test_empty_conventions(self):
        assert get_ospa([], []) == 0
        assert get_ospa([], [{"keypoints": [0] * 51}]) == 1
        # reference quirk: len(gt) != 1 and no predictions -> 1
        gt = make_gt(1, 2)["annotations"]
        assert get_ospa(gt, []) == 1

    def test_perfect_match_gives_zero(self):
        gt = make_gt(1, 2)
        dts = dt_from_gt(gt, 0.0)
        v = ospa_for_loc(gt, dts)
        assert v < 1e-6

    def test_cardinality_penalty(self):
        gt = make_gt(1, 2)
        dts = dt_from_gt(gt, 0.0)[:1]
        v = ospa_for_loc(gt, dts)
        # one matched perfectly (cost 0) + cardinality 1, / max(2,1)
        assert abs(v - 0.5) < 1e-6
