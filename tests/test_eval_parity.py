"""Non-circular evaluation parity: this repo's curve-forming evaluators vs
the reference's ACTUAL code on shared fixtures.

  - evaluate_map            vs the vendored pycocotools COCOeval
                               (data/coco/cocoapi/PythonAPI/pycocotools,
                               loaded for real via tests/ref_pycoco.py — only
                               the Cython _mask module is stubbed; the
                               keypoints path never touches it)
  - ospa_for_loc            vs JRDB_toolkit/pose_eval.py:338-367
  - average_precision_for_loc vs JRDB_toolkit/pose_eval.py:439-595

Fixtures mirror the AL loop's json shapes (ActiveLearning.py:311-327,
439-447): GT entries carry bbox(xywh)/image_id/id/score/category_id/
keypoints and NO area/num_keypoints; detections carry the same fields.
Agreement bar: 1e-9 (the tracking-toolkit standard).
"""

from __future__ import annotations

import importlib.util
import sys
import zlib

import numpy as np
import pytest

TOL = 1e-9


# --------------------------------------------------------------------------
# fixture synthesis
# --------------------------------------------------------------------------

def _pose(rng, cx, cy, spread=40.0):
    xy = np.stack([rng.normal(cx, spread, 17), rng.normal(cy, spread, 17)], 1)
    return xy


def _bbox_of(xy, pad=10.0):
    x0, y0 = xy.min(0) - pad
    x1, y1 = xy.max(0) + pad
    return [float(x0), float(y0), float(x1 - x0), float(y1 - y0)]


def make_scene(seed, n_imgs=5, max_people=4, noise=8.0, score_ties=False,
               with_area_frac=0.0, iscrowd_frac=0.0, invis_gt=False,
               extra_dts=0, drop_dts=0, dt_bbox=True, track_ids=False):
    """(gt_dict, dt_list) in the AL loop's json shapes."""
    rng = np.random.default_rng(seed)
    images = [{"id": i + 1, "file_name": f"{i:06d}.jpg",
               "width": 1280, "height": 720} for i in range(n_imgs)]
    cats = [{"id": 1, "name": "person", "keypoints": [f"k{i}" for i in
             range(17)], "skeleton": []}]
    gts, dts = [], []
    aid = 1
    for im in images:
        n_people = int(rng.integers(0, max_people + 1))
        for p in range(n_people):
            xy = _pose(rng, rng.uniform(100, 1100), rng.uniform(100, 600))
            vis = rng.choice([0.0, 1.0, 2.0], 17, p=[.2, .3, .5])
            if vis.max() == 0:           # the reference OSPA path needs k1>0
                vis[0] = 2.0
            kp = np.concatenate([xy, vis[:, None]], 1).reshape(-1).tolist()
            g = {"bbox": _bbox_of(xy), "image_id": im["id"], "id": aid,
                 "score": 1.0, "category_id": 1, "keypoints": kp}
            if track_ids:
                g["track_id"] = 100 + aid
            if rng.random() < with_area_frac:
                g["area"] = float(g["bbox"][2] * g["bbox"][3] * 0.8)
            if rng.random() < iscrowd_frac:
                g["iscrowd"] = 1
            if invis_gt and aid % 5 == 0:
                # all-invisible GT exercises the k1==0 OKS branch
                g["keypoints"] = np.concatenate(
                    [xy, np.zeros((17, 1))], 1).reshape(-1).tolist()
            gts.append(g)

            if rng.random() < drop_dts:
                aid += 1
                continue
            dxy = xy + rng.normal(0, noise, xy.shape)
            ds = rng.uniform(0.2, 0.95, 17)
            dkp = np.concatenate([dxy, ds[:, None]], 1).reshape(-1).tolist()
            score = 0.75 if score_ties else float(np.mean(ds) +
                                                  1.25 * np.max(ds))
            d = {"image_id": im["id"], "id": aid, "score": score,
                 "category_id": 1, "keypoints": dkp}
            if dt_bbox:
                d["bbox"] = list(g["bbox"])
            dts.append(d)
            aid += 1
        for _ in range(extra_dts):
            xy = _pose(rng, rng.uniform(100, 1100), rng.uniform(100, 600))
            ds = rng.uniform(0.2, 0.95, 17)
            dkp = np.concatenate([xy, ds[:, None]], 1).reshape(-1).tolist()
            d = {"image_id": im["id"], "id": 10000 + aid,
                 "score": 0.75 if score_ties else float(np.mean(ds)),
                 "category_id": 1, "keypoints": dkp}
            if dt_bbox:
                d["bbox"] = _bbox_of(xy)
            dts.append(d)
            aid += 1
    gt = {"images": images, "categories": cats, "annotations": gts}
    return gt, dts


# --------------------------------------------------------------------------
# COCO keypoint mAP vs vendored pycocotools
# --------------------------------------------------------------------------

SCENES = {
    "near_perfect": dict(noise=2.0),
    "noisy": dict(noise=25.0),
    "score_ties": dict(noise=12.0, score_ties=True),
    "missing_dts": dict(noise=10.0, drop_dts=0.4),
    "extra_dts": dict(noise=10.0, extra_dts=2),
    "area_iscrowd": dict(noise=10.0, with_area_frac=0.5, iscrowd_frac=0.3),
    "invisible_gt": dict(noise=10.0, invis_gt=True),
    "no_dt_bbox": dict(noise=10.0, dt_bbox=False),
}


@pytest.mark.parametrize("name", sorted(SCENES))
def test_map_parity_vs_vendored_pycocotools(name, tmp_path):
    from tests.ref_pycoco import reference_evaluate_map
    from vatl4pose_tpu.eval.cocoeval import STAT_KEYS, evaluate_map

    gt, dts = make_scene(seed=zlib.crc32(repr(name).encode()) % 2 ** 31, **SCENES[name])
    if not dts:
        pytest.skip("degenerate scene")
    ref = reference_evaluate_map(dts, gt, tmp_path)
    ours = evaluate_map(dts, gt)
    for k in STAT_KEYS:
        assert ours[k] == pytest.approx(ref[k], abs=TOL), (k, ours, ref)


def test_map_parity_sweep(tmp_path):
    """Randomized sweep: many seeds through one mixed config."""
    from tests.ref_pycoco import reference_evaluate_map
    from vatl4pose_tpu.eval.cocoeval import STAT_KEYS, evaluate_map

    for seed in range(6):
        gt, dts = make_scene(seed=seed, n_imgs=4, noise=15.0,
                             drop_dts=0.2, extra_dts=1, iscrowd_frac=0.2)
        if not dts:
            continue
        d = tmp_path / str(seed)
        d.mkdir()
        ref = reference_evaluate_map(dts, gt, d)
        ours = evaluate_map(dts, gt)
        for k in STAT_KEYS:
            assert ours[k] == pytest.approx(ref[k], abs=TOL), (seed, k)


# --------------------------------------------------------------------------
# OSPA + JRDB AP vs the actual JRDB_toolkit pose_eval
# --------------------------------------------------------------------------

def _load_pose_eval():
    name = "ref_pose_eval"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/JRDB_toolkit/pose_eval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _dump(tmp_path, name, obj):
    import json
    p = tmp_path / name
    with open(p, "w") as f:
        json.dump(obj, f)
    return str(p)


@pytest.mark.parametrize("name", ["near_perfect", "noisy", "missing_dts",
                                  "extra_dts", "score_ties"])
def test_ospa_parity_vs_pose_eval(name, tmp_path):
    from vatl4pose_tpu.eval.ospa import ospa_for_loc

    pe = _load_pose_eval()
    gt, dts = make_scene(seed=zlib.crc32(repr(name).encode()) % 2 ** 31 + 7, **SCENES[name])
    gt_p = _dump(tmp_path, "gt.json", gt)
    pr_p = _dump(tmp_path, "pr.json", dts)
    ref = pe.ospa_for_loc(gt_p, pr_p)
    ours = ospa_for_loc(gt, dts)
    assert ours == pytest.approx(ref, abs=TOL)


def _jrdb_dirs(tmp_path, gt, dts, boxes):
    import json
    loc = "synthetic-loc_0"
    for sub in ("gt", "pr", "box"):
        (tmp_path / sub).mkdir(exist_ok=True)
    with open(tmp_path / "gt" / f"{loc}.json", "w") as f:
        json.dump(gt, f)
    with open(tmp_path / "pr" / f"{loc}.json", "w") as f:
        json.dump({"annotations": dts}, f)
    with open(tmp_path / "box" / f"{loc}.json", "w") as f:
        json.dump(boxes, f)
    return loc


@pytest.mark.parametrize("scene,boxed", [
    ("near_perfect", False), ("noisy", False), ("missing_dts", False),
    ("extra_dts", False), ("score_ties", False), ("extra_dts", True),
])
def test_jrdb_ap_parity_vs_pose_eval(scene, boxed, tmp_path):
    from vatl4pose_tpu.eval.jrdb_ap import average_precision_for_loc

    pe = _load_pose_eval()
    rng = np.random.default_rng(hash((scene, boxed)) % 2 ** 31)
    gt, dts = make_scene(seed=zlib.crc32(repr(scene).encode()) % 2 ** 31 + 13, track_ids=True,
                         **SCENES[scene])
    boxes = {"labels": {}}
    if boxed:
        # unlabeled boxes overlapping some extra detections → forgiveness
        for im in gt["images"]:
            entries = []
            for d in dts:
                if d["image_id"] == im["id"] and d["id"] > 10000 and \
                        rng.random() < 0.7:
                    kp = np.asarray(d["keypoints"]).reshape(17, 3)
                    x0, y0 = kp[:, :2].min(0) - 5
                    x1, y1 = kp[:, :2].max(0) + 5
                    entries.append({
                        "label_id": f"pedestrian:{90000 + d['id']}",
                        "box": [float(x0), float(y0), float(x1 - x0),
                                float(y1 - y0)]})
            if entries:
                boxes["labels"]["{:06d}.jpg".format(im["id"] - 1)] = entries
    loc = _jrdb_dirs(tmp_path, gt, dts, boxes)
    ref_ap, ref_rec = pe.average_precision_for_loc(
        str(tmp_path / "gt"), str(tmp_path / "pr"), str(tmp_path / "box"),
        loc)
    ap, rec = average_precision_for_loc(gt, {"annotations": dts},
                                        unlabeled_boxes=boxes)
    assert np.allclose(np.nan_to_num(ap, nan=-7.7),
                       np.nan_to_num(ref_ap, nan=-7.7), atol=TOL), \
        (ap, ref_ap)
    assert np.allclose(np.nan_to_num(rec, nan=-7.7),
                       np.nan_to_num(ref_rec, nan=-7.7), atol=TOL)
