"""Data-prep parity: cli/prepare_data.py vs the reference's actual scripts.

Builds synthetic raw-layout fixtures (per-video PoseTrack jsons with real
tiny images on disk, a JRDB2022 label tree), executes the reference's
``data/PoseTrack21/make_new_annotation.py`` / ``integrate_new_annotation.py``
/ ``data/jrdb-pose/make_new_annotation.py`` DIRECTLY (they are
json/cv2-only), runs our CLI on an identical copy, and asserts
structurally-equal outputs.
"""

import importlib.util
import json
import os
import shutil
from pathlib import Path

import numpy as np
import pytest

REF = "/root/reference"


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_img(path, w, h, seed):
    import cv2
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)


# ---------------------------------------------------------------- PoseTrack


def _make_posetrack_raw(root: Path, split: str, vid_ids, nframes=40,
                        labeled_every=2):
    """Per-video raw jsons in the PoseTrack21 release layout: no
    width/height fields, composite ids int('1'+vid_id+frame), sparse
    is_labeled, a couple of persons per labeled frame."""
    rng = np.random.default_rng(hash(split) % 2 ** 31)
    for vid in vid_ids:
        images, anns = [], []
        for fr in range(nframes):
            image_id = int(f"1{vid}{fr:04d}")
            fname = f"images/{split}/{vid}_mpii/{fr:06d}.jpg"
            labeled = (fr % labeled_every == 0)
            images.append({
                "is_labeled": labeled,
                "nframes": nframes,
                "image_id": image_id,
                "id": image_id,
                "vid_id": vid,
                "file_name": fname,
                "has_labeled_person": labeled,
            })
            _write_img(str(root / fname), 64 + 8 * int(vid[-1]), 48, fr)
            if labeled:
                for tr in range(2):
                    kps = rng.uniform(0, 48, size=51).round(2).tolist()
                    anns.append({
                        "bbox": [1.0 + tr, 2.0, 30.0, 40.0],
                        "bbox_head": [1.0, 2.0, 10.0, 10.0],
                        "category_id": 1,
                        "id": int(f"{image_id}{tr:02d}"),
                        "image_id": image_id,
                        "keypoints": kps,
                        "track_id": tr,
                        "person_id": 20 + tr,
                    })
        out = {"images": images, "annotations": anns,
               "categories": [{"supercategory": "person", "id": 1,
                               "name": "person", "keypoints": [],
                               "skeleton": []}]}
        d = root / "posetrack_data" / split
        d.mkdir(parents=True, exist_ok=True)
        with open(d / f"{vid}_mpii.json", "w") as fh:
            json.dump(out, fh)


@pytest.fixture(scope="module")
def posetrack_pair(tmp_path_factory):
    """Two identical raw trees: one for the reference scripts, one for ours."""
    base = tmp_path_factory.mktemp("prep")
    ref_root = base / "ref" / "data" / "PoseTrack21"
    for split in ("val", "train"):
        _make_posetrack_raw(ref_root, split, ["000001", "000002"])
    ours_root = base / "ours" / "data" / "PoseTrack21"
    shutil.copytree(ref_root, ours_root)
    return ref_root, ours_root


def _load_sorted(path):
    with open(path) as fh:
        d = json.load(fh)
    return d


def test_posetrack_val_parity(posetrack_pair):
    ref_root, ours_root = posetrack_pair
    mod = _load_ref(f"{REF}/data/PoseTrack21/make_new_annotation.py",
                    "ref_make_new_annotation")
    mod.path = Path(ref_root)
    (ref_root / "activelearning" / "val").mkdir(parents=True, exist_ok=True)
    mod.make_dense_annotation_val()

    from vatl4pose_tpu.cli import prepare_data
    prepare_data.main(["posetrack-val", "--root", str(ours_root)])

    ref_files = sorted(os.listdir(ref_root / "activelearning" / "val"))
    our_files = sorted(os.listdir(ours_root / "activelearning" / "val"))
    assert ref_files == our_files and len(ref_files) == 2
    for f in ref_files:
        a = _load_sorted(ref_root / "activelearning" / "val" / f)
        b = _load_sorted(ours_root / "activelearning" / "val" / f)
        assert a == b
        # the dense-window rule actually filtered (not all 40 frames kept)
        assert 0 < len(b["images"]) < 40
        assert all("width" in im and "height" in im for im in b["images"])


def test_posetrack_train_parity(posetrack_pair):
    ref_root, ours_root = posetrack_pair
    mod = _load_ref(f"{REF}/data/PoseTrack21/make_new_annotation.py",
                    "ref_make_new_annotation2")
    mod.path = Path(ref_root)
    (ref_root / "activelearning" / "train").mkdir(parents=True, exist_ok=True)
    mod.make_annotation_train("train")

    from vatl4pose_tpu.cli import prepare_data
    prepare_data.main(["posetrack-train", "--root", str(ours_root),
                       "--mode", "train"])

    ref_dir = ref_root / "activelearning" / "train"
    our_dir = ours_root / "activelearning" / "train"
    files = sorted(os.listdir(ref_dir))
    assert files == sorted(os.listdir(our_dir))
    for f in files:
        assert _load_sorted(ref_dir / f) == _load_sorted(our_dir / f)


def test_integrate_parity(posetrack_pair):
    ref_root, ours_root = posetrack_pair
    # integrate consumes the activelearning/<mode> trees built above
    for root in (ref_root, ours_root):
        assert (root / "activelearning" / "train").is_dir()
    mod = _load_ref(f"{REF}/data/PoseTrack21/integrate_new_annotation.py",
                    "ref_integrate_new_annotation")
    mod.integrate_annotations(ref_root / "activelearning", "train")

    from vatl4pose_tpu.cli import prepare_data
    prepare_data.main(["integrate", "--root", str(ours_root),
                       "--mode", "train"])

    a = _load_sorted(ref_root / "activelearning" / "train"
                     / "000000_integrated_train.json")
    b = _load_sorted(ours_root / "activelearning" / "train"
                     / "000000_integrated_train.json")
    assert a == b
    assert len(a["annotations"]) > 0
    assert all(ann["iscrowd"] == 0 and "area" in ann
               for ann in b["annotations"])


# ------------------------------------------------------------------- JRDB


def _make_jrdb_raw(repo_root: Path, scenes, nframes=6, npersons=2):
    """JRDB2022 release layout relative to a fake repo root: pose labels in
    labels_2d_pose_stitched_coco (1-indexed image_id into the images list),
    detector boxes in labels_2d_stitched keyed by image basename."""
    rng = np.random.default_rng(99)
    data_root = repo_root / "data" / "jrdb-pose"
    lbl = data_root / "jrdb2022" / "labels"
    for scene in scenes:
        images, anns, det = [], [], {}
        aid = 0
        for fr in range(1, nframes + 1):
            base = f"{fr:06d}.jpg"
            rel = f"image_stitched/{scene}/{base}"
            images.append({"id": fr, "file_name": rel})
            _write_img(str(data_root / "images" / rel), 96, 32, fr)
            det[base] = []
            for tr in range(npersons):
                kps = []
                for j in range(17):
                    v = int(rng.integers(0, 3))  # raw vis in {0,1,2}
                    kps += [float(rng.uniform(0, 96)), float(rng.uniform(0, 32)), v]
                anns.append({"image_id": fr, "track_id": tr,
                             "category_id": 1, "num_keypoints": 17,
                             "id": aid, "keypoints": kps})
                aid += 1
                det[base].append({
                    "label_id": f"pedestrian:{tr}",
                    "box": [float(tr), 1.0, 20.0, 30.0],
                    "attributes": {"area": 600.0 + tr},
                })
            # an extra detection with no pose annotation (must be ignored)
            det[base].append({"label_id": f"pedestrian:{npersons + 5}",
                              "box": [0, 0, 5, 5],
                              "attributes": {"area": 25.0}})
        for sub, payload in (("labels_2d_pose_stitched_coco",
                              {"images": images, "annotations": anns,
                               "categories": [{"id": 1, "name": "person"}]}),
                             ("labels_2d_stitched", {"labels": det})):
            d = lbl / sub
            d.mkdir(parents=True, exist_ok=True)
            with open(d / f"{scene}.json", "w") as fh:
                json.dump(payload, fh)
    cfg = repo_root / "configs" / "jrdb-pose"
    cfg.mkdir(parents=True, exist_ok=True)
    with open(cfg / "jrdb_train.txt", "w") as fh:
        fh.write("\n".join(scenes) + "\n")
    (data_root / "activelearning" / "train").mkdir(parents=True,
                                                   exist_ok=True)
    return data_root


def test_jrdb_parity(tmp_path):
    scenes = ["scene-alpha", "scene-beta"]
    ref_repo = tmp_path / "refrepo"
    data_root = _make_jrdb_raw(ref_repo, scenes)
    ours_repo = tmp_path / "oursrepo"
    shutil.copytree(ref_repo, ours_repo)

    mod = _load_ref(f"{REF}/data/jrdb-pose/make_new_annotation.py",
                    "ref_jrdb_make_new_annotation")
    cwd = os.getcwd()
    try:
        os.chdir(ref_repo)  # the ref script uses repo-relative paths
        mod.make_annotation("train", Path("data/jrdb-pose"))
    finally:
        os.chdir(cwd)

    from vatl4pose_tpu.cli import prepare_data
    prepare_data.main([
        "jrdb", "--root", str(ours_repo / "data" / "jrdb-pose"),
        "--split", "train",
        "--scene_list", str(ours_repo / "configs" / "jrdb-pose"
                            / "jrdb_train.txt")])

    ref_dir = data_root / "activelearning" / "train"
    our_dir = ours_repo / "data" / "jrdb-pose" / "activelearning" / "train"
    files = sorted(os.listdir(ref_dir))
    assert files == sorted(os.listdir(our_dir)) == \
        ["00_jrdb-pose.json", "01_jrdb-pose.json"]
    for f in files:
        a = _load_sorted(ref_dir / f)
        b = _load_sorted(our_dir / f)
        assert a == b
        # composite 8-digit ids, squashed visibility, det-sourced boxes
        assert all(10000000 <= im["id"] < 20000000 for im in b["images"])
        for ann in b["annotations"]:
            assert set(ann["keypoints"][2::3]) <= {0, 1.0}
            assert ann["area"] in (600.0, 601.0)
