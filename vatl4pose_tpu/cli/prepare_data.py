"""Dataset preparation (parity: data/PoseTrack21/make_new_annotation.py,
integrate_new_annotation.py, data/jrdb-pose/make_new_annotation.py).

Subcommands:
  posetrack-val      extract ~30 densely-labeled center frames per val video
                     (make_new_annotation.py:6-49)
  posetrack-train    add width/height to train jsons (:51-87)
  integrate          merge per-video jsons into 000000_integrated_<mode>.json
                     with area/iscrowd fields (integrate_new_annotation.py)
  jrdb               re-key JRDB stitched-image annotations into COCO-format
                     per-scene jsons with composite 7-digit image ids
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _img_size(path):
    import cv2
    im = cv2.imread(path)
    h, w = im.shape[:2]
    return w, h


def posetrack_val(root: str):
    src = os.path.join(root, "posetrack_data", "val")
    dst = os.path.join(root, "activelearning", "val")
    os.makedirs(dst, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src, "*.json"))):
        with open(f) as fh:
            data = json.load(fh)
        center_frame = int(data["images"][0]["nframes"] / 2)
        vid_id = data["images"][0]["vid_id"]
        center_id = int(f"1{vid_id}{center_frame:04d}")
        images = []
        for image in data["images"]:
            if (center_id - 17 < image["image_id"] < center_id + 17
                    and image["is_labeled"]):
                w, h = _img_size(os.path.join(root, image["file_name"]))
                image["width"] = w
                image["height"] = h
                images.append(image)
        keep = {im["image_id"] for im in images}
        anns = [a for a in data["annotations"] if a["image_id"] in keep]
        out = {"images": images, "annotations": anns,
               "categories": data["categories"]}
        with open(os.path.join(dst, os.path.basename(f)), "w") as fh:
            json.dump(out, fh)
        print(f"{os.path.basename(f)}: {len(images)} dense frames")


def posetrack_train(root: str, mode: str):
    src = os.path.join(root, "posetrack_data", mode)
    dst = os.path.join(root, "activelearning", mode)
    os.makedirs(dst, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src, "*.json"))):
        with open(f) as fh:
            data = json.load(fh)
        for image in data["images"]:
            w, h = _img_size(os.path.join(root, image["file_name"]))
            image["width"] = w
            image["height"] = h
        with open(os.path.join(dst, os.path.basename(f)), "w") as fh:
            json.dump(data, fh)


def integrate(root: str, mode: str):
    src = os.path.join(root, "activelearning", mode)
    out = {"images": [], "annotations": [], "categories": []}
    ann_cnt = 0
    files = [f for f in sorted(glob.glob(os.path.join(src, "*.json")))
             if "000000" not in os.path.basename(f)]
    for i, f in enumerate(files):
        with open(f) as fh:
            data = json.load(fh)
        if i == 0:
            out["categories"] = data["categories"]
        keep = set()
        for img in data["images"]:
            if img.get("is_labeled", True):
                keep.add(img["image_id"])
                out["images"].append(img)
        for ann in data["annotations"]:
            if ann["image_id"] in keep:
                ann["iscrowd"] = 0
                ann["area"] = ann["bbox"][2] * ann["bbox"][3]
                out["annotations"].append(ann)
                ann_cnt += 1
    path = os.path.join(src, f"000000_integrated_{mode}.json")
    with open(path, "w") as fh:
        json.dump(out, fh)
    print(f"{ann_cnt} annotations -> {path}")


def jrdb(root: str, split: str, scene_list: str):
    """Re-key JRDB-Pose stitched-image annotations into per-scene COCO jsons
    with composite 7-digit image ids (data/jrdb-pose/make_new_annotation.py)."""
    with open(scene_list) as fh:
        scenes = [s.strip() for s in fh if s.strip()]
    dst = os.path.join(root, "activelearning", split)
    os.makedirs(dst, exist_ok=True)
    for vid, scene in enumerate(scenes):
        src = os.path.join(root, "labels", "pose", f"{scene}.json")
        if not os.path.exists(src):
            print(f"skip {scene}: no {src}")
            continue
        with open(src) as fh:
            data = json.load(fh)
        images, anns = [], []
        for img in data["images"]:
            frame = int(os.path.splitext(
                os.path.basename(img["file_name"]))[0])
            comp = int(f"{vid:03d}{frame:04d}")
            img["id"] = img["image_id"] = comp
            img["file_name"] = os.path.join(
                "images", "image_stitched", scene,
                os.path.basename(img["file_name"]))
            w, h = _img_size(os.path.join(root, img["file_name"]))
            img["width"] = w
            img["height"] = h
            images.append(img)
        id_map = {im_old: im["id"] for im_old, im in
                  zip([i.get("old_id", i["id"]) for i in images], images)}
        for ann in data["annotations"]:
            ann["image_id"] = id_map.get(ann["image_id"], ann["image_id"])
            ann["iscrowd"] = 0
            ann["area"] = ann["bbox"][2] * ann["bbox"][3]
            anns.append(ann)
        out = {"images": images, "annotations": anns,
               "categories": data["categories"]}
        with open(os.path.join(dst, f"{vid}_jrdb-pose.json"), "w") as fh:
            json.dump(out, fh)
        print(f"{scene} -> {vid}_jrdb-pose.json ({len(images)} frames)")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    s1 = sub.add_parser("posetrack-val")
    s1.add_argument("--root", default="data/PoseTrack21")
    s2 = sub.add_parser("posetrack-train")
    s2.add_argument("--root", default="data/PoseTrack21")
    s2.add_argument("--mode", default="train")
    s3 = sub.add_parser("integrate")
    s3.add_argument("--root", default="data/PoseTrack21")
    s3.add_argument("--mode", default="val")
    s4 = sub.add_parser("jrdb")
    s4.add_argument("--root", default="data/jrdb-pose")
    s4.add_argument("--split", default="test")
    s4.add_argument("--scene_list", required=True)
    a = p.parse_args(argv)
    if a.cmd == "posetrack-val":
        posetrack_val(a.root)
    elif a.cmd == "posetrack-train":
        posetrack_train(a.root, a.mode)
    elif a.cmd == "integrate":
        integrate(a.root, a.mode)
    elif a.cmd == "jrdb":
        jrdb(a.root, a.split, a.scene_list)


if __name__ == "__main__":
    main()
