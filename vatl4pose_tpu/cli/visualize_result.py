"""Per-round pose/heatmap visualization (parity: scripts/visualize_result.py).

Renders predicted skeletons per AL round from a run's predicted_kpt.json and
the video frames; optionally renders labeled/queried status overlays.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def render_round(work_dir: str, dataset_root: str, ann_file: str,
                 out_dir: str, kp_thresh: float = 0.3):
    import cv2
    from ..data.coco_json import CocoJson
    from ..utils.vis import vis_frame_fast
    with open(os.path.join(work_dir, "predicted_kpt.json")) as f:
        preds = json.load(f)
    coco = CocoJson(os.path.join(dataset_root, ann_file))
    by_img = {}
    for p in preds:
        by_img.setdefault(p["image_id"], []).append(p)
    os.makedirs(out_dir, exist_ok=True)
    for iid, plist in by_img.items():
        img_info = coco.load_img(iid)
        path = os.path.join(dataset_root, img_info["file_name"])
        if path.endswith(".npy"):
            img = np.load(path)
        else:
            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        for p in plist:
            kpts = np.asarray(p["keypoints"], np.float32).reshape(-1, 3)
            img = vis_frame_fast(img, kpts, kp_thresh)
        cv2.imwrite(os.path.join(out_dir, f"{iid}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", required=True,
                   help="AL run dir containing predicted_kpt.json")
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--ann_file", required=True)
    p.add_argument("--out_dir", default=None)
    a = p.parse_args(argv)
    out = a.out_dir or os.path.join(a.work_dir, "vis")
    print(render_round(a.work_dir, a.dataset_root, a.ann_file, out))


if __name__ == "__main__":
    main()
