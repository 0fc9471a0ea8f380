"""Wholebody hybrid-feature dataset for WPU autoencoder training.

Parity: active_learning/Whole_body_AE/Whole_body_hybrid.py:12-85 — hybrid
features computed from a COCO-format annotation json, filtered to bodies
with >=1 visible keypoint, sorted by the composite ann_id (2-digit suffix
PoseTrack, 3-digit JRDB), cached to .npy next to the data.

This build pins the 38-d ear-dropped feature (see ops/hybrid.py docstring
on the reference's 38/42-d inconsistency).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..ops.hybrid import compute_hybrid


class Wholebody:
    def __init__(self, ann_path: str, dataset_type: str = "Posetrack21",
                 kp_direct: bool = False, cache_dir: Optional[str] = None):
        self.kp_direct = kp_direct
        digits = 2 if dataset_type == "Posetrack21" else 3
        cache_path = None
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(
                cache_dir, os.path.basename(ann_path) + ".npy")
            if os.path.exists(cache_path):
                blob = np.load(cache_path, allow_pickle=True).item()
                self.features = blob["features"]
                self.ann_ids = blob["ann_ids"]
                return
        with open(ann_path) as f:
            data = json.load(f)
        rows = []
        for ann in data["annotations"]:
            kps = np.asarray(ann["keypoints"], np.float32)
            if kps[2::3].sum() == 0:
                continue
            comp_id = int(str(int(ann["id"]))[-digits:] + str(ann["image_id"]))
            if kp_direct:
                feat = kps
            else:
                feat = np.asarray(compute_hybrid(
                    np.asarray(ann["bbox"], np.float32), kps))
            rows.append((comp_id, feat))
        rows.sort(key=lambda r: r[0])
        self.ann_ids = np.array([r[0] for r in rows], np.int64)
        self.features = np.stack([r[1] for r in rows]).astype(np.float32)
        if cache_path is not None:
            np.save(cache_path, {"features": self.features,
                                 "ann_ids": self.ann_ids})

    def __len__(self):
        return len(self.ann_ids)

    def __getitem__(self, i):
        return self.features[i]
