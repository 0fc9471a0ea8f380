"""Additional dataset loaders: MSCOCO keypoints and MPII.

Parity: alphapose/datasets/mscoco.py:14 and mpii.py — AlphaPose-inherited
datasets not used by the shipped VATL configs (SURVEY §2.2 "leftovers"), kept
for capability parity: single-image person-crop items from COCO-format
jsons, no temporal linkage.
"""

from __future__ import annotations

from ..registry import DATASET
from .dataset import VideoPoseDataset


@DATASET.register_module
class Mscoco(VideoPoseDataset):
    """COCO val2017-style keypoint dataset (no tracks: every item is its own
    'track', so temporal flags are always False)."""
    num_joints = 17
    joint_pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                   [13, 14], [15, 16]]
    track_suffix_digits = 2
    EVAL_JOINTS = list(range(17))

    def _parse_obj(self, obj, frame, width, height):
        parsed = super()._parse_obj(obj, frame, width, height)
        if parsed is not None:
            # unique per-annotation track: disables prev/next linkage
            parsed["track_key"] = f"coco{parsed['ann_id']}"
        return parsed


@DATASET.register_module
class Mpii(VideoPoseDataset):
    """MPII 16-joint single-person dataset (COCO-format json export)."""
    num_joints = 16
    joint_pairs = [[0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]]
    track_suffix_digits = 2
    EVAL_JOINTS = list(range(16))

    def _parse_obj(self, obj, frame, width, height):
        parsed = super()._parse_obj(obj, frame, width, height)
        if parsed is not None:
            parsed["track_key"] = f"mpii{parsed['ann_id']}"
        return parsed
