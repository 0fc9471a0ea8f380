"""Import the reference's ACTUAL vendored pycocotools for parity testing.

The reference ships a patched cocoapi snapshot at
/root/reference/data/coco/cocoapi/PythonAPI/pycocotools whose keypoint path
is pure Python — only the Cython RLE module `pycocotools._mask` (never
touched by iouType='keypoints') needs a stand-in.  This loader makes that
snapshot importable so tests/refbridge can run the reference's REAL
COCO/COCOeval instead of a reimplementation (closing the circularity
VERDICT r2 flagged).

Environment compat shims (no behavior change on the exercised path):
  - sys.modules['pycocotools._mask']: raising stub (segm/bbox-only API).
  - np.float: the snapshot predates numpy 1.24 (cocoeval.py:385-386 uses
    `np.float`, an alias of the builtin float back then); restore the alias.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

VENDORED = "/root/reference/data/coco/cocoapi/PythonAPI/pycocotools"

_loaded: dict = {}


def load_vendored_pycocotools():
    """Returns (coco_module, cocoeval_module) loaded from the reference's
    vendored snapshot, installing them as the canonical `pycocotools.*`
    modules.  Idempotent."""
    if _loaded:
        return _loaded["coco"], _loaded["cocoeval"]

    if not hasattr(np, "float"):          # numpy>=1.24 removed the alias
        np.float = float                   # noqa: NPY001 — vendored-era alias

    pkg = types.ModuleType("pycocotools")
    pkg.__path__ = [VENDORED]
    sys.modules["pycocotools"] = pkg

    _mask = types.ModuleType("pycocotools._mask")

    def _unavailable(*a, **k):
        raise RuntimeError("pycocotools._mask is a Cython module not built "
                           "in this environment; only the keypoints eval "
                           "path (which never calls it) is supported")

    for name in ("iou", "merge", "frPyObjects", "encode", "decode", "area",
                 "toBbox"):
        setattr(_mask, name, _unavailable)
    sys.modules["pycocotools._mask"] = _mask

    for mod_name in ("mask", "coco", "cocoeval"):
        spec = importlib.util.spec_from_file_location(
            f"pycocotools.{mod_name}", os.path.join(VENDORED, f"{mod_name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"pycocotools.{mod_name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, mod_name, mod)
        _loaded[mod_name] = mod

    return _loaded["coco"], _loaded["cocoeval"]


def reference_evaluate_map(dt_list, gt_dict, tmpdir):
    """Run the reference's evaluate_mAP pipeline (metrics.py:65-115) —
    vendored COCO(gt) → loadRes(dt) → COCOeval('keypoints')
    evaluate/accumulate/summarize — returning the same 10-key dict.
    Writes the jsons to tmpdir the way the AL loop does
    (ActiveLearning.py:439-446)."""
    import json

    coco_mod, cocoeval_mod = load_vendored_pycocotools()

    gt_path = os.path.join(str(tmpdir), "GT_kpt.json")
    dt_path = os.path.join(str(tmpdir), "predicted_kpt.json")
    with open(gt_path, "w") as f:
        json.dump(gt_dict, f)
    with open(dt_path, "w") as f:
        json.dump(dt_list, f)

    coco_gt = coco_mod.COCO(gt_path)
    coco_dt = coco_gt.loadRes(dt_path)
    ev = cocoeval_mod.COCOeval(coco_gt, coco_dt, "keypoints")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    keys = ["AP", "AP .5", "AP .6", "AP .7", "AP .75", "AP .8", "AP .95",
            "AP (M)", "AP (L)", "AR"]
    return {k: float(v) for k, v in zip(keys, ev.stats)}
