"""Offline estimator evaluation (parity: scripts/poseestimator_eval.py).

Forward → decode → per-sample OKS → COCO keypoint mAP on a chosen split.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Pose estimator eval (TPU)")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--splits", nargs="+", default=["TEST"])
    p.add_argument("--work_dir", default="./exp/eval")
    p.add_argument("--synthetic", action="store_true")
    return p.parse_args(argv)


def validate(cfg, variables, split: str, synthetic_root=None):
    import jax
    from ..al.scoring import ScoringConfig, ScoringEngine
    from ..data.coco_json import CocoJson
    from ..data.dataset import build_dataset
    from ..eval.cocoeval import evaluate_map
    from ..models import build_sppe

    ds_cfg = cfg.DATASET[split]
    dataset = build_dataset(ds_cfg)
    d = dataset.data
    frames = jax.device_put(dataset.load_frames())
    model = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=False)
    engine = ScoringEngine(model, ScoringConfig(
        uncertainty="None", need_embedding=False,
        input_size=tuple(cfg.DATA_PRESET.IMAGE_SIZE),
        eval_joints=tuple(dataset.EVAL_JOINTS)))
    bbox_ann = np.stack([d.bboxes[:, 0], d.bboxes[:, 1],
                         d.bboxes[:, 2] - d.bboxes[:, 0],
                         d.bboxes[:, 3] - d.bboxes[:, 1]], 1)
    res = engine.score(variables, frames, d.frame_idx, d.bboxes,
                       d.gt_keypoints, bbox_ann, d.is_prev, d.is_next)
    kpt_json, gt_json = [], []
    for j in range(len(d)):
        e = {"bbox": bbox_ann[j].tolist(), "image_id": int(d.img_ids[j]),
             "id": int(d.ann_ids[j]), "score": float(res["det_score"][j]),
             "category_id": 1, "keypoints": res["kpts"][j].tolist(),
             "OKS": float(res["oks"][j])}
        kpt_json.append(e)
        g = dict(e)
        g["keypoints"] = d.gt_keypoints[j].tolist()
        gt_json.append(g)
    src = CocoJson(os.path.join(ds_cfg.ROOT, ds_cfg.ANN)).dataset
    gt = {"images": src["images"], "categories": src["categories"],
          "annotations": gt_json}
    return evaluate_map(kpt_json, gt), kpt_json


def main(argv=None):
    import jax
    from ..utils.runtime import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp
    import pickle
    from ..config import update_config
    from ..models import build_sppe, convert_state_dict
    from ..models.convert_torch import load_torch_checkpoint

    opt = parse_args(argv)
    cfg = update_config(opt.cfg)
    if opt.synthetic:
        import tempfile
        from ..data.synthetic import make_synthetic_video
        root = tempfile.mkdtemp(prefix="vatl_eval_")
        _, ann = make_synthetic_video(root)
        for s in opt.splits:
            cfg.DATASET.setdefault(s, dict(cfg.DATASET.EVAL))
            cfg.DATASET[s].ROOT = root
            cfg.DATASET[s].ANN = ann
    ckpt = opt.checkpoint or cfg.MODEL.get("PRETRAINED", "")
    if ckpt.endswith(".pth"):
        variables = convert_state_dict(load_torch_checkpoint(ckpt),
                                       cfg.MODEL.TYPE)
    elif ckpt:
        with open(ckpt, "rb") as f:
            variables = pickle.load(f)
    else:
        model = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=False)
        h, w = cfg.DATA_PRESET.IMAGE_SIZE
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, 3)))
    variables = jax.tree.map(jnp.asarray, variables)
    os.makedirs(opt.work_dir, exist_ok=True)
    for split in opt.splits:
        res, kpt_json = validate(cfg, variables, split)
        print(f"##### {split} | AP: {res['AP'] * 100:.2f} "
              f"AP.5: {res['AP .5'] * 100:.2f} #####")
        with open(os.path.join(opt.work_dir,
                               f"predicted_kpt_{split}.json"), "w") as f:
            json.dump(kpt_json, f)


if __name__ == "__main__":
    main()
