"""Estimator pre-training (parity: scripts/posetrack_train.py).

From-scratch heatmap training: masked MSE x0.5, Adam/RMSprop(SGD) +
MultiStepLR, DPG second stage at DPG_MILESTONE (rebuild dataset with dpg
aug + LR reset), per-epoch snapshots, validate_gt COCO mAP, best-model
tracking (posetrack_train.py:30-212).  Checkpoints are orbax-free pickled
Flax variable trees (.pkl) + optionally torch-compatible export.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="PoseTrack21 training (TPU)")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--exp-id", default="default", dest="exp_id")
    p.add_argument("--work_dir", default="./exp")
    p.add_argument("--seed", type=int, default=123123)
    p.add_argument("--snapshot", type=int, default=2)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synth_videos", type=int, default=1,
                   help="with --synthetic: number of videos in the combined "
                        "training annotation (mixed resolutions)")
    p.add_argument("--epochs_override", type=int, default=None)
    p.add_argument("--stream", action="store_true",
                   help="host-RAM frames + prefetched native-warp crops "
                        "(forced automatically for mixed-resolution "
                        "annotation files)")
    # distributed-launch surface (parity: alphapose/opt.py:28-39); the
    # TPU-native backend is jax.distributed (parallel/mesh.init_multihost)
    p.add_argument("--rank", type=int, default=-1)
    p.add_argument("--dist-url", dest="dist_url",
                   default="tcp://127.0.0.1:23456")
    p.add_argument("--dist-backend", dest="dist_backend", default="ici")
    p.add_argument("--launcher", choices=["none", "pytorch", "slurm", "mpi"],
                   default="none")
    p.add_argument("--sync", action="store_true",
                   help="batch stats are already globally synced under DP "
                        "jit (SyncBatchNorm parity is the default here)")
    return p.parse_args(argv)


def train(cfg, opt):
    import jax
    from ..utils.runtime import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp
    from ..data.dataset import build_dataset
    from ..data.pipeline import AugCfg
    from ..eval.cocoeval import evaluate_map
    from ..models import build_sppe
    from ..train.optim import multistep_lr, with_warmup
    from ..train.retrain import Retrainer
    from ..al.scoring import ScoringConfig, ScoringEngine

    model_train = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=True)
    model_eval = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=False)
    h, w = cfg.DATA_PRESET.IMAGE_SIZE
    variables = model_train.init(jax.random.PRNGKey(opt.seed),
                                 jnp.zeros((1, h, w, 3)))
    if cfg.MODEL.get("PRETRAINED"):
        # torch .pth (MODEL.PRETRAINED parity, posetrack_train.py:221-229)
        # or this framework's own pickled variable tree
        if cfg.MODEL.PRETRAINED.endswith(".pkl"):
            with open(cfg.MODEL.PRETRAINED, "rb") as f:
                variables = pickle.load(f)
        else:
            from ..models import convert_state_dict
            from ..models.convert_torch import load_torch_checkpoint
            variables = convert_state_dict(
                load_torch_checkpoint(cfg.MODEL.PRETRAINED), cfg.MODEL.TYPE)

    dataset = build_dataset(cfg.DATASET.TRAIN)
    # combined pre-training jsons span videos of different resolutions —
    # those (or --stream) take the host-crop streaming path
    # (data/stream.py); single-video sets stay device-resident
    use_stream = bool(getattr(opt, "stream", False)) or \
        dataset.data.mixed_sizes
    if use_stream:
        store = dataset.frame_store()
        frames = None
        print(f"[stream] {len(store)} frames, "
              f"{store.total_bytes / 2**20:.1f} MiB host-resident")
    else:
        frames = jax.device_put(dataset.load_frames())
    aug = cfg.DATASET.TRAIN.get("AUG", {})
    # reuse the retrainer machinery with the TRAIN optimizer section
    retrain_cfg = {
        "OPTIMIZER": {"adam": "Adam", "sgd": "SGD"}.get(
            str(cfg.TRAIN.OPTIMIZER).lower(), cfg.TRAIN.OPTIMIZER),
        "LR": cfg.TRAIN.LR, "LR_GAMMA": 1.0,
        "BATCH_SIZE": cfg.TRAIN.BATCH_SIZE,
    }
    trainer = Retrainer(model_train, retrain_cfg, cfg.MODEL.TYPE,
                        input_size=(h, w),
                        hm_size=tuple(cfg.DATA_PRESET.HEATMAP_SIZE),
                        sigma=cfg.DATA_PRESET.SIGMA,
                        aug=AugCfg(scale_factor=aug.get("SCALE_FACTOR", 0.3),
                                   rot_factor=aug.get("ROT_FACTOR", 40),
                                   flip=aug.get("FLIP", True),
                                   num_joints_half_body=aug.get(
                                       "NUM_JOINTS_HALF_BODY", 8),
                                   prob_half_body=aug.get("PROB_HALF_BODY",
                                                          -1)),
                        joint_pairs=dataset.joint_pairs, seed=opt.seed)
    streamer = None
    if use_stream:
        from ..data.stream import CropStreamer
        streamer = CropStreamer(dataset.data, store, (h, w), trainer.aug,
                                dataset.joint_pairs, cfg.TRAIN.BATCH_SIZE,
                                seed=opt.seed)
    opt_state = trainer.init_opt_state(variables["params"])
    warmup = cfg.TRAIN.get("WARMUP_EPOCHS", 0)
    lr_fn = with_warmup(multistep_lr(cfg.TRAIN.LR, cfg.TRAIN.LR_STEP,
                                     cfg.TRAIN.get("LR_FACTOR", 0.1)),
                        warmup)
    begin = cfg.TRAIN.BEGIN_EPOCH
    end = opt.epochs_override or cfg.TRAIN.END_EPOCH
    os.makedirs(opt.work_dir, exist_ok=True)
    best_ap = 0.0
    idx_all = np.arange(len(dataset.data))
    dpg_milestone = cfg.TRAIN.get("DPG_MILESTONE")
    for epoch in range(begin, end):
        if dpg_milestone is not None and epoch == dpg_milestone:
            # DPG second stage (posetrack_train.py:201-210): reset LR
            # schedule to DPG_STEP and enable dpg augmentation.
            trainer.aug.add_dpg = True
            lr_fn = multistep_lr(cfg.TRAIN.LR, cfg.TRAIN.get("DPG_STEP", []),
                                 cfg.TRAIN.get("LR_FACTOR", 0.1))
            print(f"DPG stage enabled at epoch {epoch}")
        trainer.base_lr = lr_fn(epoch)
        trainer.gamma = 1.0
        trainer.epoch_counter = 0
        if use_stream:
            variables, opt_state, loss, acc = trainer.retrain_streaming(
                variables, opt_state, streamer, idx_all, 1)
        else:
            variables, opt_state, loss, acc = trainer.retrain(
                variables, opt_state, dataset.data, frames, idx_all, 1,
                (dataset.data.width, dataset.data.height))
        print(f"epoch {epoch} | loss {loss:.6f} | acc {acc:.4f} "
              f"| lr {trainer.base_lr:.2e}", flush=True)
        if (epoch + 1) % opt.snapshot == 0 or epoch == end - 1:
            path = os.path.join(opt.work_dir, f"model_{epoch}.pkl")
            with open(path, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, variables), f)
            ap = validate_gt(cfg, variables, model_eval, dataset, frames,
                             store=store if use_stream else None)
            print(f"epoch {epoch} | validate AP {ap:.4f}", flush=True)
            if ap > best_ap:
                best_ap = ap
                with open(os.path.join(opt.work_dir, "model_best.pkl"),
                          "wb") as f:
                    pickle.dump(jax.tree.map(np.asarray, variables), f)
    return variables


def validate_gt(cfg, variables, model_eval, dataset, frames, store=None):
    """GT-box validation mAP (posetrack_train.py:89-133).  `frames` is the
    device-resident stack, or None with a host `store` (streaming mode)."""
    import jax
    from ..al.scoring import ScoringConfig, ScoringEngine
    from ..eval.cocoeval import evaluate_map
    d = dataset.data
    engine = ScoringEngine(model_eval, ScoringConfig(
        uncertainty="None", need_embedding=False,
        input_size=tuple(cfg.DATA_PRESET.IMAGE_SIZE),
        eval_joints=tuple(dataset.EVAL_JOINTS)))
    bbox_ann = np.stack([d.bboxes[:, 0], d.bboxes[:, 1],
                         d.bboxes[:, 2] - d.bboxes[:, 0],
                         d.bboxes[:, 3] - d.bboxes[:, 1]], 1)
    if frames is None:
        res = engine.score_streaming(
            variables, store, d.frame_idx, d.bboxes, d.gt_keypoints,
            bbox_ann, d.is_prev, d.is_next, keep_heatmaps=False)
    else:
        res = engine.score(variables, frames, d.frame_idx, d.bboxes,
                           d.gt_keypoints, bbox_ann, d.is_prev, d.is_next,
                           keep_heatmaps=False)
    kpt_json, gt_json = [], []
    for j in range(len(d)):
        e = {"bbox": bbox_ann[j].tolist(), "image_id": int(d.img_ids[j]),
             "id": int(d.ann_ids[j]), "score": float(res["det_score"][j]),
             "category_id": 1, "keypoints": res["kpts"][j].tolist()}
        kpt_json.append(e)
        g = dict(e)
        g["keypoints"] = d.gt_keypoints[j].tolist()
        gt_json.append(g)
    from ..data.coco_json import CocoJson
    src = CocoJson(os.path.join(cfg.DATASET.TRAIN.ROOT,
                                cfg.DATASET.TRAIN.ANN)).dataset
    gt = {"images": src["images"], "categories": src["categories"],
          "annotations": gt_json}
    return evaluate_map(kpt_json, gt)["AP"]


def main(argv=None):
    from ..config import update_config
    opt = parse_args(argv)
    cfg = update_config(opt.cfg)
    np.random.seed(opt.seed)
    if opt.synthetic:
        import tempfile
        from ..data.synthetic import (make_synthetic_multivideo,
                                      make_synthetic_video)
        root = tempfile.mkdtemp(prefix="vatl_pretrain_")
        if opt.synth_videos > 1:
            _, ann = make_synthetic_multivideo(
                root, num_videos=opt.synth_videos, num_frames=8,
                num_persons=3, seed=opt.seed, appearance_jitter=True)
        else:
            _, ann = make_synthetic_video(root, num_frames=6, seed=opt.seed)
        cfg.DATASET.TRAIN.ROOT = root
        cfg.DATASET.TRAIN.ANN = ann
    train(cfg, opt)


if __name__ == "__main__":
    main()
