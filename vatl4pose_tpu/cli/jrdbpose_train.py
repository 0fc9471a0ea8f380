"""JRDB-Pose estimator pre-training (parity: scripts/jrdbpose_train.py).

The reference's jrdbpose_train.py is a near-duplicate of
posetrack_train.py (same loss/optimizer/DPG machinery, cosmetic loop
differences); the JRDB-specific behavior lives in the data layer — dataset
TYPE 'JRDB2022' with the 3-digit track-id suffix, JRDB joint pairs for
flip augmentation, and stitched-scene frame sizes (jrdb2022.py:13-236).
This entry point reuses the shared trainer but pins JRDB defaults and
validates the dataset type, and its --synthetic fixture generates
JRDB-style 3-digit-annotated videos.
"""

from __future__ import annotations

from .posetrack_train import parse_args, train


def main(argv=None):
    import numpy as np

    from ..config import update_config
    opt = parse_args(argv)
    cfg = update_config(opt.cfg)
    np.random.seed(opt.seed)
    if opt.synthetic:
        import tempfile

        from ..data.synthetic import (make_synthetic_multivideo,
                                      make_synthetic_video)
        root = tempfile.mkdtemp(prefix="vatl_jrdb_pretrain_")
        # JRDB2022 composite-id sort takes the last THREE ann-id digits
        if opt.synth_videos > 1:
            _, ann = make_synthetic_multivideo(
                root, num_videos=opt.synth_videos, num_frames=8,
                num_persons=3, seed=opt.seed, appearance_jitter=True,
                track_digits=3)
        else:
            _, ann = make_synthetic_video(root, num_frames=6, seed=opt.seed,
                                          track_digits=3)
        cfg.DATASET.TRAIN.ROOT = root
        cfg.DATASET.TRAIN.ANN = ann
        cfg.DATASET.TRAIN.TYPE = "JRDB2022"
    assert cfg.DATASET.TRAIN.TYPE == "JRDB2022", (
        "jrdbpose_train expects a JRDB2022 training dataset "
        f"(got {cfg.DATASET.TRAIN.TYPE}); use posetrack_train otherwise")
    return train(cfg, opt)


if __name__ == "__main__":
    main()
