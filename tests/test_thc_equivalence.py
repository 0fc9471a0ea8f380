"""THC shifted-gather formulation vs the reference's explicit neighbor
forwards.

The reference runs 3 forward passes per sample (current, prev-crop,
next-crop — ActiveLearning.py:277,294-297).  This build computes each
heatmap once and gathers neighbors by a roll over the track-sorted sample
axis (ops/temporal.py).  Equivalence holds because the eval dataset applies
no augmentation, so the neighbor's crop tensor is identical whether it is
produced as someone's "prev/next" or as its own "current"
(posetrack21.py:131-181 uses test_transform both ways).

This test proves the end-to-end claim on a real pipeline: score a synthetic
video through the engine, then recompute THC the reference way — explicit
per-neighbor crops + forwards — and compare.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vatl4pose_tpu.data.dataset import build_dataset
from vatl4pose_tpu.config import Cfg
from vatl4pose_tpu.data.synthetic import make_synthetic_video
from vatl4pose_tpu.models import SimplePose
from vatl4pose_tpu.ops import crop_batch
from vatl4pose_tpu.al.scoring import ScoringConfig, ScoringEngine


class TestThcEquivalence:
    def test_roll_matches_explicit_neighbor_forwards(self, tmp_path):
        root, ann = make_synthetic_video(str(tmp_path), num_frames=5,
                                         num_persons=2, width=160,
                                         height=128)
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann}))
        d = ds.data
        frames = jnp.asarray(ds.load_frames())
        model = SimplePose(num_joints=17, num_layers=18, train=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
        engine = ScoringEngine(model, ScoringConfig(
            uncertainty="THC_L1", need_embedding=False,
            input_size=(64, 64)), chunk=32)
        bbox_ann = np.stack([d.bboxes[:, 0], d.bboxes[:, 1],
                             d.bboxes[:, 2] - d.bboxes[:, 0],
                             d.bboxes[:, 3] - d.bboxes[:, 1]], 1)
        res = engine.score(variables, frames, d.frame_idx, d.bboxes,
                           d.gt_keypoints, bbox_ann, d.is_prev, d.is_next)

        # reference-style recomputation: forward every sample's prev/next
        # crop explicitly (the neighbor's own bbox, like _get_temporal_img)
        crops, _ = crop_batch(frames.astype(jnp.float32), d.frame_idx,
                              d.bboxes, (64, 64))
        hms = jnp.transpose(model.apply(variables, crops), (0, 3, 1, 2))
        hms = np.asarray(hms)
        n, K = hms.shape[0], hms.shape[1]
        for i in range(n):
            thc = 0.0
            if d.is_prev[i]:
                # prev sample's crop forwarded independently
                prev_crop, _ = crop_batch(
                    frames.astype(jnp.float32),
                    d.frame_idx[i - 1:i], d.bboxes[i - 1:i], (64, 64))
                hm_prev = np.asarray(jnp.transpose(
                    model.apply(variables, prev_crop), (0, 3, 1, 2)))[0]
                thc += np.sum(np.abs(hms[i] - hm_prev)) / K
            if d.is_next[i]:
                next_crop, _ = crop_batch(
                    frames.astype(jnp.float32),
                    d.frame_idx[i + 1:i + 2], d.bboxes[i + 1:i + 2],
                    (64, 64))
                hm_next = np.asarray(jnp.transpose(
                    model.apply(variables, next_crop), (0, 3, 1, 2)))[0]
                thc += np.sum(np.abs(hms[i] - hm_next)) / K
                if not d.is_prev[i]:
                    thc *= 2
            elif d.is_prev[i]:
                thc *= 2
            np.testing.assert_allclose(res["unc"][i], thc, rtol=2e-3,
                                       atol=1e-3)
