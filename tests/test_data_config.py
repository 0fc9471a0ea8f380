"""Data layer / config / checkpoint utility tests."""

import json
import os

import numpy as np
import pytest

from vatl4pose_tpu.config import Cfg, load_config_str
from vatl4pose_tpu.data.dataset import build_dataset
from vatl4pose_tpu.data.synthetic import make_synthetic_video
from vatl4pose_tpu.data.wholebody import Wholebody


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    return make_synthetic_video(root, num_frames=4, num_persons=2,
                                width=200, height=160)


class TestDataset:
    def test_track_sorted_with_neighbor_flags(self, synth):
        root, ann = synth
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann}))
        d = ds.data
        assert len(d) == 8
        # composite-id sort groups tracks: same track on consecutive indices
        for i in range(1, len(d)):
            if d.track_keys[i] == d.track_keys[i - 1]:
                assert d.is_prev[i] and d.is_next[i - 1]
        # first/last of each track have no neighbor on that side
        assert not d.is_prev[0]
        assert not d.is_next[len(d) - 1]

    def test_frames_decode_once_per_frame(self, synth):
        root, ann = synth
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann}))
        frames = ds.load_frames()
        assert frames.shape == (4, 160, 200, 3)
        assert frames.dtype == np.uint8

    def test_wholebody_features(self, synth, tmp_path):
        root, ann = synth
        wb = Wholebody(os.path.join(root, ann), cache_dir=str(tmp_path))
        assert wb.features.shape[1] == 38
        assert len(wb) == 8
        # cached reload identical
        wb2 = Wholebody(os.path.join(root, ann), cache_dir=str(tmp_path))
        np.testing.assert_array_equal(wb.features, wb2.features)


class TestConfig:
    def test_yaml_attribute_access_and_mutation(self):
        cfg = load_config_str("""
A:
  B: [1, 2]
  C:
    D: 'x'
""")
        assert cfg.A.B == [1, 2]
        assert cfg.A.C.D == "x"
        cfg.A.C.D = "y"            # runtime mutation (Optuna writes)
        cfg.A.NEW = {"Z": 3}
        assert cfg.A.NEW.Z == 3

    def test_reference_config_files_load(self):
        from vatl4pose_tpu.config import update_config
        for p in ("configs/posetrack21/al_simple_posetrack.yaml",
                  "configs/jrdb-pose/al_simple_jrdb.yaml",
                  "configs/synthetic/al_simple_synthetic.yaml"):
            cfg = update_config(p)
            assert cfg.DATA_PRESET.NUM_JOINTS == 17
            assert cfg.RETRAIN.OPTIMIZER == "AdamW"


class TestCheckpoint:
    def test_save_load_try_load(self, tmp_path):
        import jax.numpy as jnp
        from vatl4pose_tpu.utils.checkpoint import (load_checkpoint,
                                                    save_checkpoint, try_load)
        tree = {"params": {"a": jnp.ones((3, 2)), "b": jnp.zeros(4)}}
        p = save_checkpoint(str(tmp_path / "ck.pkl"), tree)
        back = load_checkpoint(p)
        np.testing.assert_array_equal(back["params"]["a"], np.ones((3, 2)))
        # shape-filtered partial load
        new = {"params": {"a": jnp.full((3, 2), 5.0),
                          "b": jnp.zeros(7)}}   # b shape differs
        merged, n = try_load(new, back)
        assert n == 1
        np.testing.assert_array_equal(merged["params"]["a"], np.ones((3, 2)))
        assert merged["params"]["b"].shape == (7,)


class TestJrdbDataset:
    def test_three_digit_composite_sort(self, synth):
        from vatl4pose_tpu.config import Cfg
        root, ann = synth
        ds = build_dataset(Cfg({"TYPE": "JRDB2022", "ROOT": root,
                                "ANN": ann}))
        d = ds.data
        assert len(d) == 8
        # composite ids strictly increasing in dataset order (3-digit suffix)
        comp = [int(str(a)[-3:] + str(i))
                for a, i in zip(d.ann_ids, d.img_ids)]
        # not necessarily the stored order, but track flags must be coherent
        for i in range(1, len(d)):
            if d.track_keys[i] == d.track_keys[i - 1]:
                assert d.is_prev[i]


class TestJpegFrames:
    def test_load_frames_from_jpeg(self, tmp_path):
        """Real PoseTrack frames are JPEGs — exercise the cv2 decode path."""
        import cv2
        from vatl4pose_tpu.config import Cfg
        root, ann = make_synthetic_video(str(tmp_path), num_frames=3,
                                         num_persons=1, width=120, height=96)
        # convert the .npy frames to .jpg and rewrite the annotation
        with open(os.path.join(root, ann)) as f:
            data = json.load(f)
        for img in data["images"]:
            arr = np.load(os.path.join(root, img["file_name"]))
            new_name = img["file_name"].replace(".npy", ".jpg")
            cv2.imwrite(os.path.join(root, new_name),
                        cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
            img["file_name"] = new_name
        with open(os.path.join(root, ann), "w") as f:
            json.dump(data, f)
        ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                                "ANN": ann}))
        frames = ds.load_frames()
        assert frames.shape == (3, 96, 120, 3)
        assert frames.dtype == np.uint8
        assert frames.max() > 50  # decoded real content, RGB order
