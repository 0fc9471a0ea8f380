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


class TestJrdbTrainCLI:
    def test_jrdb_synthetic_training_runs(self, tmp_path):
        """jrdbpose_train drives the JRDB2022 dataset path end to end
        (3-digit track suffix, JRDB joint pairs) and refuses non-JRDB
        configs."""
        import yaml
        from vatl4pose_tpu.cli.jrdbpose_train import main
        cfg = {
            "DATASET": {"TRAIN": {"TYPE": "JRDB2022", "ROOT": "",
                                  "IMG_PREFIX": "", "ANN": "",
                                  "AUG": {"FLIP": True, "ROT_FACTOR": 10,
                                          "SCALE_FACTOR": 0.1,
                                          "NUM_JOINTS_HALF_BODY": 8,
                                          "PROB_HALF_BODY": -1}},
                        "EVAL": {"TYPE": "JRDB2022", "ROOT": "",
                                 "IMG_PREFIX": "", "ANN": ""}},
            "DATA_PRESET": {"TYPE": "simple", "SIGMA": 2, "NUM_JOINTS": 17,
                            "IMAGE_SIZE": [64, 64],
                            "HEATMAP_SIZE": [16, 16]},
            "MODEL": {"TYPE": "SimplePose", "PRETRAINED": "",
                      "TRY_LOAD": "", "NUM_DECONV_FILTERS": [64, 64, 64],
                      "NUM_LAYERS": 18},
            "LOSS": {"TYPE": "MSELoss"},
            "TRAIN": {"WORLD_SIZE": 1, "BATCH_SIZE": 8, "BEGIN_EPOCH": 0,
                      "END_EPOCH": 2, "OPTIMIZER": "adam", "LR": 1e-3,
                      "LR_FACTOR": 0.1, "LR_STEP": [1]},
        }
        cfg_path = tmp_path / "jrdb.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        main(["--cfg", str(cfg_path), "--synthetic", "--seed", "5",
              "--snapshot", "2", "--work_dir", str(tmp_path / "work")])
        import os
        assert any(f.endswith(".pkl")
                   for f in os.listdir(tmp_path / "work"))

        # non-JRDB config is rejected
        cfg["DATASET"]["TRAIN"]["TYPE"] = "Posetrack21"
        cfg_path.write_text(yaml.safe_dump(cfg))
        import pytest
        with pytest.raises(AssertionError, match="JRDB2022"):
            main(["--cfg", str(cfg_path), "--seed", "5",
                  "--work_dir", str(tmp_path / "w2")])


class TestConcatAndDetDatasets:
    def test_concat_lifts_joint_slices(self, tmp_path):
        """ConcatDataset places each subset's joints at its MASK_ID offset
        in the combined label space (concat_dataset.py:60-66)."""
        import numpy as np
        from vatl4pose_tpu.config import Cfg
        from vatl4pose_tpu.data.dataset import build_dataset
        from vatl4pose_tpu.data.synthetic import make_synthetic_video
        r1, a1 = make_synthetic_video(str(tmp_path / "a"), num_frames=2,
                                      num_persons=1, width=160, height=128)
        r2, a2 = make_synthetic_video(str(tmp_path / "b"), num_frames=3,
                                      num_persons=2, width=128, height=96,
                                      seed=5)
        cfg = Cfg({"TYPE": "ConcatDataset", "NUM_JOINTS": 20,
                   "SET_LIST": [
                       {"TYPE": "Posetrack21", "ROOT": r1, "ANN": a1,
                        "IMG_PREFIX": "", "MASK_ID": 0},
                       {"TYPE": "Posetrack21", "ROOT": r2, "ANN": a2,
                        "IMG_PREFIX": "", "MASK_ID": 3}]})
        ds = build_dataset(cfg)
        assert len(ds) == 2 + 6
        d = ds.data
        assert d.joints_xy.shape[1] == 20
        assert d.gt_keypoints.shape[1] == 60
        # subset 2's joints live at offset 3; its slots 0-2 are invisible
        assert np.all(d.joints_vis[2:, :3] == 0)
        assert np.any(d.joints_vis[2:, 3:20] > 0)
        # subset 1 has nothing past joint 17
        assert np.all(d.joints_vis[:2, 17:] == 0)
        assert d.mixed_sizes
        # track keys are namespaced: no accidental cross-subset linkage
        assert d.track_keys[1].startswith("s0:")
        assert d.track_keys[2].startswith("s1:")

    def test_mscoco_det_loads_detection_boxes(self, tmp_path):
        import json
        import numpy as np
        from vatl4pose_tpu.config import Cfg
        from vatl4pose_tpu.data.dataset import build_dataset
        from vatl4pose_tpu.data.synthetic import make_synthetic_video
        root, ann = make_synthetic_video(str(tmp_path), num_frames=2,
                                         num_persons=1, width=160,
                                         height=128)
        dets = [{"image_id": 10000, "bbox": [10.0, 12.0, 40.0, 60.0],
                 "score": 0.9, "category_id": 1},
                {"image_id": 10001, "bbox": [20.0, 5.0, 30.0, 70.0],
                 "score": 0.7, "category_id": 1}]
        with open(tmp_path / "dets.json", "w") as f:
            json.dump(dets, f)
        ds = build_dataset(Cfg({"TYPE": "Mscoco_det", "ROOT": root,
                                "ANN": ann, "DET_FILE": "dets.json"}))
        assert len(ds) == 2
        np.testing.assert_allclose(ds.det_scores, [0.9, 0.7], rtol=1e-6)
        # clipped xyxy conversion (bbox.py xywh->xyxy with w-1 semantics)
        np.testing.assert_allclose(ds.bboxes[0], [10, 12, 49, 71])
        frames = ds.load_frames()
        assert frames.shape == (2, 128, 160, 3)
