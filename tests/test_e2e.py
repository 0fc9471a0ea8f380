"""End-to-end AL loop on a synthetic video (CPU, tiny model)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from vatl4pose_tpu.data.synthetic import make_synthetic_video
    root = str(tmp_path_factory.mktemp("synth"))
    root, ann = make_synthetic_video(root, num_frames=5, num_persons=2,
                                     width=160, height=128)
    return root, ann


def _cfg(root, ann):
    from vatl4pose_tpu.config import Cfg
    return Cfg({
        "DATASET": {
            "TRAIN": {"TYPE": "Posetrack21", "ROOT": root, "ANN": ann,
                      "IMG_PREFIX": "",
                      "AUG": {"FLIP": False, "ROT_FACTOR": 40,
                              "SCALE_FACTOR": 0.3,
                              "NUM_JOINTS_HALF_BODY": 8,
                              "PROB_HALF_BODY": -1}},
            "EVAL": {"TYPE": "Posetrack21", "ROOT": root, "ANN": ann,
                     "IMG_PREFIX": ""},
        },
        "DATA_PRESET": {"TYPE": "simple", "SIGMA": 2, "NUM_JOINTS": 17,
                        "IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16]},
        "MODEL": {"TYPE": "SimplePose", "PRETRAINED": "", "TRY_LOAD": "",
                  "NUM_DECONV_FILTERS": [64, 64, 64], "NUM_LAYERS": 18},
        "LOSS": {"TYPE": "MSELoss"},
        "AE": {"Z_DIM": 4, "PRETRAINED_ROOT": "", "EPOCH": 1, "LR": 8e-5},
        "AUXNET": {"PRETRAINED_ROOT": "", "EPOCH": 1, "LR": 8e-5},
        "RETRAIN": {"BATCH_SIZE": 8, "BASE": 1, "OPTIMIZER": "AdamW",
                    "LR": 2.5e-4, "ALPHA": 1, "WEIGHT_DECAY": 0.7,
                    "LR_GAMMA": 0.99},
        "VAL": {"FINISH_ACC": 1, "BATCH_SIZE": 16, "W_UNC": 0.01,
                "UNC_LAMBDA": 0.01, "QUERY_RATIO": [0.5, 1.0],
                "VIS": False},
    })


class Opt:
    def __init__(self, work_dir, **kw):
        self.uncertainty = kw.get("uncertainty", "THC_L1")
        self.representativeness = kw.get("representativeness", "None")
        self.filter = kw.get("filter", "None")
        self.strategy = kw.get("strategy", self.uncertainty)
        self.video_id = "000001"
        self.work_dir = work_dir
        self.seed = 166
        self.retrain_thresh = 1.0
        self.continual = kw.get("continual", False)
        self.onebyone = False
        self.from_scratch = True
        self.THCvsWPU = "const"
        self.fixed_lambda = False
        self.optimize = False


def run_loop(cfg, opt):
    from vatl4pose_tpu.al.active_learning import ActiveLearning
    al = ActiveLearning(cfg, opt)
    while True:
        al.eval_and_query()
        result = al.outcome()
        if result is not None:
            return al, result


class TestEndToEnd:
    def test_thc_coreset_full_loop(self, synth, tmp_path):
        root, ann = synth
        cfg = _cfg(root, ann)
        opt = Opt(str(tmp_path), uncertainty="THC_L1", filter="Coreset",
                  representativeness="None", strategy="THC_L1_Coresetfilter")
        al, result = run_loop(cfg, opt)
        n = al.eval_len
        # every sample labeled exactly once, queries disjoint
        all_q = [q for r in result[3].values() for q in r]
        assert sorted(all_q) == list(range(n))
        # curves have one entry per round incl. final
        assert len(result[0]) == len(result[1]) == len(result[17])
        # with GT substituted everywhere, final ann-mAP is 1
        assert abs(result[2][-1]["AP"] - 1.0) < 1e-6
        assert result[18][-1] < 1e-6        # final OSPA_ann

    def test_thc_wpu_influence_weighted(self, synth, tmp_path):
        root, ann = synth
        cfg = _cfg(root, ann)
        opt = Opt(str(tmp_path), uncertainty="THC+WPU",
                  representativeness="Influence", filter="weighted",
                  strategy="THC+WPU+Influence_weightedfilter")
        al, result = run_loop(cfg, opt)
        all_q = [q for r in result[3].values() for q in r]
        assert sorted(all_q) == list(range(al.eval_len))
        # uncertainty dict holds [thc, wpu] pairs
        r0 = result[4]["Round0"]
        assert len(next(iter(r0.values()))) == 2


class TestResume:
    def test_checkpoint_resume_matches_uninterrupted(self, synth, tmp_path):
        """Interrupt after round 0, resume in a fresh orchestrator, and the
        remaining rounds must produce identical selections and curves."""
        from vatl4pose_tpu.al.active_learning import ActiveLearning
        root, ann = synth
        cfg = _cfg(root, ann)
        # uninterrupted reference run
        optA = Opt(str(tmp_path / "a"), uncertainty="THC_L1",
                   filter="Coreset", strategy="s")
        alA = ActiveLearning(cfg, optA)
        while True:
            alA.eval_and_query()
            resA = alA.outcome()
            if resA is not None:
                break
        # interrupted run: one round, checkpoint, new object, resume
        optB = Opt(str(tmp_path / "b"), uncertainty="THC_L1",
                   filter="Coreset", strategy="s")
        alB1 = ActiveLearning(cfg, optB)
        alB1.eval_and_query()
        assert alB1.outcome() is None
        ckpt = alB1.save_state(str(tmp_path / "state.pkl"))
        del alB1
        alB2 = ActiveLearning(cfg, optB).load_state(ckpt)
        while True:
            alB2.eval_and_query()
            resB = alB2.outcome()
            if resB is not None:
                break
        assert resA[3] == resB[3]          # identical query lists per round
        assert resA[0] == resB[0]          # identical percentages


class TestDeterminism:
    def test_same_seed_identical_selections(self, synth, tmp_path):
        """--seedfix reproducibility: two runs with the same seed produce
        identical query lists, curves and stopping markers (the premise of
        the selection-parity requirement, BASELINE.md)."""
        root, ann = synth
        results = []
        for tag in ("r1", "r2"):
            cfg = _cfg(root, ann)
            opt = Opt(str(tmp_path / tag), uncertainty="THC+WPU",
                      representativeness="Influence", filter="Coreset",
                      strategy="THC+WPU+Influence_Coresetfilter")
            _, res = run_loop(cfg, opt)
            results.append(res)
        a, b = results
        assert a[3] == b[3]                      # query lists
        assert a[0] == b[0]                      # percentages
        assert a[14:17] == b[14:17]              # stopping markers
        for pa, pb in zip(a[1], b[1]):           # mAP dicts per round
            assert pa == pb


class TestRoundMetricsAndVis:
    def test_spearman_corr_populated_and_artifacts(self, synth, tmp_path):
        """Per-round Spearman/Pearson land in the result tuple (reference
        schema fields 8/9 — its own computation ships disabled,
        ActiveLearning.py:430) and the --vis_thc/--vis_wpu/cluster artifact
        dumps appear."""
        root, ann = synth
        cfg = _cfg(root, ann)
        opt = Opt(str(tmp_path), uncertainty="THC+WPU",
                  representativeness="Influence", filter="Coreset",
                  strategy="THC+WPU+Influence_Coresetfilter")
        opt.vis = True
        opt.vis_thc = True
        opt.vis_wpu = True
        al, result = run_loop(cfg, opt)
        spearman, corr = result[8], result[9]
        # one entry per eval round (2 query rounds + final eval)
        assert len(spearman) == len(corr) == len(result[0])
        assert all(np.isfinite(v) for v in spearman)
        assert all(np.isfinite(v) for v in corr)
        assert all(-1.0 <= v <= 1.0 for v in spearman)
        # artifacts: THC heatmap grids (samples with both neighbors), WPU
        # scatter (all samples), cluster plot (Coreset filter under --vis)
        thc_dir = os.path.join(str(tmp_path), "vis_thc", "Round0")
        wpu_dir = os.path.join(str(tmp_path), "vis_wpu", "Round0")
        cl_dir = os.path.join(str(tmp_path), "cluster")
        n_mid = int(np.sum(al.data.is_prev & al.data.is_next))
        assert len(os.listdir(thc_dir)) == n_mid
        assert len(os.listdir(wpu_dir)) == al.eval_len
        assert any(f.startswith("Coreset_round") for f in os.listdir(cl_dir))
        # visualize_result consumes the dumps: skeleton renders + per-joint
        # heatmap grids (scripts/visualize_result.py parity)
        from vatl4pose_tpu.cli.visualize_result import (render_heatmaps,
                                                        render_round)
        root, ann = synth
        vis_out = os.path.join(str(tmp_path), "vis")
        render_round(str(tmp_path), root, ann, vis_out)
        assert any(f.endswith(".png") for f in os.listdir(vis_out))
        hm_paths = render_heatmaps(str(tmp_path),
                                   os.path.join(vis_out, "hm"),
                                   round_idx=0, max_samples=2)
        assert len(hm_paths) == 2
        assert all(os.path.exists(p) for p in hm_paths)


@pytest.mark.slow
class TestLearningCurveEndToEnd:
    def test_al_learning_curve_rises_from_pretrained(self, tmp_path):
        """The north-star demonstration (VERDICT round 1): pre-train on a
        diverse multi-video set, then run the AL loop on a domain-shifted
        unseen video — AP must rise with % labeled and ALC must be
        meaningful.  Scaled-down version of exp/AL_learncurve4 (R50 @256x192
        on the real TPU: AP 0.678 -> 0.86, OSPA 0.143 -> 0.07)."""
        import jax
        import jax.numpy as jnp
        from vatl4pose_tpu.config import Cfg
        from vatl4pose_tpu.data.dataset import build_dataset
        from vatl4pose_tpu.data.pipeline import AugCfg
        from vatl4pose_tpu.data.synthetic import (make_synthetic_multivideo,
                                                  make_synthetic_video)
        from vatl4pose_tpu.models import build_sppe
        from vatl4pose_tpu.train.optim import multistep_lr
        from vatl4pose_tpu.train.retrain import Retrainer
        from vatl4pose_tpu.al.al_metric import compute_alc

        # --- pre-train on 3 jittered videos (the "large dataset") --------
        pre_root = str(tmp_path / "pre")
        _, pre_ann = make_synthetic_multivideo(
            pre_root, num_videos=3, num_frames=6, num_persons=2,
            sizes=[(160, 128)], seed=11, appearance_jitter=True)
        pre_ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": pre_root,
                                    "ANN": pre_ann, "IMG_PREFIX": ""}))
        preset = Cfg({"IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                      "SIGMA": 2, "NUM_JOINTS": 17, "TYPE": "simple"})
        mcfg = Cfg({"TYPE": "SimplePose", "NUM_DECONV_FILTERS": [64, 64, 64],
                    "NUM_LAYERS": 18})
        model_t = build_sppe(mcfg, preset, train=True)
        variables = model_t.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
        trainer = Retrainer(model_t, {"OPTIMIZER": "Adam", "LR": 1e-3,
                                      "LR_GAMMA": 1.0, "BATCH_SIZE": 12},
                            "SimplePose", input_size=(64, 64),
                            hm_size=(16, 16), sigma=2.0,
                            aug=AugCfg(scale_factor=0.2, rot_factor=20,
                                       flip=False),
                            joint_pairs=pre_ds.joint_pairs, seed=1)
        opt_state = trainer.init_opt_state(variables["params"])
        frames = jax.device_put(pre_ds.load_frames())
        idx = np.arange(len(pre_ds.data))
        lr_fn = multistep_lr(1e-3, [50, 70], 0.1)
        for epoch in range(80):
            trainer.base_lr = lr_fn(epoch)
            trainer.epoch_counter = 0
            variables, opt_state, loss, acc = trainer.retrain(
                variables, opt_state, pre_ds.data, frames, idx, 1,
                (pre_ds.data.width, pre_ds.data.height))
        assert acc > 0.5, f"pre-training failed to learn (acc={acc})"
        ckpt = str(tmp_path / "pre.pkl")
        import pickle
        with open(ckpt, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, variables), f)

        # --- AL on a domain-shifted unseen video --------------------------
        al_root = str(tmp_path / "al")
        al_root, al_ann = make_synthetic_video(
            al_root, num_frames=10, num_persons=3, width=160, height=128,
            seed=999, channel_shift=1, blob_sigma=5.0, blob_amp=90.0,
            bg_level=90.0)
        cfg = _cfg(al_root, al_ann)
        cfg.MODEL.PRETRAINED = ckpt
        cfg.RETRAIN.LR = 1e-4
        cfg.RETRAIN.BASE = 10
        cfg.RETRAIN.ALPHA = 30
        cfg.VAL.QUERY_RATIO = [0.2, 0.4, 0.7, 1.0]
        opt = Opt(str(tmp_path / "work"), uncertainty="THC_L1",
                  filter="None", representativeness="None",
                  strategy="THC_L1")
        opt.from_scratch = False
        al, result = run_loop(cfg, opt)
        pct, perfs = result[0], result[1]
        aps = [p["AP"] for p in perfs]
        # the curve must RISE: final AP clearly above the pretrained start
        assert aps[-1] > aps[0] + 0.05, aps
        assert max(aps) > 0.5, aps
        alc_ann = compute_alc(pct, [p["AP"] * 100 for p in result[2]])
        assert alc_ann > 0.5, alc_ann
