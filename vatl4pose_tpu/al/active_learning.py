"""The VATL active-learning orchestrator.

Parity: active_learning/ActiveLearning.py:51-925 — per (video, strategy)
state machine: evaluate + score every sample, COCO mAP + OSPA (raw and
annotation-substituted), combine uncertainty/representativeness, filter to a
query batch, AIFT retrain-set policy, three stopping criteria, early-stop
curve padding, result accumulation with the reference's 20-field schema.

Device work per round: one chunked forward pass over the whole video +
one fused scoring pass (al/scoring.py) + the retrain loop (train/retrain.py)
+ on-device coreset (al/selection.py).  Host work: json bookkeeping,
ranking/filters (float64, exact ordering semantics).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import build_dataset
from ..data.pipeline import AugCfg
from ..eval.cocoeval import evaluate_map
from ..eval.ospa import ospa_for_loc
from ..models import build_sppe, build_wholebody_ae, convert_state_dict
from ..models.convert_torch import load_torch_checkpoint
from ..ops.hybrid import compute_hybrid
from ..train.retrain import AETrainer, Retrainer
from ..utils.profiling import CycleTimer
from .index_sets import IndexCollection
from .scoring import ScoringConfig, ScoringEngine
from .selection import (coreset_selection, diversity_filter, fuse_thc_wpu,
                        influence_scores, kmeans_filter, minmax,
                        random_filter, rank_candidates)


class ActiveLearning:
    """One active-transfer-learning run over a single video."""

    def __init__(self, cfg, opt):
        self.cfg = cfg
        self.opt = opt
        self.round_cnt = 0
        self.is_early_stop = False
        self.one_by_one = getattr(opt, "onebyone", False)
        self.strategy = opt.strategy
        self.uncertainty = opt.uncertainty
        self.representativeness = opt.representativeness
        self.filter = opt.filter
        self.video_id = opt.video_id
        self.work_dir = opt.work_dir
        self.timer = CycleTimer(opt.work_dir)
        self.rng = np.random.RandomState(getattr(opt, "seed", None))

        # ---- data ----------------------------------------------------------
        self.dataset = build_dataset(cfg.DATASET.EVAL)
        self.data = self.dataset.data
        self.eval_len = len(self.data)
        # whole-video device residency is the fast path; videos whose
        # decoded frames exceed the HBM budget (JRDB stitched scenes) keep
        # frames in host RAM and score through the chunked streaming path
        budget = float(cfg.VAL.get("HBM_FRAME_BUDGET_GB", 4.0)) * (1 << 30)
        store = self.dataset.frame_store()
        self.streaming = store.total_bytes > budget
        if self.streaming:
            self.frame_store = store
            self.frames_dev = None
            self._log(f"[streaming] frames {store.total_bytes / 2**30:.2f} "
                      f"GiB > budget — host-RAM frame store + chunked "
                      f"scoring")
        else:
            self.frame_store = None
            self.frames_dev = jax.device_put(self.dataset.load_frames())
        self.img_wh = (self.data.width, self.data.height)
        self.eval_joints = tuple(self.dataset.EVAL_JOINTS)

        # ---- AL state -------------------------------------------------------
        self.finish_acc = getattr(opt, "retrain_thresh", 1.0)
        self.finish_margin = 0.05
        self.actual_finish = 100
        self.finished_minerror = 100
        self.finished_oursc = 100
        self.query_ratio = list(cfg.VAL.QUERY_RATIO)
        self.w_unc = cfg.VAL.W_UNC
        self.unc_lambda = cfg.VAL.UNC_LAMBDA
        self.query_sizes = [int(self.eval_len * x) for x in self.query_ratio]
        self.query_size = self.query_sizes[0]
        if self.one_by_one:
            self.query_size = 3
        self.unlabeled_id = IndexCollection(range(self.eval_len))
        self.labeled_id = IndexCollection()
        self.retrain_id = IndexCollection()
        self.moks_queried = 0.0
        self.continual = bool(getattr(opt, "continual", False))

        # result accumulators (result.json schema, Run_active_learning.py:211)
        self.percentage: List[float] = []
        self.performance: List[dict] = []
        self.performance_ann: List[dict] = []
        self.ospa_list: List[float] = []
        self.ospa_list_ann: List[float] = []
        self.combine_weight: List[float] = []
        self.query_list_list: Dict[str, list] = {}
        self.uncertainty_dict: Dict[str, dict] = {}
        self.uncertainty_mean: List[float] = []
        self.influence_dict: Dict[str, dict] = {}
        self.spearmanr_list: List[float] = []
        self.corr_list: List[float] = []
        self.true_labeled_dict: Dict[str, list] = {}
        self.false_labeled_dict: Dict[str, list] = {}
        self.true_unlabeled_dict: Dict[str, list] = {}
        self.false_unlabeled_dict: Dict[str, list] = {}
        self.moksQ_list: List[float] = []

        # ---- model ----------------------------------------------------------
        # --speedup serving routes ResNet-bottleneck stage tails through the
        # folded-BN chain (models/resnet.py fused_eval — measured +4%
        # forward on v5e, exp/FUSED_BOTTLENECK.md).  Parity/f32 mode keeps
        # the exact graph: the fold reassociates BN arithmetic (~1e-6 rel).
        self.model_eval = build_sppe(
            cfg.MODEL, cfg.DATA_PRESET, train=False,
            fused_eval=bool(getattr(opt, "speedup", False)))
        self.model_train = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=True)
        self.pretrained_vars = self._load_pretrained()
        self.variables = jax.tree.map(jnp.asarray, self.pretrained_vars)
        model_type = cfg.MODEL.TYPE
        aug_cfg = cfg.DATASET.TRAIN.get("AUG", {})
        self.mesh = None
        if getattr(opt, "data_parallel", False) and len(jax.devices()) > 1:
            # DP over all local chips (nn.DataParallel analog,
            # ActiveLearning.py:233): scoring per-sample axes AND each
            # retrain step's batch axis shard over 'data'
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(len(jax.devices()))
            self._log(f"[DP] scoring+retrain sharded over "
                      f"{len(jax.devices())} devices")
        self.retrainer = Retrainer(
            self.model_train, cfg.RETRAIN, model_type,
            input_size=tuple(cfg.DATA_PRESET.IMAGE_SIZE),
            hm_size=tuple(cfg.DATA_PRESET.HEATMAP_SIZE),
            sigma=cfg.DATA_PRESET.SIGMA,
            aug=AugCfg(
                scale_factor=aug_cfg.get("SCALE_FACTOR", 0.3),
                rot_factor=aug_cfg.get("ROT_FACTOR", 40),
                flip=aug_cfg.get("FLIP", False),
                num_joints_half_body=aug_cfg.get("NUM_JOINTS_HALF_BODY", 8),
                prob_half_body=aug_cfg.get("PROB_HALF_BODY", -1)),
            joint_pairs=self.dataset.joint_pairs,
            seed=getattr(opt, "seed", 166) or 166,
            bf16=bool(getattr(opt, "speedup", False)),
            mesh=self.mesh)
        self.opt_state = self.retrainer.init_opt_state(
            self.variables["params"])
        self.retrain_epoch = cfg.RETRAIN.BASE

        # ---- WPU autoencoder -------------------------------------------------
        self.ae_model = None
        self.ae_vars = None
        if "WPU" in self.strategy:
            self.ae_model = build_wholebody_ae(cfg.AE)
            self.ae_pretrained = self._load_ae_pretrained()
            self.ae_vars = jax.tree.map(jnp.asarray, self.ae_pretrained)
            self.ae_features = self._gt_hybrid_features()

        # ---- VL4Pose auxiliary net ------------------------------------------
        self.aux_model = None
        self.aux_vars = None
        if "VL4Pose" in self.strategy:
            from ..models.auxnet import AuxNet
            assert cfg.MODEL.TYPE in ("SimplePose", "FastPose"), \
                "VL4Pose needs a backbone/head-split estimator"
            self.aux_model = AuxNet()
            h, w = cfg.DATA_PRESET.IMAGE_SIZE
            depth = cfg.MODEL.get("NUM_LAYERS", 50)
            feat_ch = 2048 if depth >= 50 else 512
            self.aux_vars = self.aux_model.init(
                jax.random.PRNGKey(318),
                jnp.zeros((1, h // 32, w // 32, feat_ch)))

        # ---- scoring engine --------------------------------------------------
        need_emb = (self.representativeness not in ("None", "Random")
                    or self.filter not in ("None", "Random"))
        self.speedup = bool(getattr(opt, "speedup", False))
        mesh = self.mesh
        self.engine = ScoringEngine(
            self.model_eval,
            ScoringConfig(uncertainty=self.uncertainty,
                          need_embedding=need_emb,
                          input_size=tuple(cfg.DATA_PRESET.IMAGE_SIZE),
                          eval_joints=self.eval_joints,
                          bf16=self.speedup),
            ae_model=self.ae_model,
            aux_model=self.aux_model,
            chunk=min(512, max(32, self.eval_len)),  # 512 ≈ +7% fps vs 256
            mesh=mesh)
        self._log(f"[[AL strategy: {self.strategy}]] video {self.video_id} "
                  f"N={self.eval_len} model={cfg.MODEL.TYPE}")
        if not self.streaming:
            # compile the retrain scan program in the background while
            # round 0 scores/evaluates (kills the ~25s round-0 retrain
            # compile spike; no-op chunk, throwaway rng)
            self.retrainer.prewarm(self.variables, self.opt_state,
                                   self.data, self.frames_dev, self.img_wh)
        self._prewarm_selection()
        if getattr(opt, "verbose", False):
            # dataset smoke info (test_dataset, ActiveLearning.py:688-691)
            assert self.eval_len >= 1
            self._log(f"[verbose] sample 0: frame={int(self.data.frame_idx[0])}"
                      f" ann_id={int(self.data.ann_ids[0])}"
                      f" bbox={self.data.bboxes[0].tolist()}"
                      f" prev/next={bool(self.data.is_prev[0])}/"
                      f"{bool(self.data.is_next[0])}")

    # ------------------------------------------------------------------ utils
    def _log(self, msg):
        print(msg, flush=True)

    def _load_pretrained(self):
        path = self.cfg.MODEL.get("PRETRAINED", "")
        if getattr(self.opt, "from_scratch", False) or not path:
            rng = jax.random.PRNGKey(getattr(self.opt, "seed", 166) or 166)
            h, w = self.cfg.DATA_PRESET.IMAGE_SIZE
            return self.model_train.init(rng, jnp.zeros((1, h, w, 3)))
        if path.endswith(".pth"):
            return convert_state_dict(load_torch_checkpoint(path),
                                      self.cfg.MODEL.TYPE)
        import pickle
        with open(path, "rb") as f:
            return pickle.load(f)

    def _load_ae_pretrained(self):
        root = self.cfg.AE.get("PRETRAINED_ROOT", "")
        zdim = self.cfg.AE.Z_DIM
        if root:
            # reference layout (ActiveLearning.py:895): torch .pth; this
            # framework's wholebodyAE_train writes .pkl variable trees
            base = os.path.join(root, "Hybrid", f"WholeBodyAE_zdim{zdim}")
            if os.path.exists(base + ".pth"):
                return convert_state_dict(
                    load_torch_checkpoint(base + ".pth"), "WholeBodyAE")
            if os.path.exists(base + ".pkl"):
                import pickle
                with open(base + ".pkl", "rb") as f:
                    return pickle.load(f)
        self._log("[AE] no pretrained AE found — random init")
        return self.ae_model.init(jax.random.PRNGKey(318),
                                  jnp.zeros((1, self.ae_model.input_dim)))

    def _gt_hybrid_features(self):
        """AE fine-tune features from GT annotations (Whole_body_hybrid.py),
        aligned with the eval dataset indices (deliberate fix of the
        reference's separately-filtered indexing)."""
        feats = compute_hybrid(self.data.raw_bbox_xywh,
                               self.data.gt_keypoints)
        return np.asarray(feats)

    # ------------------------------------------------------------- main round
    def eval_and_query(self):
        self._log(f"\n{self.video_id}[[Round{self.round_cnt}: "
                  f"{self.strategy}]]")
        self.timer.start_cycle(self.round_cnt)
        d = self.data
        # OKS / json bboxes use the clipped crop-source box converted to
        # xywh (ActiveLearning.py:304-312: bbox_xyxy_to_xywh(bboxes_ann)).
        bbox_ann_xywh = np.stack(
            [d.bboxes[:, 0], d.bboxes[:, 1],
             d.bboxes[:, 2] - d.bboxes[:, 0],
             d.bboxes[:, 3] - d.bboxes[:, 1]], axis=1)
        eval_vars = self.variables
        if self.speedup:
            # bf16 serving weights (--speedup; not reproducible vs parity)
            eval_vars = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, self.variables)
        keep_hms = bool(getattr(self.opt, "vis", False)
                        or getattr(self.opt, "vis_thc", False))
        with self.timer.phase("score"):
            if self.streaming:
                res = self.engine.score_streaming(
                    eval_vars, self.frame_store, d.frame_idx, d.bboxes,
                    d.gt_keypoints, bbox_ann_xywh, d.is_prev, d.is_next,
                    ae_variables=self.ae_vars, aux_variables=self.aux_vars,
                    keep_heatmaps=keep_hms)
            else:
                res = self.engine.score(
                    eval_vars, self.frames_dev, d.frame_idx, d.bboxes,
                    d.gt_keypoints, bbox_ann_xywh,
                    d.is_prev, d.is_next, ae_variables=self.ae_vars,
                    aux_variables=self.aux_vars, keep_heatmaps=keep_hms)

        kpts = res["kpts"].astype(np.float64)          # (N, 51)
        oks = res["oks"].astype(np.float64)
        det_score = res["det_score"].astype(np.float64)
        unc = res["unc"].astype(np.float64)
        unc2 = res["unc2"].astype(np.float64)
        gc = res["gc"].astype(np.float64)

        labeled = set(self.labeled_id.index)
        unlabeled_idx = list(self.unlabeled_id.index)

        # ---- json artifacts + mAP/OSPA --------------------------------------
        kpt_json, kpt_json_ann, gt_json = [], [], []
        for j in range(self.eval_len):
            entry = {
                "bbox": [float(v) for v in bbox_ann_xywh[j]],
                "image_id": int(d.img_ids[j]),
                "id": int(d.ann_ids[j]),
                "score": float(det_score[j]),
                "category_id": 1,
                "keypoints": [float(v) for v in kpts[j]],
                "OKS": float(oks[j]),
            }
            kpt_json.append(entry)
            e_ann = dict(entry)
            if j in labeled:
                e_ann["keypoints"] = [float(v) for v in d.gt_keypoints[j]]
            kpt_json_ann.append(e_ann)
            e_gt = dict(entry)
            e_gt["keypoints"] = [float(v) for v in d.gt_keypoints[j]]
            gt_json.append(e_gt)

        gt_dict = self._gt_coco_dict(gt_json)
        os.makedirs(self.work_dir, exist_ok=True)
        with open(os.path.join(self.work_dir, "predicted_kpt.json"),
                  "w") as f:
            json.dump(kpt_json, f)
        with open(os.path.join(self.work_dir, "GT_kpt.json"), "w") as f:
            json.dump(gt_dict, f)
        with self.timer.phase("map_ospa"):
            perf = evaluate_map(kpt_json, gt_dict)
            ospa = ospa_for_loc(gt_dict, kpt_json)
            perf_ann = evaluate_map(kpt_json_ann, gt_dict)
            ospa_ann = ospa_for_loc(gt_dict, kpt_json_ann)

        if getattr(self.opt, "vis", False):
            # per-round artifact dumps (ActiveLearning.py:416-429, 448-453)
            hm_dir = os.path.join(self.work_dir, "heatmap",
                                  f"Round{self.round_cnt}")
            os.makedirs(hm_dir, exist_ok=True)
            hms_np = np.asarray(res["heatmaps"], np.float16)
            np.save(os.path.join(hm_dir, "heatmaps.npy"), hms_np)
            np.save(os.path.join(hm_dir, "ann_ids.npy"), d.ann_ids)
            pred_dir = os.path.join(self.work_dir, "prediction",
                                    f"Round{self.round_cnt}")
            os.makedirs(pred_dir, exist_ok=True)
            with open(os.path.join(pred_dir, "predicted_kpt.json"),
                      "w") as f:
                json.dump(kpt_json, f)

        self.percentage.append(len(labeled) / self.eval_len * 100)
        self.performance.append(perf)
        self.performance_ann.append(perf_ann)
        self.ospa_list.append(ospa)
        self.ospa_list_ann.append(ospa_ann)
        self._log(f"[Evaluation] Percentage:{self.percentage[-1]:.1f}, "
                  f"mAP:{perf['AP']:.3f} (ANN:{perf_ann['AP']:.3f}), "
                  f"OSPA:{ospa:.3f} (ANN:{ospa_ann:.3f})")

        # ---- uncertainty bookkeeping ----------------------------------------
        thcwpu = self.uncertainty == "THC+WPU"
        if thcwpu:
            per_sample = unc + unc2  # total_uncertainty adds only unc in ref
            unc_dict = {int(i): [float(unc[i]), float(unc2[i])]
                        for i in range(self.eval_len)}
        else:
            unc_dict = {int(i): float(unc[i]) for i in range(self.eval_len)}
        oks_dict = {int(i): float(oks[i]) for i in range(self.eval_len)}
        # reference sums `uncertainty` per sample (first criterion only for
        # THC+WPU) — ActiveLearning.py:400-402
        self.uncertainty_mean.append(float(unc.sum()) / self.eval_len)

        # per-round criterion-quality correlations vs OKS.  The reference
        # defines this at ActiveLearning.py:430-436 but ships it disabled
        # (`if ... and False:`), leaving the result-schema fields empty; we
        # compute them live.  For the two-criterion THC+WPU case the scalar
        # is computed on the fused normalized criterion — the quantity
        # selection actually consumes (the reference's dead code would feed
        # an (N, 2) array into scipy.spearmanr, which is not a
        # per-criterion correlation).
        if self.uncertainty != "None":
            from .al_metric import compute_corr, compute_spearmanr
            if thcwpu:
                fused = minmax(unc) + minmax(unc2)
                corr_dict = {int(i): float(fused[i])
                             for i in range(self.eval_len)}
            else:
                corr_dict = {int(i): float(unc[i])
                             for i in range(self.eval_len)}
            self.spearmanr_list.append(compute_spearmanr(corr_dict,
                                                         oks_dict))
            self.corr_list.append(compute_corr(corr_dict, oks_dict))
            self._log(f"[Evaluation] Spearmanr: {self.spearmanr_list[-1]:.3f}"
                      f", Correlation: {self.corr_list[-1]:.3f}")

        # criteria visualizations (ActiveLearning.py:360-363 vis_thc,
        # :383-385 vis_wpu): per-sample artifact dumps under work_dir
        if getattr(self.opt, "vis_thc", False) and "THC" in self.uncertainty:
            from ..utils.vis import visualize_thc
            thc_dir = os.path.join(self.work_dir, "vis_thc",
                                   f"Round{self.round_cnt}")
            hms_np = np.asarray(res["heatmaps"])[:, list(self.eval_joints)]
            for j in range(self.eval_len):
                # reference visualizes samples with both neighbors present
                if d.is_prev[j] and d.is_next[j]:
                    visualize_thc(thc_dir, int(d.ann_ids[j]), hms_np[j - 1],
                                  hms_np[j], hms_np[j + 1], float(unc[j]))
        if getattr(self.opt, "vis_wpu", False) and "WPU" in self.uncertainty:
            from ..ops import bbox_xyxy_to_xywh
            from ..utils.vis import visualize_wpu
            wpu_dir = os.path.join(self.work_dir, "vis_wpu",
                                   f"Round{self.round_cnt}")
            feats = np.asarray(compute_hybrid(
                bbox_xyxy_to_xywh(jnp.asarray(res["bbox_crop"])),
                jnp.asarray(kpts, jnp.float32)))
            recon = np.asarray(self.ae_model.apply(self.ae_vars,
                                                   jnp.asarray(feats)))
            wpu_vals = unc2 if thcwpu else unc
            for j in range(self.eval_len):
                visualize_wpu(wpu_dir, int(d.ann_ids[j]), feats[j], recon[j],
                              float(wpu_vals[j]))

        combine_weight = float(gc[unlabeled_idx].sum()) if unlabeled_idx else 0.0

        # ---- influence -------------------------------------------------------
        influence_score = None
        if self.representativeness != "None":
            if len(unlabeled_idx) in (0, 1):
                influence_score = np.zeros(len(unlabeled_idx))
            elif self.representativeness == "Influence":
                influence_score = influence_scores(
                    res["embeddings"][unlabeled_idx])
            elif self.representativeness == "Random":
                influence_score = self.rng.rand(len(unlabeled_idx))
            else:
                raise ValueError("Representativeness type is not supported")
            self.influence_dict[f"Round{self.round_cnt}"] = {
                int(i): float(s) for i, s in zip(unlabeled_idx,
                                                 influence_score)}

        if len(unlabeled_idx) > 0:
            combine_weight /= len(unlabeled_idx)
            self.combine_weight.append(combine_weight)

        # ---- total score -----------------------------------------------------
        if len(unlabeled_idx) in (0, 1):
            total_score = np.zeros(len(unlabeled_idx))
        elif self.uncertainty != "None":
            if thcwpu:
                labeled_ratio = len(labeled) / self.eval_len
                unc_score = fuse_thc_wpu(
                    unc[unlabeled_idx], unc2[unlabeled_idx], labeled_ratio,
                    mode=getattr(self.opt, "THCvsWPU", "const"))
            else:
                unc_score = minmax(unc[unlabeled_idx])
            self.uncertainty_dict[f"Round{self.round_cnt}"] = unc_dict
            if self.representativeness != "None":
                total_score = (combine_weight * unc_score
                               + (1 - combine_weight) * influence_score)
            else:
                total_score = unc_score
        elif self.representativeness == "None":
            total_score = np.zeros(len(unlabeled_idx))
        else:
            total_score = influence_score

        # ---- candidates + filter --------------------------------------------
        if self.filter == "None":
            candidate_list = rank_candidates(unlabeled_idx, total_score,
                                             top_k=self.query_size)
        elif self.filter in ("weighted", "K-Means", "Coreset"):
            candidate_list = sorted(int(i) for i in unlabeled_idx)
        else:
            candidate_list = rank_candidates(unlabeled_idx, total_score,
                                             top_k=8 * self.query_size)

        with self.timer.phase("select"):
            query_list = self._apply_filter(candidate_list, total_score,
                                            res.get("embeddings"),
                                            combine_weight, unlabeled_idx)

        # cluster / coreset selection plots (pltcluster_and_save /
        # pltcoreset_and_save, ActiveLearning.py:551-617 — gated there on a
        # hardcoded-False plot_cluster; exposed here under --vis)
        if (getattr(self.opt, "vis", False)
                and self.filter in ("Coreset", "K-Means", "weighted")
                and res.get("embeddings") is not None
                and res["embeddings"].shape[1] > 1 and len(query_list)):
            from ..utils.vis import plot_embedding_selection
            plot_embedding_selection(
                os.path.join(self.work_dir, "cluster"), res["embeddings"],
                query_list, f"{self.filter}_round{self.round_cnt}",
                weight=np.asarray(total_score) if len(total_score) else None)

        # ---- tl/tu/fl/fu ------------------------------------------------------
        thresh = self.finish_acc + self.finish_margin
        tl = [i for i in range(self.eval_len)
              if i in labeled and oks[i] >= thresh]
        fl = [i for i in range(self.eval_len)
              if i in labeled and oks[i] < thresh]
        uset = set(unlabeled_idx)
        tu = [i for i in range(self.eval_len)
              if i in uset and oks[i] >= thresh]
        fu = [i for i in range(self.eval_len)
              if i in uset and oks[i] < thresh]
        assert self.eval_len == len(tl) + len(tu) + len(fl) + len(fu)
        rc = f"Round{self.round_cnt}"
        self.true_labeled_dict[rc] = tl
        self.true_unlabeled_dict[rc] = tu
        self.false_labeled_dict[rc] = fl
        self.false_unlabeled_dict[rc] = fu

        # ---- update sets + stopping -------------------------------------------
        if len(unlabeled_idx) != 0:
            self.retrain_id = IndexCollection()
            retrain_id, self.moks_queried = self._get_retrain_id(query_list,
                                                                 oks_dict)
            self.moksQ_list.append(self.moks_queried)
            self.retrain_id.update(retrain_id)
            self.labeled_id.update(query_list)
            self.unlabeled_id.difference_update(query_list)
            self.query_list_list[rc] = [int(q) for q in query_list]
            self._log(f"Queried: {sorted(query_list)}")
            self._is_finished(query_list, oks_dict)
        self.timer.end_cycle()

    def _gt_coco_dict(self, gt_json):
        from ..data.coco_json import CocoJson
        src = CocoJson(os.path.join(self.cfg.DATASET.EVAL.ROOT,
                                    self.cfg.DATASET.EVAL.ANN)).dataset
        return {"images": src["images"], "categories": src["categories"],
                "annotations": gt_json}

    def _apply_filter(self, candidate_list, total_score, embeddings,
                      combine_weight, unlabeled_idx):
        n_un = len(unlabeled_idx)
        if n_un in (0, 1) or self.filter == "None":
            return candidate_list
        if self.filter == "weighted":
            if n_un <= self.query_size:
                self.query_size = n_un
            weight = 1 + self.w_unc * combine_weight * np.asarray(total_score)
            return kmeans_filter(embeddings, candidate_list, self.query_size,
                                 weight=weight, dedupe=True)
        if self.filter == "K-Means":
            if n_un < self.query_size:
                self.query_size = n_un
            return kmeans_filter(embeddings, candidate_list, self.query_size)
        if self.filter == "Diversity":
            return diversity_filter(embeddings, candidate_list,
                                    self.query_size)
        if self.filter == "Random":
            return random_filter(candidate_list, self.query_size, self.rng)
        if self.filter == "Coreset":
            # clamp like the K-Means branches: with the taken-mask, an
            # over-sized request would pad the tail with argmax-over--inf
            # index-0 repeats once every unlabeled sample is picked
            if n_un < self.query_size:
                self.query_size = n_un
            unc_full = np.zeros(self.eval_len)
            unc_full[candidate_list] = np.asarray(total_score)
            return coreset_selection(
                embeddings, unc_full, self.labeled_id.index, self.query_size,
                self.unc_lambda, self.moks_queried,
                mode=self._coreset_mode(), rng=self.rng,
                precision="f64" if self.cfg.VAL.get("CORESET_F64") else "f32")
        raise ValueError("Filter type is not supported")

    def _coreset_mode(self):
        """Coreset scoring mode — shared by _filter and _prewarm_selection
        so the background prewarm always compiles the program the real
        select will run (ActiveLearning.py:798-850 branch structure)."""
        if self.uncertainty == "None" or self.cfg.VAL.UNC_LAMBDA == 0:
            return "plain"
        if getattr(self.opt, "fixed_lambda", False):
            return "fixed"
        return "dynamic"

    def _prewarm_selection(self):
        """Compile the on-device coreset greedy in the background while
        round 0 scores (the ~1 s first-call compile otherwise lands in the
        round-1 select phase; same pattern as Retrainer.prewarm).  The
        program is keyed by (bucketed N, bucketed query size, mode), all
        known up front; embeddings dim comes from a trace-only eval_shape.
        No-op for the f64 host path (pure numpy, nothing to compile)."""
        if self.filter != "Coreset" or self.cfg.VAL.get("CORESET_F64"):
            return None
        import threading

        def go():
            try:
                import jax as _jax
                h, w = self.cfg.DATA_PRESET.IMAGE_SIZE
                eshape = _jax.eval_shape(
                    lambda v, x: self.model_eval.apply(
                        v, x, return_embedding=True),
                    self.variables, jnp.zeros((1, h, w, 3), jnp.float32))
                dim = int(eshape[1].shape[-1])
                mode = self._coreset_mode()
                emb = np.zeros((self.eval_len, dim), np.float32)
                unc = np.ones(self.eval_len, np.float32)
                # round 0 selects with NO labeled samples (have_labeled
                # =False program), later rounds with some — warm both
                for labeled in ([], list(range(2))):
                    coreset_selection(emb, unc, labeled,
                                      min(self.query_size, self.eval_len),
                                      self.unc_lambda, 0.5, mode=mode,
                                      rng=np.random.RandomState(0))
            except Exception:   # never take down the AL loop from a warmup
                pass

        t = threading.Thread(target=go, daemon=True, name="coreset-prewarm")
        t.start()
        return t

    def _get_retrain_id(self, query_list, oks_dict):
        """AIFT retrain policy (ActiveLearning.py:852-871)."""
        oks_q = [oks_dict[i] for i in query_list]
        moks_queried = float(np.mean(oks_q)) if oks_q else 0.0
        labeled = self.labeled_id.index
        retrain = [i for i in labeled
                   if oks_dict[i] <= self.finish_acc + self.finish_margin]
        retrain += list(query_list)
        return retrain, moks_queried

    def _is_finished(self, query_list, oks_dict):
        """Three stopping criteria (ActiveLearning.py:707-725)."""
        time = len(self.labeled_id.index) / self.eval_len * 100
        vals = np.array(list(oks_dict.values()))
        if np.all(vals >= self.finish_acc) and time < self.actual_finish:
            self.actual_finish = time
            self._log(f"[Finished] Actually finished at {time:.1f}%!")
            self.is_early_stop = True
        oks_q = np.array([oks_dict[i] for i in query_list])
        if np.mean(oks_q) >= self.finish_acc and time < self.finished_minerror:
            self.finished_minerror = time
        lq = self.labeled_id.index + list(query_list)
        oks_lq = np.array([oks_dict[i] for i in lq])
        if np.all(oks_lq >= self.finish_acc) and time < self.finished_oursc:
            self.finished_oursc = time

    # --------------------------------------------------------------- outcome
    def outcome(self):
        # --stopping: terminate once "our SC" (all labeled∪queried OKS ≥ τ)
        # has fired.  The reference parses the flag but never consults it
        # (its StoppingCriteria object is dead code, SURVEY.md §2.4); here
        # it gives the paper's stopping criterion a live switch.  Off by
        # default, so parity runs are unaffected.
        if getattr(self.opt, "stopping", False) and self.finished_oursc < 100:
            self.is_early_stop = True
        if self.is_early_stop or self.one_by_one:
            while len(self.performance) <= len(self.query_ratio):
                self.round_cnt += 1
                self.performance.append(self.performance[-1])
                self.performance_ann.append(self.performance_ann[-1])
                self.ospa_list.append(self.ospa_list[-1])
                self.ospa_list_ann.append(self.ospa_list_ann[-1])
                self.uncertainty_mean.append(self.uncertainty_mean[-1])
                self.percentage.append(
                    self.query_ratio[self.round_cnt - 1] * 100)
                self.combine_weight.append(self.combine_weight[-1])
                self.moksQ_list.append(self.moksQ_list[-1])
            return self._result()

        if not self.continual:
            # reload pretrained weights + fresh optimizer/schedule each round
            self.variables = jax.tree.map(jnp.asarray, self.pretrained_vars)
            self.opt_state = self.retrainer.init_opt_state(
                self.variables["params"])
            self.retrainer.reset_schedule()
            self.retrain_epoch = int(
                self.cfg.RETRAIN.BASE * len(self.labeled_id.index)
                / self.eval_len
                + self.cfg.RETRAIN.ALPHA * (1 - self.moks_queried))
        else:
            self.retrain_epoch = int(
                self.cfg.RETRAIN.ALPHA * (1 - self.moks_queried))
        self._log(f"[Retrain Epoch]: {self.retrain_epoch}")
        self.timer.start_cycle(self.round_cnt)
        with self.timer.phase("retrain"):
            self._retrain_model()
        self.timer.end_cycle()
        self.round_cnt += 1
        if len(self.unlabeled_id.index) == 0:
            self._log(" --> Finished!")
            self.eval_and_query()
            return self._result()
        if self.round_cnt >= len(self.query_ratio):
            self.query_size = len(self.unlabeled_id.index)
        else:
            self.query_size = (self.query_sizes[self.round_cnt]
                               - len(self.labeled_id.index))
        return None

    def _retrain_model(self):
        if self.retrain_epoch > 0 and len(self.retrain_id.index) > 0:
            if self.streaming:
                from ..data.stream import CropStreamer
                streamer = CropStreamer(
                    self.data, self.frame_store,
                    tuple(self.cfg.DATA_PRESET.IMAGE_SIZE),
                    self.retrainer.aug, self.retrainer.joint_pairs,
                    self.retrainer.batch_size,
                    seed=getattr(self.opt, "seed", 166) or 166)
                self.variables, self.opt_state, loss, acc = \
                    self.retrainer.retrain_streaming(
                        self.variables, self.opt_state, streamer,
                        self.retrain_id.index, self.retrain_epoch,
                        log=self._log)
            else:
                self.variables, self.opt_state, loss, acc = \
                    self.retrainer.retrain(
                        self.variables, self.opt_state, self.data,
                        self.frames_dev, self.retrain_id.index,
                        self.retrain_epoch, self.img_wh, log=self._log)
        if self.ae_model is not None:
            # re-init from pretrained + fine-tune on labeled GT features
            # (ActiveLearning.py:681-685, 905-925)
            self.ae_vars = jax.tree.map(jnp.asarray, self.ae_pretrained)
            trainer = AETrainer(self.ae_model, lr=self.cfg.AE.LR,
                                epochs=self.cfg.AE.EPOCH)
            labeled = self.labeled_id.index
            if labeled:
                self.ae_vars = trainer.train(self.ae_vars,
                                             self.ae_features[labeled])

    # ---------------------------------------------------------- checkpoint
    _STATE_FIELDS = [
        "round_cnt", "is_early_stop", "query_size", "moks_queried",
        "percentage", "performance", "performance_ann", "ospa_list",
        "ospa_list_ann", "combine_weight", "query_list_list",
        "uncertainty_dict", "uncertainty_mean", "influence_dict",
        "spearmanr_list", "corr_list", "true_labeled_dict",
        "false_labeled_dict", "true_unlabeled_dict", "false_unlabeled_dict",
        "moksQ_list", "actual_finish", "finished_minerror", "finished_oursc",
        "retrain_epoch"]

    def save_state(self, path=None):
        """Checkpoint the full AL state (round bookkeeping + model +
        optimizer + AE) so a crashed run resumes mid-video — a capability
        the reference lacks (SURVEY §5.3: runs are atomic, crashes re-run
        from scratch)."""
        import pickle
        path = path or os.path.join(self.work_dir, "al_state.pkl")
        state = {k: getattr(self, k) for k in self._STATE_FIELDS}
        state["labeled"] = self.labeled_id.index
        state["unlabeled"] = self.unlabeled_id.index
        state["retrain"] = self.retrain_id.index
        state["variables"] = jax.tree.map(np.asarray, self.variables)
        state["opt_state"] = jax.tree.map(np.asarray, self.opt_state)
        state["epoch_counter"] = self.retrainer.epoch_counter
        state["rng_state"] = self.rng.get_state()
        state["retrainer_rng"] = self.retrainer.rng.bit_generator.state
        if self.ae_vars is not None:
            state["ae_vars"] = jax.tree.map(np.asarray, self.ae_vars)
        with open(path, "wb") as f:
            pickle.dump(state, f)
        return path

    def load_state(self, path):
        import pickle
        with open(path, "rb") as f:
            state = pickle.load(f)
        for k in self._STATE_FIELDS:
            setattr(self, k, state[k])
        self.labeled_id = IndexCollection(state["labeled"])
        self.unlabeled_id = IndexCollection(state["unlabeled"])
        self.retrain_id = IndexCollection(state["retrain"])
        self.variables = jax.tree.map(jnp.asarray, state["variables"])
        self.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        self.retrainer.epoch_counter = state["epoch_counter"]
        self.rng.set_state(state["rng_state"])
        self.retrainer.rng.bit_generator.state = state["retrainer_rng"]
        if "ae_vars" in state and self.ae_vars is not None:
            self.ae_vars = jax.tree.map(jnp.asarray, state["ae_vars"])
        return self

    def _result(self):
        return (self.percentage, self.performance, self.performance_ann,
                self.query_list_list, self.uncertainty_dict,
                self.uncertainty_mean, self.influence_dict,
                self.combine_weight, self.spearmanr_list, self.corr_list,
                self.true_labeled_dict, self.true_unlabeled_dict,
                self.false_labeled_dict, self.false_unlabeled_dict,
                self.actual_finish, self.finished_minerror,
                self.finished_oursc, self.ospa_list, self.ospa_list_ann,
                self.moksQ_list)
