"""Selection parity against the ACTUAL reference implementation.

BASELINE.md's north star: identical per-round selected-sample indices.
Round 1 proved parity against builder-written numpy replicas
(tests/reference_impl.py); these tests instead execute the reference's own
code — `active_learning.ActiveLearning` and its methods, torch CPU — on a
shared synthetic fixture with identical exported weights, via
tests/refbridge.

Covered end-to-end (full eval→score→select rounds, query lists must match
exactly): every strategy branch the reference can actually execute —
uncertainty THC_L1 / HP / TPC / MPE / Margin / Entropy, representativeness
Influence / Random, filters Coreset / weighted / K-Means / Diversity /
Random (see the parametrize list for the exact combinations and the
documented exclusions: WPU, VL4Pose, THC_L2 — reference-crash or
reference-dead branches).

The fixture model is briefly FIT on the clip (cached, gitignored) so
exported heatmaps are peaked — argmax criteria on flat random-init noise
would only test tie-breaking of ~1e-6 torch-vs-XLA forward noise.

Retraining is pinned to 0 epochs on both sides (RETRAIN.BASE=ALPHA=0) so
weights stay identical across rounds — cross-framework training RNG cannot
produce bit-identical weights, and selection parity is only meaningful
conditioned on the same model state.

Environment shims inside refbridge substitute only packages absent from
this environment with independently-validated numpy/scipy oracles (e.g.
skimage peak_local_max → tests/reference_impl.ref_peak_local_max, a
maximum_filter construction golden-tested against skimage semantics) —
never this package's own compute code, so parity is non-circular.
"""

from __future__ import annotations

import os
import types

import numpy as np
import pytest

import jax

from tests import refbridge

pytestmark = pytest.mark.skipif(
    not os.path.isdir(refbridge.REF_ROOT), reason="reference tree absent")

RATIOS = (0.34, 0.67, 1.0)


# --------------------------------------------------------------------------
# shared fixture: synthetic video (PNG, reference layout) + exported weights
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    import jax.numpy as jnp

    from vatl4pose_tpu.config import Cfg
    from vatl4pose_tpu.data.dataset import build_dataset
    from vatl4pose_tpu.data.pipeline import AugCfg
    from vatl4pose_tpu.data.synthetic import make_synthetic_video
    from vatl4pose_tpu.models import build_sppe
    from vatl4pose_tpu.train.retrain import Retrainer

    root = str(tmp_path_factory.mktemp("refparity"))
    # vis_prob=1.0: with the default 10% invisible joints, the overfit
    # fixture model leaves those (sample, joint) heatmap heads unsupervised
    # — near-flat noise maps whose argmax flips between torch-f32 and
    # XLA-f32 (measured: two corner modes 5e-6 apart under 1.5e-2 forward
    # drift), spuriously diverging integer criteria (TPC counts).  All
    # joints visible → every head trained → decode framework-stable.
    make_synthetic_video(root, num_frames=6, num_persons=3, seed=7,
                         video_id="000001", img_format="png",
                         layout="posetrack", vis_prob=1.0)
    cfg = _our_cfg(root, "")
    model = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)))

    # Briefly fit the fixture clip so exported heatmaps are PEAKED: with a
    # random-init model the heatmaps are flat noise, and argmax-based
    # criteria (TPC) or top-2 peak margins (Margin) reduce to tie-breaking
    # on ~1e-6 torch-vs-XLA forward noise — parity of those strategies is
    # only meaningful on structured predictions.  The trained weights are
    # cached on disk (gitignored) — an R50 fit on one CPU core is minutes,
    # and both AL sides load the same exported .pth, so ANY trained state
    # serves; only its peakedness matters (asserted below).
    ds = build_dataset(cfg.DATASET.EVAL)
    cache = os.path.join(os.path.dirname(__file__), ".cache",
                         "refparity_r50_v2.npz")
    if os.path.exists(cache):
        flat = dict(np.load(cache))
        variables = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(variables),
            [flat[str(i)] for i in range(len(flat))])
    else:
        from vatl4pose_tpu.train import retrain as retrain_mod
        model_t = build_sppe(cfg.MODEL, cfg.DATA_PRESET, train=True)
        old_chunk, retrain_mod.STEP_CHUNK = retrain_mod.STEP_CHUNK, 3
        try:
            tr = Retrainer(model_t, {"OPTIMIZER": "AdamW", "LR": 2e-3,
                                     "LR_GAMMA": 1.0, "BATCH_SIZE": 18,
                                     "WEIGHT_DECAY": 0.0},
                           "SimplePose", input_size=(256, 192),
                           hm_size=(64, 48),
                           aug=AugCfg(scale_factor=0.0, rot_factor=0,
                                      flip=False),
                           joint_pairs=ds.joint_pairs, seed=11)
            frames = jax.device_put(ds.load_frames())
            idx = np.arange(len(ds.data))
            opt_state = tr.init_opt_state(variables["params"])
            variables, _, _, _ = tr.retrain(
                variables, opt_state, ds.data, frames, idx, 15,
                (ds.data.width, ds.data.height))
        finally:
            retrain_mod.STEP_CHUNK = old_chunk
        # settle BatchNorm running stats: the fit above takes only ~15
        # optimizer steps (1 step/epoch at batch 18), so running stats stay
        # near init and EVAL-mode outputs inflate 5-10x vs train-mode —
        # refresh them with stat-only forwards (params untouched) so the
        # exported model behaves in eval mode like the model that was fit
        from vatl4pose_tpu.ops.warp import crop_batch as _cb
        crops_r, _ = _cb(jnp.asarray(ds.load_frames(), jnp.float32),
                         ds.data.frame_idx, ds.data.bboxes, (256, 192))
        refresh = jax.jit(
            lambda v, x: model_t.apply(v, x, mutable=["batch_stats"]))
        for _ in range(30):
            _, upd = refresh(variables, crops_r)
            variables = {**variables, **upd}
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        leaves = [np.asarray(v) for v in jax.tree.leaves(variables)]
        np.savez(cache, **{str(i): v for i, v in enumerate(leaves)})

    variables = jax.tree.map(np.asarray, variables)

    # loud under-training guard: argmax criteria need structured peaks,
    # not noise (flat-noise heatmaps max out around ~1e-3)
    from vatl4pose_tpu.ops.warp import crop_batch
    crops, _ = crop_batch(jnp.asarray(ds.load_frames(), jnp.float32),
                          ds.data.frame_idx[:4], ds.data.bboxes[:4],
                          (256, 192))
    hm = model.apply(variables, crops)
    per_joint_peak = jnp.max(hm, axis=(0, 1, 2))  # NHWC -> per-K max
    peak = float(jnp.min(per_joint_peak))
    assert peak > 0.2, (
        f"fixture model under-trained: weakest joint heatmap max {peak} "
        f"(per-joint {np.round(np.asarray(per_joint_peak), 2)})")
    pth = os.path.join(root, "pretrained.pth")
    refbridge.export_pretrained(variables, "SimplePose", pth)
    return types.SimpleNamespace(root=root, pth=pth, variables=variables)


def _our_cfg(root, pth):
    from vatl4pose_tpu.config import Cfg
    ann = "activelearning/val/000001_mpii_test.json"
    img = "images/val/000001_mpii_test/"
    return Cfg({
        "DATASET": {
            "TRAIN": {"TYPE": "Posetrack21", "ROOT": root, "IMG_PREFIX": img,
                      "ANN": ann,
                      "AUG": {"FLIP": False, "ROT_FACTOR": 40,
                              "SCALE_FACTOR": 0.3,
                              "NUM_JOINTS_HALF_BODY": 8,
                              "PROB_HALF_BODY": -1}},
            "EVAL": {"TYPE": "Posetrack21", "ROOT": root, "IMG_PREFIX": img,
                     "ANN": ann},
        },
        "DATA_PRESET": {"TYPE": "simple", "SIGMA": 2, "NUM_JOINTS": 17,
                        "IMAGE_SIZE": [256, 192], "HEATMAP_SIZE": [64, 48]},
        "MODEL": {"TYPE": "SimplePose", "PRETRAINED": pth, "TRY_LOAD": "",
                  "NUM_DECONV_FILTERS": [256, 256, 256], "NUM_LAYERS": 50},
        "LOSS": {"TYPE": "MSELoss"},
        "AE": {"Z_DIM": 4, "PRETRAINED_ROOT": "", "EPOCH": 2, "LR": 8e-5},
        "AUXNET": {"PRETRAINED_ROOT": "", "EPOCH": 2, "LR": 8e-5},
        "RETRAIN": {"BATCH_SIZE": 120, "BASE": 0, "OPTIMIZER": "AdamW",
                    "LR": 2.5e-4, "ALPHA": 0, "WEIGHT_DECAY": 0.7,
                    "LR_GAMMA": 0.99},
        "VAL": {"FINISH_ACC": 1, "BATCH_SIZE": 64, "W_UNC": 0.01,
                "UNC_LAMBDA": 0.01, "QUERY_RATIO": list(RATIOS),
                "VIS": False},
    })


def _run_ref(shared, tmp_path, unc, rep, filt):
    cfg = refbridge.make_cfg(shared.root, pretrained=shared.pth,
                             query_ratio=RATIOS)
    opt = refbridge.make_opt(str(tmp_path / "ref_work"), uncertainty=unc,
                             representativeness=rep, filt=filt)
    return refbridge.run_reference_al(cfg, opt)


def _run_ours(shared, tmp_path, unc, rep, filt):
    from vatl4pose_tpu.al.active_learning import ActiveLearning

    cfg = _our_cfg(shared.root, shared.pth)
    if filt == "Coreset":
        # reference-exact f64 greedy arithmetic (the reference's
        # fvecs_matrix is float64) — removes OUR f32 loop as a source of
        # near-tie order swaps; residual swaps are forward-noise-bound
        cfg.VAL.CORESET_F64 = True
    strategy = unc if rep == "None" else f"{unc}+{rep}"
    if filt != "None":
        strategy += f"_{filt}filter"
    opt = types.SimpleNamespace(
        uncertainty=unc, representativeness=rep, filter=filt,
        strategy=strategy, video_id="000001",
        work_dir=str(tmp_path / "our_work"), seed=166, onebyone=False,
        continual=False, retrain_thresh=1.0, speedup=False,
        fixed_lambda=False, THCvsWPU="const", vis=False, vis_thc=False,
        vis_wpu=False, get_prenext=("THC" in unc) or ("TPC" in unc))
    os.makedirs(opt.work_dir, exist_ok=True)
    np.random.seed(166)
    al = ActiveLearning(cfg, opt)
    for _ in range(32):
        al.eval_and_query()
        result = al.outcome()
        if result is not None:
            return dict(zip(refbridge.RESULT_FIELDS, result))
    raise RuntimeError("our AL did not terminate")


@pytest.mark.slow
@pytest.mark.parametrize("unc,rep,filt", [
    # every strategy branch the reference can actually execute
    # (ActiveLearning.py:329-401 uncertainty, :467-484 representativeness,
    # :533-619 filters).  Excluded with documented cause: WPU / THC+WPU
    # (reference crashes as shipped: 42-d hybrid into a 38-d AE,
    # ActiveLearning.py:367 vs AutoEncoder.py:12), VL4Pose (references
    # undefined pose_features/self.conf, :390-391), THC_L2 (the reference
    # dispatch hardcodes norm_type='L1' at :346, so its THC_L2 is
    # indistinguishable from THC_L1; ours implements real L2 — see
    # PARITY.md).
    ("THC_L1", "None", "None"),
    ("HP", "None", "None"),
    ("TPC", "None", "None"),
    ("MPE", "None", "None"),
    ("Margin", "None", "None"),
    ("Entropy", "None", "None"),
    ("None", "Random", "None"),
    ("THC_L1", "Influence", "None"),
    ("THC_L1", "Influence", "Coreset"),
    ("THC_L1", "None", "weighted"),
    ("THC_L1", "None", "K-Means"),
    ("THC_L1", "None", "Diversity"),
    ("THC_L1", "None", "Random"),
])
def test_query_list_parity(shared, tmp_path, unc, rep, filt):
    ref = _run_ref(shared, tmp_path, unc, rep, filt)
    ours = _run_ours(shared, tmp_path, unc, rep, filt)
    assert ref["query_list"].keys() == ours["query_list"].keys()
    for rnd in ref["query_list"]:
        assert sorted(ref["query_list"][rnd]) == \
            sorted(ours["query_list"][rnd]), (
                f"{unc}+{rep}+{filt} {rnd}: ref="
                f"{sorted(ref['query_list'][rnd])} "
                f"ours={sorted(ours['query_list'][rnd])}")
    # The greedy coreset pick ORDER is not asserted cross-framework: picks
    # whose scores sit within float noise (near-duplicate embeddings of
    # adjacent same-track crops) legitimately swap — torch-CPU f64 vs
    # XLA f32 forwards differ at ~1e-6, far above such tie gaps.  Observed:
    # ref [2,14,17,15,3,1] vs ours [2,14,15,17,1,3] — same set, two
    # adjacent near-tie swaps.  Within one framework the order is exactly
    # reproducible (tests/test_e2e.py determinism test).
    assert ref["percentage"] == pytest.approx(ours["percentage"])
    # curve parity — the reference side now scores with its REAL vendored
    # COCOeval (tests/ref_pycoco), ours with eval/cocoeval (cross-checked
    # ≤1e-9 in test_eval_parity.py); the residual tolerance here covers
    # torch-f64 vs XLA-f32 forward noise in the predictions themselves
    for key in ("performance", "performance_ann"):
        for stat in ("AP", "AP .5", "AP .75", "AR"):
            assert np.allclose([r[stat] for r in ref[key]],
                               [r[stat] for r in ours[key]], atol=5e-3), \
                (key, stat, ref[key], ours[key])
    for key in ("ospa", "ospa_ann"):
        assert np.allclose(ref[key], ours[key], atol=5e-3), (key,)
    assert np.allclose(ref["moks_queried"], ours["moks_queried"], atol=5e-3)
    # three stopping-criterion markers
    for k in ("actual_finish", "finished_minerror", "finished_oursc"):
        assert ref[k] == pytest.approx(ours[k])


# --------------------------------------------------------------------------
# direct-method parity: call the reference's own functions on shared inputs
# --------------------------------------------------------------------------

def _bare_ref_al(**attrs):
    """Reference ActiveLearning instance without running __init__ — the
    scoring/selection methods only touch a handful of attributes."""
    refbridge.install()
    from active_learning.ActiveLearning import ActiveLearning
    al = ActiveLearning.__new__(ActiveLearning)
    for k, v in attrs.items():
        setattr(al, k, v)
    return al


def test_compute_thc_matches():
    refbridge.install()
    rng = np.random.default_rng(0)
    hm = rng.normal(size=(17, 64, 48)).astype(np.float32)
    hm_adj = rng.normal(size=(17, 64, 48)).astype(np.float32)
    al = _bare_ref_al()
    ref_l1 = al.compute_thc(hm, hm_adj, norm_type="L1")
    ref_l2 = al.compute_thc(hm, hm_adj, norm_type="L2")
    mine_l1 = np.sum(np.abs(hm - hm_adj)) / 17
    mine_l2 = np.sum(np.square(hm - hm_adj)) / 17
    # identical math; our batched path is covered by test_thc_equivalence
    assert ref_l1 == pytest.approx(mine_l1, rel=1e-6)
    assert ref_l2 == pytest.approx(mine_l2, rel=1e-6)


def test_coreset_selection_matches_reference_method():
    """Our on-device fori_loop coreset vs the reference's numpy greedy
    (ActiveLearning.py:798-850), dynamic and fixed-lambda modes."""
    refbridge.install()
    from alipy.index import IndexCollection

    rng = np.random.default_rng(3)
    n, d = 40, 16
    emb = rng.normal(size=(n, d)).astype(np.float32)
    unc = rng.uniform(size=n).astype(np.float32)
    labeled = [3, 17, 28]
    from vatl4pose_tpu.al.selection import coreset_selection

    for fixed, mode, moks in ((False, "dynamic", 0.37), (True, "fixed", 0.4)):
        al = _bare_ref_al(
            labeled_id=IndexCollection(list(labeled)),
            moks_queried=moks, unc_lambda=0.01, uncertainty="THC_L1",
            cfg=refbridge.EasyDict({"VAL": {"UNC_LAMBDA": 0.01}}),
            opt=types.SimpleNamespace(fixed_lambda=fixed), query_size=8)
        ref_q = al.coreset_selection(emb.copy(), unc.astype(np.float64).copy())
        our_q = coreset_selection(emb, unc, labeled, 8, 0.01, moks,
                                  mode=mode)
        assert ref_q == our_q, (mode, ref_q, our_q)


def test_coreset_f64_order_parity_on_near_ties():
    """Greedy-ORDER parity on degenerate near-tie embeddings via the f64
    host path (VAL.CORESET_F64) vs the reference's numpy greedy.

    Adjacent same-track crops produce embeddings separated by ~1e-7 —
    below f32 score resolution, where the default on-device greedy may
    legitimately swap picks vs the reference's float64 arithmetic
    (fvecs_matrix is np.zeros((N,2048)) → f64, ActiveLearning.py:270).
    The f64 path replicates the reference's sklearn pairwise_distances +
    np.argmax arithmetic exactly, so the full pick ORDER must match,
    including tie-breaks."""
    refbridge.install()
    from alipy.index import IndexCollection
    from vatl4pose_tpu.al.selection import coreset_selection

    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 12))
    # 36 samples: 4 clusters x 9 near-duplicates at 1e-7 separation
    emb = np.repeat(base, 9, axis=0) + 1e-7 * rng.normal(size=(36, 12))
    emb = emb.astype(np.float32)  # what the model emits on both sides
    unc = np.repeat(rng.uniform(size=4), 9).astype(np.float32)
    unc += 1e-7 * rng.uniform(size=36).astype(np.float32)
    labeled = [0, 9]

    for fixed, mode, moks in ((False, "dynamic", 0.42), (True, "fixed", 0.3)):
        al = _bare_ref_al(
            labeled_id=IndexCollection(list(labeled)),
            moks_queried=moks, unc_lambda=0.01, uncertainty="THC_L1",
            cfg=refbridge.EasyDict({"VAL": {"UNC_LAMBDA": 0.01}}),
            opt=types.SimpleNamespace(fixed_lambda=fixed), query_size=12)
        ref_q = al.coreset_selection(emb.astype(np.float64),
                                     unc.astype(np.float64).copy())
        our_q = coreset_selection(emb, unc, labeled, 12, 0.01, moks,
                                  mode=mode, precision="f64")
        assert ref_q == our_q, (mode, ref_q, our_q)


def _bare_our_al(**attrs):
    from vatl4pose_tpu.al.active_learning import ActiveLearning as OurAL
    al = OurAL.__new__(OurAL)
    for k, v in attrs.items():
        setattr(al, k, v)
    return al


def test_get_retrain_id_and_is_finished_match():
    refbridge.install()
    from alipy.index import IndexCollection

    from vatl4pose_tpu.al.index_sets import IndexCollection as OurIC

    rng = np.random.default_rng(5)
    n = 30
    oks = {i: float(rng.uniform()) for i in range(n)}
    labeled = [0, 4, 9, 13, 20]
    query = [2, 7, 21]
    al = _bare_ref_al(labeled_id=IndexCollection(list(labeled)),
                      unlabeled_id=IndexCollection(
                          [i for i in range(n)
                           if i not in labeled and i not in query]),
                      finish_acc=0.7, finish_margin=0.05,
                      eval_len=n, actual_finish=100, finished_minerror=100,
                      finished_oursc=100)
    ref_ids, ref_moks = al.get_retrain_id(list(query), dict(oks))

    ours = _bare_our_al(labeled_id=OurIC(labeled), finish_acc=0.7,
                        finish_margin=0.05, eval_len=n, actual_finish=100,
                        finished_minerror=100, finished_oursc=100,
                        is_early_stop=False)
    our_ids, our_moks = ours._get_retrain_id(query, oks)
    assert sorted(ref_ids) == sorted(our_ids)
    assert ref_moks == pytest.approx(our_moks)

    al.labeled_id = IndexCollection(list(labeled))
    ref_fin = al.is_finished(list(query), dict(oks))
    ours._is_finished(query, oks)
    assert ref_fin == (ours.actual_finish, ours.finished_minerror,
                       ours.finished_oursc)


def test_random_query_matches():
    """random_query (:727-734) draws via global np.random.choice —
    our random_filter must replay the identical sequence from the seed."""
    refbridge.install()
    from vatl4pose_tpu.al.selection import random_filter

    cands = list(range(25))
    al = _bare_ref_al()
    np.random.seed(166)
    ref_q = al.random_query(list(cands), 7)
    ours = random_filter(list(cands), 7, np.random.RandomState(166))
    assert ref_q == ours


def test_compute_hybrid_matches():
    """The real Whole_body_AE/hybrid_feature.compute_hybrid vs ops.hybrid.

    The reference function is 17-keypoint-only: its angle-triangle table
    indexes joints up to 16 (hybrid_feature.py:44), so feeding the 15-kp
    ear-dropped input the 38-d AE expects raises IndexError — the shipped
    WPU path cannot run (SURVEY.md §7).  Real-code parity is therefore
    asserted on the runnable 17-kp/42-d variant (our drop_ears=False),
    which shares all the exercised math (CG-normalization + angles); the
    38-d ear-drop convention is covered by tests/test_ops.py against the
    15-kp triangle table the reference documents in its comment."""
    refbridge.install()
    from active_learning.Whole_body_AE.hybrid_feature import compute_hybrid

    import jax.numpy as jnp

    from vatl4pose_tpu.ops.hybrid import compute_hybrid as our_hybrid

    rng = np.random.default_rng(11)
    kpts51 = rng.uniform(10, 200, size=51)
    kpts51[2::3] = (rng.uniform(size=17) > 0.2).astype(float)
    if kpts51[2::3].sum() == 0:
        kpts51[2] = 1.0
    bbox_xywh = np.array([10.0, 20.0, 80.0, 180.0])
    ref_feat = np.asarray(compute_hybrid(list(bbox_xywh), kpts51))
    our_feat = np.asarray(our_hybrid(
        jnp.asarray(bbox_xywh)[None], jnp.asarray(kpts51)[None],
        drop_ears=False))[0]
    assert ref_feat.shape == our_feat.shape == (42,)
    np.testing.assert_allclose(our_feat, ref_feat, rtol=1e-5, atol=1e-6)


def test_wholebody_ae_forward_matches():
    """The real reference WholeBodyAE (torch) vs our Flax AE through the
    checkpoint converter."""
    refbridge.install()
    import torch
    from active_learning.Whole_body_AE import WholeBodyAE

    import jax.numpy as jnp

    from vatl4pose_tpu.models.convert_torch import convert_state_dict
    from vatl4pose_tpu.models.wholebody_ae import WholeBodyAE as OurAE

    tmodel = WholeBodyAE(z_dim=4)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd, "WholeBodyAE")
    ours = OurAE(z_dim=4, input_dim=38)
    x = np.random.default_rng(2).normal(size=(6, 38)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.tensor(x)).numpy()
    our_out = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_localpeak_mean_matches():
    refbridge.install()
    from active_learning.local_peak import localpeak_mean as ref_lp

    import jax.numpy as jnp

    from vatl4pose_tpu.ops.peaks import localpeak_mean as our_lp

    rng = np.random.default_rng(9)
    hms = rng.uniform(size=(17, 64, 48)).astype(np.float32)
    ref_val = ref_lp(hms)
    our_val = float(np.asarray(our_lp(jnp.asarray(hms)[None]))[0])
    assert our_val == pytest.approx(float(ref_val), rel=1e-5)


def test_al_metric_matches():
    """al_metric.compute_OKS / compute_Spearmanr / compute_corr — the real
    reference functions vs ours."""
    refbridge.install()
    from active_learning.al_metric import (compute_corr, compute_OKS,
                                           compute_Spearmanr)

    import jax.numpy as jnp

    from vatl4pose_tpu.al.al_metric import (compute_corr as our_corr,
                                            compute_spearmanr as our_spear)
    from vatl4pose_tpu.ops.oks import compute_oks

    rng = np.random.default_rng(4)
    gt = rng.uniform(20, 200, size=51)
    gt[2::3] = 1.0
    pred = gt + rng.normal(scale=5.0, size=51)
    pred[2::3] = rng.uniform(size=17)
    bbox = [15.0, 18.0, 120.0, 210.0]
    ref_oks = float(compute_OKS(bbox, list(pred), list(gt)))
    our_oks = float(np.asarray(compute_oks(
        jnp.asarray(pred, jnp.float32)[None],
        jnp.asarray(gt, jnp.float32)[None],
        jnp.asarray(bbox, jnp.float32)[None]))[0])
    assert our_oks == pytest.approx(ref_oks, rel=1e-5)

    unc = {i: float(rng.uniform()) for i in range(20)}
    oks = {i: float(rng.uniform()) for i in range(20)}
    assert our_spear(unc, oks) == pytest.approx(
        float(compute_Spearmanr(dict(unc), dict(oks))), rel=1e-9)
    assert our_corr(unc, oks) == pytest.approx(
        float(compute_corr(dict(unc), dict(oks))), rel=1e-9)
