"""Cross-check eval/tracking.py against the vendored JRDB toolkit.

Feeds an identical prepared sequence to the ACTUAL
JRDB_toolkit/posetrack/metrics classes (HOTA, CLEAR, Identity, OSPA2) and to
this repo's reimplementation, asserting metric agreement — including the
occlusion-level OSPA2 variants and the per-keypoint OKS preparation
(jrdbpose.py:583-632), which is exercised by calling the real
`_calculate_pckh` on a bare dataset instance.
"""

import os
import sys

import numpy as np
import pytest

TOOLKIT = "/root/reference/JRDB_toolkit"
pytestmark = pytest.mark.skipif(not os.path.isdir(TOOLKIT),
                                reason="vendored toolkit absent")


def _import_toolkit():
    if TOOLKIT not in sys.path:
        # the toolkit package is JRDB_toolkit/posetrack (relative imports)
        sys.path.insert(0, os.path.dirname(TOOLKIT))
        sys.path.insert(0, TOOLKIT)
    # numpy>=1.24 removed np.float / np.int, which hota.py / identity.py use
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "int"):
        np.int = int
    # datasets/__init__ pulls posetrack_reid which imports shapely (absent
    # here, unused by the jrdbpose path) — minimal stand-in
    if "shapely" not in sys.modules:
        import types
        shapely = types.ModuleType("shapely")
        geometry = types.ModuleType("shapely.geometry")

        class _Geom:
            def __init__(self, *a, **k):
                raise RuntimeError("shapely stub")

        geometry.Polygon = _Geom
        geometry.MultiPolygon = _Geom
        geometry.box = _Geom
        geometry.Point = _Geom
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry
    from posetrack.metrics.clear import CLEAR
    from posetrack.metrics.hota import HOTA
    from posetrack.metrics.identity import Identity
    from posetrack.metrics.ospa2 import OSPA2
    return HOTA, CLEAR, Identity, OSPA2


def _scenario(seed=0, T=8, n_gt=4, n_pr=4, drop=0.25, noise=6.0):
    """COCO-style gt/pred jsons of a synthetic tracked sequence with
    keypoint visibility levels 0/1/2 and an identity switch."""
    rng = np.random.default_rng(seed)
    images = [{"id": 100 + t} for t in range(T)]
    gt_anns, pr_anns = [], []
    base = rng.uniform(50, 400, size=(n_gt, 2))
    vel = rng.uniform(-3, 3, size=(n_gt, 2))
    for t in range(T):
        for g in range(n_gt):
            c = base[g] + vel[g] * t
            kps = np.zeros(51)
            kps[0::3] = c[0] + rng.uniform(-20, 20, 17)
            kps[1::3] = c[1] + rng.uniform(-40, 40, 17)
            kps[2::3] = rng.integers(0, 3, 17)      # 0/1/2 occlusion levels
            bbox = [c[0] - 30, c[1] - 50, 60.0, 100.0]
            gt_anns.append({"image_id": 100 + t, "track_id": g,
                            "keypoints": kps.tolist(), "bbox": bbox,
                            "area": 6000.0, "id": t * 100 + g})
            if rng.uniform() > drop:
                pk = kps.copy()
                pk[0::3] += rng.normal(0, noise, 17)
                pk[1::3] += rng.normal(0, noise, 17)
                pk[2::3] = 1.0
                # identity switch for track 1 halfway through
                tid = g if not (g == 1 and t >= T // 2) else n_gt + 5
                pr_anns.append({"image_id": 100 + t, "track_id": tid,
                                "keypoints": pk.tolist(), "bbox": bbox,
                                "area": 6000.0, "id": 10000 + t * 100 + g})
    gt = {"images": images, "annotations": gt_anns,
          "categories": [{"id": 1, "name": "person"}]}
    return gt, pr_anns


def _toolkit_data(gt, pr_anns):
    """The prepared-data dict the toolkit metrics consume, built with OUR
    _prepare (whose per-keypoint OKS is itself asserted against the real
    `_calculate_pckh` in test_per_kpt_oks_matches_toolkit)."""
    from vatl4pose_tpu.eval.tracking import _prepare
    frames, n_gt, n_pr = _prepare(gt, pr_anns, per_kpt=True)
    data = {
        "num_timesteps": len(frames),
        "num_gt_ids": n_gt, "num_tracker_ids": n_pr,
        "num_gt_dets": sum(len(f[0]) for f in frames),
        "num_tracker_dets": sum(len(f[1]) for f in frames),
        "gt_ids": [f[0] for f in frames],
        "tracker_ids": [f[1] for f in frames],
        "similarity_scores": [f[2] for f in frames],
        "oks_kpts_sims": [f[3] if f[3] is not None
                          else np.zeros((len(f[0]), len(f[1]), 17))
                          for f in frames],
        "keypoint_visibilities": [f[4] if f[4] is not None
                                  else np.zeros((0, 17), int)
                                  for f in frames],
    }
    return data


def test_per_kpt_oks_matches_toolkit():
    """ops.oks.oks_kpts_matrix + force_visible oks_matrix vs the real
    jrdbpose._calculate_pckh on shared arrays."""
    _import_toolkit()
    from posetrack.datasets.jrdbpose import JRDBPose

    from vatl4pose_tpu.ops.oks import (JRDB_VARS, oks_kpts_matrix,
                                       oks_matrix)

    rng = np.random.default_rng(3)
    G, P = 4, 5
    gt = rng.uniform(0, 300, size=(G, 17, 3))
    gt[:, :, 2] = rng.integers(0, 3, size=(G, 17))
    pr = rng.uniform(0, 300, size=(P, 17, 3))
    body = rng.uniform(3000, 9000, size=G)

    ds = JRDBPose.__new__(JRDBPose)
    ds.n_joints = 17
    ref_sim, ref_vis, _, ref_kpts = ds._calculate_pckh(
        gt, pr, head_sizes_t=np.ones(G), body_sizes_t=body)

    gk = gt.reshape(G, -1)
    pk = pr.reshape(P, -1)
    our_kpts = oks_kpts_matrix(gk, body, pk, variances=JRDB_VARS)
    our_sim = oks_matrix(gk, np.zeros((G, 4)), body, pk,
                         variances=JRDB_VARS, force_visible=True)
    np.testing.assert_allclose(our_kpts, ref_kpts, rtol=1e-9)
    np.testing.assert_allclose(our_sim, ref_sim, rtol=1e-9)
    np.testing.assert_array_equal(ref_vis, gt[:, :, 2])


@pytest.fixture(scope="module")
def scenario():
    return _scenario()


def test_hota_matches_toolkit(scenario):
    HOTA, *_ = _import_toolkit()
    from vatl4pose_tpu.eval.tracking import hota
    gt, pr = scenario
    ref = HOTA().eval_sequence(_toolkit_data(gt, pr))
    ours = hota(gt, pr)
    assert ours["HOTA"] == pytest.approx(float(np.mean(ref["HOTA"])),
                                         abs=1e-9)
    assert ours["DetA"] == pytest.approx(float(np.mean(ref["DetA"])),
                                         abs=1e-9)
    assert ours["AssA"] == pytest.approx(float(np.mean(ref["AssA"])),
                                         abs=1e-9)


def test_clear_matches_toolkit(scenario):
    _, CLEAR, *_ = _import_toolkit()
    from vatl4pose_tpu.eval.tracking import clear
    gt, pr = scenario
    m = CLEAR()
    ref = m.eval_sequence(_toolkit_data(gt, pr))
    ours = clear(gt, pr, threshold=m.threshold)
    for k in ("CLR_TP", "CLR_FN", "CLR_FP", "IDSW"):
        assert ours[k] == ref[k], (k, ours[k], ref[k])
    assert ours["MOTA"] == pytest.approx(ref["MOTA"], abs=1e-9)
    # toolkit MOTP is the per-TP similarity mean (computed in
    # _compute_final_fields as MOTP_sum / CLR_TP)
    assert ours["MOTP"] == pytest.approx(ref["MOTP_sum"]
                                         / max(1, ref["CLR_TP"]), abs=1e-9)


def test_identity_matches_toolkit(scenario):
    _, _, Identity, _ = _import_toolkit()
    from vatl4pose_tpu.eval.tracking import identity
    gt, pr = scenario
    m = Identity()
    ref = m.eval_sequence(_toolkit_data(gt, pr))
    ours = identity(gt, pr, threshold=m.threshold)
    for k in ("IDTP", "IDFN", "IDFP"):
        assert ours[k] == pytest.approx(ref[k], abs=1e-9)
    idf1 = ref["IDTP"] / max(1e-9, ref["IDTP"]
                             + 0.5 * ref["IDFN"] + 0.5 * ref["IDFP"])
    assert ours["IDF1"] == pytest.approx(idf1, abs=1e-9)


def test_ospa2_matches_toolkit_incl_occlusion_levels(scenario):
    *_, OSPA2 = _import_toolkit()
    from vatl4pose_tpu.eval.tracking import ospa2
    gt, pr = scenario
    ref = OSPA2().eval_sequence(_toolkit_data(gt, pr))
    ours = ospa2(gt, pr, occlusion_levels=True)
    for k in ("OSPA", "OSPA_CARD", "OSPA_LOC", "OSPA_INVI", "OSPA_OCCL",
              "OSPA_VIS"):
        assert ours[k] == pytest.approx(float(ref[k]), abs=1e-9), k


def test_combine_sequences_matches_toolkit():
    """Dataset-level aggregation over two sequences vs the toolkit's own
    combine_sequences (HOTA counter-sum + TP-weighted AssA; CLEAR/Identity
    counter sums; OSPA2 average)."""
    HOTA, CLEAR, Identity, OSPA2 = _import_toolkit()
    from vatl4pose_tpu.eval.tracking import (clear, combine_sequences,
                                             evaluate_tracking, hota,
                                             identity)

    scen1 = _scenario(seed=0)
    scen2 = _scenario(seed=9, T=6, n_gt=3, n_pr=3, drop=0.15, noise=9.0)

    ours = combine_sequences({
        "s1": evaluate_tracking(*scen1),
        "s2": evaluate_tracking(*scen2),
    })

    mh, mc, mi, mo = HOTA(), CLEAR(), Identity(), OSPA2()
    d1, d2 = _toolkit_data(*scen1), _toolkit_data(*scen2)
    ref_h = mh.combine_sequences({"s1": mh.eval_sequence(d1),
                                  "s2": mh.eval_sequence(d2)})
    ref_c = mc.combine_sequences({"s1": mc.eval_sequence(d1),
                                  "s2": mc.eval_sequence(d2)})
    ref_i = mi.combine_sequences({"s1": mi.eval_sequence(d1),
                                  "s2": mi.eval_sequence(d2)})
    ref_o = mo.combine_sequences({"s1": mo.eval_sequence(d1),
                                  "s2": mo.eval_sequence(d2)})

    assert ours["HOTA"] == pytest.approx(float(np.mean(ref_h["HOTA"])),
                                         abs=1e-9)
    assert ours["DetA"] == pytest.approx(float(np.mean(ref_h["DetA"])),
                                         abs=1e-9)
    assert ours["AssA"] == pytest.approx(float(np.mean(ref_h["AssA"])),
                                         abs=1e-9)
    assert ours["MOTA"] == pytest.approx(ref_c["MOTA"], abs=1e-9)
    assert ours["MOTP"] == pytest.approx(ref_c["MOTP_sum"]
                                         / max(1, ref_c["CLR_TP"]),
                                         abs=1e-9)
    assert ours["IDSW"] == ref_c["IDSW"]
    for k in ("IDTP", "IDFN", "IDFP"):
        assert ours[k] == pytest.approx(ref_i[k], abs=1e-9)
    for k in ("OSPA", "OSPA_CARD", "OSPA_LOC", "OSPA_INVI", "OSPA_OCCL",
              "OSPA_VIS"):
        assert ours[k] == pytest.approx(float(ref_o[k]), abs=1e-9), k


def test_pose_track_eval_cli_dataset_mode(tmp_path):
    """The CLI's tracker-folder layout: per-sequence table + COMBINED row
    + json payload."""
    import json as _json

    from vatl4pose_tpu.cli.pose_track_eval import main

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pr_dir.mkdir()
    for i, seed in enumerate((0, 9)):
        gt, pr = _scenario(seed=seed)
        (gt_dir / f"seq{i}.json").write_text(_json.dumps(gt))
        (pr_dir / f"seq{i}.json").write_text(_json.dumps(
            {"images": gt["images"], "annotations": pr}))
    out = tmp_path / "res.json"
    per_seq, combined = main(["--gt", str(gt_dir), "--pred", str(pr_dir),
                              "--out", str(out)])
    assert set(per_seq) == {"seq0", "seq1"}
    payload = _json.loads(out.read_text())
    assert payload["combined"]["HOTA"] == pytest.approx(combined["HOTA"])
    assert "OSPA_VIS" in payload["combined"]
