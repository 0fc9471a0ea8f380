"""Result-analysis layer: detailed_result / summarize_result / wacv_result.

Feeds hand-built result.json trees (known curves) through the CLIs and
checks interpolation, ALC, SC aggregation, and the artifact set the
reference's analyzers produce (scripts/detailed_result.py,
wacv_result.py)."""

import json
import os

import numpy as np
import pytest


def _write_result(path, percentages, ap_curve, ap_ann_curve, rounds,
                  spearman=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    perf = [{k: ap for k in ("AP", "AP .5", "AP .6", "AP .7", "AP .75",
                             "AP .8", "AP .95", "AP (M)", "AP (L)", "AR")}
            for ap in ap_curve]
    perf_ann = [{k: ap for k in ("AP", "AP .5", "AP .6", "AP .7", "AP .75",
                                 "AP .8", "AP .95", "AP (M)", "AP (L)",
                                 "AR")} for ap in ap_ann_curve]
    result = {
        "config_file": "x.yaml", "video_id": "v", "strategy": "s",
        "model": "SimplePose",
        "percentages": percentages,
        "performances": perf, "performances_ann": perf_ann,
        "query_list": {f"Round{i}": [] for i in range(rounds)},
        "uncertaity": {}, "influence": {},
        "combine_weight": [0.5] * rounds,
        "mean_uncertaity": list(np.linspace(2.0, 1.0, len(percentages))),
        "spearmanr": spearman or [], "corrcoef": [],
        "true_labeled": {}, "true_unlabeled": {}, "false_labeled": {},
        "false_unlabeled": {},
        "actual_finish": 100, "finished_minerror": 50.0,
        "finished_oursc": 75.0,
        "ospa": [0.5] * len(percentages), "ospa_ann": [0.4] * len(percentages),
        "moks_queried": [0.5] * rounds,
    }
    with open(path, "w") as f:
        json.dump(result, f)


@pytest.fixture(scope="module")
def exp_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("exp"))
    # two strategies x two videos; different round counts across videos
    base = os.path.join(root, "AL_test", "SimplePose")
    _write_result(os.path.join(base, "THC_L1", "000001", "t1",
                               "result.json"),
                  [0, 50, 100], [0.2, 0.5, 0.8], [0.2, 0.6, 1.0], 2,
                  spearman=[-0.5, -0.4, -0.3])
    _write_result(os.path.join(base, "THC_L1", "000002", "t1",
                               "result.json"),
                  [0, 25, 50, 100], [0.1, 0.3, 0.5, 0.9],
                  [0.1, 0.4, 0.7, 1.0], 3, spearman=[-0.6, -0.5, -0.2, -0.1])
    _write_result(os.path.join(base, "Random", "000001", "t1",
                               "result.json"),
                  [0, 50, 100], [0.2, 0.3, 0.6], [0.2, 0.4, 0.9], 2)
    return root


class TestDetailedResult:
    def test_collect_interpolation_and_alc(self, exp_tree):
        from vatl4pose_tpu.cli.detailed_result import GRID, collect
        from vatl4pose_tpu.al.al_metric import compute_alc
        rd, empty = collect(exp_tree, metrics=["AP"], sc_thresh="AP .75")
        d = rd["THC_L1"]
        # 1001-point interpolation of video 000001's linear AP curve
        c = np.asarray(d["AP"]["000001"])
        assert c.shape == (1001,)
        assert c[0] == pytest.approx(20.0)
        assert c[500] == pytest.approx(50.0, abs=0.1)
        assert c[-1] == pytest.approx(80.0)
        # ALC matches direct computation
        assert d["AP_ALC"]["000001"] == pytest.approx(
            compute_alc([0, 50, 100], [20.0, 50.0, 80.0]))
        # aggregates over both videos
        assert len(d["AP_mean"]) == 1001
        assert d["AP_ALC_mean"] == pytest.approx(
            np.mean([d["AP_ALC"]["000001"], d["AP_ALC"]["000002"]]))
        # stopped-AP: minerror fired at 50% -> nearest round's AP .75 (ann)
        assert d["stopped_AP_min"]["000001"] == pytest.approx(0.6)
        assert d["stopped_AP_oursc"]["000001"] == pytest.approx(0.6)
        assert empty["union"] == []

    def test_empty_video_accounting(self, exp_tree):
        from vatl4pose_tpu.cli.detailed_result import collect
        rd, empty = collect(exp_tree, metrics=["AP"],
                            video_ids=["000001", "000002", "000099"])
        assert "000099" in empty["THC_L1"]
        assert "000099" in empty["union"]

    def test_main_produces_artifact_set(self, exp_tree, tmp_path):
        from vatl4pose_tpu.cli.detailed_result import main
        out = str(tmp_path / "analysis")
        main(["--exp_root", exp_tree, "--out_dir", out,
              "--metrics", "AP", "AP .75", "--sc_thresh", "AP .75",
              "--raw"])
        for f in ("empty_dict.json", "result_ann.json", "sc_summary.json",
                  "spearmanr.png"):
            assert os.path.exists(os.path.join(out, f)), f
        for sub in ("ANN", "RAW"):
            assert os.path.exists(os.path.join(out, sub, "uncertainty.png"))
        assert os.path.exists(os.path.join(out, "ANN", "AP_ann.png"))
        assert os.path.exists(os.path.join(out, "ANN", "AP_ann.pdf"))
        assert os.path.exists(os.path.join(out, "ANN", "THC_L1",
                                           "THC_L1_AP_ann.png"))
        with open(os.path.join(out, "sc_summary.json")) as f:
            sc = json.load(f)
        assert sc["THC_L1"]["finished_minerror"] == pytest.approx(50.0)
        with open(os.path.join(out, "result_ann.json")) as f:
            rj = json.load(f)
        assert "THC_L1" in rj["AP"]
        assert len(rj["AP"]["THC_L1"]["AP_ann"]) == 10  # QUERY_TICKS


class TestOtherAnalyzers:
    def test_summarize_result_table(self, exp_tree, capsys):
        from vatl4pose_tpu.cli.summarize_result import main
        out = main(["--exp_root", exp_tree])
        assert set(out["alc"]) == {"THC_L1", "Random"}
        assert out["alc"]["THC_L1"]["mean_ALC"] > \
            out["alc"]["Random"]["mean_ALC"]

    def test_wacv_result_artifacts(self, exp_tree, tmp_path):
        from vatl4pose_tpu.cli.wacv_result import main
        out = str(tmp_path / "figs")
        main(["--exp_root", exp_tree, "--out_dir", out])
        for f in ("alc_bar.png", "strategy_table.tex", "AP_ann.png",
                  "uncertainty.png", "spearmanr.png"):
            assert os.path.exists(os.path.join(out, f)), f
        tex = open(os.path.join(out, "strategy_table.tex")).read()
        assert "THC" in tex and r"\begin{tabular}" in tex
