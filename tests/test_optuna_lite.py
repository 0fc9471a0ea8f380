"""TPE/grid hyperparameter search (al/optuna_lite.py — the optuna surface
the reference's --optimize path uses, Run_active_learning.py:175-209)."""

import numpy as np
import pytest

from vatl4pose_tpu.al.optuna_lite import (GridSampler, TPESampler,
                                          create_study)


class TestGridSampler:
    def test_cycles_grid_like_reference(self):
        """Shipped reference: GridSampler({'unc_lambda': [0.001]}) with
        n_trials=30 — every trial samples the same point."""
        study = create_study(sampler=GridSampler({"unc_lambda": [0.001]}))
        seen = []
        study.optimize(lambda t: -t.suggest_float("unc_lambda", 0.001, 100),
                       n_trials=5)
        assert all(t.params["unc_lambda"] == 0.001
                   for t, _ in study.records)

    def test_multi_point_grid(self):
        grid = [0.01, 0.1, 1.0]
        study = create_study(sampler=GridSampler({"x": grid}))
        study.optimize(lambda t: t.suggest_float("x", 0, 10), n_trials=6)
        xs = [t.params["x"] for t, _ in study.records]
        assert xs == grid + grid


class TestTPESampler:
    def test_converges_to_optimum(self):
        """TPE must concentrate samples near the optimum of a smooth 1-D
        objective far better than the startup-random phase."""
        target = 3.7

        def objective(trial):
            x = trial.suggest_float("x", 0.001, 100, log=True)
            return -(np.log(x) - np.log(target)) ** 2

        study = create_study(direction="maximize",
                             sampler=TPESampler(seed=0))
        study.optimize(objective, n_trials=40)
        assert study.best_value > -0.05
        assert 1.5 < study.best_params["x"] < 9.5
        # post-startup proposals are closer to the optimum than startup
        post = [abs(np.log(t.params["x"]) - np.log(target))
                for t, _ in study.records[10:]]
        pre = [abs(np.log(t.params["x"]) - np.log(target))
               for t, _ in study.records[:10]]
        assert np.median(post) < np.median(pre)

    def test_respects_bounds_and_direction(self):
        study = create_study(direction="minimize",
                             sampler=TPESampler(seed=1))
        study.optimize(lambda t: (t.suggest_float("x", 2.0, 4.0) - 2.5) ** 2,
                       n_trials=25)
        xs = [t.params["x"] for t, _ in study.records]
        assert all(2.0 <= x <= 4.0 for x in xs)
        assert abs(study.best_params["x"] - 2.5) < 0.4

    def test_history_plot(self, tmp_path):
        study = create_study(sampler=TPESampler(seed=2))
        study.optimize(lambda t: t.suggest_float("x", 0, 1), n_trials=12)
        p = study.plot_history(str(tmp_path / "h.png"))
        import os
        assert os.path.exists(p)

    def test_slice_plot(self, tmp_path):
        study = create_study(sampler=TPESampler(seed=3))
        study.optimize(
            lambda t: t.suggest_float("unc_lambda", 1e-3, 100, log=True),
            n_trials=12)
        p = study.plot_slice(str(tmp_path / "s.png"))
        import os
        assert os.path.exists(p)
        # no suggest_* calls (the ref's shipped single-point grid): still
        # renders
        fixed = create_study(sampler=TPESampler(seed=4))
        fixed.optimize(lambda t: 1.0, n_trials=3)
        assert os.path.exists(fixed.plot_slice(str(tmp_path / "s2.png")))


class TestOptimizeCLI:
    def test_optimize_grid_smoke(self, tmp_path, monkeypatch):
        """--optimize drives the study over do_al and reports best params."""
        from vatl4pose_tpu.cli import run_active_learning as R

        calls = []

        def fake_do_al(cfg, opt):
            lam = cfg.VAL.UNC_LAMBDA
            calls.append(lam)
            # fabricate a result tuple: pct + performances_ann rising with
            # a peak at lambda == 0.1
            pct = [0.0, 50.0, 100.0]
            quality = 1.0 / (1.0 + abs(np.log10(lam) + 1.0))
            perf = [{"AP .95": quality * p / 100} for p in pct]
            out = [pct, perf, perf] + [{}] * 11 + [100, 100, 100,
                                                   [0] * 3, [0] * 3, [0] * 2]
            return out

        monkeypatch.setattr(R, "do_al", fake_do_al)
        import types
        opt = types.SimpleNamespace(search="grid", seed=0, n_trials=6,
                                    video_id="000001",
                                    work_dir=str(tmp_path))
        from vatl4pose_tpu.config import Cfg
        cfg = Cfg({"VAL": {"UNC_LAMBDA": 0.01, "QUERY_RATIO": [0.5, 1.0]}})
        study = R.optimize_alc(cfg, opt, ["000001"])
        assert study.best_params["unc_lambda"] == pytest.approx(0.1)
        assert len(calls) == 6
        # QUERY_RATIO override parity (Run_active_learning.py:201)
        assert cfg.VAL.QUERY_RATIO == [0.05, 0.1, 0.2, 0.3, 0.4, 1]
