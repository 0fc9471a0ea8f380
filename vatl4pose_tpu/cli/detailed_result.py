"""Detailed per-video result analysis (parity: scripts/detailed_result.py).

Loads per-(strategy, video) result.json files, interpolates every learning
curve to a 1000-point percentage grid, aggregates per-metric curves and
stopping-criteria behavior, writes per-metric jsons + comparison plots.
Missing result.json per video is tolerated (detailed_result.py:51-60).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .summarize_result import (AP_HR, find_results, interp_curve,
                               load_result_json)

METRIC_KEYS = ["AP", "AP .5", "AP .6", "AP .7", "AP .75", "AP .8",
               "AP .95", "AP (M)", "AP (L)", "AR"]


def collect(exp_root: str, ann: bool = True):
    grid = np.linspace(0, 100, 1000)
    out = {}
    for strategy, videos in find_results(exp_root).items():
        curves = {k: [] for k in METRIC_KEYS}
        ospa_curves = []
        sc = {"actual_finish": [], "finished_minerror": [],
              "finished_oursc": []}
        for video, path in videos.items():
            try:
                r = load_result_json(path)
            except (OSError, json.JSONDecodeError):
                continue
            pct = r["percentages"]
            for k in METRIC_KEYS:
                vals = [p[k] * 100 for p in
                        r["performances_ann" if ann else "performances"]]
                curves[k].append(interp_curve(pct, vals, grid)[1])
            ospa_curves.append(interp_curve(pct, r["ospa_ann" if ann
                                                   else "ospa"], grid)[1])
            for k in sc:
                sc[k].append(r[k])
        if not ospa_curves:
            continue
        out[strategy] = {
            "grid": grid.tolist(),
            "mean_curves": {k: np.mean(v, axis=0).tolist()
                            for k, v in curves.items() if v},
            "mean_ospa": np.mean(ospa_curves, axis=0).tolist(),
            "stopping": {k: float(np.mean(v)) for k, v in sc.items() if v},
            "n_videos": len(ospa_curves),
        }
    return out


def plot_comparison(detail: dict, out_dir: str, metric: str = "AP"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for strategy, d in detail.items():
        if metric in d["mean_curves"]:
            ax.plot(d["grid"], d["mean_curves"][metric], label=strategy)
    ax.axhline(AP_HR * 100, ls="--", c="gray", label="AP_HR")
    ax.set_xlabel("Label Percentage (%)")
    ax.set_ylabel(f"{metric} (%)")
    ax.legend(fontsize=7)
    ax.grid()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"comparison_{metric.replace(' ', '')}.png")
    fig.savefig(path, dpi=140)
    plt.close(fig)
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp_root", required=True)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--raw", action="store_true")
    args = p.parse_args(argv)
    out_dir = args.out_dir or os.path.join(args.exp_root, "analysis")
    detail = collect(args.exp_root, ann=not args.raw)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "detailed_result.json"), "w") as f:
        json.dump(detail, f)
    for m in ("AP", "AP .5"):
        plot_comparison(detail, out_dir, m)
    for strategy, d in detail.items():
        print(f"{strategy}: n={d['n_videos']} "
              f"final {d['mean_curves']['AP'][-1]:.2f} "
              f"SC {d['stopping']}")


if __name__ == "__main__":
    main()
