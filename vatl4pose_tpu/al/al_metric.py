"""AL run metrics: ALC, correlations, learning-curve plots.

Parity: active_learning/al_metric.py — compute_alc (sklearn AUC on 0.01x
scaled axes), Spearman / Pearson correlation between the uncertainty and OKS
dicts, learning-curve PNGs.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

__all__ = ["compute_alc", "compute_spearmanr", "compute_corr",
           "plot_learning_curves"]


def compute_alc(percentages: Sequence[float],
                performances: Sequence[float]) -> float:
    from sklearn import metrics
    return float(metrics.auc(0.01 * np.asarray(percentages),
                             0.01 * np.asarray(performances)))


def _paired(unc_dict: Dict, oks_dict: Dict):
    unc = np.array([unc_dict[k] for k in unc_dict])
    oks = np.array([oks_dict[k] for k in unc_dict])
    return unc, oks


def compute_spearmanr(unc_dict: Dict, oks_dict: Dict) -> float:
    from scipy.stats import spearmanr
    unc, oks = _paired(unc_dict, oks_dict)
    corr, _ = spearmanr(unc, oks)
    return float(corr)


def compute_corr(unc_dict: Dict, oks_dict: Dict) -> float:
    unc, oks = _paired(unc_dict, oks_dict)
    return float(np.corrcoef(unc, oks)[0, 1])


def plot_learning_curves(savedir: str, video_id: str, strategy: str,
                         percentages, performances, ann: bool = False) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.set_xlabel("Label Percentage (%)")
    ax.set_ylabel("AP Performance (%)")
    ax.set_title(f"Active Learning Result on {video_id}")
    ax.grid()
    ax.set_xlim(0, 100)
    ax.set_ylim(0, 100)
    ax.plot(percentages, performances, label=strategy, color="blue")
    ax.legend(loc=0)
    fig.tight_layout()
    suffix = "_ann" if ann else ""
    path = os.path.join(savedir,
                        f"learning_curve_{strategy}_{video_id}{suffix}.png")
    fig.savefig(path)
    plt.close(fig)
    return path
