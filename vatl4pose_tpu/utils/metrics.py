"""Training metrics: running averages and PCK-style heatmap accuracy.

Parity: alphapose/utils/metrics.py:14-32 (DataLogger) and :118-147,221-245
(calc_accuracy / calc_dist / dist_acc) — heatmap-argmax accuracy with
norm = heatmap_size/10 and threshold 0.5, joints counted only when the
label argmax is at x>1 and y>1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.heatmap import get_max_pred

__all__ = ["DataLogger", "calc_accuracy"]


class DataLogger:
    def __init__(self):
        self.clear()

    def clear(self):
        self.value, self.sum, self.cnt, self.avg = 0, 0, 0, 0

    def update(self, value, n=1):
        self.value = value
        self.sum += value * n
        self.cnt += n
        self._cal_avg()

    def _cal_avg(self):
        self.avg = self.sum / self.cnt


@jax.jit
def _acc_impl(preds, labels, thr):
    p, _ = get_max_pred(preds)
    l, _ = get_max_pred(labels)
    H, W = preds.shape[-2], preds.shape[-1]
    norm = jnp.asarray([W, H], jnp.float32) / 10.0
    visible = (l[..., 0] > 1) & (l[..., 1] > 1)           # (N, K)
    dist = jnp.linalg.norm((p - l) / norm, axis=-1)
    # -1 sentinel for invisible joints (calc_dist, metrics.py:221-235):
    # an exact argmax hit has dist == 0 and MUST count — a 0 sentinel
    # silently drops perfect predictions from the accuracy
    dist = jnp.where(visible, dist, -1.0)
    dist_cal = dist != -1.0
    num = jnp.sum(dist_cal, axis=0)                        # (K,)
    hit = jnp.sum(dist_cal & (dist < thr), axis=0)
    acc = jnp.where(num > 0, hit / jnp.maximum(num, 1), -1.0)
    valid = acc >= 0
    return jnp.where(jnp.any(valid),
                     jnp.sum(jnp.where(valid, acc, 0.0))
                     / jnp.maximum(jnp.sum(valid), 1), 0.0)


def calc_accuracy(preds, labels, thr: float = 0.5) -> float:
    """preds/labels: (N, K, H, W) — see metrics.py:118-147."""
    return float(_acc_impl(jnp.asarray(preds), jnp.asarray(labels),
                           jnp.asarray(thr, jnp.float32)))
