"""Loss functions.

Parity: alphapose/models/criterion.py (MSELoss is the shipped-config loss;
L1JointRegression is the integral/soft-argmax regression loss) and the call
sites ActiveLearning.py:669 / posetrack_train.py:52 (0.5 * MSE(out*mask,
label*mask), mean reduction over every element of the batch).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.heatmap import integral_coords

__all__ = ["mse_loss", "masked_heatmap_loss", "weighted_l1_loss",
           "l1_joint_regression_loss"]


def mse_loss(pred, target):
    """torch.nn.MSELoss(reduction='mean')."""
    return jnp.mean(jnp.square(pred - target))


def masked_heatmap_loss(pred, target, target_weight, valid=None):
    """0.5 * MSE(pred*mask, target*mask) with the mean taken over every
    element of the *valid* samples.

    pred/target: (N, K, H, W) or NHWC (N, H, W, K) — any layout, elementwise.
    target_weight: broadcastable joint mask (e.g. (N, K, 1, 1) / (N, 1, 1, K)).
    valid: optional (N,) bool for padded batches — replicates the reference's
    per-batch mean over B*K*H*W elements when the batch is padded to a static
    shape (the padded rows contribute 0 to the sum and are excluded from the
    denominator).
    """
    diff = (pred - target) * target_weight
    sq = jnp.square(diff)
    if valid is None:
        return 0.5 * jnp.mean(sq)
    valid = valid.astype(sq.dtype)
    per_elem = sq.reshape(sq.shape[0], -1)
    total = jnp.sum(per_elem.sum(axis=1) * valid)
    denom = jnp.maximum(jnp.sum(valid), 1.0) * per_elem.shape[1]
    return 0.5 * total / denom


def weighted_l1_loss(pred, target, weight, size_average: bool = True):
    """criterion.py:85-94."""
    out = jnp.abs(pred - target) * weight
    if size_average:
        denom = jnp.maximum(jnp.sum(weight > 0), 1)
        return jnp.sum(out) / denom
    return jnp.sum(out)


def l1_joint_regression_loss(hms, target_uv, target_uv_weight,
                             norm_type: str = "softmax",
                             size_average: bool = True):
    """L1JointRegression (criterion.py:46-76): integral soft-argmax decode of
    the heatmaps, weighted L1 against (u, v) targets in [-0.5, 0.5) space.
    hms: (N, K, H, W); target_uv/(weight): (N, K*2)."""
    coords, _ = integral_coords(hms, norm_type)
    pred_uv = coords.reshape(coords.shape[0], -1)
    return weighted_l1_loss(pred_uv, target_uv, target_uv_weight, size_average)


LOSS_REGISTRY = {
    "MSELoss": masked_heatmap_loss,
    "L1JointRegression": l1_joint_regression_loss,
}
