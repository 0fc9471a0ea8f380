"""Temporal continuity scorers (THC / TPC) — batched, shifted-gather form.

Parity: active_learning/ActiveLearning.py:736-760 and the dispatch at
:333-370.

The reference recomputes the previous/next person-crop's heatmaps with two
extra forward passes per sample (ActiveLearning.py:294-297) even though the
eval path produces those exact heatmaps as each neighbor's "current" output
(the eval dataset applies no augmentation, so the neighbor's crop tensor is
bit-identical — posetrack21.py:131-181).  This build instead computes every
heatmap once and forms neighbors by a gather along the track-sorted sample
axis: numerically identical, 3x fewer inference FLOPs.

Neighbor indices/validity come from the dataset's track linkage
(dataset items are sorted so index±1 is the same person in the adjacent
frame when the track matches — posetrack21.py:70-73,103).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["thc_scores", "tpc_scores", "temporal_neighbor_weights"]


def temporal_neighbor_weights(is_prev, is_next):
    """Per-sample (w_prev, w_next) implementing the reference's doubling rule:
    both neighbors → (1, 1); prev only → (2, 0); next only → (0, 2);
    none → (0, 0).  (ActiveLearning.py:345-370)."""
    is_prev = jnp.asarray(is_prev)
    is_next = jnp.asarray(is_next)
    both = is_prev & is_next
    w_prev = jnp.where(both, 1.0, jnp.where(is_prev, 2.0, 0.0))
    w_next = jnp.where(both, 1.0, jnp.where(is_next, 2.0, 0.0))
    return w_prev, w_next


def thc_scores(hms, is_prev, is_next, norm_type: str = "L1"):
    """Temporal Heatmap Continuity for every sample of a track-sorted video.

    hms: (N, K, H, W) heatmaps in dataset order; is_prev/is_next: (N,) bool
    (sample i's neighbor is sample i∓1 when the flag is set).
    Returns (N,) float32.  Parity: compute_thc (ActiveLearning.py:747-760):
    sum(|H - H_adj|)/K (L1) or sum((H - H_adj)^2)/K (L2), with the
    single-neighbor doubling rule.  bf16 inputs are upcast to f32 at entry
    (exact; fuses into the first read) so the sums run in f32.
    """
    hms = jnp.asarray(hms, jnp.float32)
    K = hms.shape[1]
    prev_hms = jnp.roll(hms, 1, axis=0)
    next_hms = jnp.roll(hms, -1, axis=0)
    if norm_type == "L1":
        d_prev = jnp.sum(jnp.abs(hms - prev_hms), axis=(1, 2, 3)) / K
        d_next = jnp.sum(jnp.abs(hms - next_hms), axis=(1, 2, 3)) / K
    elif norm_type == "L2":
        d_prev = jnp.sum(jnp.square(hms - prev_hms), axis=(1, 2, 3)) / K
        d_next = jnp.sum(jnp.square(hms - next_hms), axis=(1, 2, 3)) / K
    else:
        raise ValueError(norm_type)
    w_prev, w_next = temporal_neighbor_weights(is_prev, is_next)
    return w_prev * d_prev + w_next * d_next


def tpc_scores(hms, coords, bbox_crop_xyxy, is_prev, is_next):
    """Temporal Pose Continuity (ActiveLearning.py:333-344, 736-745).

    hms: (N, K, H, W) heatmaps in dataset order; coords: (N, K, 2) decoded
    poses of the current samples; bbox_crop_xyxy: (N, 4).

    Note the reference decodes the *neighbor's heatmap with the current
    sample's crop box* (compute_tpc at :736-745 passes the current `bbox`),
    so the adjacent pose is heatmap_to_coord(roll(hms), bbox_current) — not a
    roll of the decoded coords.  Per neighbor: count of joints whose decoded
    position moves more than 0.01*sqrt(crop area); doubling rule applies.
    """
    from .heatmap import heatmap_to_coord

    hms = jnp.asarray(hms, jnp.float32)
    coords = jnp.asarray(coords)
    bb = jnp.asarray(bbox_crop_xyxy, jnp.float32)
    thresh = 0.01 * jnp.sqrt((bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]))
    prev_c, _ = heatmap_to_coord(jnp.roll(hms, 1, axis=0), bb)
    next_c, _ = heatmap_to_coord(jnp.roll(hms, -1, axis=0), bb)
    d_prev = jnp.linalg.norm(coords - prev_c, axis=-1)   # (N, K)
    d_next = jnp.linalg.norm(coords - next_c, axis=-1)
    c_prev = jnp.sum(d_prev > thresh[:, None], axis=-1).astype(jnp.float32)
    c_next = jnp.sum(d_next > thresh[:, None], axis=-1).astype(jnp.float32)
    w_prev, w_next = temporal_neighbor_weights(is_prev, is_next)
    return w_prev * c_prev + w_next * c_next
