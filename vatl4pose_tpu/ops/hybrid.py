"""Whole-body hybrid pose feature — batched JAX.

Parity: active_learning/Whole_body_AE/hybrid_feature.py:6-61.

The reference as shipped feeds all 17 keypoints into compute_hybrid (42-d)
while its pretrained PoseTrack21 WholeBodyAE expects 38-d — a latent shape
bug (it slices 42→38 after the AE in one path and would crash in the other).
This build pins the documented intent (the commented-out 15-keypoint call at
ActiveLearning.py:369 and the old triangle table at hybrid_feature.py:43):
drop the two ear keypoints (COCO indices 3, 4) and compute the 38-d feature
= 15 centered-x + 15 centered-y + 8 joint-triangle angles.  A 17-keypoint
(42-d) variant is kept for the JRDB configuration.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["compute_hybrid", "HYBRID_DIM_15KP", "HYBRID_DIM_17KP",
           "ANGLE_TRIANGLES_17"]

HYBRID_DIM_15KP = 38
HYBRID_DIM_17KP = 42

# Joint triangles (left, center, right) in 17-keypoint COCO indexing
# (hybrid_feature.py:44): shoulders/elbows and hips/knees/ankles.
ANGLE_TRIANGLES_17 = np.array(
    [[8, 6, 12], [6, 8, 10], [5, 7, 9], [7, 5, 11],
     [11, 12, 14], [12, 11, 13], [12, 14, 16], [11, 13, 15]], dtype=np.int32)

_EPS = 1e-6


def _angles(xk, yk, triangles):
    """Absolute joint-triangle angles via arctan of slopes
    (hybrid_feature.py:6-12).  xk, yk: (..., K)."""
    t = jnp.asarray(triangles)
    x0, y0 = xk[..., t[:, 0]], yk[..., t[:, 0]]
    x1, y1 = xk[..., t[:, 1]], yk[..., t[:, 1]]
    x2, y2 = xk[..., t[:, 2]], yk[..., t[:, 2]]
    m1 = (y1 - y0) / (x1 - x0 + _EPS)
    m2 = (y2 - y1) / (x2 - x1 + _EPS)
    tan_abs = jnp.abs((m1 - m2) / (1 + m1 * m2 + _EPS))
    return jnp.arctan(tan_abs)


def compute_hybrid(bbox_xywh, keypoints, drop_ears: bool = True):
    """Hybrid pose feature from interleaved (x, y, score) keypoints.

    bbox_xywh: (..., 4); keypoints: (..., 51) (17 keypoints).
    drop_ears=True → 38-d (PoseTrack21 convention); False → 42-d (JRDB).

    Feature = [(x - cg_x)/bbox_h, (y - cg_y)/bbox_h, 8 triangle angles] where
    the center of gravity is the score-weighted mean (hybrid_feature.py:35-39)
    and the angles always use the full 17-keypoint triangle joints (none of
    the triangles involves the ears).
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    bb = jnp.asarray(bbox_xywh, jnp.float32)
    height = bb[..., 3]
    xk, yk, sk = kp[..., 0::3], kp[..., 1::3], kp[..., 2::3]
    if drop_ears:
        keep = np.array([0, 1, 2] + list(range(5, 17)))
        xs, ys, ss = xk[..., keep], yk[..., keep], sk[..., keep]
    else:
        xs, ys, ss = xk, yk, sk
    wsum = jnp.sum(ss, axis=-1)
    cg_x = jnp.sum(xs * ss, axis=-1) / wsum
    cg_y = jnp.sum(ys * ss, axis=-1) / wsum
    nx = (xs - cg_x[..., None]) / height[..., None]
    ny = (ys - cg_y[..., None]) / height[..., None]
    ang = _angles(xk, yk, ANGLE_TRIANGLES_17)
    return jnp.concatenate([nx, ny, ang], axis=-1)
