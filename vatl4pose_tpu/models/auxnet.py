"""VL4Pose auxiliary network — Flax linen.

Parity target: active_learning/VL4Pose/AuxiliaryNet.py:10-115 (conv feature
pyramid with stride-2 convs + residual adds, FC head [128, 64, 32, 16] →
per-link (μ, log σ²)).  The reference module is non-functional as shipped
(references an undefined global `arch`, and the AL dispatch feeds undefined
variables — SURVEY §2.1); this build implements the documented intent on the
COCO skeleton: the auxiliary net consumes the estimator's stride-32 backbone
feature and predicts Gaussian distance parameters for a 16-link tree rooted
at the nose.
"""

from __future__ import annotations

import numpy as np
from flax import linen as nn
import jax.numpy as jnp

# 16-link tree over the 17 COCO keypoints, rooted at the nose (0).
COCO_LINKS = np.array([
    [0, 1], [1, 3], [0, 2], [2, 4],          # nose→eyes→ears
    [0, 5], [5, 7], [7, 9],                  # left arm
    [0, 6], [6, 8], [8, 10],                 # right arm
    [5, 11], [11, 13], [13, 15],             # left leg
    [6, 12], [12, 14], [14, 16],             # right leg
], dtype=np.int32)


class AuxNet(nn.Module):
    """Backbone feature (N, h, w, C) → (N, num_links, 2) = (μ, log σ²)."""
    num_links: int = len(COCO_LINKS)
    channels: int = 128
    fc_dims: tuple = (128, 64, 32, 16)

    @nn.compact
    def __call__(self, feat):
        x = nn.Conv(self.channels, (1, 1), name="proj")(feat)
        x = nn.relu(x)
        # stride-2 conv stages with residual adds on pooled shortcuts
        for i in range(2):
            y = nn.Conv(self.channels, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}")(x)
            s = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(y + s)
        x = jnp.mean(x, axis=(1, 2))
        for i, d in enumerate(self.fc_dims):
            x = nn.relu(nn.Dense(d, name=f"fc{i}")(x))
        x = nn.Dense(self.num_links * 2, name="out")(x)
        return x.reshape(x.shape[0], self.num_links, 2)
