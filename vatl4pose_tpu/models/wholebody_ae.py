"""WholeBodyAE — the WPU autoencoder (Flax linen).

Parity: active_learning/Whole_body_AE/AutoEncoder.py:5-39 — MLP encoder
in→24→12→7→z with ReLU, decoder z→7→12→24→in with ReLU + final Sigmoid.
input_dim 38 (hybrid feature, PoseTrack21), 42 (JRDB) or 51 (raw keypoints,
kp_direct).
"""

from __future__ import annotations

from flax import linen as nn


class WholeBodyAE(nn.Module):
    z_dim: int = 4
    input_dim: int = 38

    @nn.compact
    def __call__(self, x):
        z = nn.relu(nn.Dense(24, name="enc0")(x))
        z = nn.relu(nn.Dense(12, name="enc1")(z))
        z = nn.relu(nn.Dense(7, name="enc2")(z))
        z = nn.Dense(self.z_dim, name="enc3")(z)
        y = nn.relu(nn.Dense(7, name="dec0")(z))
        y = nn.relu(nn.Dense(12, name="dec1")(y))
        y = nn.relu(nn.Dense(24, name="dec2")(y))
        y = nn.sigmoid(nn.Dense(self.input_dim, name="dec3")(y))
        return y
