"""Gather-free rotated warp (kernels/rot_warp) vs the single-pass bilinear
gather warp — numerics on CPU via pallas interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vatl4pose_tpu.data.pipeline import np_affine_transform
from vatl4pose_tpu.kernels.rot_warp import (decompose_inv_mats,
                                            warp_rotated_batch)
from vatl4pose_tpu.ops.warp import warp_affine_bilinear

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def smooth_frame():
    """Band-limited image (sum of gaussians) — the regime where the
    3-pass shear interpolation is a faithful stand-in for 1-pass
    bilinear."""
    H, W = 240, 320
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    for _ in range(25):
        cy, cx = RNG.uniform(0, H), RNG.uniform(0, W)
        s, a = RNG.uniform(3, 15), RNG.uniform(20, 200)
        img[..., RNG.integers(0, 3)] += a * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    return img


def _case(rot, flip, W=320):
    inv = np_affine_transform(np.array([160.0, 120.0]),
                              np.array([140.0, 186.0]), rot, (192, 256),
                              inv=True)
    if flip:
        inv = inv.copy()
        inv[0, 0] = -inv[0, 0]
        inv[0, 1] = -inv[0, 1]
        inv[0, 2] = W - 1 - inv[0, 2]
    return inv


class TestRotWarp:
    def test_matches_gather_warp(self, smooth_frame):
        frames = jnp.asarray(smooth_frame[None])
        cases = [(0.0, False), (0.0, True), (-25.0, False), (70.0, True)]
        inv_mats = np.stack([_case(r, f) for r, f in cases])
        got = np.asarray(warp_rotated_batch(
            frames, np.zeros(len(cases), np.int64), inv_mats, (256, 192),
            interpret=True))
        for i, (rot, flip) in enumerate(cases):
            ref = np.asarray(warp_affine_bilinear(
                frames[0], jnp.asarray(inv_mats[i]), (256, 192)))
            d = np.abs(got[i] - ref)
            if rot == 0.0:
                # rot=0 (incl. flip): identity shears — exact
                assert d.max() < 1e-3, (rot, flip, d.max())
            else:
                assert d.max() < 4.0, (rot, flip, d.max())   # cv2-tol scale
                assert d.mean() < 0.05, (rot, flip, d.mean())

    def test_geometry_exact_on_coordinate_ramp(self):
        """Warping an image whose channels hold the source coordinates must
        return exactly M x + t at every in-bounds crop pixel: linear
        interpolation reproduces linear functions exactly, even through
        three shear passes — this pins the composed GEOMETRY (decompose +
        canvas rotation + crop offsets) with no interpolation tolerance."""
        H, W = 240, 320
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        ramp = np.stack([xx, yy, np.ones_like(xx)], -1)
        frames = jnp.asarray(ramp[None])
        cases = [(0.0, False), (33.0, False), (-77.0, True), (50.0, True)]
        inv_mats = np.stack([_case(r, f) for r, f in cases])
        _, _, iso = decompose_inv_mats(inv_mats, (256, 192))
        assert iso < 1e-5
        got = np.asarray(warp_rotated_batch(
            frames, np.zeros(len(cases), np.int64), inv_mats, (256, 192),
            interpret=True))
        gx, gy = np.meshgrid(np.arange(192, dtype=np.float64),
                             np.arange(256, dtype=np.float64))
        for i, (rot, flip) in enumerate(cases):
            m, t = inv_mats[i, :, :2].astype(np.float64), inv_mats[i, :, 2]
            sx = m[0, 0] * gx + m[0, 1] * gy + t[0]
            sy = m[1, 0] * gx + m[1, 1] * gy + t[1]
            # stay clear of borders (constant-0 padding mixes in)
            inb = (sx > 2) & (sx < W - 3) & (sy > 2) & (sy < H - 3)
            assert inb.sum() > 10000
            np.testing.assert_allclose(got[i, :, :, 0][inb], sx[inb],
                                       atol=5e-2, err_msg=f"{rot},{flip}")
            np.testing.assert_allclose(got[i, :, :, 1][inb], sy[inb],
                                       atol=5e-2, err_msg=f"{rot},{flip}")
