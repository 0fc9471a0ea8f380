"""Gather-free rotated warp (kernels/rot_warp) vs the single-pass bilinear
gather warp — numerics on CPU via pallas interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vatl4pose_tpu.data.pipeline import np_affine_transform
from vatl4pose_tpu.kernels.rot_warp import (decompose_inv_mats,
                                            decompose_rotation, plan_v2,
                                            warp_rotated_batch,
                                            warp_rotated_traced)
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

    def test_angle_reduction_extremes(self, smooth_frame):
        """v2's 90-degree reduction makes ANY angle legal (v1 capped at
        ~85 deg): check 45-boundary, ~90, ~135 and 179-degree rotations
        against the single-pass gather warp, plus a mixed batch with
        rot==0 fast-path samples interleaved."""
        frames = jnp.asarray(smooth_frame[None])
        cases = [(44.9, False), (45.1, False), (-45.0, True), (90.0, False),
                 (-91.0, True), (135.0, False), (179.0, True), (0.0, False)]
        inv_mats = np.stack([_case(r, f) for r, f in cases])
        mats2, phi2, iso = decompose_rotation(inv_mats, (256, 192))
        assert iso < 1e-5
        assert np.all(np.abs(phi2) <= np.pi / 4 + 1e-6)
        assert phi2[-1] == 0.0          # rot==0 stays exactly 0
        got = np.asarray(warp_rotated_batch(
            frames, np.zeros(len(cases), np.int64), inv_mats, (256, 192),
            interpret=True))
        for i, (rot, flip) in enumerate(cases):
            ref = np.asarray(warp_affine_bilinear(
                frames[0], jnp.asarray(inv_mats[i]), (256, 192)))
            d = np.abs(got[i] - ref)
            if rot == 0.0:
                assert d.max() < 1e-3, (rot, flip, d.max())
            else:
                assert d.max() < 4.0, (rot, flip, d.max())
                assert d.mean() < 0.05, (rot, flip, d.mean())

    def test_v2_geometry_ramp_extreme_angles(self):
        """Coordinate-ramp exactness (no interpolation tolerance) through
        the reduction branches: one case per quarter-turn bucket."""
        H, W = 240, 320
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        ramp = np.stack([xx, yy, np.ones_like(xx)], -1)
        frames = jnp.asarray(ramp[None])
        cases = [(44.0, False), (88.0, False), (-95.0, True), (140.0, False),
                 (-178.0, False)]
        inv_mats = np.stack([_case(r, f) for r, f in cases])
        got = np.asarray(warp_rotated_batch(
            frames, np.zeros(len(cases), np.int64), inv_mats, (256, 192),
            interpret=True))
        gx, gy = np.meshgrid(np.arange(192, dtype=np.float64),
                             np.arange(256, dtype=np.float64))
        for i, (rot, flip) in enumerate(cases):
            m, t = inv_mats[i, :, :2].astype(np.float64), inv_mats[i, :, 2]
            sx = m[0, 0] * gx + m[0, 1] * gy + t[0]
            sy = m[1, 0] * gx + m[1, 1] * gy + t[1]
            inb = (sx > 2) & (sx < W - 3) & (sy > 2) & (sy < H - 3)
            assert inb.sum() > 10000
            np.testing.assert_allclose(got[i, :, :, 0][inb], sx[inb],
                                       atol=5e-2, err_msg=f"{rot},{flip}")
            np.testing.assert_allclose(got[i, :, :, 1][inb], sy[inb],
                                       atol=5e-2, err_msg=f"{rot},{flip}")

    def test_v1_v2_agree(self, smooth_frame):
        """v1 (640 canvas, no reduction) and v2 (512, windowed) compute the
        same 3-shear algebra for |rot| <= 45: crops must agree closely
        (different canvas centers -> only float-rounding differences)."""
        frames = jnp.asarray(smooth_frame[None])
        cases = [(0.0, False), (17.0, False), (-42.0, True), (31.0, True)]
        inv_mats = np.stack([_case(r, f) for r, f in cases])
        pre, phi, _ = decompose_inv_mats(inv_mats, (256, 192))
        v1 = np.asarray(warp_rotated_traced(
            frames, jnp.zeros(len(cases), jnp.int64), jnp.asarray(pre),
            jnp.asarray(phi), (256, 192), interpret=True))
        v2 = np.asarray(warp_rotated_batch(
            frames, np.zeros(len(cases), np.int64), inv_mats, (256, 192),
            interpret=True))
        assert np.abs(v1 - v2).max() < 2e-2

    def test_plan_sizes(self):
        p = plan_v2((256, 192))
        assert p["S"] == 512
        # the lane dims the chain kernels actually operate on are
        # 128-multiples (Mosaic dynamic_rotate alignment): pass 2's padded
        # x-band w2p, pass 2's y window, pass 1's x window.  The X2 band
        # itself is only 8-aligned (pass 3 reads it through the w2p pad).
        assert p["w2p"] % 128 == 0
        assert (p["y2hi"] - p["y2lo"]) % 128 == 0
        assert (p["x1hi"] - p["x1lo"]) % 128 == 0
        assert (p["x2hi"] - p["x2lo"]) % 8 == 0
        assert (p["crop_ylo"] - p["y2lo"]) % 8 == 0
        # bigger crops auto-size a bigger canvas
        assert plan_v2((320, 256))["S"] >= 640
        with pytest.raises(ValueError):
            plan_v2((250, 190))     # not 16/8-aligned
