"""Native warp engine vs cv2.warpAffine.

mode=1 (float32 bilinear, round-half-even) matches the installed cv2 5.x up
to ±1 LSB on <0.1% of pixels (residual float op-ordering inside cv2's SIMD
kernels); mode=0 implements the classic cv2<=4.x 5-bit fixed-point scheme
(the reference environment pins opencv 4.11 — requirements.txt).
"""

import cv2
import numpy as np
import pytest

from tests import reference_impl as ref
from vatl4pose_tpu.data import native_warp

RNG = np.random.default_rng(11)


@pytest.mark.skipif(not native_warp.available(), reason="native lib absent")
class TestNativeWarp:
    def test_float_mode_matches_installed_cv2(self):
        frames = RNG.integers(0, 256, size=(3, 200, 300, 3), dtype=np.uint8)
        mats, fidx = [], []
        for i in range(12):
            center = RNG.uniform([40, 40], [260, 160]).astype(np.float32)
            w = RNG.uniform(40, 150)
            scale = np.array([w, w * 4 / 3], np.float32)
            mats.append(ref.ref_get_affine_transform(center, scale, 0,
                                                     [192, 256]))
            fidx.append(i % 3)
        mats = np.stack(mats)
        fidx = np.array(fidx, np.int32)
        got = native_warp.warp_affine_batch(frames, fidx, mats, (256, 192),
                                            mode=1)
        for i in range(12):
            golden = cv2.warpAffine(frames[fidx[i]], mats[i], (192, 256),
                                    flags=cv2.INTER_LINEAR)
            diff = np.abs(got[i].astype(int) - golden.astype(int))
            assert diff.max() <= 1
            assert (diff > 0).mean() < 1e-3

    def test_float_mode_rotation(self):
        frames = RNG.integers(0, 256, size=(1, 120, 160, 3), dtype=np.uint8)
        center = np.array([80.0, 60.0], np.float32)
        scale = np.array([90.0, 120.0], np.float32)
        m = ref.ref_get_affine_transform(center, scale, 33.0, [96, 128])
        got = native_warp.warp_affine_batch(
            frames, np.array([0], np.int32), m[None], (128, 96), mode=1)
        golden = cv2.warpAffine(frames[0], m, (96, 128),
                                flags=cv2.INTER_LINEAR)
        diff = np.abs(got[0].astype(int) - golden.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 2e-3

    def test_fixed_mode_matches_classic_scheme(self):
        """mode=0 vs a numpy replication of the classic fixed-point scheme."""
        frames = RNG.integers(0, 256, size=(1, 60, 80, 3), dtype=np.uint8)
        src = frames[0]
        center = np.array([40.0, 30.0], np.float32)
        scale = np.array([30.0, 40.0], np.float32)
        m = ref.ref_get_affine_transform(center, scale, 0.0, [24, 32])
        got = native_warp.warp_affine_batch(
            frames, np.array([0], np.int32), m[None], (32, 24), mode=0)[0]
        iM = cv2.invertAffineTransform(m)
        dh, dw = 32, 24
        out = np.zeros((dh, dw, 3), np.uint8)
        xs = np.arange(dw)
        adelta = np.rint(iM[0, 0] * xs * 1024).astype(int)
        bdelta = np.rint(iM[1, 0] * xs * 1024).astype(int)
        for y in range(dh):
            X0 = int(np.rint((iM[0, 1] * y + iM[0, 2]) * 1024)) + 16
            Y0 = int(np.rint((iM[1, 1] * y + iM[1, 2]) * 1024)) + 16
            for x in range(dw):
                X = (X0 + adelta[x]) >> 5
                Y = (Y0 + bdelta[x]) >> 5
                sx, sy = X >> 5, Y >> 5
                fx, fy = X & 31, Y & 31
                for c in range(3):
                    def tap(yy, xx):
                        if 0 <= xx < 80 and 0 <= yy < 60:
                            return int(src[yy, xx, c])
                        return 0
                    acc = ((32 - fy) * (32 - fx) * 32 * tap(sy, sx)
                           + (32 - fy) * fx * 32 * tap(sy, sx + 1)
                           + fy * (32 - fx) * 32 * tap(sy + 1, sx)
                           + fy * fx * 32 * tap(sy + 1, sx + 1))
                    base = acc >> 15
                    rem = acc & 32767
                    base += (rem > 16384) or (rem == 16384 and (base & 1))
                    out[y, x, c] = np.clip(base, 0, 255)
        assert np.array_equal(got, out)
