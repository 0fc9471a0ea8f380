"""DCN / RoIAlign / VL4Pose kernel tests vs small numpy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(5)


def np_bilinear(img, y, x):
    H, W, C = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    fy, fx = y - y0, x - x0
    def tap(yy, xx):
        if 0 <= yy < H and 0 <= xx < W:
            return img[yy, xx]
        return np.zeros(C)
    return (tap(y0, x0) * (1 - fy) * (1 - fx) + tap(y0, x0 + 1) * (1 - fy) * fx
            + tap(y0 + 1, x0) * fy * (1 - fx) + tap(y0 + 1, x0 + 1) * fy * fx)


def np_deform_conv(x, offset, kernel, stride, padding, mask=None):
    """Oracle for deform_groups=1. x (H,W,Cin), offset (Ho,Wo,2KK),
    kernel (K,K,Cin,Cout)."""
    H, W, Cin = x.shape
    K = kernel.shape[0]
    Ho = (H + 2 * padding - K) // stride + 1
    Wo = (W + 2 * padding - K) // stride + 1
    Cout = kernel.shape[3]
    out = np.zeros((Ho, Wo, Cout))
    for i in range(Ho):
        for j in range(Wo):
            acc = np.zeros(Cout)
            for ky in range(K):
                for kx in range(K):
                    kk = ky * K + kx
                    dy = offset[i, j, 2 * kk]
                    dx = offset[i, j, 2 * kk + 1]
                    y = i * stride - padding + ky + dy
                    xpos = j * stride - padding + kx + dx
                    v = np_bilinear(x, y, xpos)
                    if mask is not None:
                        v = v * mask[i, j, kk]
                    acc += v @ kernel[ky, kx]
            out[i, j] = acc
    return out


class TestDeformConv:
    def test_matches_numpy_oracle(self):
        from vatl4pose_tpu.kernels.deform_conv import deform_conv2d
        x = RNG.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
        off = (RNG.normal(0, 1, (1, 8, 8, 18)) * 0.7).astype(np.float32)
        k = RNG.normal(0, 0.2, (3, 3, 4, 6)).astype(np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(k), 1, 1))
        golden = np_deform_conv(x[0], off[0], k, 1, 1)
        np.testing.assert_allclose(got[0], golden, rtol=1e-3, atol=1e-4)

    def test_zero_offset_equals_regular_conv(self):
        from vatl4pose_tpu.kernels.deform_conv import deform_conv2d
        x = RNG.normal(0, 1, (2, 10, 10, 3)).astype(np.float32)
        off = np.zeros((2, 5, 5, 18), np.float32)
        k = RNG.normal(0, 0.2, (3, 3, 3, 8)).astype(np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(k), 2, 1))
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-3,
                                   atol=1e-4)

    def test_modulated_matches_oracle(self):
        from vatl4pose_tpu.kernels.deform_conv import deform_conv2d
        x = RNG.normal(0, 1, (1, 6, 6, 2)).astype(np.float32)
        off = (RNG.normal(0, 1, (1, 6, 6, 18)) * 0.5).astype(np.float32)
        mask = RNG.uniform(0, 1, (1, 6, 6, 9)).astype(np.float32)
        k = RNG.normal(0, 0.3, (3, 3, 2, 4)).astype(np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(k), 1, 1,
                                       mask=jnp.asarray(mask)))
        golden = np_deform_conv(x[0], off[0], k, 1, 1, mask=mask[0])
        np.testing.assert_allclose(got[0], golden, rtol=1e-3, atol=1e-4)

    def test_differentiable(self):
        from vatl4pose_tpu.kernels.deform_conv import deform_conv2d
        x = jnp.asarray(RNG.normal(0, 1, (1, 6, 6, 2)), jnp.float32)
        off = jnp.zeros((1, 6, 6, 18), jnp.float32)
        k = jnp.asarray(RNG.normal(0, 0.3, (3, 3, 2, 4)), jnp.float32)
        g = jax.grad(lambda kk: jnp.sum(deform_conv2d(x, off, kk, 1, 1)))(k)
        assert np.isfinite(np.asarray(g)).all()


class TestRoiAlign:
    def test_constant_image(self):
        from vatl4pose_tpu.kernels.roi_align import roi_align
        feats = np.full((1, 16, 16, 3), 7.0, np.float32)
        rois = np.array([[0, 2.0, 2.0, 10.0, 14.0]], np.float32)
        out = np.asarray(roi_align(jnp.asarray(feats), rois, (4, 4)))
        np.testing.assert_allclose(out, 7.0, rtol=1e-5)

    def test_gradient_patch(self):
        from vatl4pose_tpu.kernels.roi_align import roi_align
        H = W = 16
        yy, xx = np.mgrid[0:H, 0:W]
        feats = (xx.astype(np.float32))[None, :, :, None]
        rois = np.array([[0, 4.0, 4.0, 12.0, 12.0]], np.float32)
        out = np.asarray(roi_align(jnp.asarray(feats), rois, (4, 4)))[0, :, :, 0]
        # output columns must increase linearly with x
        diffs = np.diff(out.mean(axis=0))
        assert np.all(diffs > 0)
        np.testing.assert_allclose(diffs, diffs[0], rtol=1e-4)


class TestVL4Pose:
    def test_tree_matches_reference_recursion(self):
        """Tiny 2-link chain vs a direct replication of Keypoint.py:53-128."""
        from vatl4pose_tpu.ops.vl4pose import vl4pose_scores
        K, H, W = 3, 32, 32
        hms = np.zeros((1, K, H, W), np.float32)
        peaks = {0: [(12, 12, 1.0), (20, 20, 0.6)],
                 1: [(14, 13, 0.9)],
                 2: [(18, 16, 0.8), (25, 10, 0.5)]}
        for j, pts in peaks.items():
            for (y, x, v) in pts:
                hms[0, j, y, x] = v
        links = np.array([[0, 1], [1, 2]], np.int32)
        params = np.array([[[3.0, 0.5], [5.0, -0.3]]], np.float32)
        got = float(vl4pose_scores(jnp.asarray(hms), jnp.asarray(params),
                                   links=links)[0])

        from scipy.special import softmax
        def node_peaks(j):
            vals = np.array([v for (_, _, v) in peaks[j]])
            locs = np.array([[y, x] for (y, x, _) in peaks[j]], float)
            order = np.argsort(-vals, kind="stable")
            return locs[order], softmax(vals[order])

        loc0, p0 = node_peaks(0)
        loc1, p1 = node_peaks(1)
        loc2, p2 = node_peaks(2)

        def lik_child(locs, pk, parent_loc, mu, logvar, child_fn=None):
            vals = []
            for i in range(len(locs)):
                ll = np.log(2 * np.pi) + logvar
                ll += (mu - np.linalg.norm(parent_loc - locs[i])) ** 2 \
                    * np.exp(-logvar)
                ll *= -0.5
                ll += np.log(pk[i])
                if child_fn is not None:
                    ll += child_fn(locs[i])
                vals.append(ll)
            return np.sum(vals)

        def child2(parent_loc):
            return lik_child(loc2, p2, parent_loc, 5.0, -0.3)

        total = 0.0
        for i in range(len(loc0)):
            ll = np.log(p0[i])
            ll += lik_child(loc1, p1, loc0[i], 3.0, 0.5, child2)
            total += ll
        np.testing.assert_allclose(got, -total, rtol=1e-4)

    def test_auxnet_shapes(self):
        from vatl4pose_tpu.models.auxnet import AuxNet, COCO_LINKS
        m = AuxNet()
        feat = jnp.zeros((2, 8, 6, 512))
        variables = m.init(jax.random.PRNGKey(0), feat)
        out = m.apply(variables, feat)
        assert out.shape == (2, len(COCO_LINKS), 2)
