"""Pallas fused post-processing kernel vs the reference jnp ops
(interpret mode on CPU; the compiled path runs on real TPU via bench/engine)."""

import numpy as np

import jax.numpy as jnp

from vatl4pose_tpu import ops
from vatl4pose_tpu.kernels.pallas_postprocess import fused_postprocess

RNG = np.random.default_rng(9)


class TestFusedPostprocess:
    def test_matches_reference_ops(self):
        hms = RNG.normal(0.1, 0.4, size=(4, 17, 64, 48)).astype(np.float32)
        coords, maxvals, gc = fused_postprocess(jnp.asarray(hms),
                                                interpret=True)
        ref_coords, ref_maxvals = ops.get_max_pred(jnp.asarray(hms))
        ref_coords = ops.subpixel_refine(jnp.asarray(hms), ref_coords)
        ref_gc = ops.localpeak_mean(jnp.asarray(hms))
        np.testing.assert_allclose(np.asarray(coords), np.asarray(ref_coords),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(maxvals),
                                   np.asarray(ref_maxvals), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ref_gc),
                                   rtol=1e-5)

    def test_negative_heatmaps_mask_coords(self):
        hms = -np.abs(RNG.normal(0.2, 0.3, size=(2, 17, 64, 48))
                      ).astype(np.float32)
        coords, maxvals, _ = fused_postprocess(jnp.asarray(hms),
                                               interpret=True)
        assert (np.asarray(maxvals) <= 0).all()
        np.testing.assert_array_equal(np.asarray(coords), 0.0)
