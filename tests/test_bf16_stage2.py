"""bf16 heatmap hand-through to stage-2 scoring is bit-exact.

The bf16 serving path stopped materializing an f32 copy of the (N, K, h, w)
heatmap block (al/scoring.py _model_outputs): stage-1 hands the model's bf16
output through the NHWC->NKHW transpose, and every stage-2 consumer upcasts
to f32 at entry.  bf16 -> f32 conversion is exact, so each consumer must
produce bit-identical results on a bf16 input vs its f32 upcast — this
guards the invariant (a consumer that forgets the entry upcast would compute
in bf16 and break here).

Reference anchor: the per-person loop whose scoring math this fuses,
active_learning/ActiveLearning.py:299-429.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vatl4pose_tpu.ops import (compute_entropy, compute_margin, compute_mpe,
                               heatmap_to_coord, localpeak_mean, thc_scores,
                               tpc_scores)

RNG = np.random.default_rng(7)


def _fixtures(n=8, k=17, h=64, w=48):
    hm_b = jnp.asarray(RNG.normal(0, 1, (n, k, h, w)), jnp.bfloat16)
    bb = jnp.asarray(
        np.stack([RNG.uniform(0, 50, n), RNG.uniform(0, 50, n),
                  RNG.uniform(100, 200, n), RNG.uniform(100, 200, n)], 1),
        jnp.float32)
    ones = jnp.ones(n, bool)
    return hm_b, bb, ones


def test_stage2_consumers_bitexact_on_bf16():
    hm_b, bb, ones = _fixtures()
    hm_f = hm_b.astype(jnp.float32)
    fns = {
        "coords": lambda h: heatmap_to_coord(h, bb)[0],
        "scores": lambda h: heatmap_to_coord(h, bb)[1],
        "thc_l1": lambda h: thc_scores(h, ones, ones),
        "thc_l2": lambda h: thc_scores(h, ones, ones, norm_type="L2"),
        "tpc": lambda h: tpc_scores(h, heatmap_to_coord(h, bb)[0], bb,
                                    ones, ones),
        "gc": localpeak_mean,
        "mpe": compute_mpe,
        "entropy": compute_entropy,
        "margin": compute_margin,
    }
    for name, fn in fns.items():
        a = np.asarray(jax.jit(fn)(hm_b))
        b = np.asarray(jax.jit(fn)(hm_f))
        assert a.dtype == np.float32, name
        assert np.array_equal(a, b, equal_nan=True), name


def test_vl4pose_bitexact_on_bf16():
    from vatl4pose_tpu.ops.vl4pose import vl4pose_scores
    hm_b, _, _ = _fixtures(n=4)
    hm_f = hm_b.astype(jnp.float32)
    params = jnp.asarray(RNG.normal(0, 1, (4, 16, 2)), jnp.float32)
    a = np.asarray(jax.jit(vl4pose_scores)(hm_b, params))
    b = np.asarray(jax.jit(vl4pose_scores)(hm_f, params))
    assert np.array_equal(a, b, equal_nan=True)
