"""Compile-wall probe for the bench score loop (the r4 rc=124 root cause).

The r4 bench switched the bf16 score loop to the fused_eval model; the
judge measured that single program at ~406 s to XLA-compile cold, putting
bench.py's total cold wall at ~25-28 min (driver budget ~590 s).  This
probe times `lower().compile()` of exactly that loop for each chain
implementation, with the persistent cache DISABLED, on the real TPU:

    FUSE_IMPL=conv  python exp/profile_compile.py          # the fix
    FUSE_IMPL=xla   timeout 150 python exp/profile_compile.py  # the disease

Result (2026-08-20, v5e, jax through the axon tunnel):
    conv : score-loop K=2 compile 12.4 s; K=10 13.0 s   (einsum: >150 s,
           aborted — the r4 judge measured 406 s for the same program)
    plain (non-fused) model loop: 11.2 s                 (r3 bench shape)
so the fused model now compiles at parity with the plain model, and the
runtime is unchanged (same folded math, conv_general form).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 512


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from vatl4pose_tpu.models import SimplePose
    from vatl4pose_tpu.models import resnet as resnet_mod
    from vatl4pose_tpu.ops import (compute_oks, crop_batch, heatmap_to_coord,
                                   localpeak_mean, thc_scores)

    print("backend:", jax.default_backend(), "FUSE_IMPL:",
          resnet_mod.FUSE_IMPL, flush=True)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)
    frame_idx = jnp.asarray(rng.integers(0, 80, BATCH))
    raw_bbox = jnp.asarray(
        np.stack([rng.uniform(0, 100, BATCH), rng.uniform(0, 80, BATCH),
                  rng.uniform(150, 300, BATCH), rng.uniform(120, 230, BATCH)],
                 1), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    bb_ann = jnp.asarray(np.tile([[10.0, 20.0, 96.0, 128.0]], (BATCH, 1)),
                         jnp.float32)
    ones = jnp.asarray(np.ones(BATCH, bool))

    def build(model):
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 192, 3), jnp.float32)))
        var = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape),
                                  jnp.bfloat16 if a.dtype == jnp.float32
                                  else a.dtype), shapes)

        def make_loop(K):
            @jax.jit
            def loop(variables, frames):
                def body(i, acc):
                    fr = frames * (1 + acc * 1e-20)
                    crops, bbox_crop = crop_batch(
                        fr, frame_idx, raw_bbox, (256, 192),
                        precision=jax.lax.Precision.DEFAULT)
                    hm = model.apply(variables, crops.astype(jnp.bfloat16))
                    hm = jnp.transpose(hm, (0, 3, 1, 2)).astype(jnp.float32)
                    coords, scores = heatmap_to_coord(hm, bbox_crop)
                    kpts = jnp.concatenate([coords, scores[..., None]],
                                           -1).reshape(BATCH, -1)
                    oks = compute_oks(kpts, gt, bb_ann)
                    thc = thc_scores(hm, ones, ones)
                    gc = localpeak_mean(hm)
                    return acc + (oks.sum() + thc.sum() + gc.sum()
                                  + coords.mean())
                return lax.fori_loop(0, K, body, jnp.float32(0))
            return loop
        return var, make_loop

    for name, model in (
            ("fused", SimplePose(num_joints=17, num_layers=50, train=False,
                                 fused_eval=True)),
            ("plain", SimplePose(num_joints=17, num_layers=50, train=False))):
        var, make_loop = build(model)
        for K in (2, 10):
            t0 = time.perf_counter()
            c = make_loop(K).lower(var, frames).compile()
            dt = time.perf_counter() - t0
            print(f"{name} score-loop K={K}: compile {dt:.1f} s", flush=True)
        jax.device_get(c(var, frames))
        t0 = time.perf_counter()
        jax.device_get(c(var, frames))
        print(f"{name} K=10 run: {time.perf_counter() - t0:.3f} s",
              flush=True)


if __name__ == "__main__":
    main()
