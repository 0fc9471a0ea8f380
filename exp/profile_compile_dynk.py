"""Compile-wall probe: static-K vs dynamic-K (traced trip count) score loop.

Follow-up to exp/profile_compile.py.  Two conflicting measurements exist
for the conv-form fused score loop's cold compile:

  - profile_compile.py (2026-08-20 early): static K=2 compile = 12.4 s
  - /tmp/probe_conv.log  (2026-08-20 05:22): static K=2 compile = 573.8 s,
    but K=10 immediately after = 19.4 s

and the rewritten bench (dynamic-K) timed out >550 s on its first compile.
Hypotheses this probe separates, one variant per fresh process:

  (a) XLA fully unrolls small static trip counts (K=2) and the unrolled
      double-body graph blows up layout assignment -> K=2 slow, K=10 and
      dynamic-K fast;
  (b) compile walls through the axon tunnel are contention-bound (an
      orphaned server-side compile from a killed client serializes the
      next client's first compile) -> first-compile-of-the-session slow
      regardless of variant;
  (c) dynamic-K while_loop itself compiles pathologically.

Usage: python exp/profile_compile_dynk.py {static2|static10|dynamic}
Persistent cache is NOT enabled (fresh cold compile every run).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 512


def main(variant):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from vatl4pose_tpu.models import SimplePose
    from vatl4pose_tpu.models import resnet as resnet_mod
    from vatl4pose_tpu.ops import (compute_oks, crop_batch, heatmap_to_coord,
                                   localpeak_mean, thc_scores)

    print("backend:", jax.default_backend(), "FUSE_IMPL:",
          resnet_mod.FUSE_IMPL, "variant:", variant, flush=True)
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

    model = SimplePose(num_joints=17, num_layers=50, train=False,
                       fused_eval=True)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3), jnp.float32)))
    var = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape),
                              jnp.bfloat16 if a.dtype == jnp.float32
                              else a.dtype), shapes)

    def body_of(acc, variables):
        fr = frames * (1 + acc * 1e-20)
        crops, bbox_crop = crop_batch(fr, frame_idx, raw_bbox, (256, 192),
                                      precision=jax.lax.Precision.DEFAULT)
        hm = model.apply(variables, crops.astype(jnp.bfloat16))
        hm = jnp.transpose(hm, (0, 3, 1, 2)).astype(jnp.float32)
        coords, scores = heatmap_to_coord(hm, bbox_crop)
        kpts = jnp.concatenate([coords, scores[..., None]],
                               -1).reshape(BATCH, -1)
        oks = compute_oks(kpts, gt, bb_ann)
        thc = thc_scores(hm, ones, ones)
        gc = localpeak_mean(hm)
        return acc + (oks.sum() + thc.sum() + gc.sum() + coords.mean())

    # tiny first program to absorb any session-level first-compile overhead
    t0 = time.perf_counter()
    jax.device_get(jax.jit(lambda a, b: (a @ b).sum())(
        jnp.ones((128, 128), jnp.bfloat16), jnp.ones((128, 128),
                                                     jnp.bfloat16)))
    print(f"warmup matmul (first compile of session): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    if variant == "dynamic":
        @jax.jit
        def loop(K, variables):
            return lax.fori_loop(
                0, K, lambda i, acc: body_of(acc, variables), jnp.float32(0))
        t0 = time.perf_counter()
        c = loop.lower(jnp.int32(2), var).compile()
        print(f"dynamic-K compile: {time.perf_counter() - t0:.1f} s",
              flush=True)
        jax.device_get(c(jnp.int32(2), var))
        t0 = time.perf_counter()
        jax.device_get(c(jnp.int32(10), var))
        print(f"dynamic K=10 run: {time.perf_counter() - t0:.3f} s",
              flush=True)
    else:
        K = int(variant.replace("static", ""))
        @jax.jit
        def loop(variables):
            return lax.fori_loop(
                0, K, lambda i, acc: body_of(acc, variables), jnp.float32(0))
        t0 = time.perf_counter()
        c = loop.lower(var).compile()
        print(f"static K={K} compile: {time.perf_counter() - t0:.1f} s",
              flush=True)
        jax.device_get(c(var))
        t0 = time.perf_counter()
        jax.device_get(c(var))
        print(f"static K={K} run: {time.perf_counter() - t0:.3f} s",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
