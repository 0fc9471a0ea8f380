"""Per-op profile of the bf16 serving scoring extras on the real TPU.

Round-5 follow-up to exp/profile_scoring_extras.py: the composite bf16
scoring program (bench.py score_body) measures ~57 ms/batch vs ~52 ms for
the bare fused forward; this attributes the ~5 ms delta with the heatmap
block in bf16 (the serving layout since r4 commit 6c72e7a) and the warp in
serving precision.  Also times the composite with individual extras
REMOVED, which is the honest fusion accounting: XLA fuses stage-2 consumers
into the surrounding program, so the marginal cost of an op inside the
composite differs from its standalone wall.

Run: PYTHONPATH=/root/repo python exp/profile_extras_bf16.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vatl4pose_tpu.utils.runtime import setup_jax_cache
setup_jax_cache()

import bench
from vatl4pose_tpu.models import SimplePose
from vatl4pose_tpu.ops import (compute_oks, crop_batch, heatmap_to_coord,
                               localpeak_mean, thc_scores)

BATCH = 512


def chain(fn, *args, iters=8):
    def make():
        @jax.jit
        def loop(K, *a):
            def body(i, acc):
                out = fn(*((a[0] * (1 + acc * 1e-20)).astype(a[0].dtype),
                           *a[1:]))
                leaves = jax.tree.leaves(out)
                return acc + sum(jnp.mean(l.astype(jnp.float32))
                                 for l in leaves)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop
    return bench._bench_chain(make, *args, iters=iters)


def main():
    rng = np.random.default_rng(0)
    model_fused = SimplePose(num_joints=17, num_layers=50, train=False,
                             fused_eval=True)
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)
    frame_idx = jnp.asarray(rng.integers(0, 80, BATCH))
    raw_bbox = jnp.asarray(
        np.stack([rng.uniform(0, 100, BATCH), rng.uniform(0, 80, BATCH),
                  rng.uniform(150, 300, BATCH), rng.uniform(120, 230, BATCH)],
                 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model_fused.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 256, 192, 3), jnp.float32)))
    var = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape),
                              jnp.bfloat16 if a.dtype == jnp.float32
                              else a.dtype), shapes)
    gt = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    bb_ann = jnp.asarray(np.tile([[10.0, 20.0, 96.0, 128.0]], (BATCH, 1)),
                         jnp.float32)
    ones = jnp.asarray(np.ones(BATCH, bool))
    hm_bf16 = jnp.asarray(rng.uniform(0, 1, (BATCH, 17, 64, 48)),
                          jnp.bfloat16)
    bbox_crop = raw_bbox

    out = {}

    # standalone extras on the bf16 heatmap block
    out["crop_warp_ms"] = chain(
        lambda fr: crop_batch(fr, frame_idx, raw_bbox, (256, 192),
                              precision=jax.lax.Precision.DEFAULT)[0],
        frames) * 1e3
    out["decode_ms"] = chain(
        lambda h: heatmap_to_coord(h, bbox_crop), hm_bf16) * 1e3
    out["thc_ms"] = chain(lambda h: thc_scores(h, ones, ones), hm_bf16) * 1e3
    out["localpeak_ms"] = chain(localpeak_mean, hm_bf16) * 1e3
    kpts = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    out["oks_ms"] = chain(lambda k: compute_oks(k, gt, bb_ann), kpts) * 1e3

    # composite with pieces knocked out: the marginal (fused) cost
    def score_body(var, fr, with_extras=True, with_warp=True):
        if with_warp:
            crops, bbc = crop_batch(fr, frame_idx, raw_bbox, (256, 192),
                                    precision=jax.lax.Precision.DEFAULT)
        else:
            crops = lax.dynamic_slice(
                jnp.broadcast_to(fr[0], (512, 240, 320, 3)),
                (0, 0, 0, 0), (512, 240, 192, 3))
            crops = jnp.pad(crops, ((0, 0), (0, 16), (0, 0), (0, 0)))
            bbc = raw_bbox
        hm = model_fused.apply(var, crops.astype(jnp.bfloat16))
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        if not with_extras:
            return jnp.mean(hm.astype(jnp.float32))
        coords, scores = heatmap_to_coord(hm, bbc)
        kpts = jnp.concatenate([coords, scores[..., None]],
                               -1).reshape(BATCH, -1)
        oks = compute_oks(kpts, gt, bb_ann)
        thc = thc_scores(hm, ones, ones)
        gc = localpeak_mean(hm)
        return oks.sum() + thc.sum() + gc.sum() + coords.mean()

    out["composite_ms"] = chain(
        lambda fr: score_body(var, fr), frames) * 1e3
    out["warp_fwd_only_ms"] = chain(
        lambda fr: score_body(var, fr, with_extras=False), frames) * 1e3
    out["fwd_extras_nowarp_ms"] = chain(
        lambda fr: score_body(var, fr, with_warp=False), frames) * 1e3
    out["marginal_extras_ms"] = out["composite_ms"] - out["warp_fwd_only_ms"]
    out["marginal_warp_ms"] = out["composite_ms"] - out["fwd_extras_nowarp_ms"]
    print(json.dumps({k: round(v, 2) for k, v in out.items()}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
