"""Per-op profile of the non-forward scoring extras on the real TPU.

The composite scoring program (bench.py make_score_loop) runs ~12% slower
than the bare model forward; this attributes that gap to the individual
device ops: crop warp, NHWC->NCHW heatmap relayout, heatmap decode, OKS,
THC, local-peak combine weight.  Chained-fori timing (bench.py
methodology).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/profile_scoring_extras.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vatl4pose_tpu.ops import (compute_oks, crop_batch, heatmap_to_coord,
                               localpeak_mean, thc_scores)

BATCH = 512
ITERS = 16


def chain_time(fn, *args, iters=ITERS):
    def prog(*a):
        def body(i, acc):
            out = fn(*((a[0] * (1.0 + acc * 1e-20)).astype(a[0].dtype),
                       *a[1:]))
            leaves = jax.tree.leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32) * 0) +
                             jnp.mean(l.astype(jnp.float32)) for l in leaves)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    f = jax.jit(prog)
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)
    frame_idx = jnp.asarray(rng.integers(0, 80, BATCH))
    raw_bbox = jnp.asarray(
        np.stack([rng.uniform(0, 100, BATCH), rng.uniform(0, 80, BATCH),
                  rng.uniform(150, 300, BATCH), rng.uniform(120, 230, BATCH)],
                 1), jnp.float32)
    hm_nhwc = jnp.asarray(rng.uniform(0, 1, (BATCH, 64, 48, 17)),
                          jnp.float32)
    hm = jnp.asarray(rng.uniform(0, 1, (BATCH, 17, 64, 48)), jnp.float32)
    bbox_crop = jnp.asarray(
        np.stack([rng.uniform(0, 100, BATCH), rng.uniform(0, 80, BATCH),
                  rng.uniform(150, 300, BATCH), rng.uniform(120, 230, BATCH)],
                 1), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    bb_ann = jnp.asarray(np.tile([[10.0, 20.0, 96.0, 128.0]], (BATCH, 1)),
                         jnp.float32)
    ones = jnp.asarray(np.ones(BATCH, bool))

    rows = {}
    rows["crop_batch"] = chain_time(
        lambda fr: crop_batch(fr, frame_idx, raw_bbox, (256, 192))[0], frames)
    rows["transpose_hm"] = chain_time(
        lambda h: jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32), hm_nhwc)
    rows["decode"] = chain_time(
        lambda h: heatmap_to_coord(h, bbox_crop), hm)
    rows["thc"] = chain_time(lambda h: thc_scores(h, ones, ones), hm)
    rows["localpeak_mean"] = chain_time(localpeak_mean, hm)

    def oks_fn(k):
        return compute_oks(k, gt, bb_ann)
    kpts = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    rows["oks"] = chain_time(oks_fn, kpts)

    out = {k: round(v * 1e3, 3) for k, v in rows.items()}
    out["sum_ms"] = round(sum(rows.values()) * 1e3, 2)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
