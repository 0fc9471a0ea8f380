"""A/B the MXU precision of the separable crop warp on the real TPU.

The warp's two einsums contract 2-nonzero tent-weight rows against pixel
intensities <=255.  Precision.HIGHEST (6-pass f32 emulation) costs ~6x the
MXU work of a single bf16 pass for accuracy the op doesn't need: the
mathematically exact result is a 2-tap convex combination, so 3-pass
bf16x3 (HIGH) is already ~1e-7 relative.  Measures wall + max abs error
vs HIGHEST for: HIGHEST, HIGH, DEFAULT(f32 in), bf16 inputs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/profile_warp_precision.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vatl4pose_tpu.ops import warp
from vatl4pose_tpu.ops.affine import (box_to_center_scale,
                                      get_affine_transform)

BATCH = 512
ITERS = 16


def chain_time(fn, *args, iters=ITERS):
    def prog(*a):
        def body(i, acc):
            out = fn((a[0] * (1.0 + acc * 1e-20)).astype(a[0].dtype),
                     *a[1:])
            return acc + jnp.mean(out.astype(jnp.float32))
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
    bb = np.stack([rng.uniform(0, 100, BATCH), rng.uniform(0, 80, BATCH),
                   rng.uniform(150, 300, BATCH),
                   rng.uniform(120, 230, BATCH)], 1).astype(np.float32)
    center, scale = box_to_center_scale(
        bb[:, 0], bb[:, 1], bb[:, 2] - bb[:, 0], bb[:, 3] - bb[:, 1],
        192.0 / 256.0)
    inv_mats = jnp.asarray(get_affine_transform(center, scale, 0.0,
                                                (192, 256), inv=True))

    def run(prec, cast=None):
        def fn(fr, fi, m):
            if cast is not None:
                fr = fr.astype(cast)
            return warp.warp_axis_aligned_batch(
                fr, fi, m, (256, 192), precision=prec).astype(jnp.float32)
        return fn

    ref = jax.jit(run(jax.lax.Precision.HIGHEST))(frames, frame_idx,
                                                  inv_mats)
    out = {}
    for name, prec, cast in (
            ("HIGHEST", jax.lax.Precision.HIGHEST, None),
            ("HIGH", jax.lax.Precision.HIGH, None),
            ("DEFAULT_f32", jax.lax.Precision.DEFAULT, None),
            ("bf16_in", jax.lax.Precision.DEFAULT, jnp.bfloat16)):
        fn = run(prec, cast)
        t = chain_time(fn, frames, frame_idx, inv_mats)
        got = jax.jit(fn)(frames, frame_idx, inv_mats)
        err = float(jnp.max(jnp.abs(got - ref)))
        out[name] = {"ms": round(t * 1e3, 3),
                     "max_abs_err_vs_HIGHEST": round(err, 6)}
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    main()
