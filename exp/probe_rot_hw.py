"""A/B the v2 rotation warp vs the gather warp ON THE REAL CHIP.

tests/test_rot_warp.py runs the Pallas kernel in interpret mode on the CPU
backend; this checks the compiled Mosaic path gives the same crops, with
reference-style rot sampling (p=0.6 rotate, +-40 deg) AND the rot=0 case.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry
from vatl4pose_tpu.kernels.rot_warp import (decompose_rotation,
                                            warp_rotated_traced2)
from vatl4pose_tpu.ops.warp import warp_affine_bilinear

rng = np.random.default_rng(3)
N = 18
frames = rng.uniform(0, 255, (6, 240, 320, 3)).astype(np.float32)
bboxes = np.stack([rng.uniform(0, 100, N), rng.uniform(0, 80, N),
                   rng.uniform(150, 300, N), rng.uniform(120, 230, N)],
                  1).astype(np.float32)
joints = rng.uniform(20, 200, (N, 17, 2)).astype(np.float32)
vis = np.ones((N, 17), np.float32)
fidx = rng.integers(0, 6, N)

for label, aug in (("rot0", AugCfg(scale_factor=0.0, rot_factor=0,
                                   flip=False)),
                   ("rot40", AugCfg(scale_factor=0.3, rot_factor=40,
                                    flip=False))):
    inv_mats, _, j2, v2, _ = train_sample_geometry(
        bboxes, joints, vis, (320, 240), (256, 192), aug, [],
        np.random.default_rng(5))
    mats2, phi2, err = decompose_rotation(inv_mats, (256, 192))
    got = np.asarray(warp_rotated_traced2(
        jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(mats2),
        jnp.asarray(phi2), (256, 192)))
    ref = np.stack([
        np.asarray(warp_affine_bilinear(jnp.asarray(frames[fidx[i]]),
                                        jnp.asarray(inv_mats[i]),
                                        (256, 192)))
        for i in range(N)])
    d = np.abs(got - ref)
    print(f"[{label}] max={d.max():.3f} mean={d.mean():.5f} "
          f"p99={np.percentile(d, 99):.3f} (intensity units /255)",
          flush=True)
print("done")
