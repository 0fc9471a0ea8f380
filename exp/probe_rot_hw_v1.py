import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry
from vatl4pose_tpu.kernels.rot_warp import (decompose_inv_mats,
                                            warp_rotated_traced)
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
aug = AugCfg(scale_factor=0.3, rot_factor=40, flip=False)
inv_mats, _, _, _, _ = train_sample_geometry(
    bboxes, joints, vis, (320, 240), (256, 192), aug, [],
    np.random.default_rng(5))
pre_mats, phi, err = decompose_inv_mats(inv_mats, (256, 192))
got = np.asarray(warp_rotated_traced(
    jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(pre_mats),
    jnp.asarray(phi), (256, 192)))
allmax = 0.0
for i in range(N):
    ref = np.asarray(warp_affine_bilinear(
        jnp.asarray(frames[fidx[i]]), jnp.asarray(inv_mats[i]), (256, 192)))
    d = np.abs(got[i] - ref)
    allmax = max(allmax, float(d.max()))
    print(f"i={i:2d} phi={np.degrees(phi[i]):7.2f} max={d.max():8.2f} "
          f"mean={d.mean():7.3f}", flush=True)
print("V1 ALLMAX", allmax)
