import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry
from vatl4pose_tpu.kernels.rot_warp import decompose_rotation, warp_rotated_traced2
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
mats2, phi2, err = decompose_rotation(inv_mats, (256, 192))
got_neg = np.asarray(warp_rotated_traced2(
    jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(mats2),
    jnp.asarray(-phi2), (256, 192)))
rot = np.abs(np.degrees(phi2)) > 0.01
mx = mean = 0.0
for i in np.where(rot)[0]:
    ref = np.asarray(warp_affine_bilinear(
        jnp.asarray(frames[fidx[i]]), jnp.asarray(inv_mats[i]), (256, 192)))
    d = np.abs(got_neg[i] - ref)
    print(f"i={i:2d} phi={np.degrees(phi2[i]):7.2f} NEG-max={d.max():8.2f} "
          f"NEG-mean={d.mean():7.3f}", flush=True)
