"""Attribute the train-aug rotation warp (~90 ms/step at batch 120,
exp/profile_retrain_step.py): pre-warp einsum to the 640x640 canvas vs the
3 Pallas shear passes vs canvas size.  Chained-fori timing.

Usage: python exp/profile_rot_warp.py [part ...]
  parts: full pre shears pre384 full_aa
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from vatl4pose_tpu.utils.runtime import setup_jax_cache  # noqa: E402
setup_jax_cache()
from bench import _bench_chain_static as _bench_chain  # noqa: E402
from vatl4pose_tpu.kernels import rot_warp  # noqa: E402
from vatl4pose_tpu.ops.warp import warp_axis_aligned_batch  # noqa: E402

BATCH = 120
CANVAS = rot_warp.CANVAS


def main():
    which = sys.argv[1:] or ["full", "pre", "shears", "full_aa"]
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)
    fi = jnp.asarray(rng.integers(0, 80, BATCH))
    # realistic train affines: iso scale ~1.3 + rotation up to +-70 deg
    theta = rng.normal(0, 40, BATCH).clip(-70, 70) * np.pi / 180
    s = rng.uniform(0.9, 1.5, BATCH)
    pre = np.zeros((BATCH, 2, 3), np.float32)
    pre[:, 0, 0] = s
    pre[:, 1, 1] = s
    pre[:, 0, 2] = rng.uniform(0, 60, BATCH)
    pre[:, 1, 2] = rng.uniform(0, 40, BATCH)
    pre_j = jnp.asarray(pre)
    phi_j = jnp.asarray(theta.astype(np.float32))
    canvas_in = jnp.asarray(
        rng.uniform(0, 255, (BATCH, 3, CANVAS, CANVAS)), jnp.float32)

    def consume(out, acc):
        return acc + jnp.sum(out[0, 0, 0, :2].astype(jnp.float32))

    def make_full(K):
        @jax.jit
        def loop(frames):
            def body(i, acc):
                out = rot_warp.warp_rotated_traced(
                    frames * (1 + acc * 1e-20), fi, pre_j, phi_j, (256, 192))
                return consume(out, acc)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_pre(K):
        @jax.jit
        def loop(frames):
            def body(i, acc):
                out = warp_axis_aligned_batch(
                    frames * (1 + acc * 1e-20), fi, pre_j, (CANVAS, CANVAS))
                return consume(out, acc)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_shears(K):
        @jax.jit
        def loop(canvas_in):
            def body(i, acc):
                c0 = canvas_in * (1 + acc * 1e-20)
                sx, sy = rot_warp._rotation_shifts(phi_j, CANVAS)
                c1 = rot_warp._shear_pass(c0, sx)
                c1t = jnp.swapaxes(c1, 2, 3)
                c2t = rot_warp._shear_pass(c1t, sy)
                c2 = jnp.swapaxes(c2t, 2, 3)
                c3 = rot_warp._shear_pass(c2, sx)
                return acc + jnp.sum(c3[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_noswap(K):  # 3 x-shear passes, no transposes
        @jax.jit
        def loop(canvas_in):
            def body(i, acc):
                c0 = canvas_in * (1 + acc * 1e-20)
                sx, _ = rot_warp._rotation_shifts(phi_j, CANVAS)
                c1 = rot_warp._shear_pass(c0, sx)
                c2 = rot_warp._shear_pass(c1, sx)
                c3 = rot_warp._shear_pass(c2, sx)
                return acc + jnp.sum(c3[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_swaps(K):  # the two transposes alone
        @jax.jit
        def loop(canvas_in):
            def body(i, acc):
                c0 = canvas_in * (1 + acc * 1e-20)
                c1 = jnp.swapaxes(c0, 2, 3) + 1.0
                c2 = jnp.swapaxes(c1, 2, 3)
                return acc + jnp.sum(c2[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_one(K):  # a single x-shear pass
        @jax.jit
        def loop(canvas_in):
            def body(i, acc):
                c0 = canvas_in * (1 + acc * 1e-20)
                sx, _ = rot_warp._rotation_shifts(phi_j, CANVAS)
                c1 = rot_warp._shear_pass(c0, sx)
                return acc + jnp.sum(c1[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_full_aa(K):  # control: the scoring-style axis-aligned warp
        @jax.jit
        def loop(frames):
            def body(i, acc):
                out = warp_axis_aligned_batch(
                    frames * (1 + acc * 1e-20), fi, pre_j, (256, 192))
                return consume(out, acc)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    # ---- v2 A/B: realistic reference-style train affines ----------------
    # (rot ~ N(0, 40) clipped +-80 with p=0.6 else 0, flip p=0.5 — the
    # actual simple_transform.py:212-217 distribution the retrain step sees)
    from vatl4pose_tpu.data.pipeline import np_affine_transform
    rots = np.where(rng.uniform(size=BATCH) <= 0.6,
                    np.clip(rng.normal(0, 40, BATCH), -80, 80), 0.0)
    inv_list = []
    for i in range(BATCH):
        inv = np_affine_transform(np.array([160.0, 120.0]),
                                  np.array([140.0, 186.0]), rots[i],
                                  (192, 256), inv=True)
        if rng.uniform() < 0.5:
            inv = inv.copy()
            inv[0] = -inv[0]
            inv[0, 2] += 320 - 1
        inv_list.append(inv)
    inv_mats = np.stack(inv_list)
    m2, p2, _ = rot_warp.decompose_rotation(inv_mats, (256, 192))
    m2_j, p2_j = jnp.asarray(m2), jnp.asarray(p2)
    pre1, ph1, _ = rot_warp.decompose_inv_mats(inv_mats, (256, 192))
    pre1_j, ph1_j = jnp.asarray(pre1), jnp.asarray(ph1)
    # worst case: every sample rotated (no fast-path skips)
    rots_a = np.clip(rng.normal(0, 40, BATCH), -80, 80)
    rots_a[rots_a == 0] = 13.0
    inv_a = np.stack([np_affine_transform(
        np.array([160.0, 120.0]), np.array([140.0, 186.0]), r, (192, 256),
        inv=True) for r in rots_a])
    m2a, p2a, _ = rot_warp.decompose_rotation(inv_a, (256, 192))
    m2a_j, p2a_j = jnp.asarray(m2a), jnp.asarray(p2a)

    def make_v2(K):
        @jax.jit
        def loop(frames):
            def body(i, acc):
                out = rot_warp.warp_rotated_traced2(
                    frames * (1 + acc * 1e-20), fi, m2_j, p2_j, (256, 192))
                return consume(out, acc)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_v2_allrot(K):
        @jax.jit
        def loop(frames):
            def body(i, acc):
                out = rot_warp.warp_rotated_traced2(
                    frames * (1 + acc * 1e-20), fi, m2a_j, p2a_j, (256, 192))
                return consume(out, acc)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_v2pre(K):   # v2 pre-stage: two hat-weight warps + sum
        p = rot_warp.plan_v2((256, 192))
        S = p["S"]

        @jax.jit
        def loop(frames):
            def body(i, acc):
                fr = frames * (1 + acc * 1e-20)
                frT = jnp.swapaxes(fr, 1, 2)
                from vatl4pose_tpu.ops.warp import warp_axis_aligned_batch
                c0 = (warp_axis_aligned_batch(fr, fi, m2_j[:, 0], (S, S))
                      + warp_axis_aligned_batch(frT, fi, m2_j[:, 1], (S, S)))
                c0 = jnp.transpose(c0, (0, 3, 1, 2))
                return acc + jnp.sum(c0[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    pv2 = rot_warp.plan_v2((256, 192))
    c0v2 = jnp.asarray(
        rng.uniform(0, 255, (BATCH, 3, pv2["S"], pv2["S"])), jnp.float32)

    def make_v2shears(K):  # v2 shear passes alone (canvas resident)
        p = pv2
        S = p["S"]

        @jax.jit
        def loop(c0_in):
            def body(i, acc):
                c0 = c0_in * (1 + acc * 1e-20)
                x2lo, w2 = p["x2lo"], p["x2hi"] - p["x2lo"]
                y2lo, h2 = p["y2lo"], p["y2hi"] - p["y2lo"]
                sh1, sh2, sh3 = rot_warp._rotation_shifts_v2(
                    p2_j, S, (0, S), (x2lo, w2), (p["crop_ylo"], 256))
                zfl = (p2_j == 0).astype(jnp.int32)
                c1 = rot_warp._shear_pass_v2(
                    c0, sh1, zfl, S_out=S, d_lane=0, maxd=rot_warp._MAXD1,
                    in_row_off=0, out_abs_base=0, in_abs_lo=0, in_abs_hi=S)
                c1t = jnp.swapaxes(c1, 2, 3)
                c2t = rot_warp._shear_pass_v2(
                    c1t, sh2, zfl, S_out=h2, d_lane=y2lo,
                    maxd=rot_warp._MAXD2, in_row_off=x2lo,
                    out_abs_base=y2lo, in_abs_lo=0, in_abs_hi=S)
                c2 = jnp.swapaxes(c2t, 2, 3)
                c3 = rot_warp._shear_pass_v2(
                    c2, sh3, zfl, S_out=w2, d_lane=0, maxd=rot_warp._MAXD1,
                    in_row_off=p["crop_ylo"] - y2lo, out_abs_base=x2lo,
                    in_abs_lo=x2lo, in_abs_hi=x2lo + w2)
                return acc + jnp.sum(c3[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_v2p1(K):  # pass 1 alone
        p = pv2
        S = p["S"]

        @jax.jit
        def loop(c0_in):
            def body(i, acc):
                c0 = c0_in * (1 + acc * 1e-20)
                sh1, _, _ = rot_warp._rotation_shifts_v2(
                    p2_j, S, (0, S), (0, 8), (0, 8))
                zfl = (p2_j == 0).astype(jnp.int32)
                c1 = rot_warp._shear_pass_v2(
                    c0, sh1, zfl, S_out=S, d_lane=0, maxd=rot_warp._MAXD1,
                    in_row_off=0, out_abs_base=0, in_abs_lo=0, in_abs_hi=S)
                return acc + jnp.sum(c1[0, 0, 0, :2])
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    def make_v1_ref(K):  # v1 on the same realistic affines
        @jax.jit
        def loop(frames):
            def body(i, acc):
                out = rot_warp.warp_rotated_traced(
                    frames * (1 + acc * 1e-20), fi, pre1_j, ph1_j,
                    (256, 192))
                return consume(out, acc)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    makers = {"full": (make_full, frames), "pre": (make_pre, frames),
              "shears": (make_shears, canvas_in),
              "noswap": (make_noswap, canvas_in),
              "swaps": (make_swaps, canvas_in),
              "one": (make_one, canvas_in),
              "full_aa": (make_full_aa, frames),
              "v2": (make_v2, frames),
              "v2_allrot": (make_v2_allrot, frames),
              "v2pre": (make_v2pre, frames),
              "v2shears": (make_v2shears, c0v2),
              "v2p1": (make_v2p1, c0v2),
              "v1_ref": (make_v1_ref, frames)}
    for name in which:
        mk, arg = makers[name]
        dt, _ = _bench_chain(mk, arg, iters=8)
        print(json.dumps({"part": name, "batch": BATCH,
                          "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
