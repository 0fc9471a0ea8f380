"""Attribute the retrain wall-clock gap: BENCH_DETAIL r3 showed 192 ms/step
wall vs 92.4 ms jitted step (f32, batch 120).  This replays
Retrainer.retrain's exact loop with per-phase timers:

  geometry   host train_sample_geometry per step
  warp_mats  host decompose_inv_mats (rotation-kernel path)
  stack_h2d  np.stack + jnp.asarray of the chunk inputs
  dispatch   _steps_scan call (async return)
  device     remaining time until the stats fetch completes
  stats      _weighted_stats host math

Usage: python exp/profile_retrain_wall.py [bf16]
"""

import json
import sys
import time
import types

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry  # noqa: E402
from vatl4pose_tpu.models import SimplePose  # noqa: E402
from vatl4pose_tpu.train import retrain as retrain_mod  # noqa: E402
from vatl4pose_tpu.train.retrain import Retrainer, _weighted_stats  # noqa: E402
from vatl4pose_tpu.train.optim import init_state  # noqa: E402

BF16 = len(sys.argv) > 1 and sys.argv[1] == "bf16"
BATCH = 120
N_SAMP = 240
EPOCHS = 8  # -> 16 steps = one STEP_CHUNK


def main():
    rng = np.random.default_rng(0)
    model_t = SimplePose(num_joints=17, num_layers=50, train=True)
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)
    d = types.SimpleNamespace(
        frame_idx=np.asarray(rng.integers(0, 80, N_SAMP)),
        bboxes=np.asarray(np.stack(
            [rng.uniform(0, 100, N_SAMP), rng.uniform(0, 80, N_SAMP),
             rng.uniform(150, 300, N_SAMP), rng.uniform(120, 230, N_SAMP)],
            1), np.float32),
        joints_xy=rng.uniform(20, 200, (N_SAMP, 17, 2)).astype(np.float32),
        joints_vis=np.ones((N_SAMP, 17), np.float32))
    variables = model_t.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 256, 192, 3)))
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype),
        variables)
    tr = Retrainer(model_t, {"OPTIMIZER": "AdamW", "LR": 2.5e-4,
                             "WEIGHT_DECAY": 0.7, "BATCH_SIZE": BATCH},
                   "SimplePose", aug=AugCfg(), joint_pairs=[], seed=166,
                   bf16=BF16)
    opt_state = init_state(variables["params"])
    idx = np.arange(N_SAMP)

    def timed_retrain(variables, opt_state):
        t = dict(geometry=0.0, warp_mats=0.0, stack_h2d=0.0, dispatch=0.0,
                 device=0.0, stats=0.0)
        indices = np.asarray(idx, np.int64)
        bs = tr.batch_size
        steps = []
        for _ in range(EPOCHS):
            lr = tr.base_lr * (tr.gamma ** tr.epoch_counter)
            order = tr.rng.permutation(len(indices))
            for s in range(0, len(order), bs):
                sel = indices[order[s:s + bs]]
                n = len(sel)
                sel_p = np.resize(sel, bs)
                t0 = time.perf_counter()
                inv_mats, flips, joints, vis, _ = train_sample_geometry(
                    d.bboxes[sel_p], d.joints_xy[sel_p],
                    d.joints_vis[sel_p], (320, 240), tr.input_size,
                    tr.aug, tr.joint_pairs, tr.rng)
                t1 = time.perf_counter()
                t["geometry"] += t1 - t0
                mats, phi = tr._warp_mats(inv_mats)
                t["warp_mats"] += time.perf_counter() - t1
                valid = np.zeros(bs, bool)
                valid[:n] = True
                steps.append((d.frame_idx[sel_p], mats, phi, joints, vis,
                              valid, lr, n))
            tr.epoch_counter += 1
        stats, counts = [], []
        C = retrain_mod.STEP_CHUNK
        for s in range(0, len(steps), C):
            chunk = steps[s:s + C]
            tn = len(chunk)
            chunk = chunk + [chunk[0]] * (C - tn)
            upd = np.zeros(C, bool)
            upd[:tn] = True
            fi, mats, phis, joints, vis, valid, lrs, ns = zip(*chunk)
            t0 = time.perf_counter()
            args = (jnp.asarray(np.stack(fi)), jnp.asarray(np.stack(mats)),
                    jnp.asarray(np.stack(phis)),
                    jnp.asarray(np.stack(joints)),
                    jnp.asarray(np.stack(vis)),
                    jnp.asarray(np.stack(valid)),
                    jnp.asarray(np.asarray(lrs), jnp.float32),
                    jnp.asarray(upd))
            t1 = time.perf_counter()
            t["stack_h2d"] += t1 - t0
            variables, opt_state, st = tr._steps_scan(
                variables, opt_state, frames, *args)
            t2 = time.perf_counter()
            t["dispatch"] += t2 - t1
            stats.append(st)
            counts.extend([n if u else 0 for n, u in zip(ns, upd)])
        t0 = time.perf_counter()
        # the concatenate+fetch inside _weighted_stats is the sync point:
        # everything still in flight lands in "device"
        la = _weighted_stats(stats, counts)
        t["device"] += time.perf_counter() - t0
        return variables, opt_state, t, la

    # warm-up (compile)
    variables, opt_state, _, _ = timed_retrain(variables, opt_state)
    for rep in range(3):
        t_all = time.perf_counter()
        variables, opt_state, t, la = timed_retrain(variables, opt_state)
        wall = time.perf_counter() - t_all
        print(json.dumps({
            "rep": rep, "bf16": BF16, "wall_s": round(wall, 3),
            "per_step_ms": round(wall / 16 * 1e3, 1),
            **{k: round(v, 3) for k, v in t.items()},
            "unaccounted": round(wall - sum(t.values()), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
