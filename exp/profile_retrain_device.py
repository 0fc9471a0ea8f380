"""Device-side attribution of the 16-step retrain scan (round 5).

BENCH r4/r5: retrain_wall_16steps_s ~= 2.08 s (130 ms/step) vs
retrain_step_ms 94 (fwd+bwd+AdamW on pre-made crops).  The ~36 ms/step
delta lives INSIDE the scan program — this times the full 16-step scan
with components knocked out:

  full        warp + gaussian target + fwd/bwd/opt + PCK acc + upd select
  no_warp     crops = constant (skips the v2 rotation kernel)
  no_acc      PCK accuracy removed
  no_select   upd where-select over params/opt/batch_stats removed
  no_target   gaussian_target replaced by a constant map
  warp_only   only the rotation warp per step (checksum-carried)

Timing: traced-K fori around the WHOLE 16-step scan; per-scan time is
(t[K=4]-t[K=2])/2, cancelling dispatch overhead (bench.py methodology).

Run: PYTHONPATH=/root/repo:/root/.axon_site python exp/profile_retrain_device.py
"""
import json
import sys
import time
import types

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from vatl4pose_tpu.utils.runtime import setup_jax_cache  # noqa: E402
setup_jax_cache()

import bench  # noqa: E402
from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry  # noqa: E402
from vatl4pose_tpu.models import SimplePose  # noqa: E402
from vatl4pose_tpu.train.retrain import Retrainer, STEP_CHUNK  # noqa: E402
from vatl4pose_tpu.train.optim import init_state  # noqa: E402

BATCH = 120
N_SAMP = 240


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
                   "SimplePose", aug=AugCfg(), joint_pairs=[], seed=166)
    opt_state = init_state(variables["params"])

    # build ONE chunk of 16 steps exactly as retrain() would
    idx = np.arange(N_SAMP)
    steps = []
    for _ in range(8):
        order = tr.rng.permutation(len(idx))
        for s in range(0, len(order), BATCH):
            sel = np.resize(idx[order[s:s + BATCH]], BATCH)
            inv_mats, flips, joints, vis, _ = train_sample_geometry(
                d.bboxes[sel], d.joints_xy[sel], d.joints_vis[sel],
                (320, 240), tr.input_size, tr.aug, tr.joint_pairs, tr.rng)
            mats, phi = tr._warp_mats(inv_mats)
            steps.append((d.frame_idx[sel], mats, phi, joints, vis,
                          np.ones(BATCH, bool)))
    fi, mats, phis, joints, vis, valid = (
        jnp.asarray(np.stack(a)) for a in zip(*steps))
    lrs = jnp.full(STEP_CHUNK, 2.5e-4, jnp.float32)
    upd = jnp.ones(STEP_CHUNK, bool)

    from vatl4pose_tpu.kernels.rot_warp import warp_rotated_traced2
    from vatl4pose_tpu.ops.warp import RGB_MEAN
    from vatl4pose_tpu.ops.heatmap import gaussian_target
    from vatl4pose_tpu.utils.metrics import _acc_impl
    from vatl4pose_tpu.models.criterion import masked_heatmap_loss
    from vatl4pose_tpu.train.optim import lr_multiplier_tree

    def make_scan(with_warp=True, with_acc=True, with_select=True,
                  with_target=True, warp_only=False):
        def step(vars_c, opt_c, fi, m, ph, j, v, va, l):
            if with_warp:
                crops = warp_rotated_traced2(frames, fi, m, ph,
                                             tr.input_size)
                crops = crops / 255.0 - jnp.asarray(RGB_MEAN)
            else:
                crops = jnp.broadcast_to(
                    jnp.float32(0.1), (BATCH,) + tr.input_size + (3,))
            if warp_only:
                return vars_c, opt_c, jnp.mean(crops), jnp.float32(0)
            params = vars_c["params"]
            rest = {k: x for k, x in vars_c.items() if k != "params"}
            if with_target:
                target, tw = gaussian_target(j, v, tr.hm_size, tr.sigma)
            else:
                target = jnp.broadcast_to(
                    jnp.float32(0.1), (BATCH, 17) + tr.hm_size)
                tw = jnp.ones((BATCH, 17), jnp.float32)
            mask = tw[:, None, None, :]

            def loss_fn(p):
                out, new_state = model_t.apply(
                    {"params": p, **rest}, crops, mutable=["batch_stats"])
                lv = masked_heatmap_loss(
                    out, jnp.transpose(target, (0, 2, 3, 1)), mask, valid=va)
                return lv, (new_state, out)

            (loss, (new_state, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            mults = lr_multiplier_tree(params, tr.group_of)
            new_params, opt_c = tr.update_fn(params, grads, opt_c, l, mults)
            new_vars = {"params": new_params, **new_state}
            if with_acc:
                out_nkhw = jnp.transpose(out, (0, 3, 1, 2))
                acc = _acc_impl(out_nkhw, target * tw[:, :, None, None],
                                jnp.float32(0.5))
            else:
                acc = jnp.float32(0)
            return new_vars, opt_c, loss, acc

        def scan16(variables, opt_state):
            def body(carry, xs):
                vars_c, opt_c = carry
                f, m, ph, j, v, va, l, u = xs
                new_vars, new_opt, loss, acc = step(
                    vars_c, opt_c, f, m, ph, j, v, va, l)
                if with_select and not warp_only:
                    new_vars = jax.tree.map(
                        lambda a, b: jnp.where(u, a, b), new_vars, vars_c)
                    new_opt = jax.tree.map(
                        lambda a, b: jnp.where(u, a, b), new_opt, opt_c)
                return (new_vars, new_opt), jnp.stack([loss, acc])
            (v2, o2), st = lax.scan(body, (variables, opt_state),
                                    (fi, mats, phis, joints, vis, valid,
                                     lrs, upd))
            return st.sum() + jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda x: jnp.sum(x[..., :1].astype(jnp.float32)
                                               * 0), v2["params"]))

        def make():
            @jax.jit
            def loop(K, variables, opt_state):
                def body(i, acc):
                    v = jax.tree.map(
                        lambda a: (a * (1 + acc * 1e-20)).astype(a.dtype)
                        if a.dtype == jnp.float32 else a, variables)
                    return acc + scan16(v, opt_state)
                return lax.fori_loop(0, K, body, jnp.float32(0))
            return loop
        return make

    out = {}
    for name, kw in [
            ("full", {}),
            ("no_warp", dict(with_warp=False)),
            ("no_acc", dict(with_acc=False)),
            ("no_select", dict(with_select=False)),
            ("no_target", dict(with_target=False)),
            ("warp_only", dict(warp_only=True)),
    ]:
        t0 = time.perf_counter()
        dt = bench._bench_chain(make_scan(**kw), variables, opt_state,
                                iters=2)
        out[name + "_scan16_s"] = round(dt, 3)
        out[name + "_ms_per_step"] = round(dt / STEP_CHUNK * 1e3, 1)
        print(f"[{name}] {dt:.3f} s/scan16 = "
              f"{dt / STEP_CHUNK * 1e3:.1f} ms/step  "
              f"(wall incl compile {time.perf_counter() - t0:.0f}s)",
              flush=True)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
