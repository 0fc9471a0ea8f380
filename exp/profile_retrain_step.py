"""Attribute the retrain device step: bare fwd+bwd+AdamW (bench.py's 92.4
ms) vs + gaussian targets/PCK vs + the rotation warp — chained-fori timing
(the (variables, opt_state) carry serializes iterations by construction).

Usage: python exp/profile_retrain_step.py [variant ...]
  variants: bare crops warp  (default all)
"""

import json
import sys
import types

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from vatl4pose_tpu.utils.runtime import setup_jax_cache  # noqa: E402
setup_jax_cache()
from bench import _bench_chain_static as _bench_chain  # noqa: E402
from vatl4pose_tpu.data.pipeline import AugCfg, train_sample_geometry  # noqa: E402
from vatl4pose_tpu.models import SimplePose  # noqa: E402
from vatl4pose_tpu.train.retrain import Retrainer  # noqa: E402
from vatl4pose_tpu.train.optim import init_state  # noqa: E402

BATCH = 120


def main():
    which = sys.argv[1:] or ["bare", "crops", "warp"]
    rng = np.random.default_rng(0)
    model_t = SimplePose(num_joints=17, num_layers=50, train=True)
    variables = model_t.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 256, 192, 3)))
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype),
        variables)
    tr = Retrainer(model_t, {"OPTIMIZER": "AdamW", "LR": 2.5e-4,
                             "WEIGHT_DECAY": 0.7, "BATCH_SIZE": BATCH},
                   "SimplePose", aug=AugCfg(), joint_pairs=[], seed=166)
    opt_state = init_state(variables["params"])
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)

    n = BATCH
    d = types.SimpleNamespace(
        frame_idx=np.asarray(rng.integers(0, 80, n)),
        bboxes=np.asarray(np.stack(
            [rng.uniform(0, 100, n), rng.uniform(0, 80, n),
             rng.uniform(150, 300, n), rng.uniform(120, 230, n)], 1),
            np.float32),
        joints_xy=rng.uniform(20, 200, (n, 17, 2)).astype(np.float32),
        joints_vis=np.ones((n, 17), np.float32))
    inv_mats, _, joints, vis, _ = train_sample_geometry(
        d.bboxes, d.joints_xy, d.joints_vis, (320, 240), tr.input_size,
        tr.aug, tr.joint_pairs, tr.rng)
    mats, phi = tr._warp_mats(inv_mats)
    mats_j = jnp.asarray(mats)
    phi_j = jnp.asarray(phi)
    fi = jnp.asarray(d.frame_idx)
    joints_j = jnp.asarray(joints)
    vis_j = jnp.asarray(vis)
    valid = jnp.ones(n, bool)
    lr = jnp.float32(2.5e-4)
    crops_u8 = jnp.asarray(rng.uniform(0, 255, (n, 256, 192, 3)),
                           jnp.float32)

    def make_warp(K):
        @jax.jit
        def loop(variables, opt_state):
            def body(i, carry):
                v, o, acc = carry
                v, o, loss, _ = tr._train_step(
                    v, o, frames * (1 + acc * 1e-20), fi, mats_j, phi_j,
                    joints_j, vis_j, valid, lr)
                return (v, o, acc + loss)
            return lax.fori_loop(0, K, body,
                                 (variables, opt_state, jnp.float32(0)))[2]
        return loop

    def make_crops(K):
        @jax.jit
        def loop(variables, opt_state):
            def body(i, carry):
                v, o, acc = carry
                v, o, loss, _ = tr._train_step_crops(
                    v, o, crops_u8 * (1 + acc * 1e-20), joints_j, vis_j,
                    valid, lr)
                return (v, o, acc + loss)
            return lax.fori_loop(0, K, body,
                                 (variables, opt_state, jnp.float32(0)))[2]
        return loop

    # bench.py's bare step: pre-made normalized crops, pre-made targets,
    # no PCK — replicated here for a same-process control
    from vatl4pose_tpu.models.criterion import masked_heatmap_loss
    from vatl4pose_tpu.train.optim import (build_optimizer,
                                           lr_multiplier_tree)
    update_fn, group_of = build_optimizer(
        {"OPTIMIZER": "AdamW", "LR": 2.5e-4, "WEIGHT_DECAY": 0.7},
        "SimplePose")
    target = jnp.asarray(rng.uniform(0, 1, (n, 64, 48, 17)), jnp.float32)
    tw = jnp.ones((n, 17), jnp.float32)

    def make_bare(K):
        @jax.jit
        def loop(variables, opt_state):
            def body(i, carry):
                v, o, acc = carry
                params = v["params"]
                rest = {k: x for k, x in v.items() if k != "params"}

                def loss_fn(p):
                    out, new_state = model_t.apply(
                        {"params": p, **rest},
                        crops_u8 * (1 + acc * 1e-20), mutable=["batch_stats"])
                    return masked_heatmap_loss(
                        out.astype(jnp.float32), target,
                        tw[:, None, None, :], valid=valid), new_state

                (loss, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                mults = lr_multiplier_tree(params, group_of)
                new_params, new_opt = update_fn(params, grads, o, lr, mults)
                return ({"params": new_params, **new_state}, new_opt,
                        acc + loss)
            return lax.fori_loop(0, K, body,
                                 (variables, opt_state, jnp.float32(0)))[2]
        return loop

    makers = {"bare": make_bare, "crops": make_crops, "warp": make_warp}
    for name in which:
        dt, _ = _bench_chain(makers[name], variables, opt_state, iters=4)
        print(json.dumps({"variant": name, "batch": BATCH,
                          "step_ms": round(dt * 1e3, 1),
                          "samples_per_s": round(BATCH / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
