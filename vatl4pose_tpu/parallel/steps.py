"""Sharded train/eval step builders (pjit-style: jit + NamedSharding).

DP semantics: batch axis sharded over the 'data' mesh axis, params/optimizer
state replicated; XLA inserts the gradient psum over ICI.  This is the
TPU-native replacement for nn.DataParallel (ActiveLearning.py:233).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.criterion import masked_heatmap_loss
from ..train.optim import lr_multiplier_tree


def build_sharded_train_step(model_train, update_fn, group_of, mesh: Mesh):
    """Returns step(variables, opt_state, crops, target, tw, valid, lr).

    crops NHWC / target NKHW / tw (N,K) / valid (N,) are sharded on the batch
    dim; variables and opt_state are replicated.
    """
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(variables, opt_state, crops, target, tw, valid, lr):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out, new_state = model_train.apply(
                {"params": p, **rest}, crops, mutable=["batch_stats"])
            l = masked_heatmap_loss(
                out, jnp.transpose(target, (0, 2, 3, 1)),
                tw[:, None, None, :], valid=valid)
            return l, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn,
                                                      has_aux=True)(params)
        lr_mults = lr_multiplier_tree(params, group_of)
        new_params, new_opt = update_fn(params, grads, opt_state, lr,
                                        lr_mults)
        return {"params": new_params, **new_state}, new_opt, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_sh, batch_sh, batch_sh, batch_sh,
                      repl),
        out_shardings=(repl, repl, repl))


def build_sharded_eval_step(model_eval, mesh: Mesh):
    """Batch-sharded forward: crops NHWC -> heatmaps NKHW (+embedding)."""
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(variables, crops):
        hm, emb = model_eval.apply(variables, crops, return_embedding=True)
        return jnp.transpose(hm, (0, 3, 1, 2)), emb

    return jax.jit(step, in_shardings=(repl, batch_sh),
                   out_shardings=(batch_sh, batch_sh))
