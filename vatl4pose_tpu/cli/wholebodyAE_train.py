"""WholeBodyAE pre-training (parity: scripts/wholebodyAE_train.py).

AdamW lr 1e-3 with manual decay to 2e-4 at epoch 12 and 5e-5 at epoch 40,
batch 10000, MSE, early stopping patience 30, best-val checkpointing
(wholebodyAE_train.py:90-184).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WholeBodyAE training (TPU)")
    p.add_argument("--ann_train", type=str, required=True,
                   help="COCO-format annotation json for training features")
    p.add_argument("--ann_val", type=str, required=True)
    p.add_argument("--dataset_type", default="Posetrack21")
    p.add_argument("--zdim", type=int, default=4)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--batch", type=int, default=10000)
    p.add_argument("--patience", type=int, default=30)
    p.add_argument("--kp_direct", action="store_true")
    p.add_argument("--work_dir", default="./exp/wholebodyAE")
    p.add_argument("--seed", type=int, default=318)
    return p.parse_args(argv)


def main(argv=None):
    import jax
    from ..utils.runtime import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp
    from ..data.wholebody import Wholebody
    from ..models.wholebody_ae import WholeBodyAE
    from ..train.optim import init_state, make_adamw

    opt = parse_args(argv)
    np.random.seed(opt.seed)
    train_ds = Wholebody(opt.ann_train, opt.dataset_type,
                         kp_direct=opt.kp_direct)
    val_ds = Wholebody(opt.ann_val, opt.dataset_type,
                       kp_direct=opt.kp_direct)
    input_dim = train_ds.features.shape[1]
    model = WholeBodyAE(z_dim=opt.zdim, input_dim=input_dim)
    variables = model.init(jax.random.PRNGKey(opt.seed),
                           jnp.zeros((1, input_dim)))
    opt_state = init_state(variables["params"])
    # reference: torch.optim.AdamW(lr=1e-3) — torch default weight_decay 0.01
    update = make_adamw(weight_decay=0.01)

    @jax.jit
    def step(variables, opt_state, feats, lr):
        def loss_fn(p):
            out = model.apply({"params": p}, feats)
            return jnp.mean(jnp.square(out - feats))
        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        params, opt_state = update(variables["params"], grads, opt_state, lr)
        return {"params": params}, opt_state, loss

    @jax.jit
    def val_loss(variables, feats):
        out = model.apply(variables, feats)
        return jnp.mean(jnp.square(out - feats))

    os.makedirs(opt.work_dir, exist_ok=True)
    rng = np.random.default_rng(opt.seed)
    best, best_epoch, log = np.inf, -1, []
    feats_train = train_ds.features
    feats_val = jnp.asarray(val_ds.features)
    for epoch in range(opt.epochs):
        lr = 1e-3 if epoch < 12 else (2e-4 if epoch < 40 else 5e-5)
        order = rng.permutation(len(feats_train))
        tl = 0.0
        for s in range(0, len(order), opt.batch):
            batch = jnp.asarray(feats_train[order[s:s + opt.batch]])
            variables, opt_state, loss = step(variables, opt_state, batch,
                                              jnp.asarray(lr, jnp.float32))
            tl += float(loss)
        vl = float(val_loss(variables, feats_val))
        log.append({"epoch": epoch, "train_loss": tl, "val_loss": vl})
        print(f"epoch {epoch}: train {tl:.6f} val {vl:.6f}", flush=True)
        if vl < best:
            best, best_epoch = vl, epoch
            with open(os.path.join(
                    opt.work_dir, f"WholeBodyAE_zdim{opt.zdim}.pkl"),
                    "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, variables), f)
        elif epoch - best_epoch >= opt.patience:
            print(f"early stop at {epoch} (best {best:.6f} @ {best_epoch})")
            break
    with open(os.path.join(opt.work_dir, "log.json"), "w") as f:
        json.dump(log, f)


if __name__ == "__main__":
    main()
