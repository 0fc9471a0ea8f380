"""Optimizers with exact torch semantics + per-layer LR groups.

Parity: ActiveLearning.py:220-231 — AdamW with per-module LR multipliers
(SimplePose: final_layer x10, preact x1, deconv_layers x5; FastPose:
conv_out x10, preact x1, suffle1/duc1/duc2 x5), weight_decay 0.7,
ExponentialLR(gamma=0.99) stepped per epoch; posetrack_train.py:155-161 —
Adam / RMSprop with MultiStepLR.

The learning rate is a per-update argument (scaled by the per-leaf
multiplier tree), so epoch-level schedules are plain host arithmetic —
matching torch's scheduler.step() exactly, including the continual mode
where optimizer state and schedule survive across AL rounds.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["OptState", "make_adamw", "make_adam", "make_sgd",
           "lr_multiplier_tree", "exponential_lr", "multistep_lr"]


@dataclasses.dataclass
class OptState:
    m: Any
    v: Any
    count: jnp.ndarray

    def tree_flatten(self):
        return (self.m, self.v, self.count), None


jax.tree_util.register_pytree_node(
    OptState,
    lambda s: ((s.m, s.v, s.count), None),
    lambda _, c: OptState(*c))


def lr_multiplier_tree(params, group_of: Callable[[str], float]):
    """Per-leaf LR multiplier tree: group_of(top-level module name) -> mult."""
    return {k: jax.tree.map(lambda _: group_of(k), v)
            for k, v in params.items()}


LR_GROUPS = {
    "SimplePose": lambda k: 10.0 if k == "final_layer" else
    (1.0 if k == "preact" else 5.0),
    "FastPose": lambda k: 10.0 if k == "conv_out" else
    (1.0 if k == "preact" else 5.0),
}


def init_state(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return OptState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                    count=jnp.zeros((), jnp.int32))


def make_adamw(weight_decay: float, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.AdamW: p *= (1 - lr*wd); p -= lr * m̂ / (sqrt(v̂) + eps)."""

    def update(params, grads, state: OptState, lr, lr_mults=None):
        c = state.count + 1
        bc1 = 1 - b1 ** c.astype(jnp.float32)
        bc2 = 1 - b2 ** c.astype(jnp.float32)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g,
                         state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g,
                         state.v, grads)

        def step(p, mm, vv, mult):
            eff = lr * mult
            p = p * (1 - eff * weight_decay)
            return p - eff * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps)

        if lr_mults is None:
            lr_mults = jax.tree.map(lambda _: 1.0, params)
        new_params = jax.tree.map(step, params, m, v, lr_mults)
        return new_params, OptState(m, v, c)

    return update


def make_adam(weight_decay: float = 0.0, b1=0.9, b2=0.999, eps=1e-8):
    """torch.optim.Adam (L2-in-gradient weight decay)."""

    def update(params, grads, state: OptState, lr, lr_mults=None):
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)
        c = state.count + 1
        bc1 = 1 - b1 ** c.astype(jnp.float32)
        bc2 = 1 - b2 ** c.astype(jnp.float32)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g,
                         state.v, grads)
        if lr_mults is None:
            lr_mults = jax.tree.map(lambda _: 1.0, params)
        new_params = jax.tree.map(
            lambda p, mm, vv, mult:
            p - lr * mult * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps),
            params, m, v, lr_mults)
        return new_params, OptState(m, v, c)

    return update


def make_sgd(momentum: float = 0.9, weight_decay: float = 0.0):
    """torch.optim.SGD with momentum (buf = mu*buf + grad; p -= lr*buf)."""

    def update(params, grads, state: OptState, lr, lr_mults=None):
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                                 grads, params)
        first = state.count == 0
        m = jax.tree.map(
            lambda buf, g: jnp.where(first, g, momentum * buf + g),
            state.m, grads)
        if lr_mults is None:
            lr_mults = jax.tree.map(lambda _: 1.0, params)
        new_params = jax.tree.map(lambda p, buf, mult: p - lr * mult * buf,
                                  params, m, lr_mults)
        return new_params, OptState(m, state.v, state.count + 1)

    return update


def exponential_lr(base_lr: float, gamma: float):
    """ExponentialLR: lr(epoch) = base * gamma**epoch."""
    return lambda epoch: base_lr * (gamma ** epoch)


def multistep_lr(base_lr: float, milestones, factor: float):
    """MultiStepLR: decay by `factor` at each milestone epoch."""
    ms = sorted(milestones)

    def lr(epoch):
        k = sum(1 for m in ms if epoch >= m)
        return base_lr * (factor ** k)

    return lr


def with_warmup(lr_fn, warmup_epochs: int):
    """Linear epoch-level LR warmup: scale lr_fn by (epoch+1)/warmup for the
    first `warmup_epochs` epochs.

    The reference never needs this because its backbones always start from
    torchvision ImageNet weights (alphapose/models/simplepose.py:23-31); when
    training truly from scratch (no pretrained weights available), the first
    full-LR Adam steps reliably collapse the head into the degenerate
    all-zero-heatmap basin (loss plateau ~1.8e-3, PCK ~0), from which escape
    is slow and seed-dependent.  Config-gated via TRAIN.WARMUP_EPOCHS."""
    if warmup_epochs <= 0:
        return lr_fn
    return lambda epoch: lr_fn(epoch) * min(1.0, (epoch + 1) / warmup_epochs)


def build_optimizer(retrain_cfg, model_type: str):
    """Optimizer from a RETRAIN config section (ActiveLearning.py:220-231)."""
    name = retrain_cfg["OPTIMIZER"]
    if name == "AdamW":
        upd = make_adamw(weight_decay=retrain_cfg.get("WEIGHT_DECAY", 0.0))
        group_of = LR_GROUPS.get(model_type, lambda k: 1.0)
    elif name == "Adam":
        upd = make_adam()
        group_of = lambda k: 1.0  # noqa: E731
    elif name == "SGD":
        upd = make_sgd(momentum=0.9, weight_decay=0.0005)
        group_of = lambda k: 1.0  # noqa: E731
    else:
        raise ValueError(f"Optimizer {name} not supported")
    return upd, group_of
