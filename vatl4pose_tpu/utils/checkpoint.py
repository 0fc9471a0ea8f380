"""Checkpointing: Flax variable/optimizer trees.

Parity: the reference's torch.save/load cycle (posetrack_train.py:188-196,
ActiveLearning.py:207-219) plus TRY_LOAD's shape-filtered partial load
(posetrack_train.py:221-229).  Uses orbax when available (the TPU-native
answer), with a pickle fallback, and reads the reference's .pth files
through models/convert_torch.py.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import numpy as np

import jax


def save_checkpoint(path: str, tree: Any):
    """Save a pytree (variables and/or optimizer state)."""
    tree = jax.tree.map(np.asarray, tree)
    if path.endswith(".pkl"):
        with open(path, "wb") as f:
            pickle.dump(tree, f)
        return path
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(tree, f)
        return path + ".pkl"


def load_checkpoint(path: str, arch: Optional[str] = None):
    """Load .pkl / orbax dir / reference .pth (needs `arch`)."""
    if path.endswith(".pth"):
        from ..models.convert_torch import (convert_state_dict,
                                            load_torch_checkpoint)
        assert arch, ".pth load needs the architecture name"
        return convert_state_dict(load_torch_checkpoint(path), arch)
    if path.endswith(".pkl") or os.path.isfile(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def try_load(variables: Any, ckpt_tree: Any):
    """Shape-filtered partial load (posetrack_train.py:221-229 TRY_LOAD):
    copy leaves whose path+shape match, keep the rest."""
    flat_new = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_ck = dict(jax.tree_util.tree_flatten_with_path(ckpt_tree)[0])
    out = {}
    n_loaded = 0
    for k, v in flat_new.items():
        c = flat_ck.get(k)
        if c is not None and np.shape(c) == np.shape(v):
            out[k] = c
            n_loaded += 1
        else:
            out[k] = v
    tree_def = jax.tree_util.tree_structure(variables)
    leaves = [out[k] for k, _ in
              jax.tree_util.tree_flatten_with_path(variables)[0]]
    return jax.tree_util.tree_unflatten(tree_def, leaves), n_loaded
