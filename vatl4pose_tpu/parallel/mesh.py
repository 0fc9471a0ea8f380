"""Device mesh + sharding helpers.

The reference's scale-out story is single-process nn.DataParallel plus
shell-level per-video GPU assignment (ActiveLearning.py:233,
backrun_active_learning.sh) and dead torch.distributed scaffolding
(alphapose/utils/env.py).  The TPU-native equivalent (SURVEY §2.5/§5.8):

  * one jax.sharding.Mesh with a 'data' axis — the (frame × person) sample
    axis of a video is batch-sharded across devices; params are replicated
    (the estimators are ~34M params, no FSDP needed);
  * an optional 'video' axis — the embarrassingly-parallel per-video axis
    the reference drives from a shell loop becomes a second mesh dimension;
  * XLA emits the collectives (psum for gradients) over ICI;
    jax.distributed.initialize() extends the same mesh across hosts (DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "init_multihost"]


def make_mesh(n_devices: Optional[int] = None, axes=("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = shape or (len(devs),)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Device-put arrays with the leading dim sharded over `axis`."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Multi-host bring-up (replaces env.py:11-20 NCCL/MPI init):
    jax.distributed.initialize + one global mesh over all hosts."""
    kwargs = {}
    if coordinator:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return make_mesh()
