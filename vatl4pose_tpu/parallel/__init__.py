"""Mesh + sharded-step builders (DP over devices; multi-host via DCN)."""

from .mesh import (data_sharding, init_multihost, make_mesh, replicated,
                   shard_batch)
from .steps import build_sharded_eval_step, build_sharded_train_step
