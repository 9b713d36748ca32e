"""Mesh sharding + distributed training (dp over envs, optional tp)."""

from .mesh import (
    env_sharding,
    make_mesh,
    param_tp_sharding,
    replicated,
    shard_env_states,
)
from .train import DistributedTrainer

__all__ = [
    "DistributedTrainer",
    "env_sharding",
    "make_mesh",
    "param_tp_sharding",
    "replicated",
    "shard_env_states",
]
