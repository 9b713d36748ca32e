"""Mesh sharding + distributed training (dp over envs, optional tp)."""

from .distributed import host_to_global, initialize_distributed
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
    "host_to_global",
    "initialize_distributed",
    "env_sharding",
    "make_mesh",
    "param_tp_sharding",
    "replicated",
    "shard_env_states",
]
