from .mesh import env_sharding, make_mesh, replicated_sharding
from .rollout import (
    ppo_runner_specs,
    shard_fused_rollout,
    shard_rollout,
    shard_train_iteration,
    shard_env_state,
)

__all__ = [
    "make_mesh",
    "env_sharding",
    "replicated_sharding",
    "ppo_runner_specs",
    "shard_fused_rollout",
    "shard_rollout",
    "shard_train_iteration",
    "shard_env_state",
]
