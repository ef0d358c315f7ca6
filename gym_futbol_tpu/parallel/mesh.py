"""Device mesh + sharding helpers (SURVEY.md §2.3).

The reference has zero parallelism (single-process pymunk loop); all scale
here is new design: envs are embarrassingly parallel, so the mesh is a
single ``'env'`` axis over every chip of every host. The env step needs
ZERO collectives; only the learner's gradient reduction crosses chips
(``psum`` over 'env', riding ICI within a slice and DCN across slices).

Multi-host: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``); ``make_mesh`` then spans all processes'
devices, with each host feeding its local shard of the env batch.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def init_distributed(**kw) -> None:
    """Multi-host runtime bring-up. No-op when single-process (this
    sandbox: 1 process, 1 chip — SURVEY.md §7.1)."""
    if jax.process_count() > 1 or kw:
        jax.distributed.initialize(**kw)


def make_mesh(devices: list | None = None) -> Mesh:
    """1-D mesh over all devices with axis 'env'.

    Envs need no cross-device traffic, so a flat axis is optimal: XLA
    lays gradient psum over it as ICI all-reduce within hosts and DCN
    across (the only collective in the program).
    """
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for anything with a leading env-batch axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for model/optimizer state (replicated everywhere)."""
    return NamedSharding(mesh, P())
