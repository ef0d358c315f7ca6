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


def init_distributed(force: bool = False, **kw) -> None:
    """Multi-host runtime bring-up. Call BEFORE any other JAX API.

    With explicit kwargs (coordinator_address/num_processes/process_id),
    ``force=True`` (auto-detect a TPU-pod/SLURM cluster environment, the
    ``train.py --distributed`` path), or ``JAX_COORDINATOR_ADDRESS`` set,
    wraps ``jax.distributed.initialize``. Otherwise it must stay a no-op
    WITHOUT touching the backend: querying ``jax.process_count()`` here
    would initialize XLA and make a later real initialize() impossible
    (covered by tests/test_multiprocess.py).
    """
    import os

    if kw or force or os.environ.get("JAX_COORDINATOR_ADDRESS"):
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
