"""Minimal, dependency-free action/observation space classes.

The reference declares its spaces with OpenAI Gym (`gym.spaces.Box`,
`MultiDiscrete` — SURVEY.md §2.1 #2). Gym is not installed in this sandbox
(SURVEY.md §7.1 [ENV]) and pulling it in would add nothing on TPU, so we
provide the same tiny API surface: ``shape``, ``dtype``, ``sample(key)``
(JAX-native, batchable) and ``contains``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Space:
    shape: tuple
    dtype: np.dtype

    def sample(self, key: jax.Array) -> jax.Array:
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


class Box(Space):
    """Continuous box, same contract as gym.spaces.Box."""

    def __init__(self, low, high, shape=None, dtype=jnp.float32):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        self.shape = tuple(shape)
        self.low = jnp.broadcast_to(jnp.asarray(low, dtype), self.shape)
        self.high = jnp.broadcast_to(jnp.asarray(high, dtype), self.shape)
        self.dtype = dtype

    def sample(self, key: jax.Array) -> jax.Array:
        u = jax.random.uniform(key, self.shape, dtype=self.dtype)
        return self.low + u * (self.high - self.low)

    def contains(self, x) -> bool:
        x = jnp.asarray(x)
        return bool(
            x.shape == self.shape
            and jnp.all(x >= self.low)
            and jnp.all(x <= self.high)
        )

    def __repr__(self):
        return f"Box(shape={self.shape}, dtype={jnp.dtype(self.dtype).name})"


class Discrete(Space):
    def __init__(self, n: int):
        self.n = int(n)
        self.shape = ()
        self.dtype = jnp.int32

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (), 0, self.n, dtype=jnp.int32)

    def contains(self, x) -> bool:
        x = int(x)
        return 0 <= x < self.n

    def __repr__(self):
        return f"Discrete({self.n})"


class MultiDiscrete(Space):
    """Vector of independent discrete dims, same contract as gym's.

    The reference's joint action is per-agent discrete (SURVEY.md §2.1 #4):
    each player picks (direction in 5, act in 5); the joint space over
    2*ppt players is MultiDiscrete of shape [2*ppt, 2] here (kept 2-D for
    readability; flatten if a learner wants 1-D).
    """

    def __init__(self, nvec):
        self.nvec = np.asarray(nvec, dtype=np.int32)
        self.shape = self.nvec.shape
        self.dtype = jnp.int32

    def sample(self, key: jax.Array) -> jax.Array:
        u = jax.random.uniform(key, self.shape)
        return jnp.floor(u * jnp.asarray(self.nvec)).astype(jnp.int32)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            x.shape == self.shape and (x >= 0).all() and (x < self.nvec).all()
        )

    def __repr__(self):
        return f"MultiDiscrete({self.nvec.tolist()})"
