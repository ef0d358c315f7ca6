"""Test configuration: virtual 8-device CPU mesh (SURVEY.md §4.2 item 4).

The sandbox has exactly one TPU chip; all multi-device/sharding logic is
validated on fake CPU devices via --xla_force_host_platform_device_count.
This must be set before jax initializes, hence the env mutation at import
time (pytest imports conftest before test modules import jax).
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the sandbox sets
# axon for the real chip; tests always use the fake 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The sandbox's sitecustomize imports jax at interpreter startup (to
# register the axon TPU plugin), so jax snapshots JAX_PLATFORMS=axon
# before this file's env mutation runs. Backends are not initialized
# until the first device query, so overriding the config here still
# takes effect.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"tests need the fake 8-device CPU mesh, got {jax.devices()}"
)

from gym_futbol_tpu.utils.cache import enable_compilation_cache  # noqa: E402

# Persistent XLA compile cache: the physics program's compile cost grows
# steeply with body count (5v5 ~3min on CPU); pay it once per machine.
enable_compilation_cache()


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
