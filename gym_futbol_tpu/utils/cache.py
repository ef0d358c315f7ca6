"""Persistent XLA compilation cache (SURVEY.md §5 observability/infra).

First TPU compile of a big scanned rollout costs minutes (remote-compile
RTT included); the persistent cache makes every subsequent process hit
disk instead. Call :func:`enable_compilation_cache` before the first jit
execution (safe to call anytime after ``import jax``).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(directory: str | None = None) -> str:
    directory = directory or os.environ.get(
        "GFT_COMPILATION_CACHE", DEFAULT_DIR
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    # Persist EVERY compile (not just >1s ones): under axon remote
    # compile, a wedged compile service (CLAUDE.md gotcha #5) hangs any
    # uncached program — tiny ones included — so a fully-populated cache
    # is what lets warm benches survive service outages.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return directory
