"""Tracing / profiling helpers (SURVEY.md §5: jax.profiler + Perfetto,
block_until_ready walls, per-kernel cost via compiled cost_analysis)."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import jax


@contextlib.contextmanager
def timed(label: str = "", sync: Any = None) -> Iterator[dict]:
    """Wall-clock a block; blocks on ``sync`` (array/pytree) before
    stopping the clock so device work is included."""
    box = {"label": label, "seconds": None}
    t0 = time.perf_counter()
    yield box
    if sync is not None:
        jax.block_until_ready(sync)
    box["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """jax.profiler trace (view with Perfetto / TensorBoard)."""
    with jax.profiler.trace(log_dir):
        yield


def cost_analysis(fn: Callable, *args, **kw) -> dict:
    """FLOP/byte estimates for a jittable fn at the given example args."""
    lowered = jax.jit(fn).lower(*args, **kw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}
