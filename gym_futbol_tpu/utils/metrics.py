"""Metrics / logging / observability (SURVEY.md §5).

The reference's observability is the ``info`` dict plus prints. Here
training metrics flow through a structured writer: JSON-lines always
(machine-readable, zero deps), TensorBoard when flax's summary writer is
available. Device arrays are fetched once per log call, never inside jit.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, IO, Mapping

import jax


def _to_python(v: Any) -> Any:
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return None
    return v


class MetricsLogger:
    """JSONL (+ optional TensorBoard) metrics writer.

    Usage::

        log = MetricsLogger("runs/exp1")
        log.write(step, {"loss": ..., "mean_reward": ...})
        log.close()
    """

    def __init__(self, directory: str | None = None, tensorboard: bool = True):
        self._t0 = time.time()
        self._jsonl: IO[str] | None = None
        self._tb = None
        if directory:
            os.makedirs(directory, exist_ok=True)
            self._jsonl = open(os.path.join(directory, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    from flax.metrics.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(directory, "tb"))
                except Exception:
                    self._tb = None  # TB stack absent: JSONL still works

    def write(self, step: int, metrics: Mapping[str, Any]) -> dict:
        vals = {
            k: _to_python(v) for k, v in jax.device_get(dict(metrics)).items()
        }
        record = {"step": step, "wall_s": round(time.time() - self._t0, 3), **vals}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in vals.items():
                if isinstance(v, (int, float)):
                    self._tb.scalar(k, v, step)
        return record

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
