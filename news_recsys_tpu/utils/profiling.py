"""Tracing / profiling hooks (the reference has none — SURVEY §5.1).

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA ops, fusion, HBM transfers);
- :class:`StepTimer` — lightweight per-step wall-clock stats with
  examples/sec percentiles, written to ``metrics.jsonl``-style dicts;
- :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from .logging import get_logger

logger = get_logger("profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {log_dir}")


class StepTimer:
    """Collect per-step durations; report throughput percentiles."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self.durations.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "step_ms_p50": float(np.percentile(d, 50) * 1e3),
            "step_ms_p95": float(np.percentile(d, 95) * 1e3),
            "step_ms_mean": float(d.mean() * 1e3),
            "examples_per_sec": float(self.batch_size / d.mean()),
        }


def device_memory_stats() -> List[Dict[str, float]]:
    out = []
    for dev in jax.devices():
        try:
            stats = dev.memory_stats() or {}
            out.append({
                "device": str(dev),
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            })
        except Exception:
            out.append({"device": str(dev)})
    return out
