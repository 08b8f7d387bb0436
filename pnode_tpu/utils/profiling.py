"""Profiling hooks: trace capture and device-memory telemetry.

The reference profiles via NFE counters, wall-clock meters, and GPU memory
queries (SURVEY.md 5.1: torch.cuda.max_memory_allocated + nvidia-smi,
train-Cifar10.py:277-295). The TPU-native equivalents:

- ``trace(logdir)``: context manager around ``jax.profiler`` trace capture
  (view with TensorBoard / xprof). Drivers enable it with
  ``-pnode_profile <logdir>``.
- ``device_memory_gb()``: peak/live device memory from the backend's
  allocator stats (the nvidia-smi analogue).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

from ..options import Options


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture a profiler trace if a logdir is given or -pnode_profile set."""
    if logdir is None:
        logdir = Options().get_string("pnode_profile")
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def device_memory_gb(device=None) -> dict:
    """{'peak_gb': ..., 'live_gb': ...} from allocator stats (0.0 if the
    backend does not expose them, e.g. CPU)."""
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "peak_gb": stats.get("peak_bytes_in_use", 0) / 1e9,
        "live_gb": stats.get("bytes_in_use", 0) / 1e9,
    }


def annotate(name: str):
    """Named profiler region (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)
