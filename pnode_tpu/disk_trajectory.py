"""Disk-backed trajectory storage (-ts_trajectory_type disk).

PETSc TSTrajectory's DEFAULT is disk storage (the reference's examples
always override it to memory — SURVEY.md 5.4); the capability matters for
trajectories too large for device memory. Here each forward step streams the
step-start state to a host-side memmap via ``jax.experimental.io_callback``
(ordered), and the reverse sweep reads it back per step — trading host I/O
for O(1) device-memory trajectory footprint, exactly the PETSc trade.

The memmap lives under ``-ts_trajectory_dirname`` (default ./ts_trajectory).
One buffer per compiled solve; forward and backward of a given call must not
interleave with another solve using the same buffer (PETSc's disk trajectory
has the same single-stream semantics).

Note: host callbacks require a backend with host-callback support; the CPU
backend is always fine (CI-tested). The axon-tunneled TPU in this sandbox
does not support them — use the in-memory policies (checkpoint/revolve give
the same memory relief without host I/O) on that backend.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Tuple

import numpy as np

_LOCK = threading.Lock()
_BUFFERS: Dict[int, np.memmap] = {}
_NEXT_ID = [0]


def new_buffer_id() -> int:
    with _LOCK:
        _NEXT_ID[0] += 1
        return _NEXT_ID[0]


def _ensure(buf_id: int, n_steps: int, shape: Tuple[int, ...], dtype,
            dirname: str) -> np.memmap:
    buf = _BUFFERS.get(buf_id)
    full_shape = (n_steps,) + tuple(shape)
    if buf is None or buf.shape != full_shape or buf.dtype != np.dtype(dtype):
        os.makedirs(dirname, exist_ok=True)
        path = os.path.join(dirname, f"traj_{buf_id:04d}.bin")
        buf = np.memmap(path, dtype=np.dtype(dtype), mode="w+",
                        shape=full_shape)
        _BUFFERS[buf_id] = buf
    return buf


def write_step(buf_id: int, n_steps: int, dirname: str, k, y) -> np.ndarray:
    """Host callback: store state y at step index k."""
    buf = _ensure(buf_id, n_steps, y.shape, y.dtype, dirname)
    buf[int(k)] = np.asarray(y)
    return np.zeros((), np.int32)  # io_callback needs a concrete result


def read_step(buf_id: int, k, template: np.ndarray) -> np.ndarray:
    """Host callback: load the state stored at step index k."""
    buf = _BUFFERS.get(buf_id)
    if buf is None:
        raise RuntimeError(
            f"disk trajectory buffer {buf_id} missing — backward called "
            "without a forward pass?"
        )
    return np.asarray(buf[int(k)], dtype=template.dtype)
