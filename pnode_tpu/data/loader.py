"""Windowed-minibatch loader: native prefetching backend + numpy fallback.

The runtime data-path component: the reference trains the PDE examples from
a torch DataLoader over a windowed dataset (DistFuncDataset,
/root/reference/examples-sinode/KS/KS.py:226-255) whose batch assembly and
pinned-memory staging run in native code. Here ``csrc/windowed_loader.cpp``
(built to libwindowed_loader.so) assembles shuffled (y0, targets) batches on
a background thread into a staging ring, overlapping host batch prep with
device compute; ``WindowedLoader`` falls back to in-process numpy when the
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..",
                        "libwindowed_loader.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
        if os.path.exists(os.path.join(csrc, "windowed_loader.cpp")):
            os.system(f"make -s -C {csrc} >/dev/null 2>&1")
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.wl_create.restype = ctypes.c_void_p
        lib.wl_create.argtypes = [fp, ctypes.c_long, ctypes.c_long,
                                  ctypes.c_long, ctypes.c_long,
                                  ctypes.c_ulong, ctypes.c_int]
        lib.wl_batches_per_epoch.restype = ctypes.c_long
        lib.wl_batches_per_epoch.argtypes = [ctypes.c_void_p]
        lib.wl_next.restype = ctypes.c_long
        lib.wl_next.argtypes = [ctypes.c_void_p, fp, fp]
        lib.wl_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


class WindowedLoader:
    """Iterate shuffled windowed minibatches of a trajectory array.

    u: (N, dim) float array; yields (y0 (B, dim), targets (B, n_tgt, dim))
    with n_tgt = 1 (endpoint_only) or window. One iteration = one epoch.
    """

    def __init__(self, u: np.ndarray, window: int, batch: int,
                 seed: int = 0, endpoint_only: bool = False,
                 use_native: Optional[bool] = None):
        self.u = np.ascontiguousarray(u, dtype=np.float32)
        self.window = int(window)
        self.batch = int(batch)
        self.seed = int(seed)
        self.endpoint_only = bool(endpoint_only)
        self.n_tgt = 1 if endpoint_only else self.window
        n = self.u.shape[0]
        self.batches_per_epoch = max(0, (n - self.window) // self.batch)
        lib = _load() if (use_native or use_native is None) else None
        self._h = None
        self._lib = None
        if lib is not None and use_native is not False and (
            self.batches_per_epoch > 0
        ):
            fp = ctypes.POINTER(ctypes.c_float)
            h = lib.wl_create(
                self.u.ctypes.data_as(fp), n, self.u.shape[1], self.window,
                self.batch, self.seed, int(self.endpoint_only),
            )
            if h:
                self._h = h
                self._lib = lib
        elif use_native:
            raise RuntimeError("native loader requested but unavailable")
        self._rng = np.random.default_rng(self.seed)

    @property
    def native(self) -> bool:
        return self._h is not None

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        dim = self.u.shape[1]
        if self._h is not None:
            y0 = np.empty((self.batch, dim), np.float32)
            tgt = np.empty((self.batch, self.n_tgt, dim), np.float32)
            fp = ctypes.POINTER(ctypes.c_float)
            for _ in range(self.batches_per_epoch):
                self._lib.wl_next(
                    self._h, y0.ctypes.data_as(fp), tgt.ctypes.data_as(fp)
                )
                yield y0.copy(), tgt.copy()
            return
        starts = self._rng.permutation(self.u.shape[0] - self.window)
        for b in range(self.batches_per_epoch):
            s = starts[b * self.batch:(b + 1) * self.batch]
            y0 = self.u[s]
            if self.endpoint_only:
                tgt = self.u[s + self.window][:, None]
            else:
                tgt = np.stack(
                    [self.u[s + 1 + j] for j in range(self.window)], axis=1
                )
            yield y0, tgt

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.wl_destroy(self._h)
            self._h = None
