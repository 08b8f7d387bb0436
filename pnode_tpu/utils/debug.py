"""Failure detection and debug dumps.

Rebuild of the reference's failure-handling spirit (SURVEY.md 5.3):
- ``ksp.setErrorIfNotConverged`` + binary dump of the failing operator/RHS
  (/root/reference/pnode/hpddm_linearsolve.py:4,18,42-47) becomes
  ``assert_converged`` + ``dump_state`` (.npz) driven by the
  ``-pnode_dump_on_failure`` runtime flag;
- NaN/Inf loss guards that break the training loop
  (/root/reference/examples-sinode/Burgers/Burgers.py:502,548) become
  ``nan_guard``.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import jax
import numpy as np

from ..options import Options


class SolverDivergedError(RuntimeError):
    pass


def dump_state(path_prefix: str, **arrays) -> str:
    """Save named arrays to an .npz next to a timestamp (the PETSc binary-
    viewer dump equivalent)."""
    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    path = f"{path_prefix}_{int(time.time())}.npz"
    np.savez_compressed(
        path, **{k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
    )
    return path


def assert_converged(stats, context: str = "", dump: Optional[dict] = None):
    """Host-sync the solver stats; raise (and optionally dump) on divergence.

    Enable dumps with ``-pnode_dump_on_failure <path_prefix>``.
    """
    converged = bool(jax.device_get(stats.newton_converged))
    if converged:
        return
    opts = Options()
    prefix = opts.get_string("pnode_dump_on_failure")
    msg = f"nonlinear solver failed to converge ({context})"
    if prefix and dump:
        path = dump_state(prefix, **dump)
        msg += f"; state dumped to {path}"
    raise SolverDivergedError(msg)


def nan_guard(value, context: str = "loss") -> float:
    """Return float(value); raise on NaN/Inf (the training-loop break guard)."""
    v = float(jax.device_get(value))
    if math.isnan(v) or math.isinf(v):
        raise FloatingPointError(f"{context} is {v}")
    return v
