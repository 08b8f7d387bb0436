"""Central VMEM budget for the fused Pallas kernels.

Measured (tools/probe_vmem_limit.py, RESULTS.md round 4): the TPU v5e
chip runs single-program kernels with up to ~120 MB of VMEM-resident
buffers once ``pltpu.CompilerParams(vmem_limit_bytes=...)`` is raised —
the 16 MB "scoped VMEM limit" that gated round-3's Burgers-512 fused
kernels was Mosaic's conservative DEFAULT, not hardware (v5e physical
VMEM = 128 MiB).

Two knobs derive from one runtime option ``-pnode_vmem_mb`` (default
100, leaving headroom below the physical 128):

- ``vmem_limit_bytes()`` — passed to every fused kernel's
  CompilerParams so Mosaic may actually use the capacity.
- ``resident_budget_bytes()`` — the value the kernels' FEASIBILITY
  MODELS compare against. The analytic models track the *resident* set;
  Mosaic's true scoped demand measured ~2.6x the resident model at the
  one calibrated point (Burgers-512 reverse: modeled 12.8 MB, actual
  33.76 MB — per-tile live values, double buffering), so the budget is
  limit/3.
"""

from __future__ import annotations

import functools


def _vmem_mb() -> int:
    from ..options import Options

    return int(Options().get_int("pnode_vmem_mb", 100))


def vmem_limit_bytes() -> int:
    return _vmem_mb() * 2**20


def resident_budget_bytes() -> int:
    """Budget for resident-set feasibility models (limit / 3 — see
    module docstring for the calibration)."""
    return vmem_limit_bytes() // 3


def loop_budget_bytes() -> int:
    """Budget for the fused TRAIN-LOOP feasibility model, which already
    counts streamed minibatch blocks and live temporaries explicitly —
    so it compares against 70% of the raw limit (headroom for Mosaic's
    double-buffering), not the /3 resident calibration."""
    return int(vmem_limit_bytes() * 0.7)


def tpu_compiler_params():
    """CompilerParams with the raised VMEM limit (None off-TPU import)."""
    try:
        from jax.experimental.pallas import tpu as pltpu
    except Exception:  # pragma: no cover
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes())
