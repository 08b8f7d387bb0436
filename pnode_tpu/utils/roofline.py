"""Roofline accounting: XLA cost analysis -> MFU / HBM-bandwidth fractions.

Converts "fast vs last round" into "fast vs physics": every benchmark
reports what fraction of the chip's peak FLOP rate (MFU) and peak HBM
bandwidth the measured throughput corresponds to, from the compiled
program's own cost analysis (``compiled.cost_analysis()``). The reference
publishes no such numbers (SURVEY.md section 6); on TPU this is the
first-class performance contract.

Also hosts the persistent-compilation-cache switch: XLA compile time is a
first-class TPU cost (the round-2 headline config paid 480 s per cold
start), so benchmarks and drivers opt into ``jax_compilation_cache_dir``
and report cold/warm compile seconds.
"""

from __future__ import annotations

import os
from typing import Optional

# chip peaks: (dense matmul FLOP/s at the native MXU dtype, HBM bytes/s).
# v5e (aka "v5 lite"): 197 TFLOP/s bf16, 819 GB/s HBM (public TPU v5e specs;
# fp32-accumulated bf16 matmuls run at the same MXU rate).
_PEAKS = {
    "v5e": (197e12, 819e9),
    "v5 lite": (197e12, 819e9),
    "v4": (275e12, 1228e9),
    "v5p": (459e12, 2765e9),
    "v6e": (918e12, 1640e9),
}


def device_peaks(device=None) -> Optional[tuple]:
    """(peak_flops, peak_hbm_bytes_per_s) for the given/default device, or
    None when the device kind is unknown (CPU, emulators)."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return None


def cost_analysis(compiled) -> dict:
    """Normalize ``compiled.cost_analysis()`` across jax versions to a dict
    with at least {"flops": float, "bytes": float} (0.0 when the backend
    reports nothing)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not isinstance(ca, dict):
        return {"flops": 0.0, "bytes": 0.0}
    flops = float(ca.get("flops", 0.0) or 0.0)
    byts = float(ca.get("bytes accessed", 0.0) or 0.0)
    return {"flops": flops, "bytes": byts, "raw": ca}


def roofline(compiled, rate_per_s: float, work_per_program: int = 1,
             device=None, extra_flops_per_unit: float = 0.0,
             extra_bytes_per_unit: float = 0.0) -> dict:
    """Roofline fractions for a compiled program dispatched at
    ``rate_per_s * work_per_program`` logical units per second.

    ``extra_*_per_unit`` add analytic per-unit costs that XLA's analysis
    cannot see (Pallas kernels = custom calls reporting zero flops; the
    kernel modules export fused_ark_{fwd,adj}_cost estimators).

    Returns {flops_per_unit, hbm_bytes_per_unit, mfu, hbm_frac}; the
    fractions are None when the device peaks are unknown or the total
    flops are zero.
    """
    ca = cost_analysis(compiled)
    w = max(1, int(work_per_program))
    flops_u = ca["flops"] / w + float(extra_flops_per_unit)
    bytes_u = ca["bytes"] / w + float(extra_bytes_per_unit)
    peaks = device_peaks(device)
    out = {
        "flops_per_unit": flops_u,
        "hbm_bytes_per_unit": bytes_u,
        "mfu": None,
        "hbm_frac": None,
    }
    if peaks is not None and flops_u > 0:
        peak_f, peak_b = peaks
        out["mfu"] = flops_u * rate_per_s / peak_f
        out["hbm_frac"] = bytes_u * rate_per_s / peak_b
    return out


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             tpu_only: bool = True) -> Optional[str]:
    """Turn on JAX's persistent compilation cache (idempotent).

    Default location: $PNODE_COMPILATION_CACHE or ~/.cache/pnode_tpu_xla.
    Returns the directory used, or None when skipped. By default only
    active on TPU backends: that is where compile time is the real cost
    (480 s cold for the round-2 headline config), while XLA:CPU AOT cache
    entries warn about machine-feature mismatches across processes."""
    import jax

    if tpu_only:
        # Decide from the *configured* platform string WITHOUT initializing
        # the backend: jax.default_backend() here would bring up the axon
        # tunnel (30-600 s) inside pnode_tpu.init(), before a driver's
        # --cpu flag can run jax.config.update("jax_platforms", "cpu") —
        # observed as every CPU driver hanging in round 4. Only fall back
        # to a real backend query when no platform hint exists at all.
        plats = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS", ""))
        if plats:
            if not any(p in plats for p in ("tpu", "axon")):
                return None
        elif jax.default_backend() not in ("tpu", "axon"):
            return None
    cache_dir = (
        cache_dir
        or os.environ.get("PNODE_COMPILATION_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "pnode_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program (default min compile time 1 s skips small jits;
    # the drivers re-jit many small programs whose compiles add up)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except AttributeError:  # older jax
        pass
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass
    return cache_dir
