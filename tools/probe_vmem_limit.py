"""Probe the chip's real VMEM capacity vs Mosaic's default scoped limit.

Round-3 finding: the Burgers-512 fused training-loop kernel was rejected by
Mosaic with "scoped VMEM 33.76 MB vs 16 MB limit". 16 MB is Mosaic's
DEFAULT budget, not necessarily the physical VMEM of the chip —
pltpu.CompilerParams(vmem_limit_bytes=...) raises it. This probe binary-
searches the largest single-kernel resident set that actually compiles and
runs, which decides whether the Burgers-512 fused loop and the CIFAR
whole-chain dynamics kernel can simply raise the limit instead of
streaming.

Usage: python tools/probe_vmem_limit.py [--limit_mb 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def try_size(mb: float, limit_mb: float) -> bool:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # kernel holds IN + OUT + SCRATCH, all VMEM-resident: total = 3 bufs
    n_rows = max(8, int(mb * 2**20 / 3 / (128 * 4)) // 8 * 8)
    shape = (n_rows, 128)
    real_mb = 3 * n_rows * 128 * 4 / 2**20

    def kernel(x_ref, o_ref, scratch):
        scratch[:] = x_ref[:] * 2.0
        o_ref[:] = scratch[:] + x_ref[:]

    x = jnp.ones(shape, jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(limit_mb * 2**20)
            ),
        )(x)
        ok = bool(jnp.all(out == 3.0))
        print(f"  resident {real_mb:6.1f} MB: {'OK' if ok else 'WRONG RESULT'}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  resident {real_mb:6.1f} MB: FAIL ({msg})")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit_mb", type=float, default=128.0)
    args = ap.parse_args()
    import jax

    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    lo, hi = 8.0, None
    for mb in (12, 16, 24, 32, 48, 64, 96, 120):
        if try_size(mb, args.limit_mb):
            lo = mb
        else:
            hi = mb
            break
    print(f"largest working resident set: ~{lo} MB"
          + (f" (fails at {hi} MB)" if hi else " (never failed)"))


if __name__ == "__main__":
    main()
