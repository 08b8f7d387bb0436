"""Fused periodic-stencil Pallas kernel with custom VJP.

The SINODE implicit operators are short circular stencils (3-point Burgers
Laplacian, 5-point KS biharmonic — models/sinode.py). XLA evaluates the
roll-chain as several fused groups; on the op-latency-bound KS step each
group costs dispatch latency in both the forward solve and the adjoint's
VJPs. One VMEM-resident kernel applies the whole stencil (and its transpose)
in a single op.

out[..., i] = sum_j w[j] * y[..., (i + j - k//2) mod N]   (cross-correlation,
matching models.sinode.circular_stencil_apply). The VJP wrt y is the flipped
stencil; wrt w it is a k-vector of shifted inner products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(y, shift):
    """pltpu.roll with negative shifts mapped mod N (it requires shift >= 0)."""
    n = y.shape[1]
    return pltpu.roll(y, shift % n, axis=1)


def _fwd_kernel(k, y_ref, w_ref, out_ref):
    half = k // 2
    y = y_ref[:]
    acc = w_ref[0, 0] * _roll(y, half)
    for j in range(1, k):
        acc = acc + w_ref[0, j] * _roll(y, half - j)
    out_ref[:] = acc


def _bwd_kernel(k, y_ref, g_ref, w_ref, dy_ref, dw_ref):
    half = k // 2
    y = y_ref[:]
    g = g_ref[:]
    # dy: transpose of the correlation = rolls in the opposite direction
    dy = w_ref[0, 0] * _roll(g, -half)
    for j in range(1, k):
        dy = dy + w_ref[0, j] * _roll(g, j - half)
    dy_ref[:] = dy
    # dw[j] = sum(g * roll(y, half - j))
    for j in range(k):
        dw_ref[0, j] = jnp.sum(g * _roll(y, half - j))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _stencil_core(y2, w2, k, interpret):
    return _call_fwd(y2, w2, k, interpret)


def _call_fwd(y2, w2, k, interpret):
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k),
        out_shape=jax.ShapeDtypeStruct(y2.shape, y2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y2, w2)


def _core_fwd(y2, w2, k, interpret):
    return _call_fwd(y2, w2, k, interpret), (y2, w2)


def _core_bwd(k, interpret, res, g):
    y2, w2 = res
    dy, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        out_shape=(
            jax.ShapeDtypeStruct(y2.shape, y2.dtype),
            jax.ShapeDtypeStruct(w2.shape, w2.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(y2, g, w2)
    return dy, dw


_stencil_core.defvjp(_core_fwd, _core_bwd)


def circular_stencil(y: jnp.ndarray, kernel: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Periodic cross-correlation along the last axis, one Pallas kernel.

    y: (..., N); kernel: (k,). Differentiable wrt both (reverse mode). N
    should be a multiple of 128 for best TPU layout (the KS/Burgers grids
    are 64/512; 64 is padded internally by Mosaic).

    LIMITATION: as a custom_vjp op it cannot be forward-mode differentiated
    (jax.jvp / jacfwd) — don't use it inside dynamics whose Jacobian is
    assembled (fixed_jacobian dense solvers) or GMRES jvp operators; the
    roll-chain path (models.sinode.circular_stencil_apply) covers those.
    """
    k = int(kernel.shape[0])
    batch_shape = y.shape[:-1]
    n = y.shape[-1]
    y2 = y.reshape(-1, n)
    w2 = kernel.reshape(1, k).astype(y.dtype)
    out = _stencil_core(y2, w2, k, bool(interpret))
    return out.reshape(batch_shape + (n,))
