"""Fused ARK-IMEX FORWARD-step Pallas kernel (companion to
fused_ark_adjoint.py).

After the fused reverse step, the forward solve became the larger half of
the KS training step (~0.74 of 0.98 ms): per ARK stage it still launches a
fused-MLP kernel plus ~10 XLA ops (stage AXPYs, the ksponly linearized
solve, stencil applies). This kernel runs the WHOLE step — all stages, the
single linearized solve per implicit stage against the pre-inverted frozen
operator, the linear implicit applies, and the explicit MLP evaluations —
in ONE pallas_call with weights resident in VMEM.

Scope (gated by the same conditions as the fused reverse, PLUS ksponly):
``-snes_type ksponly`` + frozen shared dense J + CERTIFIED-LINEAR implicit
part + explicit part = sign * MLP + uniform dt. For a linear f_im the
single linearized ksponly step is EXACT Newton, so:

    for i = 0..s-1:
        G_i = y + dt sum_{j<i} (aI_ij kI_j + aE_ij kE_j)
        if aI_ii != 0:
            r   = -dt aI_ii * f_im(G_i)          # residual at z0 = G_i
            Y_i = G_i - inv_op @ r               # one solve, exact
        else:
            Y_i = G_i
        kI_i = f_im(Y_i) = Y_i J^T ;  kE_i = sign * MLP(Y_i)
    y1 = y + dt sum_i (bI_i kI_i + bE_i kE_i)

Outputs y1 and the stacked stage values (the trajectory aux payload).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_mlp import _ACTS, _pad2, _round_up
from .vmem import resident_budget_bytes, tpu_compiler_params
from .fused_ark_adjoint import (
    _stiff_dot, fused_ark_fits, resolve_stiff_precision,
)


def _kernel(s, n_layers, act_name, aI, aE, bI, bE, dI, dE, sign, stiff_prec,
            dt_ref, y_ref, jf_ref, invf_ref, *refs):
    """refs = [W1, b1, ..., Wn, bn, y1_ref, ys_ref[, err_ref]].

    ``dI``/``dE`` are the embedded-error weight differences
    (b - b_err); when not None the kernel also emits the embedded error
    estimate err = dt * sum_i (dI_i kI_i + dE_i kE_i) for the adaptive
    controller (-ts_adapt_type basic through the fused path)."""
    act = _ACTS[act_name]
    y1_ref = refs[2 * n_layers]
    ys_ref = refs[2 * n_layers + 1]
    err_ref = refs[2 * n_layers + 2] if dI is not None else None
    dt = dt_ref[0, 0]
    y = y_ref[:]
    jf = jf_ref[:]      # J^T: f_im(x) = x @ jf
    invf = invf_ref[:]  # inv_op^T: solve(r) = r @ invf

    def mlp(x):
        h = x
        for l in range(n_layers):
            W = refs[2 * l][:]
            b = refs[2 * l + 1][:]
            # bf16 weight storage: MXU-native bf16 dot with f32 accumulate
            h = jnp.dot(h.astype(W.dtype), W,
                        preferred_element_type=jnp.float32) + b
            if l < n_layers - 1:
                h = act(h)
        return h

    kI = [None] * s
    kE = [None] * s
    y1 = y
    err = jnp.zeros_like(y) if err_ref is not None else None
    for i in range(s):
        G = y
        for j in range(i):
            if aI[i][j] != 0.0:
                G = G + (dt * aI[i][j]) * kI[j]
            if aE[i][j] != 0.0:
                G = G + (dt * aE[i][j]) * kE[j]
        if aI[i][i] != 0.0:
            # raised precision: these operators are STIFF (||J|| ~ 1/dx^4
            # for the PDE stencils); the TPU's default single-pass bf16 dot
            # loses ~0.4% per apply, which compounds across stages into an
            # O(1)-wrong step (found on hardware: KS training plateaued
            # while every CPU test passed — CPU dots are exact fp32).
            # stiff_prec defaults to HIGHEST (fp32, 6-pass); see
            # stiff_dot_precision for the -pnode_fused_ark_precision knob.
            #
            # For linear f_im with the exact pre-inverted operator the
            # ksponly residual-correction G - inv(..)@((-dt a_ii)(G@J))
            # is ALGEBRAICALLY the direct solve Yi = G @ inv — one stiff
            # dot instead of two — and the stage equation gives
            # kI = J Yi = (Yi - G)/(dt a_ii) with no further J apply:
            # 10 HIGHEST dots per ARK3 step collapse to 4 (round 3).
            Yi = _stiff_dot(G, invf, stiff_prec)
            # dt=0 identity steps (adaptive masked trials, checkpoint
            # padding): Yi == G there, so kI's value is irrelevant but
            # must stay FINITE — guard the 1/dt
            inv_dt = jnp.where(dt == 0.0, 0.0, 1.0 / (dt * aI[i][i]))
            kI[i] = (Yi - G) * inv_dt
        else:
            Yi = G
            kI[i] = _stiff_dot(Yi, jf, stiff_prec)
        ys_ref[i] = Yi.astype(ys_ref.dtype)
        kE[i] = sign * mlp(Yi)
        if bI[i] != 0.0:
            y1 = y1 + (dt * bI[i]) * kI[i]
        if bE[i] != 0.0:
            y1 = y1 + (dt * bE[i]) * kE[i]
        if err is not None:
            if dI[i] != 0.0:
                err = err + (dt * dI[i]) * kI[i]
            if dE[i] != 0.0:
                err = err + (dt * dE[i]) * kE[i]
    y1_ref[:] = y1.astype(y1_ref.dtype)
    if err_ref is not None:
        err_ref[:] = err.astype(err_ref.dtype)


def fused_ark_fwd_cost(tableau_static, B, d, layer_dims):
    """Analytic (flops, hbm_bytes) per fused forward-step call, counting the
    MXU dots at LOGICAL (unpadded) sizes — the useful-work convention for
    MFU. Pallas kernels surface as XLA custom calls that report zero cost,
    so benchmarks add this to ``compiled.cost_analysis()`` totals.

    Per stage: ONE stiff dot (direct inverse apply for implicit stages /
    J apply for explicit ones — the round-3 algebraic collapse, see
    _kernel) + kE = MLP (sum_l 2*B*w_l*w_{l+1}); kI on implicit stages is
    a free AXPY. HBM traffic: operators/weights read once per call
    (VMEM-resident across the batch grid), y in, y1 + s stage values out.
    """
    aI, _, bI, _ = tableau_static
    s = len(bI)
    dims = [d] + list(layer_dims)
    mlp = sum(2 * B * a * b for a, b in zip(dims, dims[1:]))
    flops = 0
    for i in range(s):
        flops += 2 * B * d * d + mlp
    w_elems = sum(a * b + b for a, b in zip(dims, dims[1:]))
    byts = 4 * (2 * d * d + w_elems + B * d * (2 + s))
    return flops, byts


def fused_ark_step_fwd(
    tableau_static,
    dt,
    y: jnp.ndarray,        # (B, d)
    J_dense: jnp.ndarray,  # (d, d)
    inv_op: jnp.ndarray,   # (d, d) (I - dt*gamma*J)^{-1}
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    activation: str = "relu",
    sign: float = -1.0,
    interpret: bool = False,
    b_err=None,
    weight_dtype: str = "f32",
    stiff_prec: str = None,
) -> Tuple[jnp.ndarray, ...]:
    """One fused forward ARK step. Returns (y1, Ys stacked (s, B, d)), or
    (y1, err, Ys) when ``b_err = (b_im_err, b_ex_err)`` is given (the
    embedded pair driving -ts_adapt_type basic)."""
    aI, aE, bI, bE = tableau_static
    s = len(bI)
    B, d = y.shape
    n_layers = len(weights)
    dims = [d] + [int(w.shape[1]) for w in weights]
    pdims = [_round_up(x, 128) for x in dims]
    P = pdims[0]
    maxP = max(pdims)

    if not fused_ark_fits(d, dims[1:], with_grad_accumulators=False,
                          weight_dtype=weight_dtype):
        raise ValueError("fused ARK forward step does not fit VMEM")

    wb = 2 if weight_dtype == "bf16" else 4
    budget = resident_budget_bytes() + 2 * 2**20
    fixed = (wb * sum(pi * pj for pi, pj in zip(pdims, pdims[1:]))
             + 4 * sum(pdims[1:])
             + 4 * 2 * P * P)
    per_row = 4 * (3 * s * P + 2 * maxP + 6 * P)
    if b_err is not None:
        # embedded path: err accumulator + the extra (Bt, P) output block
        per_row += 4 * 2 * P
    Bt = max(8, min(_round_up(B, 8), ((budget - fixed) // per_row) // 8 * 8))
    Bp = _round_up(B, Bt)
    n_tiles = Bp // Bt

    y_p = _pad2(y, Bp, P)
    # row-vector forward applies need the TRANSPOSED operators
    jf_p = _pad2(J_dense.T, P, P)
    invf_p = _pad2(inv_op.T, P, P)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    flat = []
    wdt = jnp.bfloat16 if weight_dtype == "bf16" else None
    for i, (w, b) in enumerate(zip(weights, biases)):
        wp = _pad2(w, pdims[i], pdims[i + 1])
        flat.append(wp if wdt is None else wp.astype(wdt))
        flat.append(_pad2(b.reshape(1, -1), 1, pdims[i + 1]))

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((Bt, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        const(jf_p),
        const(invf_p),
    ] + [const(a) for a in flat]
    out_shapes = [
        jax.ShapeDtypeStruct((Bp, P), y.dtype),
        jax.ShapeDtypeStruct((s, Bp, P), y.dtype),
    ]
    row_spec = pl.BlockSpec((Bt, P), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [
        row_spec,
        pl.BlockSpec((s, Bt, P), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if b_err is not None:
        bIe, bEe = b_err
        dI = tuple(float(bI[i]) - float(bIe[i]) for i in range(s))
        dE = tuple(float(bE[i]) - float(bEe[i]) for i in range(s))
        out_shapes.append(jax.ShapeDtypeStruct((Bp, P), y.dtype))
        out_specs.append(row_spec)
    else:
        dI = dE = None
    kern = functools.partial(
        _kernel, s, n_layers, activation,
        tuple(tuple(float(x) for x in row) for row in aI),
        tuple(tuple(float(x) for x in row) for row in aE),
        tuple(float(x) for x in bI),
        tuple(float(x) for x in bE),
        dI, dE,
        float(sign),
        # callers that resolve from the un-indexed frozen constants pass
        # stiff_prec; direct calls resolve from the operands (which are
        # concrete outside a trace)
        stiff_prec or resolve_stiff_precision(J_dense, inv_op, n_applies=s),
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        **({} if interpret else
           {"compiler_params": tpu_compiler_params()}),
    )(dt_arr, y_p, jf_p, invf_p, *flat)
    if b_err is not None:
        y1_p, ys_p, err_p = outs
        return y1_p[:B, :d], err_p[:B, :d], ys_p[:, :B, :d]
    y1_p, ys_p = outs
    return y1_p[:B, :d], ys_p[:, :B, :d]
