"""Data-parallel composition of the fused training-loop kernel.

The single-chip fused loop (ops/fused_train_loop.py) keeps K complete
training iterations — forward ARK-IMEX step, stage-exact reverse sweep,
Adam — inside ONE Pallas kernel with the weights and Adam moments
VMEM-resident. Exact synchronous data parallelism needs a cross-device
gradient reduction BEFORE each Adam update, so when the batch is sharded
the iteration boundary must come back out of the kernel. This module is
that composition, built to keep everything else the fused loop won:

    shard_map over the mesh's "dp" axis (batch sharded, params replicated)
    └─ lax.scan over the K iterations (ONE dispatch per launch, like the
       single-chip loop — the host round-trip is still amortized)
       └─ per iteration:
          1. `fused_grad_step` — ONE Pallas kernel per device computing
             the complete forward+reverse sweep on the local shard and
             emitting the STACKED gradient blocks (same (R, maxP) /
             (Rb, maxP) layout the loop kernel keeps resident);
          2. `lax.pmean` of (loss, dWstack, dbstack) over the dp axis —
             the only ICI traffic, one fused allreduce of ~R*maxP floats;
          3. the stacked Adam update as ~12 large XLA VPU ops (the
             round-3 stacked-layout lesson: per-layer Adam was latency-
             bound on op count, stacked Adam is a handful of big ops).

    Parameters stay bit-identical across devices: every device applies
    the same update to the same replicated state.

Cost model vs the single-chip fused loop: the kernel no longer carries
weights in registers across iterations (one VMEM read/write of the stacks
per iteration) and each iteration pays one kernel launch + one allreduce
+ the XLA Adam glue instead of amortizing the ~8 us sequencer cost over a
32-iteration chunk. That is the price of exact DP semantics; per-device
throughput is bounded by the scanned per-step-fused path (~71k steps/s at
the KS config) rather than the 125k single-chip loop, and scales with the
mesh. `bench.py --dp N` rides this path; tests/test_fused_dp.py asserts
gradient/parameter equality with the single-chip fused loop on the full
batch (interpret mode, 8-device CPU mesh).

Reference semantics being matched: one-rank-per-shard PETSc/MPI training
where the solver is COMM_SELF-local and only gradients are reduced
(/root/reference/pnode/petsc_adjoint.py:367; SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops.fused_train_loop import LoopLayout, fused_grad_step


def dp_fused_train_loop(
    mesh,
    tableau_static,
    dt,
    y_stack: jnp.ndarray,     # (K, B_global, d)
    tgt_stack: jnp.ndarray,   # (K, B_global, d)
    J_dense: jnp.ndarray,     # (d, d)
    inv_op: jnp.ndarray,      # (d, d)
    weights,
    biases,
    m_state,
    v_state,
    t0: int,
    activation: str = "relu",
    sign: float = -1.0,
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    stiff_prec: str = None,
    axis: str = "dp",
    force_general: bool = False,
) -> Tuple[list, list, tuple, tuple, jnp.ndarray]:
    """K data-parallel training iterations; same signature contract and
    return value as ``fused_train_loop`` plus the mesh. The batch axis of
    ``y_stack``/``tgt_stack`` is sharded over ``axis``; parameters and
    moments are replicated and stay synchronized by construction.

    A 1-device mesh needs no reduction, so it delegates to the
    single-chip K-iteration loop kernel (identical math — per-iteration
    Adam on the unreduced gradient IS the loop kernel's update), keeping
    ``--dp 1`` a literal zero-regression configuration.
    ``force_general=True`` runs the per-iteration path anyway (used to
    measure the DP architecture's single-device cost)."""
    from ..ops.fused_ark_adjoint import resolve_stiff_precision
    from ..ops.fused_train_loop import fused_train_loop

    K, B, d = y_stack.shape
    n_dev = int(np.prod([mesh.shape[a] for a in
                         ((axis,) if isinstance(axis, str) else axis)]))
    if B % n_dev:
        raise ValueError(f"global batch {B} must divide over {n_dev} "
                         f"devices on mesh axis {axis!r}")
    B_local = B // n_dev
    if n_dev == 1 and not force_general:
        return fused_train_loop(
            tableau_static, dt, y_stack, tgt_stack, J_dense, inv_op,
            weights, biases, m_state, v_state, t0,
            activation=activation, sign=sign, lr=lr, b1=b1, b2=b2,
            eps=eps, interpret=interpret, stiff_prec=stiff_prec,
        )
    layout = LoopLayout(B_local, d, [int(w.shape[1]) for w in weights])
    prec = stiff_prec or resolve_stiff_precision(
        J_dense, inv_op, n_applies=len(tableau_static[2]))

    # operator constants, padded once (forward pairs are transposed for
    # the kernel's row-vector applies, mirroring fused_train_loop)
    ops_p = tuple(layout.pack_operator(a) for a in
                  (J_dense.T, inv_op.T, J_dense, inv_op))
    Wv0, bv0 = layout.pack(weights, biases)
    mW0, mb0 = layout.pack(*m_state)
    vW0, vb0 = layout.pack(*v_state)
    lr_arr = jnp.asarray(lr, jnp.float32)
    t0_arr = jnp.asarray(t0, jnp.int32)
    ln_b1, ln_b2 = float(np.log(b1)), float(np.log(b2))

    def local_body(Wv, bv, mW, mb, vW, vb, t0_, lr_, jf, invf, jt, invt,
                   y_loc, tgt_loc):
        y_p = layout.pad_batch(y_loc)
        tgt_p = layout.pad_batch(tgt_loc)

        def body(carry, yt):
            Wv, bv, mW, mb, vW, vb, t = carry
            y, tgt = yt
            loss, dW, db = fused_grad_step(
                layout, tableau_static, dt, y, tgt, jf, invf, jt, invt,
                Wv, bv, activation=activation, sign=sign,
                interpret=interpret, stiff_prec=prec,
            )
            # the ONLY collectives: local means -> global batch mean
            loss = lax.pmean(loss, axis)
            dW = lax.pmean(dW, axis)
            db = lax.pmean(db, axis)
            # stacked Adam, identical formula to the in-kernel update
            # (b^t as exp(t ln b) so the two paths agree bitwise)
            t = t + 1
            tf = t.astype(jnp.float32)
            c1 = 1.0 - jnp.exp(tf * ln_b1)
            c2 = 1.0 - jnp.exp(tf * ln_b2)
            mW = b1 * mW + (1.0 - b1) * dW
            vW = b2 * vW + (1.0 - b2) * (dW * dW)
            Wv = Wv - lr_ * (mW / c1) / (jnp.sqrt(vW / c2) + eps)
            mb_ = b1 * mb + (1.0 - b1) * db
            vb_ = b2 * vb + (1.0 - b2) * (db * db)
            bv = bv - lr_ * (mb_ / c1) / (jnp.sqrt(vb_ / c2) + eps)
            return (Wv, bv, mW, mb_, vW, vb_, t), loss

        (Wv, bv, mW, mb, vW, vb, _), losses = lax.scan(
            body, (Wv, bv, mW, mb, vW, vb, t0_), (y_p, tgt_p))
        return Wv, bv, mW, mb, vW, vb, losses

    batch_spec = P(None, axis, None)
    rep = P()
    out = jax.shard_map(
        local_body, mesh=mesh,
        in_specs=(rep,) * 12 + (batch_spec, batch_spec),
        out_specs=(rep,) * 7,
        check_vma=False,
    )(Wv0, bv0, mW0, mb0, vW0, vb0, t0_arr, lr_arr, *ops_p,
      y_stack, tgt_stack)

    Wv, bv, mW, mb, vW, vb, losses = out
    Ws_o, bs_o = layout.unpack(Wv, bv)
    mW_o, mb_o = layout.unpack(mW, mb)
    vW_o, vb_o = layout.unpack(vW, vb)
    return Ws_o, bs_o, (mW_o, mb_o), (vW_o, vb_o), losses
