"""Fused ARK-IMEX training-LOOP Pallas kernel: many complete training
iterations per kernel launch, C of them per grid step.

Round-3 profiling on the tunneled v5e found a ~8 us FIXED cost per
sequenced step — the same whether it is a `lax.scan` iteration, a
pallas_call launch, or a Pallas GRID STEP with an empty body (measured:
trivial 256x128 AXPY scan 7.9 us/iter; empty-body grid step 8.3 us;
+48 serialized 256x128 matmuls only +4.3 us). The headline KS training
step (~16 us) is therefore sequencer-bound: no per-step kernel split can
beat ~2 sequenced regions per step.

This kernel moves the LOOP inside Pallas AND amortizes the per-grid-step
cost over a CHUNK of C complete training iterations per grid step:

    grid = (K / C,); each grid step runs C x [
      forward ARK-IMEX step (ksponly + frozen linear f_im, MLP f_ex)
      -> one-step-prediction MSE loss + gradient seed
      -> stage-exact reverse sweep (same math as ops/fused_ark_adjoint)
      -> Adam update (optax.adam formula, bias-corrected)
    ]

with the weight stack and Adam moments RESIDENT in VMEM across all K
iterations (constant-index output blocks, initialized from the inputs at
grid step 0) and the per-chunk minibatch blocks (C, B, P) STREAMED from
HBM by Pallas's grid pipeline. Stage values never round-trip to HBM
(forward and reverse share registers). Per-iteration cost approaches the
~0.1 us/matmul compute floor; the ~8 us sequencer cost is paid once
per C iterations.

Scope: the reference's production stiff-PDE training configuration
(/root/reference/examples-sinode/KS/KS.py: ksponly + fixed_jacobian +
linear f_IM + MLP f_EX, one-step MSE target, Adam) — the same gate as the
per-step fused kernels, plus MSE+Adam. The generic ODESolver + optax path
remains the correctness reference (asserted equal in
tests/test_fused_train_loop.py).

Math per iteration (identical to fused_ark_forward + fused_ark_adjoint +
optax.adam):

    forward:  Yi = G_i @ inv           (implicit stages; kI = (Yi-G)/(dt a_ii))
              kI = Yi @ J              (explicit stages)
              kE = sign * MLP(Yi)
    loss:     L = mean((y1 - target)^2);  lam = 2 (y1 - target) / (B d)
    reverse:  xi_i = (u/(dt a_ii) + v) @ inv^T - u/(dt a_ii)   (implicit)
              dW_l += h_l^T g_l,  db_l += sum g_l
    adam:     m <- b1 m + (1-b1) g;  v <- b2 v + (1-b2) g^2
              p <- p - lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_mlp import _ACTS, _pad2, _round_up
from .vmem import loop_budget_bytes, tpu_compiler_params
from .fused_ark_adjoint import (
    _pack_high_operator,
    _stiff_dot,
    _stiff_dot_high_packed,
)


def fused_train_loop_fits(B, d, layer_dims, chunk=8) -> bool:
    """VMEM feasibility: resident = the stacked weight/bias blocks +
    moments (x3 the stacks) + operators + the streamed (chunk, B, P)
    minibatch blocks (x2 for double buffering, x2 for y+target) + ~10
    (B, P)-sized live temporaries (stages, MLP intermediates,
    covectors). The stacked layout pads every layer to the max padded
    width (all 128 for the SINODE nets, so no overhead there)."""
    pdims = [_round_up(x, 128) for x in [d] + list(layer_dims)]
    P = pdims[0]
    n_layers = len(layer_dims)
    maxP = max(pdims)
    w_elems = sum(pdims[:n_layers]) * maxP + _round_up(n_layers, 8) * maxP
    Bp = _round_up(B, 8)
    resident = 4 * (3 * w_elems + 4 * P * P)
    stream = 4 * 4 * chunk * Bp * P
    live = 4 * 10 * Bp * max(pdims)
    # budget from -pnode_vmem_mb (ops/vmem.py): this model already
    # counts streaming + live temporaries, so it gets the less
    # conservative loop budget (0.7x the raw limit)
    return resident + stream + live < loop_budget_bytes()


def pick_chunk(K, B, d, layer_dims) -> int:
    """Largest chunk in (32, 16, 8) that divides K and fits VMEM; 1
    otherwise (loss-block legality requires chunk % 8 == 0 or chunk == 1)."""
    for c in (32, 16, 8):
        if K % c == 0 and fused_train_loop_fits(B, d, layer_dims, chunk=c):
            return c
    return 1


def fused_train_loop_cost(tableau_static, B, d, layer_dims, K):
    """Analytic (flops, hbm_bytes) PER TRAINING ITERATION at LOGICAL
    (unpadded) sizes — Pallas custom calls report zero cost to XLA's
    analysis, so benchmarks add this (convention of fused_ark_fwd_cost).

    Per iteration: forward = s stiff dots + s MLPs; reverse = one stiff
    dot per stage + MLP backprop at ~2x the forward MLP dots (activations
    are cached in-kernel, no recompute); Adam = ~10 elementwise ops per
    parameter. HBM: (y, target) streamed in per iteration, the loss row
    out; weights/moments/operators are VMEM-resident across all K
    iterations so their one-time traffic is amortized by 1/K.
    """
    aI, _, bI, _ = tableau_static
    s = len(bI)
    dims = [d] + list(layer_dims)
    mlp = sum(2 * B * a * b for a, b in zip(dims, dims[1:]))
    w_elems = sum(a * b + b for a, b in zip(dims, dims[1:]))
    flops = s * (2 * B * d * d + mlp)        # forward
    flops += s * (2 * B * d * d + 2 * mlp)   # reverse
    flops += 10 * w_elems + 3 * B * d        # adam + loss
    byts = 4 * (2 * B * d + 128)
    byts += 4 * (2 * 6 * w_elems + 4 * d * d) / max(1, K)
    return flops, byts


def _fwd_bwd_iteration(s, n_layers, act_name, aI, aE, bI, bE, sign,
                       sdot, inv_count, pdims, offs, maxP, bias_rows,
                       dt, Wv, bv, y, tgt, jf, invf, jt, invt, row_mask):
    """One complete forward ARK-IMEX step + loss + stage-exact reverse
    sweep on VALUES (not refs): returns (loss, dWstack, dbstack).

    Shared between the K-iteration loop kernel (which applies Adam
    in-kernel between iterations) and the grads-only kernel used by the
    data-parallel composition (``fused_grad_step``), where the Adam
    update happens OUTSIDE the kernel after a cross-device gradient
    psum (parallel/fused_dp.py)."""
    act = _ACTS[act_name]
    # per-layer views of the carried stacks (static slices)
    Ws = [jax.lax.slice(Wv, (offs[l], 0),
                        (offs[l] + pdims[l], pdims[l + 1]))
          for l in range(n_layers)]
    bs = [jax.lax.slice(bv, (l, 0), (l + 1, pdims[l + 1]))
          for l in range(n_layers)]

    def mlp(x, Ws=Ws, bs=bs):
        h = x
        pre = []
        hs = [h]
        for l in range(n_layers):
            z = jnp.dot(h, Ws[l],
                        preferred_element_type=jnp.float32) + bs[l]
            pre.append(z)
            h = act(z) if l < n_layers - 1 else z
            hs.append(h)
        return h, pre, hs

    # ---- forward ARK step (mirror of fused_ark_forward._kernel) ----
    kI = [None] * s
    kE = [None] * s
    Ys = [None] * s
    pres = [None] * s  # cached MLP internals: the reverse sweep
    hss = [None] * s   # reuses them instead of recomputing (op count
    y1 = y             # is the latency bottleneck in this kernel)
    for i in range(s):
        G = y
        for j in range(i):
            if aI[i][j] != 0.0:
                G = G + (dt * aI[i][j]) * kI[j]
            if aE[i][j] != 0.0:
                G = G + (dt * aE[i][j]) * kE[j]
        if aI[i][i] != 0.0:
            Yi = sdot(G, invf)
            inv_dt = jnp.where(dt == 0.0, 0.0, 1.0 / (dt * aI[i][i]))
            kI[i] = (Yi - G) * inv_dt
        else:
            Yi = G
            kI[i] = sdot(Yi, jf)
        Ys[i] = Yi
        out, pres[i], hss[i] = mlp(Yi)
        kE[i] = sign * out
        if bI[i] != 0.0:
            y1 = y1 + (dt * bI[i]) * kI[i]
        if bE[i] != 0.0:
            y1 = y1 + (dt * bE[i]) * kE[i]

    # ---- loss + adjoint seed (phantom rows masked out) --------------
    diff = (y1 - tgt) * row_mask
    loss = jnp.sum(diff * diff) * inv_count
    lam = (2.0 * inv_count) * diff

    # ---- reverse sweep (mirror of fused_ark_adjoint._kernel) -------
    # per-stage backprop deltas are collected and the dW/db outer
    # products batched into ONE dot per layer over the concatenated
    # stages (stacking is cheap VPU work; each saved dot is a full
    # MXU issue)
    g_stages = [[] for _ in range(n_layers)]
    h_stages = [[] for _ in range(n_layers)]
    xis = [None] * s
    for i in range(s - 1, -1, -1):
        u = None
        uh = None
        if bI[i] != 0.0:
            u = (dt * bI[i]) * lam
        if bE[i] != 0.0:
            uh = (dt * bE[i]) * lam
        for m in range(i + 1, s):
            if xis[m] is None:
                continue
            if aI[m][i] != 0.0:
                t_ = (dt * aI[m][i]) * xis[m]
                u = t_ if u is None else u + t_
            if aE[m][i] != 0.0:
                t_ = (dt * aE[m][i]) * xis[m]
                uh = t_ if uh is None else uh + t_
        if u is None and uh is None:
            continue
        implicit = aI[i][i] != 0.0
        p = None
        if u is not None and not implicit:
            p = sdot(u, jt)
        if uh is not None:
            pre, hs = pres[i], hss[i]
            g = sign * uh
            for l in range(n_layers - 1, -1, -1):
                if l < n_layers - 1:
                    if act_name == "relu":
                        g = g * (pre[l] > 0).astype(jnp.float32)
                    else:  # tanh
                        t_ = jnp.tanh(pre[l])
                        g = g * (1.0 - t_ * t_)
                g_stages[l].append(g)
                h_stages[l].append(hs[l])
                g = jnp.dot(g, Ws[l].T,
                            preferred_element_type=jnp.float32)
            p = g if p is None else p + g
        if implicit:
            if u is not None:
                inv_dtg = jnp.where(dt == 0.0, 0.0,
                                    1.0 / (dt * aI[i][i]))
                c = u * inv_dtg
                q = c if p is None else c + p
                xi = sdot(q, invt) - c
            else:
                xi = sdot(p, invt)
        else:
            xi = p
        xis[i] = xi

    dW_blocks = []
    db_rows = []
    for l in range(n_layers):
        if not g_stages[l]:
            dW_blocks.append(jnp.zeros((pdims[l], maxP), jnp.float32))
            db_rows.append(jnp.zeros((1, maxP), jnp.float32))
            continue
        G_all = (g_stages[l][0] if len(g_stages[l]) == 1
                 else jnp.concatenate(g_stages[l], axis=0))
        H_all = (h_stages[l][0] if len(h_stages[l]) == 1
                 else jnp.concatenate(h_stages[l], axis=0))
        dW = jnp.dot(H_all.T, G_all,
                     preferred_element_type=jnp.float32)
        db = jnp.sum(G_all, axis=0, keepdims=True)
        if pdims[l + 1] < maxP:
            dW = jnp.pad(dW, ((0, 0), (0, maxP - pdims[l + 1])))
            db = jnp.pad(db, ((0, 0), (0, maxP - pdims[l + 1])))
        dW_blocks.append(dW)
        db_rows.append(db)
    dWstack = (dW_blocks[0] if n_layers == 1
               else jnp.concatenate(dW_blocks, axis=0))
    if bias_rows > n_layers:  # bias block rows padded to 8
        db_rows.append(jnp.zeros((bias_rows - n_layers, maxP),
                                 jnp.float32))
    dbstack = (db_rows[0] if len(db_rows) == 1
               else jnp.concatenate(db_rows, axis=0))
    return loss, dWstack, dbstack


def _kernel(s, n_layers, act_name, aI, aE, bI, bE, sign, stiff_prec,
            b1, b2, eps, inv_count, C, pdims, offs, logical_B,
            dt_ref, t0_ref, lr_ref, y_ref, tgt_ref,
            jf_ref, invf_ref, jt_ref, invt_ref,
            *refs):
    """refs = [Wstack, bstack, mWstack, mbstack, vWstack, vbstack]
    inputs, then the same 6 stacked blocks as outputs, then loss_ref.

    Stacked layout (the round-3 latency fix): the per-layer padded
    weights live concatenated along axis 0 in ONE (R, maxP) block
    (layer l at rows offs[l]:offs[l]+pdims[l], cols :pdims[l+1]), the
    biases as rows of ONE (ceil8(n_layers), maxP) block, and likewise
    the Adam m/v moments. The kernel is latency-bound on its serialized
    op chain (~0.1 us/op issue cost), and per-layer Adam on 6*n_layers
    refs was the single largest op block (~6 ops x 2 x n_layers x 5
    tensors); stacking runs Adam as ~12 large VPU ops total, and the
    parameter/moment state is carried in registers across the C
    iterations of a grid step (one ref read + one write per block per
    grid step instead of per iteration)."""
    ins = refs[:6]
    outs = refs[6:12]
    loss_ref = refs[12]
    g_id = pl.program_id(0)
    dt = dt_ref[0, 0]
    lr = lr_ref[0, 0]  # runtime scalar: LR schedules don't recompile
    maxP = ins[0].shape[1]

    # grid step 0: seed the resident parameter/moment blocks
    @pl.when(g_id == 0)
    def _init():
        for i in range(6):
            outs[i][:] = ins[i][:].astype(outs[i].dtype)

    jf = jf_ref[:]      # J^T (row-vector forward apply)
    invf = invf_ref[:]  # inv^T
    jt = jt_ref[:]      # J (reverse: u @ J == (J^T u)^T)
    invt = invt_ref[:]  # inv
    if stiff_prec == "high":
        # single-issue bf16x3: pack each constant operator ONCE per grid
        # step; every apply is then one MXU dot instead of three
        jf, invf, jt, invt = (
            _pack_high_operator(a) for a in (jf, invf, jt, invt))

        def sdot(x, A):
            return _stiff_dot_high_packed(x, A)
    else:
        def sdot(x, A):
            return _stiff_dot(x, A, stiff_prec)

    # carried state for this grid step (written back once at the end)
    Wv, bv, mWv, mbv, vWv, vbv = [outs[i][:] for i in range(6)]

    # phantom-row mask: the batch is padded to a sublane multiple, and
    # padded rows enter the MLP as x=0 — with nonzero biases MLP(0) != 0,
    # so an unmasked loss would inject phantom terms into lam/dW/db
    # (wrong gradients whenever B % 8 != 0). Masking the loss seed zeroes
    # every phantom contribution: g rows >= B are 0 through the whole
    # reverse sweep.
    n_rows = y_ref.shape[1]
    row_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
                < logical_B).astype(jnp.float32)

    losses = []
    for it in range(C):
        loss_it, dWstack, dbstack = _fwd_bwd_iteration(
            s, n_layers, act_name, aI, aE, bI, bE, sign,
            sdot, inv_count, pdims, offs, maxP, bv.shape[0],
            dt, Wv, bv, y_ref[it], tgt_ref[it],
            jf, invf, jt, invt, row_mask,
        )
        losses.append(loss_it)

        # ---- Adam (optax.adam formula; t counts updates, 1-based) ------
        # one stacked update for all weights and one for all biases;
        # zero-gradient padding regions stay exactly zero (m=v=0 there)
        t = (t0_ref[0, 0] + g_id * C + it + 1).astype(jnp.float32)
        # b^t as exp(t ln b): Mosaic has no powf, and b1/b2 are static
        c1 = 1.0 - jnp.exp(t * float(np.log(b1)))
        c2 = 1.0 - jnp.exp(t * float(np.log(b2)))
        mWv = b1 * mWv + (1.0 - b1) * dWstack
        vWv = b2 * vWv + (1.0 - b2) * (dWstack * dWstack)
        Wv = Wv - lr * (mWv / c1) / (jnp.sqrt(vWv / c2) + eps)
        mbv = b1 * mbv + (1.0 - b1) * dbstack
        vbv = b2 * vbv + (1.0 - b2) * (dbstack * dbstack)
        bv = bv - lr * (mbv / c1) / (jnp.sqrt(vbv / c2) + eps)

    # write the carried state back once per grid step
    for ref, val in zip(outs, (Wv, bv, mWv, mbv, vWv, vbv)):
        ref[:] = val

    # ---- per-iteration loss trace --------------------------------------
    if C % 8 == 0:
        # (C, 128) block per grid step: write all C rows at once
        loss_ref[:] = jnp.broadcast_to(
            jnp.stack(losses).reshape(C, 1), loss_ref.shape
        )
    else:
        # C == 1: the (8, 128) block covers 8 consecutive grid steps
        # (index_map g -> g//8); write row g%8 via an iota select (Mosaic
        # forbids (1,1) blocks and dynamic sublane stores). Rows not yet
        # visited hold garbage until their step — the host wrapper slices
        # [:K] and reads column 0 only.
        rows = jax.lax.broadcasted_iota(jnp.int32, loss_ref.shape, 0)
        loss_ref[:] = jnp.where(rows == (g_id % 8), losses[0], loss_ref[:])


def fused_train_loop(
    tableau_static,
    dt,
    y_stack: jnp.ndarray,    # (K, B, d) per-iteration inputs
    tgt_stack: jnp.ndarray,  # (K, B, d) per-iteration targets
    J_dense: jnp.ndarray,    # (d, d)
    inv_op: jnp.ndarray,     # (d, d) (I - dt*gamma*J)^{-1}
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    m_state,                 # (mWs, mbs) tuples matching weights/biases
    v_state,
    t0,                      # int: Adam updates already applied
    activation: str = "relu",
    sign: float = -1.0,
    lr: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
    stiff_prec: str = None,
    chunk: int = None,
) -> Tuple[list, list, tuple, tuple, jnp.ndarray]:
    """Run K complete training iterations in ONE kernel launch, ``chunk``
    of them per grid step (auto-picked to divide K and fit VMEM).

    Returns (weights', biases', (mWs', mbs'), (vWs', vbs'), losses (K,)).
    Iteration k consumes (y_stack[k], tgt_stack[k]); passing the same
    minibatch K times reproduces the repeated-batch benchmark loop, and a
    real epoch passes its stacked minibatches.
    """
    from .fused_ark_adjoint import resolve_stiff_precision

    aI, aE, bI, bE = tableau_static
    s = len(bI)
    K, B, d = y_stack.shape
    n_layers = len(weights)
    dims = [d] + [int(w.shape[1]) for w in weights]
    pdims = [_round_up(x, 128) for x in dims]
    P = pdims[0]
    Bp = _round_up(B, 8)
    C = chunk if chunk is not None else pick_chunk(K, B, d, dims[1:])
    if K % C != 0:
        raise ValueError(f"chunk {C} must divide K={K}")
    if C != 1 and C % 8 != 0:
        raise ValueError(f"chunk must be 1 or a multiple of 8, got {C}")
    if not fused_train_loop_fits(B, d, dims[1:], chunk=C):
        raise ValueError("fused train loop does not fit VMEM")
    n_grid = K // C

    prec = stiff_prec or resolve_stiff_precision(J_dense, inv_op,
                                                 n_applies=s)

    def pad3(a):
        return jnp.pad(a, ((0, 0), (0, Bp - B), (0, P - d)))

    y_p = pad3(y_stack.astype(jnp.float32))
    tgt_p = pad3(tgt_stack.astype(jnp.float32))
    jf_p = _pad2(J_dense.T, P, P)
    invf_p = _pad2(inv_op.T, P, P)
    jt_p = _pad2(J_dense, P, P)
    invt_p = _pad2(inv_op, P, P)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)
    t0_arr = jnp.asarray(t0, jnp.int32).reshape(1, 1)
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)

    mWs, mbs = m_state
    vWs, vbs = v_state
    # stacked resident layout: layer l's weights at rows
    # offs[l]:offs[l]+pdims[l] (cols :pdims[l+1]) of one (R, maxP)
    # block; biases as row l of one (ceil8(n_layers), maxP) block
    maxP = max(pdims)
    offs = [0]
    for l in range(n_layers):
        offs.append(offs[-1] + pdims[l])
    R = offs[-1]
    Rb = _round_up(n_layers, 8)

    def wstack(ws):
        return _wstack(ws, pdims, maxP)

    def bstack(bs_):
        return _bstack(bs_, maxP, Rb)

    flat = [wstack(weights), bstack(biases), wstack(mWs), bstack(mbs),
            wstack(vWs), bstack(vbs)]
    shapes = [(R, maxP), (Rb, maxP)] * 3

    const = lambda a: pl.BlockSpec(a.shape, lambda g: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    stream = pl.BlockSpec((C, Bp, P), lambda g: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        stream, stream,
        const(jf_p), const(invf_p), const(jt_p), const(invt_p),
    ] + [const(a) for a in flat]
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32) for sh in shapes]
    out_specs = [pl.BlockSpec(sh, lambda g: (0,) * len(sh),
                              memory_space=pltpu.VMEM) for sh in shapes]
    if C % 8 == 0:
        out_shapes.append(jax.ShapeDtypeStruct((K, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((C, 128), lambda g: (g, 0),
                                      memory_space=pltpu.VMEM))
    else:
        Kp = _round_up(K, 8)
        out_shapes.append(jax.ShapeDtypeStruct((Kp, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((8, 128), lambda g: (g // 8, 0),
                                      memory_space=pltpu.VMEM))

    kern = functools.partial(
        _kernel, s, n_layers, activation,
        tuple(tuple(float(x) for x in row) for row in aI),
        tuple(tuple(float(x) for x in row) for row in aE),
        tuple(float(x) for x in bI),
        tuple(float(x) for x in bE),
        float(sign), prec,
        float(b1), float(b2), float(eps),
        float(1.0 / (B * d)), C,
        tuple(pdims), tuple(offs), B,
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_grid,),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        **({} if interpret else
           {"compiler_params": tpu_compiler_params()}),
    )(dt_arr, t0_arr, lr_arr, y_p, tgt_p, jf_p, invf_p, jt_p, invt_p,
      *flat)

    losses = outs[-1][:K, 0]
    Wres, bres, mWres, mbres, vWres, vbres = outs[:-1]
    Ws_o, bs_o, mW_o, mb_o, vW_o, vb_o = [], [], [], [], [], []
    for l in range(n_layers):
        wi, wj = dims[l], dims[l + 1]
        o = offs[l]
        Ws_o.append(Wres[o:o + wi, :wj])
        bs_o.append(bres[l, :wj])
        mW_o.append(mWres[o:o + wi, :wj])
        mb_o.append(mbres[l, :wj])
        vW_o.append(vWres[o:o + wi, :wj])
        vb_o.append(vbres[l, :wj])
    return Ws_o, bs_o, (mW_o, mb_o), (vW_o, vb_o), losses


# ---------------------------------------------------------------------------
# Data-parallel composition: grads-only kernel + stacked-layout helpers.
#
# Exact synchronous DP needs a cross-device gradient reduction BEFORE every
# Adam update, so the K-iteration loop cannot stay inside one kernel when the
# batch is sharded. The DP path (parallel/fused_dp.py) instead runs, per
# scanned iteration and per device, ONE fused forward+reverse kernel
# (`fused_grad_step`, the same `_fwd_bwd_iteration` math as the loop kernel)
# producing the stacked gradient blocks; a `lax.pmean` reduces them over the
# mesh and the stacked Adam update runs as ~12 large XLA VPU ops between
# kernel calls. Weights/moments stay in the stacked (R, maxP)/(Rb, maxP)
# layout across the whole scan (pack once, unpack once — `LoopLayout`).
# ---------------------------------------------------------------------------


def _wstack(ws, pdims, maxP):
    return jnp.concatenate(
        [_pad2(w.astype(jnp.float32), pdims[l], maxP)
         for l, w in enumerate(ws)], axis=0)


def _bstack(bs_, maxP, Rb):
    n_layers = len(bs_)
    rows = [_pad2(b.reshape(1, -1).astype(jnp.float32), 1, maxP)
            for b in bs_]
    if Rb > n_layers:
        rows.append(jnp.zeros((Rb - n_layers, maxP), jnp.float32))
    return jnp.concatenate(rows, axis=0)


class LoopLayout:
    """Static description of the stacked VMEM-resident parameter layout
    shared by the loop kernel and the DP grads-only kernel: layer l's
    (dims[l], dims[l+1]) weights live at rows offs[l]:offs[l]+pdims[l]
    (cols :pdims[l+1]) of one (R, maxP) f32 block; biases as row l of one
    (Rb, maxP) block. ``B`` is the LOCAL (per-device) logical batch."""

    def __init__(self, B, d, layer_dims):
        self.dims = [int(d)] + [int(x) for x in layer_dims]
        self.pdims = [_round_up(x, 128) for x in self.dims]
        self.n_layers = len(layer_dims)
        self.P = self.pdims[0]
        self.B = int(B)
        self.Bp = _round_up(int(B), 8)
        self.maxP = max(self.pdims)
        offs = [0]
        for l in range(self.n_layers):
            offs.append(offs[-1] + self.pdims[l])
        self.offs = offs
        self.R = offs[-1]
        self.Rb = _round_up(self.n_layers, 8)

    def pad_batch(self, a):
        """(..., B, d) -> (..., Bp, P) zero-padded f32."""
        pad = [(0, 0)] * (a.ndim - 2) + [(0, self.Bp - a.shape[-2]),
                                         (0, self.P - a.shape[-1])]
        return jnp.pad(a.astype(jnp.float32), pad)

    def pack(self, ws, bs):
        return _wstack(ws, self.pdims, self.maxP), _bstack(
            bs, self.maxP, self.Rb)

    def unpack(self, Wv, bv):
        ws, bs = [], []
        for l in range(self.n_layers):
            o = self.offs[l]
            ws.append(Wv[o:o + self.dims[l], :self.dims[l + 1]])
            bs.append(bv[l, :self.dims[l + 1]])
        return ws, bs

    def pack_operator(self, A):
        return _pad2(A, self.P, self.P)


def _grad_kernel(s, n_layers, act_name, aI, aE, bI, bE, sign, stiff_prec,
                 inv_count, pdims, offs, logical_B,
                 dt_ref, y_ref, tgt_ref,
                 jf_ref, invf_ref, jt_ref, invt_ref, W_ref, b_ref,
                 dW_ref, db_ref, loss_ref):
    """One forward+reverse iteration; emits gradient stacks instead of
    applying Adam (the DP wrapper reduces them across devices first)."""
    dt = dt_ref[0, 0]
    jf = jf_ref[:]
    invf = invf_ref[:]
    jt = jt_ref[:]
    invt = invt_ref[:]
    if stiff_prec == "high":
        jf, invf, jt, invt = (
            _pack_high_operator(a) for a in (jf, invf, jt, invt))

        def sdot(x, A):
            return _stiff_dot_high_packed(x, A)
    else:
        def sdot(x, A):
            return _stiff_dot(x, A, stiff_prec)

    n_rows = y_ref.shape[0]
    row_mask = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
                < logical_B).astype(jnp.float32)
    maxP = W_ref.shape[1]
    loss, dWstack, dbstack = _fwd_bwd_iteration(
        s, n_layers, act_name, aI, aE, bI, bE, sign,
        sdot, inv_count, pdims, offs, maxP, b_ref.shape[0],
        dt, W_ref[:], b_ref[:], y_ref[:], tgt_ref[:],
        jf, invf, jt, invt, row_mask,
    )
    dW_ref[:] = dWstack
    db_ref[:] = dbstack
    loss_ref[:] = jnp.full(loss_ref.shape, loss, jnp.float32)


def fused_grad_step(
    layout: "LoopLayout",
    tableau_static,
    dt,
    y_p: jnp.ndarray,       # (Bp, P) padded local minibatch
    tgt_p: jnp.ndarray,     # (Bp, P)
    jf_p, invf_p, jt_p, invt_p,   # (P, P) padded operators (fwd/rev pairs)
    Wv: jnp.ndarray,        # (R, maxP) stacked weights
    bv: jnp.ndarray,        # (Rb, maxP) stacked biases
    activation: str = "relu",
    sign: float = -1.0,
    interpret: bool = False,
    stiff_prec: str = "highest",
    global_count: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(loss, dWstack, dbstack) for ONE training iteration on the LOCAL
    batch shard, all in the stacked layout. ``global_count`` (default
    B*d) is the loss-mean denominator — the DP wrapper passes the LOCAL
    count and pmean's the result, which equals the global mean.
    """
    aI, aE, bI, bE = tableau_static
    s = len(bI)
    denom = float(global_count if global_count is not None
                  else layout.B * layout.dims[0])
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    const = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    kern = functools.partial(
        _grad_kernel, s, layout.n_layers, activation,
        tuple(tuple(float(x) for x in row) for row in aI),
        tuple(tuple(float(x) for x in row) for row in aE),
        tuple(float(x) for x in bI),
        tuple(float(x) for x in bE),
        float(sign), stiff_prec,
        float(1.0 / denom),
        tuple(layout.pdims), tuple(layout.offs), layout.B,
    )
    outs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((layout.R, layout.maxP), jnp.float32),
            jax.ShapeDtypeStruct((layout.Rb, layout.maxP), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, 1), lambda: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + [const(a) for a in
             (y_p, tgt_p, jf_p, invf_p, jt_p, invt_p, Wv, bv)],
        out_specs=(
            pl.BlockSpec((layout.R, layout.maxP), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((layout.Rb, layout.maxP), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **({} if interpret else
           {"compiler_params": tpu_compiler_params()}),
    )(dt_arr, y_p, tgt_p, jf_p, invf_p, jt_p, invt_p, Wv, bv)
    dWstack, dbstack, loss_blk = outs
    return loss_blk[0, 0], dWstack, dbstack
