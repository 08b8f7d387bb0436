"""Fused ARK-IMEX reverse-step Pallas kernel (the KS/Burgers hot path).

Round-1 profiling (RESULTS.md): the discrete-adjoint sweep dominates the
KS training step (~1.1 of 1.54 ms), and within it ~everything is the
per-stage fused-MLP backward launches — each a separate pallas_call that
re-DMAs the weights and pays full launch latency for ~60 MFLOP of work.
This kernel evaluates the ENTIRE reverse step (all s stages) in ONE
pallas_call: per stage the covector AXPYs, the explicit-part MLP VJP
(recompute-then-backprop, weights resident in VMEM across stages), the
implicit-part J^T apply, and the transposed stage solve against the
pre-inverted frozen operator — pure VPU/MXU work with zero intermediate
HBM round-trips.

Scope (the reference's production stiff-PDE configuration,
/root/reference/examples-sinode/KS/KS.py: ksponly + fixed_jacobian +
linear f_IM): fixed parameter-free implicit part with a shared dense
Jacobian, explicit part = sign * MLP (relu/tanh), uniform dt (pre-inverted
stage operator available), single ESDIRK diagonal gamma. The generic
stage-exact adjoint in steppers.ARKIMEX.step_adj remains the fallback for
everything else and is the correctness reference (asserted equal in
tests/test_fused_ark_adjoint.py).

Math (identical to ARKIMEX.step_adj, steppers.py:510-571):

    for i = s-1 .. 0:
        u_i  = dt (bI_i lam + sum_{m>i} aI_mi xi_m)
        uh_i = dt (bE_i lam + sum_{m>i} aE_mi xi_m)
        p_i  = J_im^T u_i + sign * MLP_vjp_x(Y_i, sign * uh_i)
        xi_i = (I - dt gamma J_im)^{-T} p_i        (or p_i when a_ii = 0)
        dW  += MLP_vjp_W(Y_i, sign * uh_i)
    lam_prev = lam + sum_i xi_i
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
from .vmem import resident_budget_bytes, tpu_compiler_params


def stiff_dot_precision() -> str:
    """Precision tier for the STIFF operator dots (J apply, inverse apply)
    in the fused step kernels, from ``-pnode_fused_ark_precision``:

    - "auto" (default): measure, at trace time, the bf16x3 tier's error on
      the PROBLEM'S OWN frozen operators against fp64 (host-side emulation
      of the exact kernel arithmetic — see resolve_stiff_precision) and
      pick "high" when the composed per-step error clears
      ``-pnode_fused_ark_auto_tol`` (default 1e-2 = the hardware_smoke
      stiff-J gate bound; the probe itself is ~7x more conservative than
      the gate, measured at the validated KS config), else "highest".
      Falls back to "highest" whenever the operators are not compile-time
      constants.
    - "highest": fp32-exact 6-pass emulation — the round-2 hardware fix
      (bf16 single-pass silently broke KS training).
    - "high": bf16x3 3-pass (~2^-21 error vs fp32's 2^-24) — +6-19%
      headline throughput, fully gate- and trajectory-validated on KS
      post reverse-collapse (RESULTS.md round 3); "auto" selects it only
      after measuring it safe for the operators at hand. Mosaic rejects
      the Precision.HIGH enum inside kernels, so _stiff_dot emulates it
      with an explicit two-term bf16 split (xh@Ah + xh@Al + xl@Ah).
    - "default": single-pass bf16 — known WRONG for stiff operators on
      real hardware; exposed for measurement only.

    Read at trace time (static for the compiled program)."""
    from ..options import Options

    name = Options().get_string("pnode_fused_ark_precision", "auto")
    if name not in ("auto", "highest", "high", "default"):
        raise ValueError(
            f"-pnode_fused_ark_precision {name!r}: "
            "use auto|highest|high|default"
        )
    return name


# (operator-digest -> (tier, measured_err)) memo for the auto tier; the
# frozen operators are per-(problem, dt) constants so this stays tiny
_AUTO_TIER_MEMO: dict = {}


def auto_tier_decisions() -> dict:
    """Measured auto-tier decisions so far: digest -> (tier, rel_err)."""
    return dict(_AUTO_TIER_MEMO)


def _emulate_high_dot(x32: np.ndarray, A32: np.ndarray) -> np.ndarray:
    """Host-side fp32 emulation of _stiff_dot's "high" tier (bf16x3).

    bf16 x bf16 products are exact in fp32 (8+8 mantissa bits < 24), and
    numpy's sgemm accumulates in fp32 like the MXU, so this reproduces the
    kernel's dominant error term (the bf16 operand splits + the dropped
    xl@Al cross term) faithfully enough to bound it."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    xh = x32.astype(bf).astype(np.float32)
    xl = (x32 - xh).astype(bf).astype(np.float32)
    Ah = A32.astype(bf).astype(np.float32)
    Al = (A32 - Ah).astype(bf).astype(np.float32)
    return xh @ Ah + xh @ Al + xl @ Ah


def resolve_stiff_precision(J, inv_op, n_applies: int = 4) -> str:
    """Resolve the -pnode_fused_ark_precision tier for a concrete operator
    pair, measuring the "auto" tier per problem.

    The round-2 lesson was that low-precision stiff dots fail through
    COMPOSITION: a ~0.4% per-apply error is harmless once but O(1)-wrong
    compounded across stages, and how much it amplifies depends on the
    operators themselves (pre reverse-collapse the J-then-inverse chain
    amplified bf16x3 to 6.2e-2 and failed the gate; post-collapse the same
    tier composes to 3.7e-4 and passes — RESULTS.md round 3). So "auto"
    replays the kernels' actual stiff-dot chain (``n_applies`` inverse
    applies, one J apply — the post-collapse step structure) in host fp32
    with the bf16x3 split emulated exactly, against fp64 ground truth on
    unit probes, and picks "high" only when the composed relative error
    clears ``-pnode_fused_ark_auto_tol`` (default 1e-2 — the on-chip
    stiff-J composition gate bound; the probe's J-after-smoothing-chain
    structure makes it CONSERVATIVE relative to the gate: at the
    hardware-validated KS config the probe reads 2.5e-3 where the on-chip
    gate reads 3.7e-4, so clearing the gate bound on the probe leaves
    ~7x real margin). Tracers (non-constant operators: adaptive inline
    inverses, learned implicit parts) always resolve to "highest"."""
    name = stiff_dot_precision()
    if name != "auto":
        return name
    if J is None or inv_op is None:
        return "highest"
    if isinstance(J, jax.core.Tracer) or isinstance(inv_op, jax.core.Tracer):
        return "highest"
    try:
        Jn = np.asarray(jax.device_get(J), dtype=np.float64)
        In = np.asarray(jax.device_get(inv_op), dtype=np.float64)
    except Exception:
        return "highest"
    # accept the (1, d, d) shared-block layout the steppers carry (passing
    # the un-indexed parent avoids staging `J[0]` into a tracer mid-trace)
    if Jn.ndim == 3:
        Jn = Jn[0]
    if In.ndim == 3:
        In = In[0]
    import hashlib

    from ..options import Options

    tol = Options().get_real("pnode_fused_ark_auto_tol", 1e-2)
    key = (Jn.shape, int(n_applies), float(tol),
           hashlib.sha1(Jn.tobytes() + In.tobytes()).hexdigest())
    hit = _AUTO_TIER_MEMO.get(key)
    if hit is not None:
        return hit[0]
    d = Jn.shape[-1]
    rng = np.random.default_rng(20260817)
    X = rng.standard_normal((8, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ref = X.copy()
    emu = X.astype(np.float32)
    J32 = Jn.astype(np.float32)
    I32 = In.astype(np.float32)
    for _ in range(max(1, int(n_applies))):
        ref = ref @ In
        emu = _emulate_high_dot(emu, I32)
    refJ = ref @ Jn
    emuJ = _emulate_high_dot(emu, J32)

    def _rel(a, b):
        num = np.linalg.norm(a.astype(np.float64) - b, axis=1)
        den = np.maximum(np.linalg.norm(b, axis=1), 1e-30)
        return float(np.max(num / den))

    err = max(_rel(emu, ref), _rel(emuJ, refJ))
    tier = "high" if err < tol else "highest"
    _AUTO_TIER_MEMO[key] = (tier, err)
    if Options().get_bool("pnode_fused_ark_auto_verbose", False):
        print(f"[pnode] fused-ARK auto precision: composed bf16x3 error "
              f"{err:.3e} vs tol {tol:.1e} -> {tier} "
              f"(d={d}, n_applies={n_applies})")
    return tier


def _stiff_dot(x, A, prec: str):
    """Stiff-operator dot at the selected tier (see stiff_dot_precision)."""
    if prec == "highest":
        return jnp.dot(x, A, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if prec == "high":
        xh32 = x.astype(jnp.bfloat16).astype(jnp.float32)
        xh = xh32.astype(jnp.bfloat16)
        xl = (x - xh32).astype(jnp.bfloat16)
        Ah32 = A.astype(jnp.bfloat16).astype(jnp.float32)
        Ah = Ah32.astype(jnp.bfloat16)
        Al = (A - Ah32).astype(jnp.bfloat16)
        d = jnp.dot(xh, Ah, preferred_element_type=jnp.float32)
        d = d + jnp.dot(xh, Al, preferred_element_type=jnp.float32)
        d = d + jnp.dot(xl, Ah, preferred_element_type=jnp.float32)
        return d
    return jnp.dot(x, A, preferred_element_type=jnp.float32)


def _pack_high_operator(A):
    """Pack an f32 operator for the single-issue "high" stiff dot.

    The bf16x3 tier costs 3 MXU issues per apply as written in
    ``_stiff_dot``; on the latency-bound fused kernels the per-issue
    cost (~0.1 us) dominates the actual systolic work at these shapes.
    Packing the operator rows as [Ah; Al; Ah] (bf16) lets
    ``[xh | xh | xl] @ packed`` compute xh@Ah + xh@Al + xl@Ah in ONE
    MXU issue with a single f32 accumulation chain (at least as
    accurate as the 3-dot version, which rounds two partial sums).
    The operators are compile-time constants, so kernels hoist this
    packing out of their stage/iteration loops."""
    Ah32 = A.astype(jnp.bfloat16).astype(jnp.float32)
    Ah = Ah32.astype(jnp.bfloat16)
    Al = (A - Ah32).astype(jnp.bfloat16)
    return jnp.concatenate([Ah, Al, Ah], axis=0)


def _stiff_dot_high_packed(x, A3):
    """Single-issue bf16x3 stiff dot against a ``_pack_high_operator``
    result: split x once, widen to [xh | xh | xl], one MXU dot."""
    xh32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    xh = xh32.astype(jnp.bfloat16)
    xl = (x - xh32).astype(jnp.bfloat16)
    X = jnp.concatenate([xh, xh, xl], axis=1)
    return jnp.dot(X, A3, preferred_element_type=jnp.float32)


def fused_ark_fits(d: int, layer_dims: Sequence[int],
                   with_grad_accumulators: bool = True,
                   weight_dtype: str = "f32") -> bool:
    """True when the resident set fits the scoped-VMEM budget.

    The REVERSE kernel holds the weight stack (at ``weight_dtype`` bytes)
    plus fp32 dW accumulators: e.g. KS nx=64 fits at fp32; Burgers nx=512
    does NOT (fp32 resident ~16.4 MB) but DOES with bf16 weight storage
    (~12.8 MB resident; the MLP dots already run single-pass bf16 at
    DEFAULT precision on fp32 inputs, so bf16 *storage* barely moves the
    math — the stiff operators stay fp32). ``with_grad_accumulators=
    False`` is the forward-only budget (weight stack once); note the
    STEPPERS deliberately keep the forward kernel gated on the full
    reverse-capable budget — fusing only the forward measured a 10%
    regression at Burgers-512 sizes (RESULTS.md) — so the relaxed budget
    serves direct kernel callers only."""
    pdims = [_round_up(x, 128) for x in [d] + list(layer_dims)]
    P = pdims[0]
    w_elems = sum(pi * pj + pj for pi, pj in zip(pdims, pdims[1:]))
    wbytes = (2 if weight_dtype == "bf16" else 4) * w_elems
    grad_bytes = 4 * w_elems if with_grad_accumulators else 0
    # budget derives from -pnode_vmem_mb (ops/vmem.py): the raised
    # Mosaic limit / the measured resident->scoped inflation factor.
    # Burgers-512 f32 (resident 16.4 MB) fits at the default 100 MB
    # limit; round 3's 12 MB constant (Mosaic's 16 MB default) gated
    # it out.
    return wbytes + grad_bytes + 2 * 4 * P * P <= resident_budget_bytes()


def pick_weight_dtype(d: int, layer_dims: Sequence[int],
                      with_grad_accumulators: bool = True):
    """Resolve the fused kernels' weight-storage dtype: "f32", "bf16", or
    None (does not fit). ``-pnode_fused_ark_weights {auto,f32,bf16}``.

    MEASURED NEGATIVE RESULT (round 3, Burgers-512 5-layer reverse): bf16
    weight storage halves the resident stack as modeled (~12.8 MB), but
    Mosaic's actual scoped-VMEM demand for the monolithic reverse kernel
    was 33.76 MB against the 16 MB limit — the compiler's per-tile live
    set (stage arrays, recompute activations, double buffering) is ~10x
    the naive per-row model, and shrinking the batch tile cannot recover
    a >2x gap. So "auto" does NOT fall back to bf16: it returns f32 when
    that fits (KS-class sizes) and None otherwise (Burgers-512 keeps the
    generic XLA path, 7,015 steps/s with real sync). "bf16" stays as an
    explicit opt-in for smaller stacks where the fp32 resident set is the
    only blocker."""
    from ..options import Options

    mode = Options().get_string("pnode_fused_ark_weights", "auto")
    if mode not in ("auto", "f32", "bf16"):
        raise ValueError(
            f"-pnode_fused_ark_weights {mode!r}: use auto|f32|bf16"
        )
    if mode in ("auto", "f32") and fused_ark_fits(
            d, layer_dims, with_grad_accumulators, "f32"):
        return "f32"
    if mode == "bf16" and fused_ark_fits(
            d, layer_dims, with_grad_accumulators, "bf16"):
        return "bf16"
    return None


def _kernel(s, n_layers, act_name, aI, aE, bI, bE, sign, stiff_prec,
            dt_ref, ys_ref, lam_ref, jt_ref, invt_ref, *refs):
    """refs = [W1, b1, ..., Wn, bn, lam_prev_ref, dW1, db1, ..., dWn, dbn].

    Static arguments: stage count, layer count, activation, tableau rows
    (python floats -> zero coefficients are skipped at trace time), sign.
    Runs on a 1-D grid over batch tiles: weights/operators are revisited
    (stay resident in VMEM), weight gradients accumulate across tiles.
    """
    act = _ACTS[act_name]
    lam_prev_ref = refs[2 * n_layers]
    first_tile = pl.program_id(0) == 0
    dt = dt_ref[0, 0]
    lam = lam_ref[:]
    jt = jt_ref[:]
    invt = invt_ref[:]

    dWs = [None] * n_layers
    dbs = [None] * n_layers
    xis = [None] * s
    lam_prev = lam

    for i in range(s - 1, -1, -1):
        # covectors into the implicit/explicit stage derivatives
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

        # Reverse-side algebraic collapse (round 3, mirror of the forward
        # one): for implicit stages xi = inv^T (J^T u + v) with
        # inv = (I - dt a_ii J)^{-1}, and since inv^T (I - dt a_ii J)^T = I,
        #     inv^T J^T u = (inv^T u - u) / (dt a_ii)
        # so  xi = (u/(dt a_ii) + v) @ invt - u/(dt a_ii)
        # — ONE stiff dot per stage instead of two (J^T apply + transposed
        # solve). Explicit stages (a_ii = 0) still need the J^T apply.
        implicit = aI[i][i] != 0.0
        p = None
        if u is not None and not implicit:
            # raised precision: stiff operator transpose (fused_ark_forward)
            p = _stiff_dot(u, jt, stiff_prec)
        if uh is not None:
            # MLP VJP at Y_i with covector sign * uh:
            # recompute forward storing layer inputs, then backprop
            x = ys_ref[i]
            h = x
            pre = []
            hs = [h]
            for l in range(n_layers):
                W = refs[2 * l][:]
                b = refs[2 * l + 1][:]
                # bf16 weight storage: cast the activation to match (the
                # MXU's native bf16 x bf16 -> f32 path; same arithmetic
                # the DEFAULT-precision fp32 dot performs anyway)
                z = jnp.dot(h.astype(W.dtype), W,
                            preferred_element_type=jnp.float32) + b
                pre.append(z)
                h = act(z) if l < n_layers - 1 else z
                hs.append(h)
            g = sign * uh
            for l in range(n_layers - 1, -1, -1):
                if l < n_layers - 1:
                    if act_name == "relu":
                        g = g * (pre[l] > 0).astype(jnp.float32)
                    else:  # tanh
                        t_ = jnp.tanh(pre[l])
                        g = g * (1.0 - t_ * t_)
                W = refs[2 * l][:]
                dW = jnp.dot(hs[l].T, g, preferred_element_type=jnp.float32)
                db = jnp.sum(g, axis=0, keepdims=True)
                dWs[l] = dW if dWs[l] is None else dWs[l] + dW
                dbs[l] = db if dbs[l] is None else dbs[l] + db
                g = jnp.dot(g.astype(W.dtype), W.T,
                            preferred_element_type=jnp.float32)
            # sign was folded into the backprop seed, so g IS the f_ex VJP
            dyE = g
            p = dyE if p is None else p + dyE

        if implicit:
            if u is not None:
                # dt=0 identity steps (adaptive masked trials, checkpoint
                # padding): u is numerically zero there, but the 1/dt must
                # stay finite — same guard as the forward kernel
                inv_dtg = jnp.where(dt == 0.0, 0.0, 1.0 / (dt * aI[i][i]))
                c = u * inv_dtg
                q = c if p is None else c + p
                xi = _stiff_dot(q, invt, stiff_prec) - c
            else:
                xi = _stiff_dot(p, invt, stiff_prec)
        else:
            xi = p
        xis[i] = xi
        lam_prev = lam_prev + xi

    lam_prev_ref[:] = lam_prev.astype(lam_prev_ref.dtype)
    for l in range(n_layers):
        dW_ref = refs[2 * n_layers + 1 + 2 * l]
        db_ref = refs[2 * n_layers + 2 + 2 * l]
        dW = (dWs[l] if dWs[l] is not None
              else jnp.zeros(dW_ref.shape, jnp.float32))
        db = (dbs[l] if dbs[l] is not None
              else jnp.zeros(db_ref.shape, jnp.float32))
        # accumulate across batch tiles (output block revisited per step);
        # first tile must OVERWRITE (the buffer starts uninitialized, and
        # 0 * garbage would keep NaNs alive)
        @pl.when(first_tile)
        def _init(dW_ref=dW_ref, db_ref=db_ref, dW=dW, db=db):
            dW_ref[:] = dW.astype(dW_ref.dtype)
            db_ref[:] = db.astype(db_ref.dtype)

        @pl.when(jnp.logical_not(first_tile))
        def _acc(dW_ref=dW_ref, db_ref=db_ref, dW=dW, db=db):
            dW_ref[:] = (dW_ref[:] + dW).astype(dW_ref.dtype)
            db_ref[:] = (db_ref[:] + db).astype(db_ref.dtype)


def fused_ark_adj_cost(tableau_static, B, d, layer_dims):
    """Analytic (flops, hbm_bytes) per fused reverse-step call at LOGICAL
    sizes (see fused_ark_fwd_cost — Pallas custom calls report zero cost to
    XLA's analysis, so benchmarks add this).

    Per active stage: ONE stiff dot (the round-3 reverse collapse folds
    the J^T apply into the transposed inverse apply for implicit stages;
    explicit stages keep the J^T apply) + MLP recompute + backprop
    (forward dots + dW outer products + g@W^T: ~3x the forward MLP dots).
    HBM: operators + weights read once, stage values (s,B,d) + lam in,
    lam_prev + weight grads out.
    """
    aI, _, bI, _ = tableau_static
    s = len(bI)
    dims = [d] + list(layer_dims)
    mlp = sum(2 * B * a * b for a, b in zip(dims, dims[1:]))
    flops = 0
    for i in range(s):
        flops += 2 * B * d * d          # one stiff dot (inv^T or J^T)
        flops += 3 * mlp                # MLP recompute + dW + g backprop
    w_elems = sum(a * b + b for a, b in zip(dims, dims[1:]))
    byts = 4 * (2 * d * d + 2 * w_elems + B * d * (s + 2))
    return flops, byts


def fused_ark_step_adj(
    tableau_static,
    dt,
    Ys: jnp.ndarray,      # (s, B, d)
    lam: jnp.ndarray,     # (B, d)
    J_dense: jnp.ndarray,  # (d, d) implicit-part Jacobian (shared block)
    inv_op: jnp.ndarray,   # (d, d) (I - dt*gamma*J)^{-1} (shared block)
    weights: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    activation: str = "relu",
    sign: float = -1.0,
    interpret: bool = False,
    weight_dtype: str = "f32",
    stiff_prec: str = None,
) -> Tuple[jnp.ndarray, Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]]:
    """One fused reverse ARK step. Returns (lam_prev, (dWs, dbs)).

    tableau_static: (a_im, a_ex, b_im, b_ex) as nested python floats.
    ``weight_dtype="bf16"`` stores the resident weight stack in bf16
    (halving its VMEM footprint — the Burgers-512 enabler); dW
    accumulators and the stiff operators stay fp32.
    """
    aI, aE, bI, bE = tableau_static
    s, B, d = Ys.shape
    n_layers = len(weights)
    dims = [d] + [int(w.shape[1]) for w in weights]
    if dims[-1] != d:
        raise ValueError("explicit MLP must map the state to itself")
    pdims = [_round_up(x, 128) for x in dims]
    P = pdims[0]
    maxP = max(pdims)

    # batch-tile size chosen to fit the scoped VMEM budget: weights +
    # operators are resident; per-row cost = Ys/xis/covectors (s tiles of P)
    # plus the recompute-then-backprop activations (n_layers + 1 of maxP)
    if not fused_ark_fits(d, [int(w.shape[1]) for w in weights],
                          weight_dtype=weight_dtype):
        raise ValueError(
            "fused ARK reverse step does not fit VMEM at these sizes; "
            "gate with fused_ark_fits() before calling"
        )
    wb = 2 if weight_dtype == "bf16" else 4
    budget = resident_budget_bytes() + 2 * 2**20
    w_elems = sum(pi * pj + pj for pi, pj in zip(pdims, pdims[1:]))
    fixed = (wb + 4) * w_elems + 4 * 2 * P * P
    per_row = 4 * (4 * s * P + 2 * (n_layers + 1) * maxP + 6 * P)
    Bt = max(8, min(_round_up(B, 8), ((budget - fixed) // per_row) // 8 * 8))
    Bp = _round_up(B, Bt)
    n_tiles = Bp // Bt

    ys_p = jnp.pad(Ys, ((0, 0), (0, Bp - B), (0, P - d)))
    lam_p = _pad2(lam, Bp, P)
    # row-vector convention: J^T u (columns) == u @ J (rows), and the
    # transposed solve (op^T x = p) == p @ inv (rows) — matching
    # DenseStageSolver._solve(trans=1)
    jt_p = _pad2(J_dense, P, P)
    invt_p = _pad2(inv_op, P, P)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    flat = []
    wdt = jnp.bfloat16 if weight_dtype == "bf16" else None
    for i, (w, b) in enumerate(zip(weights, biases)):
        wp = _pad2(w, pdims[i], pdims[i + 1])
        flat.append(wp if wdt is None else wp.astype(wdt))
        flat.append(_pad2(b.reshape(1, -1), 1, pdims[i + 1]))

    out_shapes = [jax.ShapeDtypeStruct((Bp, P), lam.dtype)]
    out_specs = [
        pl.BlockSpec((Bt, P), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for i in range(n_layers):
        for k in (2 * i, 2 * i + 1):
            out_shapes.append(jax.ShapeDtypeStruct(flat[k].shape, lam.dtype))
            out_specs.append(
                pl.BlockSpec(flat[k].shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            )

    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((s, Bt, P), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        const(jt_p),
        const(invt_p),
    ] + [const(a) for a in flat]
    kern = functools.partial(
        _kernel, s, n_layers, activation,
        tuple(tuple(float(x) for x in row) for row in aI),
        tuple(tuple(float(x) for x in row) for row in aE),
        tuple(float(x) for x in bI),
        tuple(float(x) for x in bE),
        float(sign),
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
    )(dt_arr, ys_p, lam_p, jt_p, invt_p, *flat)

    lam_prev = outs[0][:B, :d]
    dWs = []
    dbs = []
    for i in range(n_layers):
        dWs.append(outs[1 + 2 * i][: dims[i], : dims[i + 1]])
        dbs.append(outs[2 + 2 * i][0, : dims[i + 1]])
    return lam_prev, (tuple(dWs), tuple(dbs))
