"""Adaptive step-size control (-ts_adapt_type basic) with adjoint support.

TPU-native rebuild of PETSc's TSAdapt "basic" controller: embedded-error
step-size adaptation with safety factor / clipping, WRMS error norm against
``-ts_rtol``/``-ts_atol`` tolerances, MATCHSTEP truncation onto requested
output times. The reference exposes exactly this via the options database
(examples toggle it with ``-ts_adapt_type none`` /
``--petsc_ts_adapt``, ROBER.py:71-73).

XLA cannot trace data-dependent trajectory lengths, so the controller runs
as a **bounded scan over max_steps trial steps** with masked no-ops once all
outputs are reached — static shapes, fully jittable, and differentiable: the
custom-vjp backward replays the recorded (dt, accepted) sequence in reverse
with `lax.cond`-gated stage transposes, treating dt as data (accepted step
sizes are not differentiated — the same semantics as PETSc TSAdjoint over an
adaptive forward run, SURVEY.md section 7 "adaptive-step adjoints must replay
recorded accepted steps").

Trajectory policies (PETSc TSTrajectory applies to ADAPTIVE runs too —
/root/reference/README.md:91-100; every ``-ts_trajectory_max_cps_ram``
example in the reference runs under TSAdapt): the per-trial-step record is
always the SCALAR tuple ``(t, dt, accepted, out_slot)`` — O(max_steps)
scalars, never O(max_steps * state) unless the policy stores states — and
the reverse sweep runs the policy machinery over the **static trial-step
axis** (the bounded scan gives the schedule a static length; rejected /
never-reached trial steps reverse as gated identities):

  * ``store_all``     — states AND stage sets per trial step
                         (solution_only=0): zero recomputation, no Newton
                         re-solves in reverse.
  * ``solution_only`` — states per trial step; stages (implicit: Newton)
                         recomputed in the reverse sweep.
  * ``checkpoint(c)`` — c uniformly spaced trial-step checkpoints stored in
                         the forward scan; the reverse recomputes each
                         segment (storing states + stage sets locally) then
                         sweeps it: peak memory O(c + max_steps/c).
  * ``revolve(c)``    — nothing stored beyond y0 + the scalar record; the
                         reverse executes the optimal binomial schedule
                         (pnode_tpu/revolve.py) over the trial axis with a
                         (c+2)-slot buffer.
  * ``cams(c)``       — optimal multistage schedule (pnode_tpu/cams.py):
                         solution + stage-set checkpoints captured en
                         passant during the forward scan; scanned
                         unit-action reverse executor.
  * ``disk``          — states streamed to a host memmap via ordered
                         io_callback (CPU backends; the solver substitutes
                         CAMS on TPU).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .misc import tree_add, tree_zeros_like


@dataclass(frozen=True)
class AdaptConfig:
    rtol: float = 1e-4
    atol: float = 1e-4
    safety: float = 0.9
    dt_min_factor: float = 0.1   # max shrink per step (-ts_adapt_clip low)
    dt_max_factor: float = 10.0  # max growth per step (-ts_adapt_clip high)
    max_steps: int = 4096        # trial-step buffer bound (static)
    order: int = 5               # used for the controller exponent
    # controller: "basic" = PETSc's elementary I-controller;
    # "pi" = two-error-history PI controller (Hairer-Wanner II.4:
    # fac = safety * err^(-kI/(p+1)) * err_prev^(kP/(p+1))), smoother dt
    # sequences on mildly stiff problems
    controller: str = "basic"
    pi_kI: float = 0.7
    pi_kP: float = 0.4


class AdaptiveStats(NamedTuple):
    steps: jnp.ndarray
    accepted: jnp.ndarray
    rejected: jnp.ndarray
    newton_iters: jnp.ndarray
    newton_converged: jnp.ndarray
    completed: jnp.ndarray  # all outputs reached within max_steps
    # controller dt after the final trial — feed back as the next solve's
    # dt0 (ODESolver.solve(..., dt0=stats.dt_last)) to warm-start the
    # controller across repeated solves of the same system; PETSc resets
    # dt each TSSolve (petsc_adjoint.py:813-817), so the warm start is an
    # optimization beyond the reference's operating mode
    dt_last: jnp.ndarray
    # dt of the FIRST accepted step. For repeated solves over the same
    # trajectory window (the training loop: y0 fixed, params drifting)
    # this is the right warm start: a trajectory whose initial data needs
    # a small dt (high-frequency content that decays along the solve)
    # ends with dt_last >> the start-of-window requirement, so dt_last
    # re-pays the whole rejection descent every solve — dt_first lands
    # inside the accept region immediately (measured on KS b256: 6
    # rejections/solve with dt_last vs 0-1 with dt_first).
    dt_first: jnp.ndarray


def _wrms(err, y0, y1, rtol, atol):
    # the weighted norm runs at >= f32 even for low-precision states (a bf16
    # mean over thousands of elements loses the digits the controller needs)
    wdt = jnp.promote_types(err.dtype, jnp.float32)
    err, y0, y1 = err.astype(wdt), y0.astype(wdt), y1.astype(wdt)
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return jnp.sqrt(jnp.mean((err / scale) ** 2))


def _gated_adj(stp, params, t_k, dt_k, y_k, aux_k, acc_k, slot_k, g_out,
               lam, gp):
    """One gated reverse trial step: inject the slot's output cotangent,
    then transpose the step iff it was accepted (rejected / never-reached
    trials reverse as identities). Shared by every adaptive policy engine
    and the host-orchestrated disk driver (disk_host.py)."""
    f_k = jnp.where(
        slot_k >= 0,
        g_out[jnp.maximum(slot_k, 0)].astype(lam.dtype),
        jnp.zeros_like(lam),
    )
    lam = lam + f_k

    def do(args):
        lam_i, gp_i = args
        lam_n, gstep = stp.step_adj(t_k, dt_k, y_k, params, aux_k, lam_i)
        return lam_n, tree_add(gp_i, gstep)

    return lax.cond(acc_k, do, lambda a: a, (lam, gp))


def trial_step_core(stp, params, cfg, touts, n_out, expo, core):
    """One adaptive trial step: MATCHSTEP truncation onto the next output,
    embedded step, WRMS accept test, dt controller, output landing.

    The SINGLE SOURCE of the controller semantics — consumed by
    make_adaptive_odeint's scan body (every in-memory policy) and by the
    host-orchestrated disk driver (disk_host.AdaptiveHostDiskTrajectory);
    their bit-parity holds because both run this function.

    ``core`` = (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv, eprev,
    rejprev).
    Returns ``(new_core, (t, dt_try, accept, out_slot), aux)`` with t/y the
    PRE-step values in the record and ``aux`` the step's stage set (for
    policies that capture it).
    """
    (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv, eprev,
     rejprev) = core
    tdtype = t.dtype
    t_end = touts[-1]
    done = out_i >= n_out
    target = touts[jnp.minimum(out_i, n_out - 1)]
    # MATCHSTEP: truncate onto the next requested output
    dt_try = jnp.minimum(dt, target - t)
    dt_try = jnp.maximum(dt_try, jnp.asarray(0.0, tdtype))

    y1, err, aux, st = stp.step_embedded(t, dt_try, y, params)
    enorm = _wrms(err, y, y1, cfg.rtol, cfg.atol)
    accept = jnp.logical_or(enorm <= 1.0, dt_try <= 1e-14 * t_end)
    accept = jnp.logical_and(accept, jnp.logical_not(done))

    e_cur = jnp.maximum(enorm, 1e-10)
    if cfg.controller == "pi":
        # two-error-history PI controller (Hairer-Wanner II.4)
        fac = (cfg.safety
               * jnp.power(e_cur, -cfg.pi_kI * expo)
               * jnp.power(eprev, cfg.pi_kP * expo))
    else:
        # elementary controller (PETSc TSAdapt basic)
        fac = cfg.safety * jnp.power(e_cur, -expo)
    fac = jnp.clip(fac, cfg.dt_min_factor, cfg.dt_max_factor)
    # Stability-limited problems (e.g. the ARK explicit part near its
    # stability boundary) bounce: an easy accept grows dt up to
    # dt_max_factor, the next trial's error explodes non-polynomially, and
    # several rejections pay the way back down. Hairer's DOPRI5 rule
    # (Hairer-Wanner II.4, also PETSc TSAdapt's post-reject behavior):
    # no growth on the trial immediately following a rejection.
    fac = jnp.where(rejprev, jnp.minimum(fac, 1.0), fac)
    dt_next = jnp.where(done, dt, dt * fac)
    eprev_new = jnp.where(accept, e_cur, eprev)
    rejprev_new = jnp.where(
        done, rejprev,
        jnp.logical_and(jnp.logical_not(accept), jnp.logical_not(done)),
    )

    t_new = jnp.where(accept, t + dt_try, t)
    y_new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, b, a), y, y1
    )
    tol = 1e-10 * jnp.maximum(jnp.abs(target), 1.0)
    landed = jnp.logical_and(accept, t_new >= target - tol)
    out_slot = jnp.where(landed, out_i, -1)
    outputs = jnp.where(
        (jnp.arange(n_out) == out_slot).reshape((-1,) + (1,) * y.ndim),
        y_new[None],
        outputs,
    )
    out_i = jnp.where(landed, out_i + 1, out_i)
    n_acc = n_acc + jnp.where(accept, 1, 0)
    n_rej = n_rej + jnp.where(
        jnp.logical_and(jnp.logical_not(accept), jnp.logical_not(done)),
        1, 0,
    )
    nit = nit + st.newton_iters
    conv = jnp.logical_and(conv, st.newton_converged)
    new_core = (t_new, y_new, dt_next, out_i, outputs, n_acc, n_rej,
                nit, conv, eprev_new, rejprev_new)
    return new_core, (t, dt_try, accept, out_slot), aux


def make_adaptive_odeint(stepper, t_out: np.ndarray, cfg: AdaptConfig,
                         dt0: float, with_adjoint: bool = True,
                         traj=None):
    """Build solve(y0, params) -> (outputs, stats) with adaptive stepping.

    ``stepper`` must provide ``step_embedded(t, dt, y, params) ->
    (y1, err, aux, stats)``; t_out is the static ascending output-time array
    (t_out[0] = initial time, reported as y0). ``traj`` is an
    adjoint.TrajectoryConfig selecting the trajectory policy (None =
    store_all).
    """
    from .adjoint import TrajectoryConfig

    if traj is None:
        traj = TrajectoryConfig()
    t_out = np.asarray(t_out, dtype=np.float64)
    n_out = len(t_out)
    max_steps = int(cfg.max_steps)
    expo = 1.0 / (cfg.order + 1)
    kind = traj.kind if with_adjoint else "solution_only"
    if kind not in ("store_all", "solution_only", "checkpoint", "revolve",
                    "cams", "disk"):
        raise ValueError(f"unknown trajectory kind {kind!r}")
    _store_dt = jnp.dtype(traj.store_dtype) if traj.store_dtype else None

    def _compress(x):
        return x if _store_dt is None else x.astype(_store_dt)

    def _expand(x, like):
        return x if _store_dt is None else x.astype(like.dtype)

    # uniform checkpoint geometry over the trial axis
    if kind == "checkpoint":
        _c = max(1, int(traj.max_cps))
        _seg_len = max(1, math.ceil(max_steps / _c))
        _n_seg = math.ceil(max_steps / _seg_len)
        _pad = _n_seg * _seg_len - max_steps
    else:
        _seg_len = _n_seg = _pad = 0

    def _prepared(y0, params):
        # freeze-once-per-odeint Jacobian semantics (same as the fixed-grid
        # driver's _prepare); dt0=None because dt varies under the
        # controller — stage inverses are computed per trial step instead
        # of pre-inverted (steppers._fused_reverse_args(dt=...))
        prep = getattr(stepper, "prepare", None)
        if prep is None:
            return stepper
        return prep(
            jnp.asarray(t_out[0],
                        jnp.promote_types(y0.dtype, jnp.float32)),
            y0, params, dt0=None)

    # -- CAMS plan over the static trial axis --------------------------------

    _cams_memo: dict = {}

    def _cams_comp(y0, params):
        """(fwd_sol, fwd_stage, actions, n_sol, n_stage) for the trial axis.
        Keyed on y0/params leaf shapes (retraces with a different batch size
        must not reuse a stale stage-checkpoint weight)."""
        from . import cams as cm

        key = (
            tuple(y0.shape), str(y0.dtype),
            tuple((tuple(p.shape), str(p.dtype))
                  for p in jax.tree_util.tree_leaves(params)),
        )
        if key not in _cams_memo:
            stp = _prepared(y0, params)
            aux_shape = _aux_shape(stp, y0, params)
            aux_sz = sum(int(np.prod(a.shape))
                         for a in jax.tree_util.tree_leaves(aux_shape))
            w = cm.stage_weight(aux_sz, y0.size)
            m = max(1, int(traj.max_cps) or 16)
            plan_fwd, plan_rev = cm.cams_plan(max_steps, m, w)
            _cams_memo[key] = cm.compile_plan(plan_fwd, plan_rev, max_steps)
        return _cams_memo[key]

    def _aux_shape(stp, y0, params):
        _, _, aux_shape, _ = jax.eval_shape(
            lambda y: stp.step_embedded(
                jnp.asarray(t_out[0],
                            jnp.promote_types(y0.dtype, jnp.float32)),
                jnp.asarray(dt0,
                            jnp.promote_types(y0.dtype, jnp.float32)),
                y, params),
            y0,
        )
        return aux_shape

    # -- disk policy plumbing ------------------------------------------------

    from . import disk_trajectory as _dtraj
    from .options import Options as _Options

    _disk_id = _dtraj.new_buffer_id() if kind == "disk" else None
    _disk_dir = _Options().get_string("ts_trajectory_dirname",
                                      "./ts_trajectory")

    # -- forward -------------------------------------------------------------

    def forward(y0, params, dt0_v):
        stp = _prepared(y0, params)
        dtype = y0.dtype
        # time/dt/controller scalars ride at >= f32: bf16 time arithmetic
        # cannot accumulate t+dt or land on outputs (eps ~ 8e-3)
        tdtype = jnp.promote_types(dtype, jnp.float32)
        touts = jnp.asarray(t_out, tdtype)
        t_end = touts[-1]
        outputs0 = jnp.broadcast_to(y0, (n_out,) + y0.shape).astype(dtype)

        # policy-dependent checkpoint buffers carried through the scan
        if kind == "checkpoint":
            bufs0 = (jnp.zeros((_n_seg,) + y0.shape,
                               _store_dt or y0.dtype),)
        elif kind == "cams":
            comp = _cams_comp(y0, params)
            aux_shape = _aux_shape(stp, y0, params)

            def _mk(n_slots, shape, dt_):
                return jnp.zeros((n_slots + 1,) + tuple(shape),
                                 _store_dt or dt_)

            bufs0 = (
                _mk(comp["n_sol"], y0.shape, y0.dtype),
                _mk(comp["n_stage"], y0.shape, y0.dtype),
                jax.tree_util.tree_map(
                    lambda a: _mk(comp["n_stage"], a.shape, a.dtype),
                    aux_shape,
                ),
            )
        else:
            bufs0 = ()

        if kind == "cams":
            comp = _cams_comp(y0, params)
            xs = (jnp.arange(max_steps), jnp.asarray(comp["fwd_sol"]),
                  jnp.asarray(comp["fwd_stage"]))
            n_sol, n_stage = comp["n_sol"], comp["n_stage"]
        else:
            xs = (jnp.arange(max_steps),)

        def body(carry, x):
            (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv,
             eprev, rejprev, bufs) = carry
            k = x[0]

            if kind == "checkpoint":
                # uniform trial-axis checkpoints: store y at segment starts
                (cps,) = bufs
                slot = k // _seg_len
                cps = lax.cond(
                    k % _seg_len == 0,
                    lambda b: b.at[slot].set(_compress(y)),
                    lambda b: b,
                    cps,
                )
                bufs = (cps,)
            elif kind == "disk":
                from jax.experimental import io_callback

                io_callback(
                    lambda kk, yy: _dtraj.write_step(
                        _disk_id, max_steps, _disk_dir, kk, yy),
                    jax.ShapeDtypeStruct((), jnp.int32), k, y, ordered=True,
                )

            core = (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv,
                    eprev, rejprev)
            new_core, rec, aux = trial_step_core(
                stp, params, cfg, touts, n_out, expo, core
            )

            if kind == "cams":
                ss, cs = x[1], x[2]
                solbuf, sy, saux = bufs
                solbuf = lax.cond(
                    ss < n_sol,
                    lambda b: b.at[ss].set(_compress(y)),
                    lambda b: b,
                    solbuf,
                )

                def _cap(bb):
                    sy_b, saux_b = bb
                    sy_b = sy_b.at[cs].set(_compress(y))
                    saux_b = jax.tree_util.tree_map(
                        lambda b, v: b.at[cs].set(_compress(v)), saux_b, aux
                    )
                    return sy_b, saux_b

                sy, saux = lax.cond(
                    cs < n_stage, _cap, lambda bb: bb, (sy, saux)
                )
                bufs = (solbuf, sy, saux)

            new_carry = new_core + (bufs,)
            # scalar record: O(max_steps), not O(max_steps * state)
            if kind == "store_all":
                rec = rec + (_compress(y),
                             jax.tree_util.tree_map(_compress, aux))
            elif kind == "solution_only":
                rec = rec + (_compress(y),)
            return new_carry, rec

        init = (
            jnp.asarray(t_out[0], tdtype), y0,
            jnp.asarray(dt0_v, tdtype).reshape(()),
            jnp.asarray(1), outputs0, jnp.asarray(0), jnp.asarray(0),
            jnp.asarray(0, jnp.int32), jnp.asarray(True),
            jnp.asarray(1.0, tdtype), jnp.asarray(False), bufs0,
        )
        carry, recs = lax.scan(body, init, xs)
        (_, _, dt_end, out_i, outputs, n_acc, n_rej, nit, conv, _, _,
         bufs) = carry
        # first accepted trial's dt from the scalar record (recs[1] = dt_try,
        # recs[2] = accept); argmax picks the first True. No accepts ->
        # fall back to the end-of-solve dt.
        dt_r, acc_r = recs[1], recs[2]
        dt_first = jnp.where(
            jnp.any(acc_r), dt_r[jnp.argmax(acc_r)], dt_end
        )
        stats = AdaptiveStats(
            steps=n_acc + n_rej, accepted=n_acc, rejected=n_rej,
            newton_iters=nit, newton_converged=conv,
            completed=out_i >= n_out, dt_last=dt_end, dt_first=dt_first,
        )
        return outputs, stats, recs, bufs

    if not with_adjoint:
        def solve_noadj(y0, params, dt0_arg=None):
            d = dt0 if dt0_arg is None else dt0_arg
            outputs, stats, _, _ = forward(y0, params, d)
            return outputs, stats

        return solve_noadj

    # -- reverse policy engines over the trial axis --------------------------
    #
    # All engines consume the scalar record (t_r, dt_r, acc_r, slot_r):
    # slot_r[k] >= 0 marks an accepted landing step whose output cotangent
    # g_out[slot_r[k]] is injected into lam BEFORE transposing step k. The
    # per-step forcing is GATHERED inside each scan body from the
    # O(n_out * state) cotangent array — materializing it up front would
    # cost O(max_steps * state), defeating the low-memory policies (the
    # whole point of revolve/CAMS here). Rejected (and never-reached)
    # steps are gated to identity with lax.cond, so only accepted steps
    # pay a stage transpose at runtime.

    def _gated_step(stp, params, t_k, dt_k, acc_k, y):
        # replay advance: step() is step_embedded() minus the error
        # estimate (identical y1 from the same call chain; for Theta the
        # estimate costs two extra dynamics evaluations per step)
        return lax.cond(
            acc_k,
            lambda yy: stp.step(t_k, dt_k, yy, params)[0],
            lambda yy: yy,
            y,
        )

    def _bwd_direct(stp, params, recs, g_out, lam, gp):
        """store_all / solution_only: one reverse scan over the records."""
        if kind == "store_all":
            t_r, dt_r, acc_r, slot_r, y_r, aux_r = recs
        else:
            t_r, dt_r, acc_r, slot_r, y_r = recs
            aux_r = None

        def body(carry, x):
            lam_c, gp_c = carry
            if aux_r is not None:
                t_k, dt_k, acc_k, s_k, y_k, aux_k = x
                aux_k = jax.tree_util.tree_map(
                    lambda a: _expand(a, lam_c), aux_k
                )
            else:
                t_k, dt_k, acc_k, s_k, y_k = x
                aux_k = None
            y_k = _expand(y_k, lam_c)
            lam_c, gp_c = _gated_adj(
                stp, params, t_k, dt_k, y_k, aux_k, acc_k, s_k, g_out,
                lam_c, gp_c
            )
            return (lam_c, gp_c), None

        xs = (t_r, dt_r, acc_r, slot_r, y_r)
        if aux_r is not None:
            xs = xs + (aux_r,)
        (lam, gp), _ = lax.scan(body, (lam, gp), xs, reverse=True)
        return lam, gp

    def _bwd_checkpoint(stp, params, recs, g_out, lam, gp, cps):
        """Uniform trial-axis segments: recompute each segment forward from
        its stored checkpoint (capturing states + stage sets locally), then
        sweep it — peak memory O(c·state + seg_len·(state + aux))."""
        t_r, dt_r, acc_r, slot_r = recs[:4]
        pad_f = jnp.asarray(False)
        t_p = jnp.concatenate([t_r, jnp.zeros((_pad,), t_r.dtype)])
        dt_p = jnp.concatenate([dt_r, jnp.zeros((_pad,), dt_r.dtype)])
        acc_p = jnp.concatenate(
            [acc_r, jnp.broadcast_to(pad_f, (_pad,))])
        slot_p = jnp.concatenate(
            [slot_r, jnp.full((_pad,), -1, slot_r.dtype)]
        )
        seg_t = t_p.reshape(_n_seg, _seg_len)
        seg_dt = dt_p.reshape(_n_seg, _seg_len)
        seg_acc = acc_p.reshape(_n_seg, _seg_len)
        seg_slot = slot_p.reshape(_n_seg, _seg_len)

        def seg_bwd(carry, x):
            lam_c, gp_c = carry
            y_cp, s_t, s_dt, s_acc, s_slot = x
            y_cp = _expand(y_cp, lam_c)

            def fbody(y, xx):
                t_k, dt_k, acc_k = xx
                y1, aux, _ = stp.step(t_k, dt_k, y, params)
                y_next = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(acc_k, b, a), y, y1
                )
                return y_next, (y, aux)

            _, (y_hist, aux_hist) = lax.scan(
                fbody, y_cp, (s_t, s_dt, s_acc)
            )

            def rbody(carry2, xx):
                lam_i, gp_i = carry2
                t_k, dt_k, acc_k, s_k, y_k, aux_k = xx
                lam_i, gp_i = _gated_adj(
                    stp, params, t_k, dt_k, y_k, aux_k, acc_k, s_k, g_out,
                    lam_i, gp_i,
                )
                return (lam_i, gp_i), None

            (lam_c, gp_c), _ = lax.scan(
                rbody, (lam_c, gp_c),
                (s_t, s_dt, s_acc, s_slot, y_hist, aux_hist), reverse=True,
            )
            return (lam_c, gp_c), None

        (lam, gp), _ = lax.scan(
            seg_bwd, (lam, gp), (cps, seg_t, seg_dt, seg_acc, seg_slot),
            reverse=True,
        )
        return lam, gp

    def _bwd_revolve(stp, params, recs, g_out, lam, gp, y0):
        """Optimal binomial schedule over the trial axis: the shared
        unit-action table (revolve.compile_actions) executed by one scan
        with a (c+2)-slot buffer; advances and reverses are acc-gated."""
        from . import revolve as rv

        t_r, dt_r, acc_r, slot_r = recs[:4]
        c = max(1, int(traj.max_cps))
        acts = jnp.asarray(rv.compile_actions(max_steps, c))
        buf0 = jnp.zeros((c + 2,) + y0.shape, y0.dtype).at[0].set(y0)

        def body(carry, a):
            op, slot, k = a[0], a[1], a[2]

            def do_restore(carry):
                buf, cursor, lam_c, gp_c = carry
                return buf, buf[slot], lam_c, gp_c

            def do_advance(carry):
                buf, cursor, lam_c, gp_c = carry
                y1 = _gated_step(stp, params, t_r[k], dt_r[k], acc_r[k],
                                 cursor)
                return buf, y1, lam_c, gp_c

            def do_store(carry):
                buf, cursor, lam_c, gp_c = carry
                return buf.at[slot].set(cursor), cursor, lam_c, gp_c

            def do_reverse(carry):
                buf, cursor, lam_c, gp_c = carry
                lam_c, gp_c = _gated_adj(
                    stp, params, t_r[k], dt_r[k], cursor, None, acc_r[k],
                    slot_r[k], g_out, lam_c, gp_c,
                )
                return buf, cursor, lam_c, gp_c

            carry = lax.switch(
                op, [do_restore, do_advance, do_store, do_reverse], carry
            )
            return carry, None

        (_, _, lam, gp), _ = lax.scan(body, (buf0, y0, lam, gp), acts)
        return lam, gp

    def _bwd_cams(stp, params, recs, g_out, lam, gp, y0, stored):
        """CAMS unit-action executor over the trial axis (the adjoint
        module's _cams_bwd_scan with acc-gated advances/reverses)."""
        comp = _cams_comp(y0, params)
        t_r, dt_r, acc_r, slot_r = recs[:4]
        solbuf, sy, saux = stored
        solbuf = solbuf.at[0].set(_compress(y0))
        acts = jnp.asarray(comp["actions"])
        if acts.shape[0] == 0:
            return lam, gp

        def body(carry, a):
            op, slot, k = a[0], a[1], a[2]

            def r_sol(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                return (solbuf, sy, saux, _expand(solbuf[slot], lam_c),
                        lam_c, gp_c)

            def r_stage(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                return (solbuf, sy, saux, _expand(sy[slot], lam_c),
                        lam_c, gp_c)

            def adv(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                y1 = _gated_step(stp, params, t_r[k], dt_r[k], acc_r[k],
                                 cursor)
                return solbuf, sy, saux, y1, lam_c, gp_c

            def store(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                return (solbuf.at[slot].set(_compress(cursor)), sy, saux,
                        cursor, lam_c, gp_c)

            def rev(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                lam_c, gp_c = _gated_adj(
                    stp, params, t_r[k], dt_r[k], cursor, None, acc_r[k],
                    slot_r[k], g_out, lam_c, gp_c,
                )
                return solbuf, sy, saux, cursor, lam_c, gp_c

            def cap(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                y1, aux, _ = stp.step(
                    t_r[k], dt_r[k], cursor, params
                )
                y1 = jax.tree_util.tree_map(
                    lambda a_, b_: jnp.where(acc_r[k], b_, a_), cursor, y1
                )
                sy2 = sy.at[slot].set(_compress(cursor))
                saux2 = jax.tree_util.tree_map(
                    lambda b, v: b.at[slot].set(_compress(v)), saux, aux
                )
                return solbuf, sy2, saux2, y1, lam_c, gp_c

            def rev_stage(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                y_k = _expand(sy[slot], lam_c)
                aux_k = jax.tree_util.tree_map(
                    lambda b: _expand(b[slot], lam_c), saux
                )
                lam_c, gp_c = _gated_adj(
                    stp, params, t_r[k], dt_r[k], y_k, aux_k, acc_r[k],
                    slot_r[k], g_out, lam_c, gp_c,
                )
                return solbuf, sy, saux, cursor, lam_c, gp_c

            carry = lax.switch(
                op, [r_sol, r_stage, adv, store, rev, cap, rev_stage], carry
            )
            return carry, None

        init = (solbuf, sy, saux, y0, lam, gp)
        (_, _, _, _, lam, gp), _ = lax.scan(body, init, acts)
        return lam, gp

    def _bwd_disk(stp, params, recs, g_out, lam, gp, y0):
        from jax.experimental import io_callback

        t_r, dt_r, acc_r, slot_r = recs[:4]
        template = jax.ShapeDtypeStruct(y0.shape, y0.dtype)

        def body(carry, x):
            lam_c, gp_c = carry
            k, t_k, dt_k, acc_k, s_k = x
            y_k = io_callback(
                lambda kk: _dtraj.read_step(_disk_id, kk,
                                            np.zeros(y0.shape, y0.dtype)),
                template, k, ordered=True,
            )
            lam_c, gp_c = _gated_adj(
                stp, params, t_k, dt_k, y_k, None, acc_k, s_k, g_out,
                lam_c, gp_c
            )
            return (lam_c, gp_c), None

        ks = jnp.arange(max_steps)
        (lam, gp), _ = lax.scan(
            body, (lam, gp), (ks, t_r, dt_r, acc_r, slot_r), reverse=True
        )
        return lam, gp

    # -- custom-vjp wrapper --------------------------------------------------

    @jax.custom_vjp
    def solve_core(y0, params, dt0_v):
        outputs, stats, _, _ = forward(y0, params, dt0_v)
        return outputs, stats

    def solve_fwd(y0, params, dt0_v):
        outputs, stats, recs, bufs = forward(y0, params, dt0_v)
        return (outputs, stats), (y0, params, recs, bufs)

    def solve_bwd(res, cts):
        g_outputs, _ = cts
        y0, params, recs, bufs = res
        stp = _prepared(y0, params)
        gp0 = tree_zeros_like(params)
        lam0 = jnp.zeros_like(y0)
        # the per-step forcing (cotangent of the output written at the END
        # of trial step k; slot >= 0 only on accepted landing steps) is
        # gathered from g_outputs INSIDE each engine's scan body — never
        # materialized as an O(max_steps * state) array, which would
        # defeat the low-memory policies

        if kind in ("store_all", "solution_only"):
            lam, gp = _bwd_direct(stp, params, recs, g_outputs, lam0, gp0)
        elif kind == "checkpoint":
            (cps,) = bufs
            lam, gp = _bwd_checkpoint(
                stp, params, recs, g_outputs, lam0, gp0, cps
            )
        elif kind == "revolve":
            lam, gp = _bwd_revolve(
                stp, params, recs, g_outputs, lam0, gp0, y0
            )
        elif kind == "cams":
            lam, gp = _bwd_cams(
                stp, params, recs, g_outputs, lam0, gp0, y0, bufs
            )
        else:  # disk
            lam, gp = _bwd_disk(stp, params, recs, g_outputs, lam0, gp0, y0)

        # t_out[0] output is y0 itself
        lam = lam + g_outputs[0]
        # dt0 is data to the controller (the recorded schedule is replayed,
        # not re-adapted — "differentiate the discretization you ran")
        return lam, gp, jnp.zeros(
            (), jnp.promote_types(y0.dtype, jnp.float32))

    solve_core.defvjp(solve_fwd, solve_bwd)

    def solve(y0, params, dt0_arg=None):
        d = dt0 if dt0_arg is None else dt0_arg
        return solve_core(
            y0, params,
            jnp.asarray(d, jnp.promote_types(y0.dtype, jnp.float32)))

    # exposed for tests: lets the policy-memory test inspect the residual
    # shapes (the scalar record must be O(max_steps), states only where the
    # policy stores them)
    solve.forward_for_test = lambda y0, params: forward(
        y0, params, jnp.asarray(dt0))
    return solve
