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
"""

from __future__ import annotations

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


def _wrms(err, y0, y1, rtol, atol):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return jnp.sqrt(jnp.mean((err / scale) ** 2))


def make_adaptive_odeint(stepper, t_out: np.ndarray, cfg: AdaptConfig,
                         dt0: float, with_adjoint: bool = True):
    """Build solve(y0, params) -> (outputs, stats) with adaptive stepping.

    ``stepper`` must provide ``step_embedded(t, dt, y, params) ->
    (y1, err, aux, stats)``; t_out is the static ascending output-time array
    (t_out[0] = initial time, reported as y0).
    """
    t_out = np.asarray(t_out, dtype=np.float64)
    n_out = len(t_out)
    max_steps = int(cfg.max_steps)
    expo = 1.0 / (cfg.order + 1)

    def _prepared(y0, params):
        # freeze-once-per-odeint Jacobian semantics (same as the fixed-grid
        # driver's _prepare); dt0=None because dt varies under the
        # controller — stage inverses are computed per trial step instead
        # of pre-inverted (steppers._fused_reverse_args(dt=...))
        prep = getattr(stepper, "prepare", None)
        if prep is None:
            return stepper
        return prep(jnp.asarray(t_out[0], y0.dtype), y0, params, dt0=None)

    def forward(y0, params):
        stp = _prepared(y0, params)
        dtype = y0.dtype
        touts = jnp.asarray(t_out, dtype)
        t_end = touts[-1]
        outputs0 = jnp.broadcast_to(y0, (n_out,) + y0.shape).astype(dtype)

        def body(carry, _):
            (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv,
             eprev) = carry
            done = out_i >= n_out
            target = touts[jnp.minimum(out_i, n_out - 1)]
            # MATCHSTEP: truncate onto the next requested output
            dt_try = jnp.minimum(dt, target - t)
            dt_try = jnp.maximum(dt_try, jnp.asarray(0.0, dtype))

            y1, err, _, st = stp.step_embedded(t, dt_try, y, params)
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
            dt_next = jnp.where(done, dt, dt * fac)
            eprev_new = jnp.where(accept, e_cur, eprev)

            t_new = jnp.where(accept, t + dt_try, t)
            y_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), y, y1
            )
            tol = 1e-10 * jnp.maximum(jnp.abs(target), 1.0)
            landed = jnp.logical_and(accept, t_new >= target - tol)
            out_slot = jnp.where(landed, out_i, -1)
            outputs = jnp.where(
                (jnp.arange(n_out) == out_slot).reshape(
                    (-1,) + (1,) * y0.ndim
                ),
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
            new_carry = (t_new, y_new, dt_next, out_i, outputs, n_acc, n_rej,
                         nit, conv, eprev_new)
            rec = (y, t, dt_try, accept, out_slot)
            return new_carry, rec

        init = (
            jnp.asarray(t_out[0], dtype), y0, jnp.asarray(dt0, dtype),
            jnp.asarray(1), outputs0, jnp.asarray(0), jnp.asarray(0),
            jnp.asarray(0, jnp.int32), jnp.asarray(True),
            jnp.asarray(1.0, dtype),
        )
        carry, recs = lax.scan(body, init, None, length=max_steps)
        (_, _, _, out_i, outputs, n_acc, n_rej, nit, conv, _) = carry
        stats = AdaptiveStats(
            steps=n_acc + n_rej, accepted=n_acc, rejected=n_rej,
            newton_iters=nit, newton_converged=conv,
            completed=out_i >= n_out,
        )
        return outputs, stats, recs

    if not with_adjoint:
        def solve_noadj(y0, params):
            outputs, stats, _ = forward(y0, params)
            return outputs, stats

        return solve_noadj

    @jax.custom_vjp
    def solve(y0, params):
        outputs, stats, _ = forward(y0, params)
        return outputs, stats

    def solve_fwd(y0, params):
        outputs, stats, recs = forward(y0, params)
        return (outputs, stats), (y0, params, recs)

    def solve_bwd(res, cts):
        g_outputs, _ = cts
        y0, params, recs = res
        stp = _prepared(y0, params)
        gp0 = tree_zeros_like(params)
        lam0 = jnp.zeros_like(y0)

        def body(carry, rec):
            lam, gp = carry
            y_k, t_k, dt_k, accepted, out_slot = rec
            # inject forcing for an output written at the END of this step
            force = jnp.where(
                out_slot >= 0,
                g_outputs[jnp.maximum(out_slot, 0)],
                jnp.zeros_like(lam),
            )
            lam_in = lam + force

            def do_adj(args):
                lam_i, gp_i = args
                lam_n, gstep = stp.step_adj(
                    t_k, dt_k, y_k, params, None, lam_i
                )
                return lam_n, tree_add(gp_i, gstep)

            lam_new, gp_new = lax.cond(
                accepted, do_adj, lambda a: a, (lam_in, gp)
            )
            return (lam_new, gp_new), None

        (lam, gp), _ = lax.scan(body, (lam0, gp0), recs, reverse=True)
        # t_out[0] output is y0 itself
        lam = lam + g_outputs[0]
        return lam, gp

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
