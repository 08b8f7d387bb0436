"""Host-orchestrated disk trajectory: real disk spill on backends without
host callbacks (the tunneled TPU).

PETSc's DEFAULT trajectory type is disk (/root/reference/README.md:91-100):
TSSolve writes every step's solution to disk; TSAdjointSolve reads them back
in reverse. The jit-compiled engine in ``adjoint.py`` implements the policy
with an ordered ``io_callback`` inside the scan — which the axon TPU backend
cannot execute (verified round 3: the program hangs before producing output;
see solver.py). This module keeps the capability REAL on such backends by
moving the orchestration to the host — which is the reference's own
architecture: petsc4py's TSSolve / TSAdjointSolve are eager C calls driven
step-by-step from Python (petsc_adjoint.py:829, :871-890), not regions of
one compiled graph.

  forward   N/chunk jitted dispatches; each returns the chunk's per-step
            states, which the host FETCHES (device->host transfers work on
            every backend, including the tunnel) and appends to a disk
            memmap (``-ts_trajectory_dirname``).
  backward  explicit discrete-adjoint solve (the reference's TSAdjointSolve
            + setCostGradients forcing): chunks are re-UPLOADED in reverse
            order and swept by a jitted reverse kernel; the adjoint state
            (lam, gp) never leaves the device.

Device memory is O(chunk * state); the disk holds the O(n_steps * state)
trajectory. Stages are recomputed inside ``step_adj`` (aux=None) — the
same solution-only storage PETSc's disk trajectory defaults to.

NOT jittable end-to-end BY DESIGN: ``jax.grad`` cannot trace across host
I/O, so gradients come from the explicit :meth:`adjoint_solve` /
:meth:`value_and_grad` — mirroring the reference's usage, where the forward
runs under ``torch.no_grad`` and the backward is an explicit TSAdjoint loop
(petsc_adjoint.py:905-947). Exactly two chunk-kernel compilations happen
regardless of trajectory length (the full-chunk length and, if ragged, the
remainder length).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .adjoint import SolveStats
from .misc import tree_add, tree_zeros_like

_COUNTER = [0]


def _np_dtype(name: str):
    if not name:
        return None
    if name in ("bf16", "bfloat16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class HostDiskTrajectory:
    """Disk-backed trajectory + explicit adjoint for one (stepper, grid).

    Parameters
    ----------
    stepper : prepared-capable stepper (``ODESolver._stepper``)
    grid : TimeGrid (static schedule)
    dirname : directory for the trajectory memmap
        (``-ts_trajectory_dirname``, PETSc's flag)
    chunk : steps per dispatch / per disk write (``-pnode_disk_chunk``)
    store_dtype : optional compressed storage dtype ("bf16"/"float16"/...);
        states are re-expanded before the stage transposes
    sel : optional index array or slice subsetting the grid's outputs
        (the solver's ``_prep_times`` selection)
    """

    def __init__(self, stepper, grid, dirname: str = "./ts_trajectory",
                 chunk: int = 64, store_dtype: str = "", sel=None):
        self.stepper = stepper
        self.grid = grid
        self.dirname = dirname
        self.chunk = max(1, int(chunk))
        if store_dtype in ("bf16",):
            store_dtype = "bfloat16"  # the flag accepts either spelling
        self._store_np = _np_dtype(store_dtype)
        self._store_jnp = jnp.dtype(store_dtype) if store_dtype else None
        if sel is None or (isinstance(sel, slice) and sel == slice(None)):
            self.sel = None
        else:
            # normalize slice/array selections to an index array once
            self.sel = np.arange(len(np.asarray(grid.out_idx)))[sel]
        _COUNTER[0] += 1
        self._path = os.path.join(
            dirname, f"pnode_hostdisk_{os.getpid()}_{_COUNTER[0]}.npy"
        )
        self._mm = None
        self._y_final = None
        self._fwd_fns = {}
        self._bwd_fns = {}
        n = int(grid.n_steps)
        self._t0 = float(grid.ts[0]) if n > 0 else 0.0
        uniform = n > 0 and bool(
            np.allclose(grid.dts, grid.dts[0], rtol=1e-12, atol=0.0)
        )
        self._dt0 = float(grid.dts[0]) if uniform else None

    # -- compression -------------------------------------------------------

    def _compress(self, x):
        return x if self._store_jnp is None else x.astype(self._store_jnp)

    # -- jitted chunk kernels (cached by chunk length: at most 2 compiles) --

    def _fwd_fn(self, L: int):
        fn = self._fwd_fns.get(L)
        if fn is not None:
            return fn
        stepper, t0, dt0 = self.stepper, self._t0, self._dt0

        @jax.jit
        def run(y, ts_c, dts_c, params):
            stp = stepper.prepare(t0, y, params, dt0=dt0)

            def body(yy, x):
                t, dt = x
                y1, _, st = stp.step(t, dt, yy, params)
                return y1, (self._compress(yy), st)

            y_end, (hist, stats) = lax.scan(body, y, (ts_c, dts_c))
            return (y_end, hist, jnp.sum(stats.newton_iters),
                    jnp.all(stats.newton_converged))

        self._fwd_fns[L] = run
        return run

    def _bwd_fn(self, L: int):
        fn = self._bwd_fns.get(L)
        if fn is not None:
            return fn
        stepper, t0, dt0 = self.stepper, self._t0, self._dt0

        @jax.jit
        def run(lam, gp, y_hist, ts_c, dts_c, force_c, params):
            stp = stepper.prepare(t0, lam, params, dt0=dt0)

            def body(carry, x):
                lam_i, gp_i = carry
                y_k, t_k, dt_k, f_k = x
                y_k = y_k.astype(lam_i.dtype)
                # aux=None: recompute stages (solution-only storage, the
                # PETSc disk-trajectory default)
                lam_new, gstep = stp.step_adj(t_k, dt_k, y_k, params,
                                              None, lam_i)
                lam_new = lam_new + f_k
                return (lam_new, tree_add(gp_i, gstep)), None

            (lam, gp), _ = lax.scan(
                body, (lam, gp), (y_hist, ts_c, dts_c, force_c), reverse=True
            )
            return lam, gp

        self._bwd_fns[L] = run
        return run

    # -- chunk geometry ------------------------------------------------------

    def _chunks(self):
        n = int(self.grid.n_steps)
        edges = list(range(0, n, self.chunk)) + [n]
        return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]

    # -- forward -------------------------------------------------------------

    def solve(self, y0, params) -> Tuple[jnp.ndarray, SolveStats]:
        """Forward solve; every step's solution streams to the disk memmap.

        Returns (outputs, stats) like ``ODESolver.solve``. The final output
        is exact (device value); interior outputs read back through the
        (possibly compressed) disk store.
        """
        grid = self.grid
        n = int(grid.n_steps)
        y0 = jnp.asarray(y0)
        out_idx = np.asarray(grid.out_idx)
        if n == 0:
            outputs = jnp.stack([y0 for _ in out_idx])
            stats = SolveStats(jnp.zeros((), jnp.int32), jnp.asarray(True))
            return (outputs if self.sel is None else outputs[self.sel]), stats

        os.makedirs(self.dirname, exist_ok=True)
        store_dt = self._store_np or np.dtype(np.asarray(
            jax.device_get(jnp.zeros((), y0.dtype))).dtype)
        mm = np.lib.format.open_memmap(
            self._path, mode="w+", dtype=store_dt,
            shape=(n + 1,) + tuple(y0.shape),
        )
        self._mm = mm

        ts_np = np.asarray(grid.ts)
        dts_np = np.asarray(grid.dts)
        y = y0
        nit = 0
        conv = True
        for a, b in self._chunks():
            run = self._fwd_fn(b - a)
            y, hist, it_c, cv_c = run(
                y, jnp.asarray(ts_np[a:b], y0.dtype),
                jnp.asarray(dts_np[a:b], y0.dtype), params,
            )
            # device->host fetch: the only sync primitive the tunneled
            # backend has — and all this engine needs
            mm[a:b] = np.asarray(jax.device_get(hist))
            nit += int(it_c)
            conv = conv and bool(cv_c)
        y_final = y
        mm[n] = np.asarray(jax.device_get(self._compress(y_final)))
        mm.flush()
        self._y_final = y_final

        outs = []
        for oi in out_idx:
            if oi == n:
                outs.append(y_final)  # exact, never round-tripped
            elif oi == 0:
                outs.append(y0)
            else:
                outs.append(jnp.asarray(mm[oi], y0.dtype))
        outputs = jnp.stack(outs)
        stats = SolveStats(jnp.asarray(nit, jnp.int32), jnp.asarray(conv))
        return (outputs if self.sel is None else outputs[self.sel]), stats

    # -- explicit adjoint ------------------------------------------------------

    def adjoint_solve(self, g_outputs, params):
        """Discrete adjoint from output cotangents (TSAdjointSolve +
        setCostGradients forcing, reference petsc_adjoint.py:871-890).

        ``g_outputs``: cotangent per RETURNED output (post-``sel``).
        Returns ``(grad_y0, grad_params)`` — identical to what
        ``jax.grad`` of the in-memory path produces for the same loss.
        """
        if self._mm is None:
            raise RuntimeError("run solve() before adjoint_solve()")
        grid = self.grid
        n = int(grid.n_steps)
        out_idx = np.asarray(grid.out_idx)
        g_np = np.asarray(jax.device_get(jnp.stack(list(g_outputs))),
                          dtype=np.float64)

        # undo the output selection: scatter-add back onto grid outputs
        if self.sel is not None:
            g_full = np.zeros((len(out_idx),) + g_np.shape[1:], g_np.dtype)
            np.add.at(g_full, self.sel, g_np)
            g_np = g_full

        state_shape = tuple(g_np.shape[1:])
        dtype = self._y_final.dtype if self._y_final is not None else jnp.float32

        def node_force(k):
            f = np.zeros(state_shape, np.float64)
            for i, oi in enumerate(out_idx):
                if oi == k:
                    f += g_np[i]
            return f

        lam = jnp.asarray(node_force(n), dtype)
        gp = tree_zeros_like(params)
        if n == 0:
            return lam, gp

        ts_np = np.asarray(grid.ts)
        dts_np = np.asarray(grid.dts)
        mm = self._mm
        hit_nodes = set(int(x) for x in out_idx)
        for a, b in reversed(self._chunks()):
            run = self._bwd_fn(b - a)
            force_c = np.zeros((b - a,) + state_shape, np.float64)
            for k in range(a, b):
                if k in hit_nodes:
                    force_c[k - a] = node_force(k)
            lam, gp = run(
                lam, gp,
                jnp.asarray(mm[a:b]),  # host->device re-upload of the chunk
                jnp.asarray(ts_np[a:b], dtype),
                jnp.asarray(dts_np[a:b], dtype),
                jnp.asarray(force_c, dtype),
                params,
            )
        return lam, gp

    # -- convenience -------------------------------------------------------

    def value_and_grad(self, loss_fn: Callable, y0, params):
        """loss_fn(outputs) -> scalar; returns (loss, (grad_y0, grad_params)).

        The loss and its output-cotangents are computed on device (outputs
        are n_out states — small); the trajectory stays on disk.
        """
        outputs, _ = self.solve(y0, params)
        loss, g_out = jax.value_and_grad(loss_fn)(outputs)
        grad_y0, grad_p = self.adjoint_solve(g_out, params)
        return loss, (grad_y0, grad_p)

    def close(self):
        if self._mm is not None:
            del self._mm
            self._mm = None
        if os.path.exists(self._path):
            os.remove(self._path)


class AdaptiveHostDiskTrajectory:
    """Host-orchestrated disk trajectory for the ADAPTIVE path
    (``-ts_adapt_type basic`` + ``-ts_trajectory_type disk`` on backends
    without host callbacks) — PETSc's default configuration: TSAdapt with
    the disk TSTrajectory (/root/reference/README.md:91-100).

    Same architecture as :class:`HostDiskTrajectory`, chunked over the
    STATIC trial-step axis (``-ts_adapt_max_steps``): the forward runs the
    bounded adaptive controller scan ``chunk`` trials per dispatch,
    carrying the controller state (t, dt, output cursor, error history)
    across dispatches, and fetches each chunk's per-trial-step states into
    the disk memmap; the backward re-uploads chunks in reverse and sweeps
    them with the acc-gated stage transposes (``adaptive._gated_adj`` —
    the exact engine the in-memory policies use).

    The controller body REPLICATES adaptive.make_adaptive_odeint's
    trial-step body (the plain-record branch); the tether against drift is
    tests/test_disk_host.py::test_adaptive_disk_host_bit_parity, which
    asserts outputs, stats, AND gradients are identical to the in-memory
    solution_only engine.
    """

    def __init__(self, stepper, t_out, cfg, dt0: float,
                 dirname: str = "./ts_trajectory", chunk: int = 64,
                 store_dtype: str = "", sel=None):
        from .adaptive import AdaptConfig  # noqa: F401 (type anchor)

        self.stepper = stepper
        self.t_out = np.asarray(t_out, np.float64)
        self.cfg = cfg
        self.dt0 = float(dt0)
        self.dirname = dirname
        self.chunk = max(1, int(chunk))
        if store_dtype in ("bf16",):
            store_dtype = "bfloat16"
        self._store_np = _np_dtype(store_dtype)
        self._store_jnp = jnp.dtype(store_dtype) if store_dtype else None
        n_out = len(self.t_out)
        if sel is None or (isinstance(sel, slice) and sel == slice(None)):
            self.sel = None
        else:
            self.sel = np.arange(n_out)[sel]
        _COUNTER[0] += 1
        self._path = os.path.join(
            dirname, f"pnode_hostdisk_adapt_{os.getpid()}_{_COUNTER[0]}.npy"
        )
        self._mm = None
        self._scalars = None
        self._fwd_fns = {}
        self._bwd_fns = {}

    def _compress(self, x):
        return x if self._store_jnp is None else x.astype(self._store_jnp)

    def _prepared(self, y, params):
        prep = getattr(self.stepper, "prepare", None)
        if prep is None:
            return self.stepper
        tdt = jnp.promote_types(y.dtype, jnp.float32)
        # dt0=None: dt varies under the controller (adaptive._prepared)
        return prep(jnp.asarray(self.t_out[0], tdt), y, params, dt0=None)

    # -- jitted chunk kernels (cached by length: at most 2 compiles each) ---

    def _fwd_fn(self, L: int):
        fn = self._fwd_fns.get(L)
        if fn is not None:
            return fn
        cfg = self.cfg
        t_out = self.t_out
        n_out = len(t_out)
        expo = 1.0 / (cfg.order + 1)

        @jax.jit
        def run(carry, params):
            (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv, eprev) = carry
            stp = self._prepared(y, params)
            tdtype = t.dtype
            touts = jnp.asarray(t_out, tdtype)
            t_end = touts[-1]

            def body(c, _):
                # MIRRORS adaptive.make_adaptive_odeint's trial body (plain
                # branch) — keep in lockstep; the bit-parity test enforces it
                (t, y, dt, out_i, outputs, n_acc, n_rej, nit, conv,
                 eprev) = c
                done = out_i >= n_out
                target = touts[jnp.minimum(out_i, n_out - 1)]
                dt_try = jnp.minimum(dt, target - t)
                dt_try = jnp.maximum(dt_try, jnp.asarray(0.0, tdtype))

                y1, err, aux, st = stp.step_embedded(t, dt_try, y, params)
                from .adaptive import _wrms

                enorm = _wrms(err, y, y1, cfg.rtol, cfg.atol)
                accept = jnp.logical_or(enorm <= 1.0,
                                        dt_try <= 1e-14 * t_end)
                accept = jnp.logical_and(accept, jnp.logical_not(done))

                e_cur = jnp.maximum(enorm, 1e-10)
                if cfg.controller == "pi":
                    fac = (cfg.safety
                           * jnp.power(e_cur, -cfg.pi_kI * expo)
                           * jnp.power(eprev, cfg.pi_kP * expo))
                else:
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
                        (-1,) + (1,) * y.ndim
                    ),
                    y_new[None],
                    outputs,
                )
                out_i = jnp.where(landed, out_i + 1, out_i)
                n_acc2 = n_acc + jnp.where(accept, 1, 0)
                n_rej2 = n_rej + jnp.where(
                    jnp.logical_and(jnp.logical_not(accept),
                                    jnp.logical_not(done)), 1, 0,
                )
                nit2 = nit + st.newton_iters
                conv2 = jnp.logical_and(conv, st.newton_converged)
                new_c = (t_new, y_new, dt_next, out_i, outputs, n_acc2,
                         n_rej2, nit2, conv2, eprev_new)
                rec = (t, dt_try, accept, out_slot, self._compress(y))
                return new_c, rec

            carry2, recs = lax.scan(body, carry, None, length=L)
            return carry2, recs

        self._fwd_fns[L] = run
        return run

    def _bwd_fn(self, L: int):
        fn = self._bwd_fns.get(L)
        if fn is not None:
            return fn

        @jax.jit
        def run(lam, gp, y_hist, t_r, dt_r, acc_r, slot_r, g_out, params):
            from .adaptive import _gated_adj

            stp = self._prepared(lam, params)

            def body(carry, x):
                lam_i, gp_i = carry
                t_k, dt_k, acc_k, s_k, y_k = x
                y_k = y_k.astype(lam_i.dtype)
                lam_i, gp_i = _gated_adj(
                    stp, params, t_k, dt_k, y_k, None, acc_k, s_k, g_out,
                    lam_i, gp_i,
                )
                return (lam_i, gp_i), None

            (lam, gp), _ = lax.scan(
                body, (lam, gp), (t_r, dt_r, acc_r, slot_r, y_hist),
                reverse=True,
            )
            return lam, gp

        self._bwd_fns[L] = run
        return run

    def _chunks(self):
        n = int(self.cfg.max_steps)
        edges = list(range(0, n, self.chunk)) + [n]
        return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]

    # -- forward -----------------------------------------------------------

    def solve(self, y0, params):
        from .adaptive import AdaptiveStats

        y0 = jnp.asarray(y0)
        n_out = len(self.t_out)
        max_steps = int(self.cfg.max_steps)
        tdtype = jnp.promote_types(y0.dtype, jnp.float32)

        os.makedirs(self.dirname, exist_ok=True)
        store_dt = self._store_np or np.dtype(np.asarray(
            jax.device_get(jnp.zeros((), y0.dtype))).dtype)
        mm = np.lib.format.open_memmap(
            self._path, mode="w+", dtype=store_dt,
            shape=(max_steps,) + tuple(y0.shape),
        )
        self._mm = mm
        t_sc = np.zeros((max_steps,), np.float64)
        dt_sc = np.zeros((max_steps,), np.float64)
        acc_sc = np.zeros((max_steps,), bool)
        slot_sc = np.full((max_steps,), -1, np.int64)

        outputs0 = jnp.broadcast_to(
            y0, (n_out,) + y0.shape).astype(y0.dtype)
        carry = (
            jnp.asarray(self.t_out[0], tdtype), y0,
            jnp.asarray(self.dt0, tdtype), jnp.asarray(1), outputs0,
            jnp.asarray(0), jnp.asarray(0), jnp.asarray(0, jnp.int32),
            jnp.asarray(True), jnp.asarray(1.0, tdtype),
        )
        for a, b in self._chunks():
            run = self._fwd_fn(b - a)
            carry, recs = run(carry, params)
            t_r, dt_r, acc_r, slot_r, y_r = recs
            # device->host fetch: states to disk, scalar record to RAM
            mm[a:b] = np.asarray(jax.device_get(y_r))
            t_sc[a:b] = np.asarray(jax.device_get(t_r), np.float64)
            dt_sc[a:b] = np.asarray(jax.device_get(dt_r), np.float64)
            acc_sc[a:b] = np.asarray(jax.device_get(acc_r))
            slot_sc[a:b] = np.asarray(jax.device_get(slot_r))
        mm.flush()
        self._scalars = (t_sc, dt_sc, acc_sc, slot_sc)
        self._tdtype = tdtype

        (_, _, _, out_i, outputs, n_acc, n_rej, nit, conv, _) = carry
        stats = AdaptiveStats(
            steps=n_acc + n_rej, accepted=n_acc, rejected=n_rej,
            newton_iters=nit, newton_converged=conv,
            completed=out_i >= n_out,
        )
        return (outputs if self.sel is None else outputs[self.sel]), stats

    # -- explicit adjoint ----------------------------------------------------

    def adjoint_solve(self, g_outputs, params):
        if self._mm is None:
            raise RuntimeError("run solve() before adjoint_solve()")
        n_out = len(self.t_out)
        g = jnp.stack(list(g_outputs))
        if self.sel is not None:
            g_full = jnp.zeros((n_out,) + g.shape[1:], g.dtype)
            g_full = g_full.at[jnp.asarray(self.sel)].add(g)
            g = g_full
        dtype = g.dtype
        lam = jnp.zeros(g.shape[1:], dtype)
        gp = tree_zeros_like(params)
        t_sc, dt_sc, acc_sc, slot_sc = self._scalars
        mm = self._mm
        for a, b in reversed(self._chunks()):
            run = self._bwd_fn(b - a)
            lam, gp = run(
                lam, gp,
                jnp.asarray(mm[a:b]),
                jnp.asarray(t_sc[a:b], self._tdtype),
                jnp.asarray(dt_sc[a:b], self._tdtype),
                jnp.asarray(acc_sc[a:b]),
                jnp.asarray(slot_sc[a:b], jnp.int32),
                g, params,
            )
        # t_out[0] output is y0 itself (adaptive.solve_bwd tail)
        lam = lam + g[0]
        return lam, gp

    def value_and_grad(self, loss_fn: Callable, y0, params):
        outputs, _ = self.solve(y0, params)
        loss, g_out = jax.value_and_grad(loss_fn)(outputs)
        grad_y0, grad_p = self.adjoint_solve(g_out, params)
        return loss, (grad_y0, grad_p)

    def close(self):
        if self._mm is not None:
            del self._mm
            self._mm = None
        if os.path.exists(self._path):
            os.remove(self._path)
