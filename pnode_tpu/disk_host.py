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
same solution-only storage PETSc's disk trajectory defaults to. Both
kernels prepare the stepper at the SOLVE'S INITIAL STATE y0 (passed into
every dispatch), so frozen-Jacobian semantics (``fixed_jacobian=True``)
match the in-memory engines exactly; with a frozen J this re-runs the
O(d^3) assembly once per dispatch rather than once per solve — part of
the measured spill overhead (RESULTS.md), acceptable for a policy whose
cost is I/O-bound by construction.

NOT jittable end-to-end BY DESIGN: ``jax.grad`` cannot trace across host
I/O, so gradients come from the explicit :meth:`adjoint_solve` /
:meth:`value_and_grad` — mirroring the reference's usage, where the forward
runs under ``torch.no_grad`` and the backward is an explicit TSAdjoint loop
(petsc_adjoint.py:905-947). Exactly two chunk-kernel compilations happen
per direction regardless of trajectory length (the full-chunk length and,
if ragged, the remainder length).
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


class _HostDiskBase:
    """Shared plumbing: storage-dtype normalization/compression, chunk
    geometry over ``self._axis_len``, memmap lifecycle, value_and_grad."""

    def _init_common(self, dirname: str, chunk: int, store_dtype: str,
                     sel, n_outputs: int, tag: str, dtype=None):
        self.dirname = dirname
        self.chunk = max(1, int(chunk))
        if store_dtype in ("bf16",):
            store_dtype = "bfloat16"  # the flag accepts either spelling
        self._store_np = _np_dtype(store_dtype)
        self._store_jnp = jnp.dtype(store_dtype) if store_dtype else None
        self.dtype = dtype  # solver state dtype (ODESolver.solve casts too)
        if sel is None or (isinstance(sel, slice) and sel == slice(None)):
            self.sel = None
        else:
            # normalize slice/array selections to an index array once
            self.sel = np.arange(n_outputs)[sel]
        _COUNTER[0] += 1
        self._path = os.path.join(
            dirname, f"pnode_hostdisk_{tag}_{os.getpid()}_{_COUNTER[0]}.npy"
        )
        self._mm = None

    def _compress(self, x):
        return x if self._store_jnp is None else x.astype(self._store_jnp)

    def _cast_y0(self, y0):
        return jnp.asarray(y0, self.dtype) if self.dtype is not None \
            else jnp.asarray(y0)

    def _chunks(self):
        n = int(self._axis_len)
        edges = list(range(0, n, self.chunk)) + [n]
        return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]

    def _open_memmap(self, n_rows: int, state_shape, state_dtype):
        os.makedirs(self.dirname, exist_ok=True)
        store_dt = self._store_np or np.dtype(np.asarray(
            jax.device_get(jnp.zeros((), state_dtype))).dtype)
        self._mm = np.lib.format.open_memmap(
            self._path, mode="w+", dtype=store_dt,
            shape=(n_rows,) + tuple(state_shape),
        )
        return self._mm

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


class HostDiskTrajectory(_HostDiskBase):
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
    dtype : solver state dtype (inputs are cast, matching ODESolver.solve)
    """

    def __init__(self, stepper, grid, dirname: str = "./ts_trajectory",
                 chunk: int = 64, store_dtype: str = "", sel=None,
                 dtype=None):
        self.stepper = stepper
        self.grid = grid
        self._axis_len = int(grid.n_steps)
        self._init_common(dirname, chunk, store_dtype, sel,
                          len(np.asarray(grid.out_idx)), "grid", dtype)
        self._y_final = None
        self._fwd_fns = {}
        self._bwd_fns = {}
        n = int(grid.n_steps)
        self._t0 = float(grid.ts[0]) if n > 0 else 0.0
        uniform = n > 0 and bool(
            np.allclose(grid.dts, grid.dts[0], rtol=1e-12, atol=0.0)
        )
        self._dt0 = float(grid.dts[0]) if uniform else None

    # -- jitted chunk kernels (cached by chunk length: at most 2 compiles) --

    def _fwd_fn(self, L: int):
        fn = self._fwd_fns.get(L)
        if fn is not None:
            return fn
        stepper, t0, dt0 = self.stepper, self._t0, self._dt0

        @jax.jit
        def run(y, y0, ts_c, dts_c, params):
            # prepare at the SOLVE's initial state — frozen-Jacobian parity
            # with the in-memory engine (adjoint.py _prepare)
            stp = stepper.prepare(t0, y0, params, dt0=dt0)

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
        def run(lam, gp, y0, y_hist, ts_c, dts_c, force_c, params):
            stp = stepper.prepare(t0, y0, params, dt0=dt0)

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

    # -- forward -------------------------------------------------------------

    def solve(self, y0, params) -> Tuple[jnp.ndarray, SolveStats]:
        """Forward solve; every step's solution streams to the disk memmap.

        Returns (outputs, stats) like ``ODESolver.solve``. The final output
        is exact (device value); interior outputs read back through the
        (possibly compressed) disk store.
        """
        grid = self.grid
        n = int(grid.n_steps)
        y0 = self._cast_y0(y0)
        self._y0 = y0
        out_idx = np.asarray(grid.out_idx)
        if n == 0:
            outputs = jnp.stack([y0 for _ in out_idx])
            stats = SolveStats(jnp.zeros((), jnp.int32), jnp.asarray(True))
            return (outputs if self.sel is None else outputs[self.sel]), stats

        mm = self._open_memmap(n + 1, y0.shape, y0.dtype)

        ts_np = np.asarray(grid.ts)
        dts_np = np.asarray(grid.dts)
        y = y0
        nit = 0
        conv = True
        for a, b in self._chunks():
            run = self._fwd_fn(b - a)
            y, hist, it_c, cv_c = run(
                y, y0, jnp.asarray(ts_np[a:b], y0.dtype),
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
        if self._y_final is not None:
            dtype = self._y_final.dtype
        else:
            dtype = self.dtype or jnp.stack(list(g_outputs)).dtype

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
        if self._mm is None:
            raise RuntimeError("run solve() before adjoint_solve()")

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
                lam, gp, self._y0,
                jnp.asarray(mm[a:b]),  # host->device re-upload of the chunk
                jnp.asarray(ts_np[a:b], dtype),
                jnp.asarray(dts_np[a:b], dtype),
                jnp.asarray(force_c, dtype),
                params,
            )
        return lam, gp


class AdaptiveHostDiskTrajectory(_HostDiskBase):
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
    them with the acc-gated stage transposes. Both directions run the
    SHARED engine functions (``adaptive.trial_step_core`` forward,
    ``adaptive._gated_adj`` reverse), so parity with the in-memory
    adaptive engine is structural, not coincidental — and asserted
    bit-exact in tests/test_disk_host.py.

    Host orchestration also buys what the traced engine cannot do: the
    forward STOPS dispatching once all outputs have landed (the in-memory
    bounded scan must mask through all max_steps trials), and the adjoint
    skips chunks containing no accepted trial (exact identities).
    """

    def __init__(self, stepper, t_out, cfg, dt0: float,
                 dirname: str = "./ts_trajectory", chunk: int = 64,
                 store_dtype: str = "", sel=None, dtype=None):
        self.stepper = stepper
        self.t_out = np.asarray(t_out, np.float64)
        self.cfg = cfg
        self.dt0 = float(dt0)
        self._axis_len = int(cfg.max_steps)
        self._init_common(dirname, chunk, store_dtype, sel,
                          len(self.t_out), "adapt", dtype)
        self._scalars = None
        self._fwd_fns = {}
        self._bwd_fns = {}

    def _prepared(self, y0, params):
        prep = getattr(self.stepper, "prepare", None)
        if prep is None:
            return self.stepper
        tdt = jnp.promote_types(y0.dtype, jnp.float32)
        # dt0=None: dt varies under the controller (adaptive._prepared)
        return prep(jnp.asarray(self.t_out[0], tdt), y0, params, dt0=None)

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
        def run(carry, y0, params):
            from .adaptive import trial_step_core

            stp = self._prepared(y0, params)
            touts = jnp.asarray(t_out, carry[0].dtype)

            def body(c, _):
                new_c, rec, _aux = trial_step_core(
                    stp, params, cfg, touts, n_out, expo, c
                )
                return new_c, rec + (self._compress(c[1]),)

            carry2, recs = lax.scan(body, carry, None, length=L)
            return carry2, recs

        self._fwd_fns[L] = run
        return run

    def _bwd_fn(self, L: int):
        fn = self._bwd_fns.get(L)
        if fn is not None:
            return fn

        @jax.jit
        def run(lam, gp, y0, y_hist, t_r, dt_r, acc_r, slot_r, g_out,
                params):
            from .adaptive import _gated_adj

            stp = self._prepared(y0, params)

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

    # -- forward -----------------------------------------------------------

    def solve(self, y0, params):
        from .adaptive import AdaptiveStats

        y0 = self._cast_y0(y0)
        self._y0 = y0
        n_out = len(self.t_out)
        max_steps = int(self.cfg.max_steps)
        tdtype = jnp.promote_types(y0.dtype, jnp.float32)

        mm = self._open_memmap(max_steps, y0.shape, y0.dtype)
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
            jnp.asarray(False),
        )
        for a, b in self._chunks():
            run = self._fwd_fn(b - a)
            carry, recs = run(carry, y0, params)
            t_r, dt_r, acc_r, slot_r, y_r = recs
            # device->host fetch: states to disk, scalar record to RAM
            mm[a:b] = np.asarray(jax.device_get(y_r))
            t_sc[a:b] = np.asarray(jax.device_get(t_r), np.float64)
            dt_sc[a:b] = np.asarray(jax.device_get(dt_r), np.float64)
            acc_sc[a:b] = np.asarray(jax.device_get(acc_r))
            slot_sc[a:b] = np.asarray(jax.device_get(slot_r))
            # eager early exit: all outputs landed -> later trials are
            # masked no-ops in the traced engine; here we simply stop
            # (remaining records stay acc=False / slot=-1 = identities)
            if int(carry[3]) >= n_out:
                break
        mm.flush()
        self._scalars = (t_sc, dt_sc, acc_sc, slot_sc)
        self._tdtype = tdtype

        (_, _, dt_end, out_i, outputs, n_acc, n_rej, nit, conv, _,
         _) = carry
        _acc_idx = np.flatnonzero(acc_sc)
        dt_first = jnp.asarray(
            dt_sc[_acc_idx[0]] if _acc_idx.size else dt_end, tdtype
        )
        stats = AdaptiveStats(
            steps=n_acc + n_rej, accepted=n_acc, rejected=n_rej,
            newton_iters=nit, newton_converged=conv,
            completed=out_i >= n_out, dt_last=dt_end, dt_first=dt_first,
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
            if not acc_sc[a:b].any():
                continue  # no accepted trials: exact identity for (lam, gp)
            run = self._bwd_fn(b - a)
            lam, gp = run(
                lam, gp, self._y0,
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
