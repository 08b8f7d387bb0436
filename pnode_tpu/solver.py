"""Solver facade: the three-call user API (setupTS / odeint / odeint_adjoint).

Mirrors the reference's ``ODEPetsc`` class surface
(/root/reference/pnode/petsc_adjoint.py:366-900) so reference workloads carry
over, while the engine underneath is the TPU-native stack (tableau steppers
over ``lax.scan``, hand-written discrete adjoint, matrix-free Newton-Krylov):

    ode = ODESolver()
    ode.setupTS(u_template, func, step_size=..., method="cn",
                implicit_form=True, enable_adjoint=True)
    sol = ode.odeint_adjoint(y0, t)              # uses func.params
    sol = ode.odeint_adjoint(y0, t, params=p)    # functional/differentiable

The functional form is jit-compatible and differentiable: wrap it in
``jax.grad`` over ``params``/``y0`` and the hand-written adjoint runs —
replacing the torch ``autograd.Function`` bridge
(/root/reference/pnode/petsc_adjoint.py:903-947).

Runtime options override programmatic choices (setFromOptions-last):
``-ts_type``, ``-ts_rk_type``, ``-ts_arkimex_type``, ``-ts_adapt_type``,
``-ts_max_steps``, ``-ts_trajectory_type``, ``-ts_trajectory_solution_only``,
``-ts_trajectory_max_cps_ram``, ``-snes_type``, ``-snes_rtol``,
``-snes_max_it``, ``-ksp_rtol``, ``-ksp_atol``, ``-ksp_max_it``,
``-ksp_gmres_restart`` — the same knobs the reference forwards to PETSc
(SURVEY.md section 5.6).
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .adjoint import TrajectoryConfig, make_odeint
from .grid import build_time_grid
from .linsolve import LinearSolveConfig, normalize_linear_solver_name
from .modules import as_dynamics
from .newton import NewtonConfig
from .options import Options
from .steppers import ARKIMEX, ExplicitRK, ImplicitSolveSetup, Theta
from .tableaus import THETA_METHODS, get_ark_tableau, get_rk_tableau

_THETA_TS_TYPES = {"beuler": 1.0, "be": 1.0, "cn": 0.5, "theta": 0.5}


class ODESolver:
    """One configured time integrator (the reference's per-ODEPetsc state)."""

    def __init__(self, prefix: str = ""):
        self.opts = Options(prefix)
        self._configured = False
        self._cache = {}
        self.last_stats = None
        self.nfe_forward = 0
        self.nfe_backward = 0

    # ------------------------------------------------------------------
    def setupTS(
        self,
        u_tensor,
        func,
        step_size=0.01,
        enable_adjoint: bool = True,
        implicit_form: bool = False,
        use_dlpack: bool = True,  # accepted for API parity; meaningless in JAX
        method: str = "dopri5",
        mass=None,
        imex_form: bool = False,
        func2=None,
        batch_size: int = 1,
        linear_solver: str = "petsc",
        fixed_jacobian: bool = False,
        matrixfree_jacobian: bool = True,
        params=None,
        params2=None,
    ):
        """Configure the integrator (kwarg surface mirrors the reference's
        setupTS, /root/reference/pnode/petsc_adjoint.py:534-583).

        Extra (JAX-side) kwargs: ``params``/``params2`` override the
        parameter pytrees carried by ``func``/``func2``.
        """
        if imex_form and func2 is None:
            raise ValueError("func2 must be provided to enable imex_form=True")
        del use_dlpack  # single-tensor world: no interop staging to configure

        self.template = jnp.asarray(u_tensor)
        self.dtype = self.template.dtype
        self.state_shape = self.template.shape
        self.mass = None if mass is None else jnp.asarray(mass, self.dtype)
        self.imex = bool(imex_form)
        self.enable_adjoint = bool(enable_adjoint)
        self.step_size = step_size

        f_im, p_im = as_dynamics(func, params)
        # models may opt into the fused single-kernel reverse step by
        # exposing fused_mlp_spec(variables) (ops/fused_ark_adjoint.py);
        # the implicit part must additionally CERTIFY linearity in y (the
        # fused kernels apply the frozen Jacobian, exact only then)
        self._fused_ex_spec = None
        mod_im = getattr(func, "module", None)
        self._im_linear = bool(getattr(mod_im, "linear_in_y", False))
        if imex_form:
            f_ex, p_ex = as_dynamics(func2, params2)
            self.f = (f_im, f_ex)
            self.params = (p_im, p_ex)
            mod = getattr(func2, "module", None)
            if (mod is not None and hasattr(mod, "fused_mlp_spec")
                    and self._im_linear):
                self._fused_ex_spec = mod.fused_mlp_spec
        else:
            self.f = f_im
            self.params = p_im

        # --- option coupling rules (petsc_adjoint.py:590-594) -------------
        linear_solver = self.opts.get_string("pnode_linear_solver", linear_solver)
        if linear_solver in ("petsc", "gmres"):
            matrixfree_jacobian = True
        if fixed_jacobian or linear_solver in ("torch", "direct", "lu"):
            matrixfree_jacobian = False
        canonical = normalize_linear_solver_name(linear_solver)
        if canonical == "block" and not matrixfree_jacobian:
            kind = "block"
        elif canonical == "block":
            # matrix-free block solve: GMRES already exploits the block
            # structure implicitly (the operator is block-diagonal)
            kind = "gmres"
        elif matrixfree_jacobian:
            kind = "gmres"
        else:
            kind = canonical  # "direct"

        n_tmpl = int(self.template.size)
        if n_tmpl % int(batch_size) != 0:
            raise ValueError(
                f"batch_size {batch_size} does not divide state size {n_tmpl}"
            )
        # inner-solver options use the reference's "pnode_inner_" prefix
        # (hpddm_linearsolve.py:15 setOptionsPrefix), falling back to the
        # unprefixed -ksp_* flags
        inner = Options(self.opts.prefix + "pnode_inner_")

        def _ksp(name, default, get="get_real"):
            outer_val = getattr(self.opts, get)(name, default)
            return getattr(inner, get)(name, outer_val)

        self.lin_cfg = LinearSolveConfig(
            kind=kind,
            rtol=_ksp("ksp_rtol", 1e-5),
            atol=_ksp("ksp_atol", 0.0),
            restart=_ksp("ksp_gmres_restart", 30, "get_int"),
            max_restarts=max(1, _ksp("ksp_max_it", 300, "get_int") // 30),
            block_size=n_tmpl // int(batch_size),
            fixed_jacobian=bool(fixed_jacobian),
        )
        # dtype-aware Newton tolerance defaults: PETSc's 1e-8 presumes fp64;
        # in lower precisions the residual floors around ~50*eps relative,
        # so an unreachable rtol spins every stage to max_it and flags
        # converged=False on solves that are in fact at machine precision
        # (observed on hardware: 150 iters vs 6 on fp64). Derive the floor
        # from the dtype's machine epsilon so half precisions (bf16 eps
        # ~7.8e-3) get a reachable target too, not the fp32 constant.
        # Explicit -snes_rtol/-snes_stol flags always win.
        eps = float(jnp.finfo(jnp.dtype(self.dtype)).eps)
        tol_default = max(50.0 * eps, 1e-8)
        self.newton_cfg = NewtonConfig(
            rtol=self.opts.get_real("snes_rtol", tol_default),
            atol=self.opts.get_real("snes_atol", 1e-50),
            stol=self.opts.get_real("snes_stol", tol_default),
            max_it=self.opts.get_int("snes_max_it", 50),
            ksponly=self.opts.get_string("snes_type", "newtonls") == "ksponly",
            ksponly_check=bool(self.opts.get_int("snes_ksponly_check", 0)),
        )

        # --- method resolution (setFromOptions-last) -----------------------
        meth = method
        ts_type = self.opts.get_string("ts_type")
        if ts_type is not None:
            if ts_type == "rk":
                meth = self.opts.get_string("ts_rk_type", "3bs")
            elif ts_type in _THETA_TS_TYPES:
                meth = ts_type
            elif ts_type == "arkimex":
                meth = "imex"
            elif ts_type == "euler":
                meth = "euler"
            else:
                warnings.warn(f"-ts_type {ts_type} not supported; keeping {meth!r}")
        elif self.opts.has("ts_rk_type"):
            meth = self.opts.get_string("ts_rk_type")
        self.method = meth

        # --- trajectory policy ---------------------------------------------
        traj_kind = "store_all"
        if self.opts.get_int("ts_trajectory_solution_only", 0):
            traj_kind = "solution_only"
        max_cps = self.opts.get_int("ts_trajectory_max_cps_ram", 0)
        if max_cps and max_cps > 0:
            # uniform segments by default; "revolve" selects the optimal
            # binomial schedule (csrc/revolve.cpp); "cams" the optimal
            # multistage mixed solution/stage-set schedule (csrc/cams.cpp),
            # PETSc TSTrajectory's revolve/CAMS pair
            # (/root/reference/README.md:91-100)
            sched = self.opts.get_string("ts_trajectory_schedule", "uniform")
            if sched in ("revolve", "cams"):
                traj_kind = sched
            else:
                traj_kind = "checkpoint"
        tt = self.opts.get_string("ts_trajectory_type", "memory")
        if tt not in ("memory", "disk"):
            warnings.warn(f"-ts_trajectory_type {tt!r} unknown; using memory")
        elif tt == "disk":
            # stream states to a host memmap (PETSc's default trajectory
            # backend). Needs ordered host callbacks, which the tunneled TPU
            # backend lacks — VERIFIED by direct experiment (round 3): a
            # jitted scan containing an ordered io_callback hangs
            # indefinitely (>20 min, SIGTERM) on the axon backend, before
            # producing any output. The DOCUMENTED SUBSTITUTE is the CAMS
            # schedule at the same memory budget (recompute instead of
            # spill; the spill bandwidth over the tunnel would dwarf the
            # recompute cost anyway). -ts_trajectory_max_cps_ram sets the
            # budget (default 16 slots).
            import jax as _jax

            if _jax.default_backend() in ("tpu", "axon"):
                warnings.warn(
                    "-ts_trajectory_type disk needs host callbacks, which "
                    "this TPU backend lacks; substituting the CAMS "
                    "checkpoint schedule at the -ts_trajectory_max_cps_ram "
                    "budget (default 16) for jit-traced solves. REAL disk "
                    "spill is available on this backend through the "
                    "host-orchestrated eager driver: "
                    "ODESolver.disk_trajectory_solver(t) (pnode_tpu/"
                    "disk_host.py)"
                )
                traj_kind = "cams"
                max_cps = max_cps or 16
            else:
                traj_kind = "disk"
        self.traj = TrajectoryConfig(
            kind=traj_kind, max_cps=max_cps or 0,
            store_dtype=self.opts.get_string("pnode_trajectory_dtype", ""),
        )

        self.adapt_type = self.opts.get_string("ts_adapt_type", "none")
        self.max_steps = self.opts.get_int("ts_max_steps", 1_000_000)

        self._cache.clear()
        self._configured = True
        # build eagerly so method-resolution warnings surface here (the
        # reference's silent unknown-method fall-through becomes audible)
        self._stepper = self._build_stepper()
        return self

    # ------------------------------------------------------------------
    def _build_stepper(self):
        meth = self.method
        # with a frozen (fixed) Jacobian the adjoint reuses it too — the
        # reference's dense-path semantics (and a large perf win: cached
        # pre-inverted operators serve the transposed solves)
        exact_adj = not self.lin_cfg.fixed_jacobian
        if self.imex or meth == "imex":
            tab = get_ark_tableau(self.opts.get_string("ts_arkimex_type"))
            setup = ImplicitSolveSetup(self.lin_cfg, self.newton_cfg,
                                       adjoint_exact_jacobian=exact_adj,
                                       im_linear_in_y=self._im_linear)
            f_im, f_ex = self.f
            return ARKIMEX(tab, f_im, f_ex, setup, mass=self.mass,
                           fused_ex_spec=self._fused_ex_spec)
        if meth in THETA_METHODS or meth in _THETA_TS_TYPES:
            theta = THETA_METHODS.get(meth, _THETA_TS_TYPES.get(meth))
            setup = ImplicitSolveSetup(self.lin_cfg, self.newton_cfg,
                                       adjoint_exact_jacobian=exact_adj,
                                       im_linear_in_y=self._im_linear)
            return Theta(theta, self.f, setup, mass=self.mass)
        tab = get_rk_tableau(meth)
        if self.mass is not None:
            raise ValueError(
                "mass matrices require an implicit method (beuler/cn) — the "
                "reference has the same constraint (IFunction-based DAEs)"
            )
        return ExplicitRK(tab, self.f)

    def _get_solve_fn(self, grid, with_adjoint: bool):
        # t0/dt0 are part of the key: make_odeint bakes the STATIC grid
        # scalars into prepare() (frozen-Jacobian linearization time and the
        # pre-inverted operator's step size), so two grids with identical
        # geometry but shifted/rescaled times must not share a compiled fn
        n0 = int(grid.n_steps)
        uniform = n0 > 0 and bool(
            np.allclose(grid.dts, grid.dts[0], rtol=1e-12, atol=0.0)
        )
        key = (
            n0,
            tuple(int(i) for i in grid.out_idx),
            with_adjoint,
            float(grid.ts[0]) if n0 > 0 else 0.0,
            float(grid.dts[0]) if uniform else None,
        )
        fn = self._cache.get(key)
        if fn is None:
            solve = make_odeint(
                self._stepper, grid, self.traj, with_adjoint=with_adjoint
            )
            fn = jax.jit(solve)
            self._cache[key] = fn
        return fn

    def _prep_times(self, t):
        if isinstance(t, jax.core.Tracer):
            raise TypeError(
                "output times `t` must be concrete (they define the static "
                "step schedule, like PETSc's TimeSpan). Close over a fixed "
                "`t` inside jitted functions instead of passing it as a "
                "traced argument; the solve itself is fully jittable."
            )
        # `t` is host-side schedule data. If it lives on an accelerator,
        # fetching it costs a device->host transfer PER TRACE — on the
        # tunneled TPU backend a single tiny transfer measured 35+ s and
        # one jit of a training step re-enters here ~9 times (fwd + vjp +
        # scan traces), which masqueraded as "480 s compile time" in round
        # 2. Memoize the host copy by array identity (training loops reuse
        # one `t` object), and prefer passing numpy/python times.
        memo = getattr(self, "_t_memo", None)
        if memo is not None and memo[0] is t:
            t_np = memo[1]
        else:
            t_np = np.asarray(jax.device_get(t), dtype=np.float64).reshape(-1)
            self._t_memo = (t, t_np)
        if t_np.shape[0] == 1:
            # single output time: integrate [0, t0], return only the endpoint
            # (reference: ts.setTime(0); setMaxTime(t[0]) —
            # petsc_adjoint.py:818-820)
            t_full = np.array([0.0, float(t_np[0])])
            return t_full, slice(1, 2)
        return t_np, slice(None)

    def _build_adapt_cfg(self):
        """(AdaptConfig, dt0) from the options database — shared between the
        jitted adaptive engine and the host-orchestrated disk driver."""
        from .adaptive import AdaptConfig

        if not hasattr(self._stepper, "step_embedded"):
            raise ValueError(
                "-ts_adapt_type basic needs an embedded error estimate; "
                f"method {self.method!r} has none (use an embedded RK "
                "(bosh3/dopri5) or an ARK pair with b_err, or "
                "-ts_adapt_type none)"
            )
        tab = getattr(self._stepper, "tab", None)
        order = getattr(tab, "order", 5) if tab is not None else 2
        # -ts_adapt_clip low,high (PETSc TSAdaptSetClip parity)
        clip = self.opts.get_string("ts_adapt_clip", "")
        lo, hi = 0.1, 10.0
        if clip:
            parts = [p for p in clip.replace(",", " ").split() if p]
            if len(parts) == 2:
                lo, hi = float(parts[0]), float(parts[1])
            else:
                warnings.warn(
                    f"-ts_adapt_clip expects 'low,high'; got {clip!r}"
                )
        cfg = AdaptConfig(
            rtol=self.opts.get_real("ts_rtol", 1e-4),
            atol=self.opts.get_real("ts_atol", 1e-4),
            safety=self.opts.get_real("ts_adapt_safety", 0.9),
            dt_min_factor=lo,
            dt_max_factor=hi,
            max_steps=min(self.max_steps,
                          self.opts.get_int("ts_adapt_max_steps", 4096)),
            order=order,
            controller="pi" if self.adapt_type == "pi" else "basic",
        )
        dt0 = (
            float(self.step_size[0])
            if isinstance(self.step_size, (list, tuple))
            else float(self.step_size)
        )
        return cfg, dt0

    def _get_adaptive_fn(self, t_full, with_adjoint: bool):
        from .adaptive import make_adaptive_odeint

        key = ("adaptive", tuple(float(x) for x in t_full), with_adjoint,
               self.traj)
        fn = self._cache.get(key)
        if fn is None:
            cfg, dt0 = self._build_adapt_cfg()
            fn = jax.jit(
                make_adaptive_odeint(
                    self._stepper, t_full, cfg, dt0,
                    with_adjoint=with_adjoint, traj=self.traj
                )
            )
            self._cache[key] = fn
        return fn

    def solve(self, u0, t, params=None, with_adjoint: Optional[bool] = None,
              dt0=None):
        """Functional solve: returns (solution, stats); differentiable.

        ``dt0`` (adaptive mode only) overrides the controller's initial
        step for THIS solve — feed ``stats.dt_first`` from the previous
        solve to warm-start the controller across repeated solves of the
        SAME window (a training loop: the first accepted dt is the right
        scale at t=0; ``stats.dt_last`` is the end-of-window dt and
        re-pays the descent whenever the trajectory needs a smaller step
        at the start than at the end). PETSc resets dt every TSSolve
        (petsc_adjoint.py:813-817); the warm start avoids re-paying the
        initial rejection descent each iteration. May be a traced value.
        """
        if not self._configured:
            raise RuntimeError("call setupTS before odeint")
        if with_adjoint is None:
            with_adjoint = self.enable_adjoint
        t_full, sel = self._prep_times(t)
        if self.adapt_type not in (None, "none"):
            fn = self._get_adaptive_fn(t_full, with_adjoint)
            y0 = jnp.asarray(u0, self.dtype)
            p = self.params if params is None else params
            outputs, stats = fn(y0, p) if dt0 is None else fn(y0, p, dt0)
            self.last_stats = stats
            return outputs[sel], stats
        if dt0 is not None:
            raise ValueError("dt0 is an adaptive-mode argument "
                             "(-ts_adapt_type basic/pi)")
        grid = build_time_grid(
            t_full, self.step_size, dtype=self.dtype, max_steps=self.max_steps
        )
        fn = self._get_solve_fn(grid, with_adjoint)
        y0 = jnp.asarray(u0, self.dtype)
        p = self.params if params is None else params
        ts = jnp.asarray(grid.ts, self.dtype)
        dts = jnp.asarray(grid.dts, self.dtype)
        outputs, stats = fn(y0, p, ts, dts)
        self.nfe_forward += grid.n_steps * self._stepper.nfe_per_step
        self.last_stats = stats
        return outputs[sel], stats

    def disk_trajectory_solver(self, t, chunk: Optional[int] = None):
        """Real ``-ts_trajectory_type disk`` for backends without host
        callbacks (the tunneled TPU): a host-orchestrated
        :class:`~pnode_tpu.disk_host.HostDiskTrajectory` bound to this
        solver's stepper and the step schedule for ``t``.

        The returned object runs the forward as chunked jitted dispatches
        whose per-step states stream to a disk memmap via device->host
        fetches, and computes gradients by an EXPLICIT adjoint solve that
        re-uploads chunks in reverse (the reference's TSSolve /
        TSAdjointSolve architecture, petsc_adjoint.py:829, :871-890). Use
        ``.solve(y0, params)`` / ``.adjoint_solve(g_outputs, params)`` /
        ``.value_and_grad(loss_fn, y0, params)``; it is an eager driver,
        not jittable end-to-end (that is what makes it work where the
        io_callback engine hangs). Under ``-ts_adapt_type`` the adaptive
        variant chunks the static trial axis instead (PETSc's default
        configuration: TSAdapt + disk TSTrajectory).

        ``chunk`` (or ``-pnode_disk_chunk``, default 64) bounds device
        memory at O(chunk * state); disk holds the full trajectory in
        ``-ts_trajectory_dirname``.
        """
        if not self._configured:
            raise RuntimeError("call setupTS before disk_trajectory_solver")
        from .disk_host import AdaptiveHostDiskTrajectory, HostDiskTrajectory

        t_full, sel = self._prep_times(t)
        if chunk is None:
            chunk = self.opts.get_int("pnode_disk_chunk", 64)
        dirname = self.opts.get_string("ts_trajectory_dirname",
                                       "./ts_trajectory")
        if self.adapt_type not in (None, "none"):
            cfg, dt0 = self._build_adapt_cfg()
            return AdaptiveHostDiskTrajectory(
                self._stepper, t_full, cfg, dt0, dirname=dirname,
                chunk=chunk, store_dtype=self.traj.store_dtype, sel=sel,
                dtype=self.dtype,
            )
        grid = build_time_grid(
            t_full, self.step_size, dtype=self.dtype, max_steps=self.max_steps
        )
        return HostDiskTrajectory(
            self._stepper, grid, dirname=dirname, chunk=chunk,
            store_dtype=self.traj.store_dtype, sel=sel, dtype=self.dtype,
        )

    # -- reference-parity entry points ----------------------------------

    def odeint(self, u0, t, params=None):
        """Forward solve without adjoint bookkeeping
        (/root/reference/pnode/petsc_adjoint.py:777)."""
        sol, _ = self.solve(u0, t, params=params, with_adjoint=False)
        return sol

    def odeint_adjoint(self, u0, t, params=None):
        """Forward solve whose gradients run the discrete adjoint
        (/root/reference/pnode/petsc_adjoint.py:892)."""
        if not self.enable_adjoint:
            warnings.warn("odeint_adjoint called with enable_adjoint=False; enabling")
            self.enable_adjoint = True
        sol, _ = self.solve(u0, t, params=params, with_adjoint=True)
        return sol


# Reference-compatible alias: `from pnode_tpu.petsc_adjoint import ODEPetsc`
ODEPnode = ODESolver
