"""Time steppers with stage-exact hand-written discrete adjoints.

TPU-native replacement for PETSc TS + TSAdjoint
(/root/reference/pnode/petsc_adjoint.py:638-656 selects RK tableaus, TSBE,
TSCN, TSARKIMEX; TSAdjoint transposes them step-by-step). Each stepper
provides:

- ``step(t, dt, y, params) -> (y1, aux, stats)``: one step, pure and
  traceable; ``aux`` holds stage values (the ``-ts_trajectory_solution_only 0``
  payload: storing it lets the adjoint skip stage recomputation/Newton
  re-solves, exactly the memory/recompute trade PETSc TSTrajectory exposes).
- ``step_adj(t, dt, y, params, aux, lam) -> (lam_prev, gparams)``: the exact
  transpose of the discrete step map. For explicit RK this is the classical
  transposed-RK recursion evaluated with ``jax.vjp`` per stage; for implicit
  (theta) and additive (ARK IMEX) methods the implicit stages are transposed
  via the implicit function theorem: one *transposed* linear solve
  (sigma*M - gamma*J)^T at the converged stage, which is precisely what
  TSAdjoint does with the shell-matrix ``multTranspose``
  (/root/reference/pnode/petsc_adjoint.py:146-196) — except J^T v here is a
  native ``jax.vjp`` instead of a double-VJP shell.

Derivation of the ARK adjoint (used below): with stages
``Y_i = y + h sum_{j<i}(aI_ij kI_j + aE_ij kE_j) + h aI_ii fI(Y_i)`` and
``y1 = y + h sum_i (bI_i kI_i + bE_i kE_i)``, the reverse recursion for
``xi_i = dL/dG_i`` (G_i the explicit part of the stage equation) is::

    u_i  = h (bI_i lam + sum_{m>i} aI_mi xi_m)      # covector into kI_i
    uh_i = h (bE_i lam + sum_{m>i} aE_mi xi_m)      # covector into kE_i
    p_i  = JI_i^T u_i + JE_i^T uh_i
    xi_i = (I - h aI_ii JI_i)^{-T} p_i              # transposed stage solve
    grad_thI += fI_th^T (u_i + h aI_ii xi_i);  grad_thE += fE_th^T uh_i
    lam_prev = lam + sum_i xi_i

The theta method (BE/CN, with optional singular mass matrix for DAEs) is the
single-stage specialization with residual
``R(z) = M(z - y) - h[(1-theta) f(t,y) + theta f(t+h,z)]``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .linsolve import LinearSolveConfig, make_stage_solver
from .misc import tree_add, tree_zeros_like
from .newton import NewtonConfig, newton_solve
from .tableaus import ARKTableau, RKTableau


class StepStats(NamedTuple):
    """Per-step solver telemetry (summed over the trajectory by the driver)."""

    newton_iters: jnp.ndarray
    newton_converged: jnp.ndarray

    @staticmethod
    def zero():
        return StepStats(
            newton_iters=jnp.array(0, jnp.int32),
            newton_converged=jnp.array(True),
        )


def _mass_apply(mass, v):
    if mass is None:
        return v
    # HIGHEST: DAE mass matrices enter stiff residuals; keep the apply
    # exact on TPU (bf16-default einsum would perturb the constraint rows)
    return jnp.einsum("ij,...j->...i", mass, v,
                      precision=jax.lax.Precision.HIGHEST)


def _mass_apply_T(mass, v):
    if mass is None:
        return v
    return jnp.einsum("ji,...j->...i", mass, v,
                      precision=jax.lax.Precision.HIGHEST)


class ExplicitRK:
    """Tableau-driven explicit RK over arbitrary state shapes.

    Stage loops are unrolled at trace time (s <= 7), letting XLA fuse the
    stage-combine AXPY chains; dynamics evaluations dominate.
    """

    def prepare(self, t0, y0, params, dt0=None):
        """Per-solve setup hook (no-op for explicit methods)."""
        return self

    def __init__(self, tableau: RKTableau, f: Callable):
        self.tab = tableau
        self.f = f  # f(t, y, params) -> dy
        # Python-float coefficient views: numpy float64 scalars would promote
        # fp32 states to fp64 under jax_enable_x64 (weak typing keeps dtypes)
        self._a = [[float(x) for x in row] for row in tableau.a]
        self._b = [float(x) for x in tableau.b]
        self._c = [float(x) for x in tableau.c]
        self._berr = (
            None if tableau.b_err is None else [float(x) for x in tableau.b_err]
        )
        # stages whose adjoint covector is identically zero can be skipped in
        # the reverse sweep (e.g. dopri5's FSAL stage has b_i = 0 = a_mi)
        s = tableau.stages
        self._adj_active = [
            bool(tableau.b[i] != 0.0 or np.any(tableau.a[i + 1:, i] != 0.0))
            for i in range(s)
        ]
        self.nfe_per_step = s

    def step(self, t, dt, y, params):
        a, b, c = self._a, self._b, self._c
        s = self.tab.stages
        ks = []
        for i in range(s):
            Yi = y
            for j in range(i):
                if a[i][j] != 0.0:
                    Yi = Yi + (dt * a[i][j]) * ks[j]
            ks.append(self.f(t + c[i] * dt, Yi, params))
        y1 = y
        for i in range(s):
            if b[i] != 0.0:
                y1 = y1 + (dt * b[i]) * ks[i]
        aux = jnp.stack(ks)
        # preserve the state dtype across the step (bf16 time integration:
        # stage math may promote to f32 — fused by XLA, costless — but the
        # CARRIED state and the STORED trajectory/aux stay at state dtype,
        # which is where the HBM traffic is; scan carries also require it)
        return y1.astype(y.dtype), aux.astype(y.dtype), StepStats.zero()

    def step_embedded(self, t, dt, y, params):
        """Step + embedded-error estimate (for the adaptive controller)."""
        y1, aux, stats = self.step(t, dt, y, params)
        err = jnp.zeros_like(y)
        for i in range(self.tab.stages):
            d = self._b[i] - self._berr[i]
            if d != 0.0:
                err = err + (dt * d) * aux[i]
        return y1, err, aux, stats

    def _stage_values(self, dt, y, ks):
        a = self._a
        Ys = []
        for i in range(self.tab.stages):
            Yi = y
            for j in range(i):
                if a[i][j] != 0.0:
                    Yi = Yi + (dt * a[i][j]) * ks[j]
            Ys.append(Yi)
        return Ys

    def step_adj(self, t, dt, y, params, aux, lam):
        a, b, c = self._a, self._b, self._c
        s = self.tab.stages
        if aux is None:
            _, aux, _ = self.step(t, dt, y, params)
        ks = [aux[i] for i in range(s)]
        Ys = self._stage_values(dt, y, ks)

        xis: list = [None] * s
        gp = tree_zeros_like(params)
        lam_prev = lam
        for i in range(s - 1, -1, -1):
            if not self._adj_active[i]:
                continue
            u = (dt * b[i]) * lam
            for m in range(i + 1, s):
                if a[m][i] != 0.0 and xis[m] is not None:
                    u = u + (dt * a[m][i]) * xis[m]
            ti = t + c[i] * dt
            fo, vjp = jax.vjp(lambda yy, pp: self.f(ti, yy, pp), Ys[i], params)
            # the cotangent must match f's OUTPUT dtype (which may be
            # promoted above the state dtype, e.g. bf16 state + f32 params)
            dly, dlp = vjp(u.astype(fo.dtype))
            xis[i] = dly
            gp = tree_add(gp, dlp)
            lam_prev = lam_prev + dly
        # state covector rides at state dtype (param grads stay at param
        # dtype via the VJPs); required for the reverse-scan carry
        return lam_prev.astype(lam.dtype), gp


@dataclass
class ImplicitSolveSetup:
    """Static solver configuration shared by theta and ARK steppers."""

    lin_cfg: LinearSolveConfig
    newton_cfg: NewtonConfig
    # frozen per-solve Jacobian blocks for dense/block solvers (the
    # reference's matrixfree_jacobian=False / fixed_jacobian semantics:
    # jacrev once per odeint, reused for every step —
    # /root/reference/pnode/petsc_adjoint.py:474-508)
    frozen_J_blocks: Optional[jnp.ndarray] = None
    # if True, the adjoint's transposed solves re-linearize at the converged
    # stage (exact discrete adjoint); if False they reuse frozen_J_blocks as
    # the reference's dense path does
    adjoint_exact_jacobian: bool = True
    # precomputed stage solvers keyed by the STATIC gamma coefficient
    # (theta, or the ESDIRK diagonal a_ii): built once per solve when the
    # Jacobian is frozen and dt is uniform, so the scan body's stage solves
    # reduce to cached-inverse matmuls (pure MXU work, no LU in the loop)
    solver_cache: Optional[dict] = None
    # the model certified d f_im/dy independent of y (linear_in_y): frozen
    # Jacobians are assembled at a CONSTANT reference state, so for a
    # parameter-free implicit part the whole assemble+invert chain executes
    # eagerly at trace time and lands in the compiled program as a constant
    # instead of running inside every training step
    im_linear_in_y: bool = False


def _const_freeze_ok(setup, params, t0, dt0):
    """True when the frozen Jacobian (and pre-inverted stage operators) can
    be computed at TRACE time under ``jax.ensure_compile_time_eval`` and
    land in the compiled program as constants: the model certified
    d f_im/dy independent of y, the implicit part has no learned
    parameters, and t0/dt0 are concrete. Without this the assembly's
    jacfwd (d tangents over the full batch state) plus the O(d^3)
    inversion execute inside EVERY training step — for Burgers-512 that
    was ~1.6 GB of per-step HBM traffic, 95% of the step time."""
    return (
        setup.im_linear_in_y
        and not jax.tree_util.tree_leaves(params)
        and not isinstance(t0, jax.core.Tracer)
        and not isinstance(dt0, jax.core.Tracer)
    )


def _frozen_setup(owner, setup, params, t0, dt0, y0, f_flat, build_cache):
    """Shared freeze path for Theta/ARKIMEX.prepare: assemble the frozen
    Jacobian (at a constant state under compile-time eval when
    _const_freeze_ok) and build the pre-inverted stage-solver cache.
    Constant results are memoized per stepper instance so repeated
    prepare() calls within one gradient trace (fwd, bwd, plan sizing)
    pay the eager jacfwd + O(d^3) inversion once."""
    import contextlib

    from .linsolve import assemble_block_jacobian

    const = _const_freeze_ok(setup, params, t0, dt0)
    key = None
    if const:
        key = (float(t0), None if dt0 is None else float(dt0),
               tuple(y0.shape), str(y0.dtype))
        memo = getattr(owner, "_const_freeze_memo", None)
        if memo is not None and memo[0] == key:
            return memo[1]
    ctx = (jax.ensure_compile_time_eval() if const
           else contextlib.nullcontext())
    # pin the eager compile-time work to the LOCAL CPU: on a tunneled TPU
    # backend every eager primitive pays a ~9 ms round trip, which turned
    # the jacfwd+inversion freeze into minutes of TRACE time (measured:
    # KS headline trace 206 s on the tunnel vs 13 s on CPU). The frozen
    # constants embed into the compiled program either way.
    dev_ctx = (jax.default_device(jax.devices("cpu")[0]) if const
               else contextlib.nullcontext())
    with ctx, dev_ctx:
        y_lin = jnp.zeros(y0.shape, y0.dtype) if const else y0
        J = assemble_block_jacobian(
            f_flat,
            y_lin.reshape(-1),
            setup.lin_cfg,
            shared=setup.lin_cfg.kind == "block",
        )
        cache = build_cache(J)
    if const:
        owner._const_freeze_memo = (key, (J, cache))
    return J, cache


class Theta:
    """Theta method: backward Euler (theta=1, TSBE) / Crank-Nicolson
    (theta=0.5 endpoint, TSCN), with optional mass matrix for DAEs
    (/root/reference/pnode/petsc_adjoint.py:426-441 evalIFunction:
    ``F = M udot - f(t, u)``; pendulum_DAE uses M = diag(1,1,1,1,0))."""

    def __init__(
        self,
        theta: float,
        f: Callable,
        setup: ImplicitSolveSetup,
        mass: Optional[jnp.ndarray] = None,
    ):
        self.theta = float(theta)
        self.f = f
        self.setup = setup
        self.mass = mass
        self.nfe_per_step = 2 if self.theta < 1.0 else 1

    def prepare(self, t0, y0, params, dt0=None):
        """Freeze the dense/block Jacobian at (t0, y0) for this solve.

        Only active with ``fixed_jacobian=True``, replicating the reference's
        assemble-once-per-odeint semantics
        (/root/reference/pnode/petsc_adjoint.py:474-508 and the setupTS
        docstring at :583). Without it, dense/block solvers re-assemble at
        each Newton iterate — exact Newton, which converges where the
        reference's frozen-Jacobian modified Newton can stall on stiff
        problems (a deliberate accuracy upgrade).
        """
        import copy

        if self.setup.lin_cfg.kind == "gmres" or not self.setup.lin_cfg.fixed_jacobian:
            return self

        def f_flat(zf):
            return self.f(t0, zf.reshape(y0.shape), params).reshape(-1)

        def build_cache(J):
            # uniform dt: pre-invert the stage operator once per solve,
            # keyed by theta (same strategy as ARKIMEX.prepare's gamma
            # cache) — the scan body's solves become cached-inverse matmuls
            # instead of per-step LU
            if dt0 is None or self.mass is not None or self.theta <= 0.0:
                return None
            from .linsolve import DenseStageSolver

            return {
                self.theta: DenseStageSolver(
                    J, None, 1.0, dt0 * self.theta, int(y0.size),
                    use_inverse=True,
                )
            }

        J, cache = _frozen_setup(
            self, self.setup, params, t0, dt0, y0, f_flat, build_cache
        )
        new = copy.copy(self)
        new.setup = ImplicitSolveSetup(
            lin_cfg=self.setup.lin_cfg,
            newton_cfg=self.setup.newton_cfg,
            frozen_J_blocks=J,
            adjoint_exact_jacobian=self.setup.adjoint_exact_jacobian,
            solver_cache=cache,
            im_linear_in_y=self.setup.im_linear_in_y,
        )
        return new

    def _solver(self, t1, params, gamma, z_flat, shape):
        def f_flat(zf):
            return self.f(t1, zf.reshape(shape), params).reshape(-1)

        return make_stage_solver(
            f_flat,
            z_flat,
            self.mass,
            sigma=1.0,
            gamma=gamma,
            cfg=self.setup.lin_cfg,
            cached_J_blocks=self.setup.frozen_J_blocks,
        )

    def step(self, t, dt, y, params):
        th = self.theta
        t1 = t + dt
        shape = y.shape
        f_n = self.f(t, y, params) if th < 1.0 else None

        def residual_flat(z_flat):
            z = z_flat.reshape(shape)
            rhs = th * self.f(t1, z, params)
            if f_n is not None:
                rhs = rhs + (1.0 - th) * f_n
            r = _mass_apply(self.mass, z - y) - dt * rhs
            return r.reshape(-1)

        gamma = dt * th
        cache = self.setup.solver_cache
        if cache is not None and th in cache:
            cached = cache[th]
            make = lambda zf: cached
        else:
            make = lambda zf: self._solver(t1, params, gamma, zf, shape)
        # Newton/Krylov run at promoted (>= f32) precision even for low-
        # precision states; the step result is cast back at the boundary
        wdt = jnp.promote_types(y.dtype, jnp.float32)
        z_flat, nstats = newton_solve(
            residual_flat, make, y.reshape(-1).astype(wdt),
            self.setup.newton_cfg
        )
        # Newton iterates may promote (f32 solver internals); carry the
        # state dtype through (bf16 time integration / scan-carry dtype)
        y1 = z_flat.reshape(shape).astype(y.dtype)
        stats = StepStats(
            newton_iters=nstats.iters.astype(jnp.int32),
            newton_converged=nstats.converged,
        )
        return y1, y1, stats  # aux = converged stage (the new state)

    def step_embedded(self, t, dt, y, params):
        """Step + embedded local-error estimate for the adaptive controller.

        Theta methods have no classical embedded pair; the standard device
        (PETSc's TSTHETA with -ts_adapt_type basic uses the same order-1
        comparison) is the trapezoid-vs-implicit-Euler difference evaluated
        at the SAME converged stage z:

            err = dt/2 * (f(t, y) - f(t+dt, z))  ~  -(dt^2/2) y'' + O(dt^3)

        an O(dt^2)-accurate local-error proxy for both BE (theta=1) and CN
        (theta=1/2) at the cost of two extra dynamics evaluations and no
        extra Newton solve."""
        y1, aux, stats = self.step(t, dt, y, params)
        f_n = self.f(t, y, params)
        f_1 = self.f(t + dt, y1, params)
        err = (0.5 * dt) * (f_n - f_1)
        if self.mass is not None:
            # DAE: only differential rows carry a meaningful truncation
            # error; mask the algebraic (zero) mass rows out of the norm
            diff_rows = jnp.diag(self.mass) != 0.0
            err = jnp.where(
                jnp.broadcast_to(diff_rows, err.shape), err,
                jnp.zeros_like(err),
            )
        return y1, err, aux, stats

    def step_adj(self, t, dt, y, params, aux, lam):
        th = self.theta
        t1 = t + dt
        shape = y.shape
        if aux is None:
            y1, _, _ = self.step(t, dt, y, params)
        else:
            y1 = aux

        # transposed solve (M - dt*theta*J1)^T w = lam at the converged state
        setup = self.setup
        cache = setup.solver_cache
        if (cache is not None and th in cache
                and not setup.adjoint_exact_jacobian):
            solver = cache[th]
        else:
            frozen = (None if setup.adjoint_exact_jacobian
                      else setup.frozen_J_blocks)

            def f1_flat(zf):
                return self.f(t1, zf.reshape(shape), params).reshape(-1)

            wdt_ = jnp.promote_types(y.dtype, jnp.float32)
            solver = make_stage_solver(
                f1_flat,
                y1.reshape(-1).astype(wdt_),
                self.mass,
                sigma=1.0,
                gamma=dt * th,
                cfg=setup.lin_cfg,
                cached_J_blocks=frozen,
            )
        wdt = jnp.promote_types(y.dtype, jnp.float32)
        w = solver.solve_transpose(
            lam.reshape(-1).astype(wdt)
        ).reshape(shape)

        # lam_prev = M^T w + dt (1-theta) J0^T w ; grads via vjps
        fo1, vjp1 = jax.vjp(lambda yy, pp: self.f(t1, yy, pp), y1, params)
        _, gp1 = vjp1(((dt * th) * w).astype(fo1.dtype))
        lam_prev = _mass_apply_T(self.mass, w)
        gp = gp1
        if th < 1.0:
            fo0, vjp0 = jax.vjp(lambda yy, pp: self.f(t, yy, pp), y, params)
            dly0, gp0 = vjp0(((dt * (1.0 - th)) * w).astype(fo0.dtype))
            lam_prev = lam_prev + dly0
            gp = tree_add(gp, gp0)
        return lam_prev.astype(lam.dtype), gp


class ARKIMEX:
    """Additive IMEX Runge-Kutta: f_IM treated implicitly (ESDIRK part),
    f_EX explicitly — the SINODE semi-implicit capability
    (/root/reference/pnode/petsc_adjoint.py:585-621 imex_form;
    /root/reference/examples-sinode/Burgers/Burgers.py:170-195).

    params is a 2-tuple (params_im, params_ex); the split-parameter adjoint
    keeps the two partitions separate (the reference zero-pads the flat
    vector instead — IJacPShell/RHSJacPShell,
    /root/reference/pnode/petsc_adjoint.py:279-363 — which a pytree makes
    unnecessary).
    """

    def __init__(
        self,
        tableau: ARKTableau,
        f_im: Callable,
        f_ex: Callable,
        setup: ImplicitSolveSetup,
        mass: Optional[jnp.ndarray] = None,
        fused_ex_spec: Optional[Callable] = None,
    ):
        if mass is not None:
            raise NotImplementedError(
                "mass matrices are supported for theta methods (DAEs); the "
                "reference's ARKIMEX examples are mass-free as well"
            )
        self.tab = tableau
        self.f_im = f_im
        self.f_ex = f_ex
        self.setup = setup
        # optional model-provided (Ws, bs, activation, sign, rebuild) spec
        # enabling the single-kernel fused reverse step
        # (ops/fused_ark_adjoint.py); None -> generic stage-exact adjoint
        self.fused_ex_spec = fused_ex_spec
        self.nfe_per_step = 2 * tableau.stages
        self._aI = [[float(x) for x in row] for row in tableau.a_im]
        self._aE = [[float(x) for x in row] for row in tableau.a_ex]
        self._bI = [float(x) for x in tableau.b_im]
        self._bE = [float(x) for x in tableau.b_ex]
        self._cI = [float(x) for x in tableau.c_im]
        self._cE = [float(x) for x in tableau.c_ex]
        self._bIe = (None if tableau.b_im_err is None
                     else [float(x) for x in tableau.b_im_err])
        self._bEe = (None if tableau.b_ex_err is None
                     else [float(x) for x in tableau.b_ex_err])

    def prepare(self, t0, y0, params, dt0=None):
        """Freeze the dense/block Jacobian of f_IM at (t0, y0) (see Theta)."""
        import copy

        if self.setup.lin_cfg.kind == "gmres" or not self.setup.lin_cfg.fixed_jacobian:
            return self
        params_im, _ = params

        def f_flat(zf):
            return self.f_im(t0, zf.reshape(y0.shape), params_im).reshape(-1)

        def build_cache(J):
            if dt0 is None:
                return None
            from .linsolve import DenseStageSolver

            gammas = sorted(
                {g for g in (float(x) for x in np.diag(self.tab.a_im))
                 if g != 0.0}
            )
            return {
                g: DenseStageSolver(J, None, 1.0, dt0 * g, int(y0.size),
                                    use_inverse=True)
                for g in gammas
            }

        J, cache = _frozen_setup(
            self, self.setup, params_im, t0, dt0, y0, f_flat, build_cache
        )
        new = copy.copy(self)
        new.setup = ImplicitSolveSetup(
            lin_cfg=self.setup.lin_cfg,
            newton_cfg=self.setup.newton_cfg,
            frozen_J_blocks=J,
            adjoint_exact_jacobian=self.setup.adjoint_exact_jacobian,
            solver_cache=cache,
            im_linear_in_y=self.setup.im_linear_in_y,
        )
        return new

    def _stage_solver(self, ti, params_im, gamma, z_flat, shape):
        def f_flat(zf):
            return self.f_im(ti, zf.reshape(shape), params_im).reshape(-1)

        return make_stage_solver(
            f_flat,
            z_flat,
            None,
            sigma=1.0,
            gamma=gamma,
            cfg=self.setup.lin_cfg,
            cached_J_blocks=self.setup.frozen_J_blocks,
        )

    def step(self, t, dt, y, params):
        # fused single-kernel forward (ksponly + linear f_im + MLP f_ex:
        # the linearized single solve is exact Newton, so the whole stage
        # loop collapses to matmuls — ops/fused_ark_forward.py)
        if self._fused_fwd_ok(y):
            fused = self._fused_reverse_args(params, dt=dt)
            if fused is not None:
                from .ops.fused_ark_forward import fused_ark_step_fwd

                spec, J, inv_op, interpret, wdt, sprec = fused
                y1, aux = fused_ark_step_fwd(
                    (self._aI, self._aE, self._bI, self._bE), dt, y, J,
                    inv_op, spec["Ws"], spec["bs"],
                    activation=spec["activation"], sign=spec["sign"],
                    interpret=interpret, weight_dtype=wdt,
                    stiff_prec=sprec,
                )
                return y1, aux, self._fused_stats()
        return self._step_generic(t, dt, y, params)

    def _fused_fwd_ok(self, y):
        """Shared forward-path gate for the fused step kernels: batched 2-D
        fp32 state and a ksponly (single linearized solve) configuration
        without the opt-in residual check."""
        return (
            y.ndim == 2
            and y.dtype == jnp.float32
            and self.setup.newton_cfg.ksponly
            and not self.setup.newton_cfg.ksponly_check
        )

    def _fused_stats(self):
        n_impl = sum(
            1 for i in range(self.tab.stages) if self._aI[i][i] != 0.0
        )
        return StepStats(
            newton_iters=jnp.array(n_impl, jnp.int32),
            newton_converged=jnp.array(True),
        )

    def _step_generic(self, t, dt, y, params):
        params_im, params_ex = params
        aI, aE, bI, bE = self._aI, self._aE, self._bI, self._bE
        s = self.tab.stages
        shape = y.shape
        kI, kE, Ys = [], [], []
        total_newton = jnp.array(0, jnp.int32)
        all_conv = jnp.array(True)
        for i in range(s):
            G = y
            for j in range(i):
                if aI[i][j] != 0.0:
                    G = G + (dt * aI[i][j]) * kI[j]
                if aE[i][j] != 0.0:
                    G = G + (dt * aE[i][j]) * kE[j]
            tiI = t + self._cI[i] * dt
            tiE = t + self._cE[i] * dt
            gii = aI[i][i]
            if gii != 0.0:
                def residual_flat(z_flat, G=G, tiI=tiI, gii=gii):
                    z = z_flat.reshape(shape)
                    r = (z - G) - (dt * gii) * self.f_im(tiI, z, params_im)
                    return r.reshape(-1)

                cache = self.setup.solver_cache
                if cache is not None and gii in cache:
                    cached = cache[gii]
                    make = lambda zf, cached=cached: cached
                else:
                    make = lambda zf, tiI=tiI, gii=gii: self._stage_solver(
                        tiI, params_im, dt * gii, zf, shape
                    )
                z_flat, nstats = newton_solve(
                    residual_flat, make,
                    G.reshape(-1).astype(
                        jnp.promote_types(y.dtype, jnp.float32)
                    ),
                    self.setup.newton_cfg
                )
                Yi = z_flat.reshape(shape).astype(y.dtype)
                total_newton = total_newton + nstats.iters.astype(jnp.int32)
                all_conv = jnp.logical_and(all_conv, nstats.converged)
            else:
                Yi = G
            Ys.append(Yi)
            kI.append(self.f_im(tiI, Yi, params_im))
            kE.append(self.f_ex(tiE, Yi, params_ex))
        y1 = y
        for i in range(s):
            if bI[i] != 0.0:
                y1 = y1 + (dt * bI[i]) * kI[i]
            if bE[i] != 0.0:
                y1 = y1 + (dt * bE[i]) * kE[i]
        aux = jnp.stack(Ys)
        stats = StepStats(newton_iters=total_newton, newton_converged=all_conv)
        self._last_ks = (kI, kE)  # trace-local; used by step_embedded only
        # carry/store at state dtype (see ExplicitRK.step)
        return y1.astype(y.dtype), aux.astype(y.dtype), stats

    def step_embedded(self, t, dt, y, params):
        """Step + embedded-error estimate (ARK pairs with b_err)."""
        tab = self.tab
        if tab.b_im_err is None:
            raise ValueError(
                f"ARK tableau {tab.name!r} has no embedded weights; "
                "-ts_adapt_type basic requires one of 1bee/3/4"
            )
        # fused single-kernel trial step with in-kernel embedded error
        # (the adaptive controller's dt varies, so the stage inverse is
        # computed per trial step — see _fused_reverse_args(dt=...))
        if self._fused_fwd_ok(y):
            fused = self._fused_reverse_args(params, dt=dt)
            if fused is not None:
                from .ops.fused_ark_forward import fused_ark_step_fwd

                spec, J, inv_op, interpret, wdt, sprec = fused
                y1, err, aux = fused_ark_step_fwd(
                    (self._aI, self._aE, self._bI, self._bE), dt, y, J,
                    inv_op, spec["Ws"], spec["bs"],
                    activation=spec["activation"], sign=spec["sign"],
                    interpret=interpret, b_err=(self._bIe, self._bEe),
                    weight_dtype=wdt, stiff_prec=sprec,
                )
                return y1, err, aux, self._fused_stats()
        y1, aux, stats = self._step_generic(t, dt, y, params)
        kI, kE = self._last_ks
        err = jnp.zeros_like(y)
        for i in range(tab.stages):
            dI = self._bI[i] - self._bIe[i]
            dE = self._bE[i] - self._bEe[i]
            if dI != 0.0:
                err = err + (dt * dI) * kI[i]
            if dE != 0.0:
                err = err + (dt * dE) * kE[i]
        return y1, err, aux, stats

    def _spectral_stage_basis(self, J0):
        """Eigenbasis ``(lam, Q)`` of the frozen J for per-trial stage
        inverses, or None (inline-LU fallback).

        The adaptive controller needs ``(I - dt*gamma*J)^{-1}`` at a dt
        that varies per trial step. ``jnp.linalg.inv`` is an LU — a
        pivoting, serialized O(d^3) op the TPU executes poorly inside the
        trial scan. When J is a compile-time constant (frozen,
        parameter-free linear implicit part — the production stiff-PDE
        configuration) and symmetric (KS/Burgers periodic stencils), one
        eager fp64 ``eigh`` at first use rewrites every trial inverse as
        ``Q diag(1/(1 - dt*gamma*lam)) Q^T`` — two d x d MXU matmuls.
        Exact in exact arithmetic; the fp64 basis is validated by
        reconstruction before use. Memoized on the prepared stepper
        (J is fixed for its lifetime)."""
        memo = getattr(self, "_spectral_memo", None)
        if memo is not None:
            return memo[0]
        if isinstance(J0, jax.core.Tracer):
            return None  # not memoized: a later concrete prepare may hit
        Jh = np.asarray(J0, dtype=np.float64)
        scale = float(np.max(np.abs(Jh))) or 1.0
        basis = None
        if float(np.max(np.abs(Jh - Jh.T))) <= 1e-6 * scale:
            lam, Q = np.linalg.eigh(Jh)
            rec = float(np.max(np.abs((Q * lam) @ Q.T - Jh)))
            if rec <= 1e-10 * scale:
                npdt = np.dtype(str(J0.dtype))
                basis = (jnp.asarray(lam.astype(npdt)),
                         jnp.asarray(Q.astype(npdt)))
        self._spectral_memo = (basis,)
        return basis

    def _fused_reverse_args(self, params, dt=None, for_reverse=True):
        """Static gate for the single-kernel fused steps.

        Conditions = the reference's production stiff-PDE configuration:
        frozen shared dense J for a parameter-free implicit part, single
        ESDIRK gamma, and a model-provided MLP spec for the explicit part.
        ``for_reverse`` selects the VMEM budget: the reverse kernel holds
        the weight stack twice (weights + dW accumulators). The steppers
        always pass the default (full reverse-capable budget) — fusing
        only the forward measured a regression at Burgers sizes
        (RESULTS.md); the parameter documents the two budgets for direct
        kernel callers.
        The pre-inverted stage operator comes from the per-solve cache
        (uniform dt); when absent and ``dt`` is given (non-uniform grids,
        the adaptive controller's trial steps) the inverse
        (I - dt*gamma*J)^{-1} is computed inline — O(d^3) per step, on par
        with the dense factor the generic path would pay. Controlled by
        -pnode_fused_ark_adjoint {auto,off,interpret} (auto = TPU only).
        """
        if self.fused_ex_spec is None:
            return None
        from .options import Options

        mode = Options().get_string("pnode_fused_ark_adjoint", "auto")
        if mode == "off":
            return None
        interpret = mode == "interpret"
        if not interpret and jax.default_backend() not in ("tpu", "axon"):
            return None
        setup = self.setup
        if setup.adjoint_exact_jacobian or setup.frozen_J_blocks is None:
            return None
        if setup.frozen_J_blocks.shape[0] != 1:
            return None
        gammas = {g for g in (float(x) for x in np.diag(self.tab.a_im))
                  if g != 0.0}
        if len(gammas) != 1:
            return None
        gamma = next(iter(gammas))
        inv_op = None
        inv_parent = None
        cache = setup.solver_cache
        if cache is not None:
            solver = cache.get(gamma)
            if (solver is not None
                    and getattr(solver, "_inv", None) is not None
                    and solver._shared):
                # keep the UN-indexed parent around: under an active trace
                # even `concrete[0]` stages into a tracer, so the auto
                # precision tier must be resolved from the parent (the
                # compile-time-frozen constant), not the indexed view
                inv_parent = solver._inv
                inv_op = inv_parent[0]
        if inv_op is None:
            if dt is None:
                return None
            J0 = setup.frozen_J_blocks[0]
            spec_basis = self._spectral_stage_basis(J0)
            # HIGHEST: same guard as DenseStageSolver — the TPU bf16 matmul
            # default corrupts the inverse of stiff operators
            with jax.default_matmul_precision("highest"):
                if spec_basis is not None:
                    # spectral form: (I - dt*g*J)^{-1} = Q diag(w) Q^T with
                    # w = 1/(1 - dt*g*lam) — two MXU matmuls per trial step
                    # instead of an LU inverse serialized inside the trial
                    # scan (the adaptive controller's dt varies per trial)
                    lam_e, Q = spec_basis
                    w = 1.0 / (1.0 - (dt * gamma) * lam_e)
                    inv_op = (Q * w) @ Q.T
                else:
                    d0 = J0.shape[-1]
                    inv_op = jnp.linalg.inv(
                        jnp.eye(d0, dtype=J0.dtype) - (dt * gamma) * J0
                    )
        params_im, params_ex = params
        if len(jax.tree_util.tree_leaves(params_im)) != 0:
            return None
        spec = self.fused_ex_spec(params_ex)
        if spec is None:
            return None
        from .ops.fused_ark_adjoint import (
            pick_weight_dtype, resolve_stiff_precision,
        )

        d = setup.frozen_J_blocks.shape[-1]
        # "auto" keeps fp32 weight storage where it fits (KS) and falls
        # back to bf16 storage where only that fits (Burgers-512) —
        # -pnode_fused_ark_weights overrides
        wdt = pick_weight_dtype(d, [int(w.shape[1]) for w in spec["Ws"]],
                                with_grad_accumulators=for_reverse)
        if wdt is None:
            return None
        # resolve the stiff-dot precision tier HERE, from the un-indexed
        # frozen constants (indexed views are tracers under a trace, which
        # would silently degrade "auto" to "highest" on the hot path)
        stiff_prec = resolve_stiff_precision(
            setup.frozen_J_blocks,
            inv_parent if inv_parent is not None else inv_op,
            n_applies=self.tab.stages,
        )
        return (spec, setup.frozen_J_blocks[0], inv_op, interpret, wdt,
                stiff_prec)

    def step_adj(self, t, dt, y, params, aux, lam):
        params_im, params_ex = params
        aI, aE, bI, bE = self._aI, self._aE, self._bI, self._bE
        s = self.tab.stages
        shape = y.shape
        if aux is None:
            _, aux, _ = self.step(t, dt, y, params)
        Ys = [aux[i] for i in range(s)]

        fused = (
            self._fused_reverse_args(params, dt=dt)
            if (y.ndim == 2 and y.dtype == jnp.float32)
            else None
        )
        if fused is not None:
            from .ops.fused_ark_adjoint import fused_ark_step_adj

            spec, J, inv_op, interpret, wdt, sprec = fused
            lam_prev, (dWs, dbs) = fused_ark_step_adj(
                (aI, aE, bI, bE), dt, aux, lam, J, inv_op,
                spec["Ws"], spec["bs"], activation=spec["activation"],
                sign=spec["sign"], interpret=interpret, weight_dtype=wdt,
                stiff_prec=sprec,
            )
            g_ex = spec["rebuild"](dWs, dbs)
            return lam_prev, (tree_zeros_like(params_im), g_ex)

        setup = self.setup
        frozen = None if setup.adjoint_exact_jacobian else setup.frozen_J_blocks
        xis: list = [None] * s
        g_im = tree_zeros_like(params_im)
        g_ex = tree_zeros_like(params_ex)
        lam_prev = lam
        for i in range(s - 1, -1, -1):
            u = (dt * bI[i]) * lam
            uh = (dt * bE[i]) * lam
            for m in range(i + 1, s):
                if xis[m] is None:
                    continue
                if aI[m][i] != 0.0:
                    u = u + (dt * aI[m][i]) * xis[m]
                if aE[m][i] != 0.0:
                    uh = uh + (dt * aE[m][i]) * xis[m]
            tiI = t + self._cI[i] * dt
            tiE = t + self._cE[i] * dt
            foI, vjpI = jax.vjp(lambda yy, pp: self.f_im(tiI, yy, pp), Ys[i], params_im)
            foE, vjpE = jax.vjp(lambda yy, pp: self.f_ex(tiE, yy, pp), Ys[i], params_ex)
            dyI, gI = vjpI(u.astype(foI.dtype))
            dyE, gE = vjpE(uh.astype(foE.dtype))
            p = dyI + dyE
            gii = aI[i][i]
            if gii != 0.0:
                cache = setup.solver_cache
                if (cache is not None and gii in cache
                        and not setup.adjoint_exact_jacobian):
                    solver = cache[gii]
                else:
                    def f_flat(zf, tiI=tiI):
                        return self.f_im(tiI, zf.reshape(shape),
                                         params_im).reshape(-1)

                    solver = make_stage_solver(
                        f_flat,
                        Ys[i].reshape(-1).astype(
                            jnp.promote_types(y.dtype, jnp.float32)
                        ),
                        None,
                        sigma=1.0,
                        gamma=dt * gii,
                        cfg=setup.lin_cfg,
                        cached_J_blocks=frozen,
                    )
                xi = solver.solve_transpose(
                    p.reshape(-1).astype(
                        jnp.promote_types(y.dtype, jnp.float32)
                    )
                ).reshape(shape)
                _, gI2 = vjpI(((dt * gii) * xi).astype(foI.dtype))
                gI = tree_add(gI, gI2)
            else:
                xi = p
            xis[i] = xi
            g_im = tree_add(g_im, gI)
            g_ex = tree_add(g_ex, gE)
            lam_prev = lam_prev + xi
        return lam_prev.astype(lam.dtype), (g_im, g_ex)
