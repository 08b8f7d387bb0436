"""Observability fixes from VERDICT r1: ksponly residual check + the
bf16-compression interior-output warning."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import pnode_tpu
from pnode_tpu import Func, ODESolver


def test_ksponly_check_flags_stale_linearization():
    """-snes_ksponly_check: a frozen Jacobian from a far-away state makes the
    single linearized solve miss; the check must record non-convergence
    instead of silently reporting converged=True."""
    from pnode_tpu.linsolve import LinearSolveConfig
    from pnode_tpu.newton import NewtonConfig, newton_solve

    # strongly nonlinear residual; the "solver" applies a WRONG inverse
    # (stale linearization stand-in)
    def residual(z):
        return z**3 + z - 1.0

    class StaleSolver:
        def solve(self, r):
            return 0.05 * r  # far from the true Newton step

    z0 = jnp.array([3.0])
    z, stats = newton_solve(
        residual, lambda zz: StaleSolver(), z0,
        NewtonConfig(ksponly=True, ksponly_check=True),
    )
    assert not bool(stats.converged)

    # without the check, ksponly reports converged unconditionally (PETSc
    # semantics)
    z, stats = newton_solve(
        residual, lambda zz: StaleSolver(), z0,
        NewtonConfig(ksponly=True, ksponly_check=False),
    )
    assert bool(stats.converged)


def test_ksponly_check_passes_on_linear_problem():
    """For a linear residual the single solve is exact: check passes and the
    solve stats surface through the public API."""
    def f(t, y, p):
        return -p["k"] * y

    P = {"k": jnp.array(1.3)}
    y0 = jnp.array([1.0, 0.5])
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-snes_type", "ksponly", "-snes_ksponly_check", "1"])
    ode = ODESolver()
    ode.setupTS(y0, Func(f, P), step_size=0.1, method="beuler",
                implicit_form=True, linear_solver="torch",
                fixed_jacobian=True)
    sol, stats = ode.solve(y0, jnp.asarray([0.0, 0.5]), params=P)
    assert bool(stats.newton_converged)
    np.testing.assert_allclose(
        np.asarray(sol[-1]),
        np.asarray(y0) * (1 / (1 + 0.1 * 1.3)) ** 5,
        rtol=1e-6,
    )


def test_bf16_compression_warns_on_interior_outputs():
    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-0.5, jnp.float32)}
    y0 = jnp.array([1.0], jnp.float32)

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-pnode_trajectory_dtype", "bfloat16"])
    ode = ODESolver()
    ode.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ode.odeint_adjoint(y0, jnp.asarray([0.0, 0.5, 1.0]), params=P)
        assert any("compressed" in str(x.message) for x in w), [
            str(x.message) for x in w
        ]

    # endpoint-only solves stay silent
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-pnode_trajectory_dtype", "bfloat16"])
    ode2 = ODESolver()
    ode2.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ode2.odeint_adjoint(y0, jnp.asarray([0.0, 1.0]), params=P)
        assert not any("compressed" in str(x.message) for x in w)


def test_disk_trajectory_substitutes_cams_on_tpu_backends(monkeypatch):
    """-ts_trajectory_type disk on a callback-less TPU backend must warn and
    substitute the CAMS schedule at the max_cps budget (documented in
    solver.py) instead of failing at runtime."""
    import jax as _jax

    import pnode_tpu.solver as solver_mod

    monkeypatch.setattr(_jax, "default_backend", lambda: "axon")

    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-0.5)}
    y0 = jnp.array([1.0])
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_trajectory_type", "disk"])
    ode = ODESolver()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")
        assert any("CAMS" in str(x.message) for x in w)
    assert ode.traj.kind == "cams"
    assert ode.traj.max_cps == 16
