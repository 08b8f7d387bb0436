"""Implicit-adjoint exactness vs autodiff through a differentiable Newton.

The hand-written theta/ARK adjoints use the implicit function theorem at the
converged stage. This suite builds a *differentiable* fixed-iteration Newton
(scan-based, no while_loop) so plain jax.grad can differentiate straight
through the entire implicit solve, and asserts the discrete adjoint matches
that ground truth to near machine precision (fp64) — the strongest
PETSc-free statement of the BASELINE "1e-8 fp64 adjoint parity" target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from pnode_tpu.linsolve import LinearSolveConfig, make_stage_solver
from pnode_tpu.newton import NewtonConfig
from pnode_tpu.steppers import ARKIMEX, ImplicitSolveSetup, Theta
from pnode_tpu.tableaus import get_ark_tableau

Y0 = jnp.array([0.8, -0.3, 0.5])
P = {"a": jnp.array(-1.2), "b": jnp.array(0.25)}


def f(t, y, p):
    return p["a"] * y + p["b"] * jnp.sin(y) + 0.1 * jnp.cos(t)


def theta_step_autodiff(theta, t, dt, y, p, n_newton=30):
    """Theta step via differentiable fixed-iteration Newton (dense solve)."""
    f_n = f(t, y, p)
    t1 = t + dt

    def residual(z):
        return z - y - dt * ((1 - theta) * f_n + theta * f(t1, z, p))

    def body(z, _):
        J = jax.jacfwd(residual)(z)
        z = z - jnp.linalg.solve(J, residual(z))
        return z, None

    z, _ = lax.scan(body, y, None, length=n_newton)
    return z


@pytest.mark.parametrize("theta", [1.0, 0.5], ids=["beuler", "cn"])
def test_theta_adjoint_vs_full_autodiff(theta):
    setup = ImplicitSolveSetup(
        lin_cfg=LinearSolveConfig(kind="gmres", rtol=1e-14),
        newton_cfg=NewtonConfig(rtol=1e-14, stol=1e-15, max_it=60),
    )
    stepper = Theta(theta, f, setup)
    t, dt = jnp.asarray(0.2), jnp.asarray(0.15)
    lam = jnp.array([1.0, -0.5, 0.25])

    # hand-written discrete adjoint
    _, aux, _ = stepper.step(t, dt, Y0, P)
    dly, dlp = stepper.step_adj(t, dt, Y0, P, aux, lam)

    # ground truth: autodiff through the full (differentiable) Newton solve
    def scalar(y, p):
        return jnp.vdot(lam, theta_step_autodiff(theta, t, dt, y, p))

    g_ref = jax.grad(scalar, argnums=(0, 1))(Y0, P)
    np.testing.assert_allclose(dly, g_ref[0], rtol=1e-10, atol=1e-12)
    for k in P:
        np.testing.assert_allclose(dlp[k], g_ref[1][k], rtol=1e-10,
                                   atol=1e-12)


@pytest.mark.slow
def test_multi_step_cn_trajectory_gradient_parity():
    """Five CN steps: full-trajectory loss gradient, adjoint vs autodiff."""
    setup = ImplicitSolveSetup(
        lin_cfg=LinearSolveConfig(kind="gmres", rtol=1e-14),
        newton_cfg=NewtonConfig(rtol=1e-14, stol=1e-15, max_it=60),
    )
    stepper = Theta(0.5, f, setup)
    dt = 0.1

    def loss_adjoint(y0, p):
        from pnode_tpu.misc import tree_add, tree_zeros_like

        ys = [y0]
        auxs = []
        y = y0
        for k in range(5):
            y, aux, _ = stepper.step(jnp.asarray(k * dt), jnp.asarray(dt), y, p)
            ys.append(y)
            auxs.append(aux)
        return ys, auxs

    def run_autodiff(y0, p):
        y = y0
        for k in range(5):
            y = theta_step_autodiff(0.5, jnp.asarray(k * dt), jnp.asarray(dt),
                                    y, p)
        return jnp.sum(y**2)

    g_ref = jax.grad(run_autodiff, argnums=(0, 1))(Y0, P)

    # manual reverse sweep with the hand-written step_adj
    ys, auxs = loss_adjoint(Y0, P)
    lam = 2.0 * ys[-1]
    from pnode_tpu.misc import tree_add, tree_zeros_like

    gp = tree_zeros_like(P)
    for k in range(4, -1, -1):
        lam, gstep = stepper.step_adj(
            jnp.asarray(k * dt), jnp.asarray(dt), ys[k], P, auxs[k], lam
        )
        gp = tree_add(gp, gstep)
    np.testing.assert_allclose(lam, g_ref[0], rtol=1e-9, atol=1e-11)
    for k in P:
        np.testing.assert_allclose(gp[k], g_ref[1][k], rtol=1e-9, atol=1e-11)
