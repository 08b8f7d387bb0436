"""Cross-check pnode_tpu adjoint gradients against PETSc TSAdjoint itself.

The sandbox has no petsc4py, so the BASELINE "1e-8 vs PETSc" gradient
target is met in-repo by proxy (FD + autodiff parity at 1e-10/1e-12,
tests/test_implicit_autodiff_parity.py). THIS script makes the claim
directly testable wherever petsc4py IS installed (e.g. the reference's own
CI environment, /root/reference/.github/workflows/build.sh):

    python tools/petsc_crosscheck.py            # needs petsc4py + jax, fp64

It integrates the ROBER problem (the reference's test workload,
/root/reference/tests/test_pnode.py) with Crank-Nicolson on both stacks,
computes d(sum(y_T^2))/d(k1,k2,k3) via PETSc TSAdjoint and via the
pnode_tpu discrete adjoint, and asserts agreement to 1e-8 relative.

Exit code 0 = parity holds; 2 = petsc4py unavailable (skipped).
"""

from __future__ import annotations

import sys

import numpy as np


def rober_rhs(t, y, k):
    k1, k2, k3 = k
    return np.array([
        -k1 * y[0] + k3 * y[1] * y[2],
        k1 * y[0] - k2 * y[1] ** 2 - k3 * y[1] * y[2],
        k2 * y[1] ** 2,
    ])


K = np.array([0.04, 3.0e7, 1.0e4])
Y0 = np.array([1.0, 0.0, 0.0])
T1 = 10.0
DT = 0.05


def grad_pnode_tpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import pnode_tpu
    from pnode_tpu import Func, ODESolver

    pnode_tpu.clear_options()

    def rhs(t, y, k):
        y0, y1, y2 = y[..., 0], y[..., 1], y[..., 2]
        return jnp.stack([
            -k[0] * y0 + k[2] * y1 * y2,
            k[0] * y0 - k[1] * y1**2 - k[2] * y1 * y2,
            k[1] * y1**2,
        ], axis=-1)

    ode = ODESolver()
    y0 = jnp.asarray(Y0)[None]
    ode.setupTS(y0, Func(rhs, jnp.asarray(K)), step_size=DT, method="cn",
                implicit_form=True)

    def loss(k):
        sol = ode.odeint_adjoint(y0, jnp.asarray([0.0, T1]), params=k)
        return jnp.sum(sol[-1] ** 2)

    return np.asarray(jax.grad(loss)(jnp.asarray(K)))


def grad_petsc():
    try:
        import petsc4py

        petsc4py.init([
            "crosscheck", "-ts_type", "cn", "-ts_adapt_type", "none",
            "-ts_trajectory_type", "memory",
        ])
        from petsc4py import PETSc
    except ImportError:
        return None

    n = 3
    ts = PETSc.TS().create(comm=PETSc.COMM_SELF)
    ts.setProblemType(PETSc.TS.ProblemType.NONLINEAR)
    ts.setType(PETSc.TS.Type.CN)

    k = K.copy()

    def ifunction(ts, t, u, udot, F):
        y = u.getArray(readonly=True)
        f = rober_rhs(t, y, k)
        F.setArray(udot.getArray(readonly=True) - f)

    def ijacobian(ts, t, u, udot, a, J, P):
        y = u.getArray(readonly=True)
        k1, k2, k3 = k
        Jf = np.array([
            [-k1, k3 * y[2], k3 * y[1]],
            [k1, -2 * k2 * y[1] - k3 * y[2], -k3 * y[1]],
            [0.0, 2 * k2 * y[1], 0.0],
        ])
        M = a * np.eye(n) - Jf
        for i in range(n):
            for j in range(n):
                P.setValue(i, j, M[i, j])
        P.assemble()
        if J != P:
            J.assemble()
        return True

    def rhsjacobianp(ts, t, u, Jp):
        y = u.getArray(readonly=True)
        # df/dk: columns per parameter
        dk = np.array([
            [-y[0], 0.0, y[1] * y[2]],
            [y[0], -y[1] ** 2, -y[1] * y[2]],
            [0.0, y[1] ** 2, 0.0],
        ])
        for i in range(n):
            for j in range(3):
                Jp.setValue(i, j, dk[i, j])
        Jp.assemble()

    u = PETSc.Vec().createSeq(n, comm=PETSc.COMM_SELF)
    u.setArray(Y0)
    F = u.duplicate()
    J = PETSc.Mat().createDense((n, n), comm=PETSc.COMM_SELF)
    J.setUp()
    Jp = PETSc.Mat().createDense((n, 3), comm=PETSc.COMM_SELF)
    Jp.setUp()

    ts.setIFunction(ifunction, F)
    ts.setIJacobian(ijacobian, J)
    ts.setRHSJacobianP(rhsjacobianp, Jp)
    ts.setTime(0.0)
    ts.setTimeStep(DT)
    ts.setMaxTime(T1)
    ts.setExactFinalTime(PETSc.TS.ExactFinalTime.MATCHSTEP)
    ts.setSaveTrajectory()
    ts.setFromOptions()
    ts.solve(u)

    yT = u.getArray(readonly=True).copy()
    lam = PETSc.Vec().createSeq(n, comm=PETSc.COMM_SELF)
    lam.setArray(2.0 * yT)  # d(sum y^2)/dy
    mu = PETSc.Vec().createSeq(3, comm=PETSc.COMM_SELF)
    mu.setArray(np.zeros(3))
    ts.setCostGradients([lam], [mu])
    ts.adjointSolve()
    return mu.getArray(readonly=True).copy()


def main():
    g_petsc = grad_petsc()
    if g_petsc is None:
        print("petsc4py not available: cross-check SKIPPED")
        return 2
    g_tpu = grad_pnode_tpu()
    rel = np.abs(g_tpu - g_petsc) / np.maximum(np.abs(g_petsc), 1e-30)
    print(f"pnode_tpu grad: {g_tpu}")
    print(f"PETSc     grad: {g_petsc}")
    print(f"max rel diff:   {rel.max():.3e}")
    assert rel.max() < 1e-8, "gradient parity vs PETSc FAILED"
    print("PARITY OK (1e-8)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
