"""Unit tests: tableau order checks, convergence order, adjoint exactness.

These are the "upgrade" of the reference's printed-not-asserted gradients
(/root/reference/tests/test_pnode.py:149-150): every stepper's hand-written
discrete adjoint is asserted against autodiff-through-the-step (explicit) or
finite differences (implicit), and the transpose identity <Jv,w> = <v,J^T w>
is checked on the GMRES stage operators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.linsolve import (
    GMRESStageSolver,
    LinearSolveConfig,
    gmres,
    make_stage_solver,
)
from pnode_tpu.newton import NewtonConfig, newton_solve
from pnode_tpu.steppers import ARKIMEX, ExplicitRK, ImplicitSolveSetup, Theta
from pnode_tpu.tableaus import (
    BOSH3,
    DOPRI5,
    EULER,
    MIDPOINT,
    RK4,
    get_ark_tableau,
    get_rk_tableau,
)


# simple nonlinear test dynamics with parameters
def f_poly(t, y, p):
    return p["a"] * y + p["b"] * y**2 + jnp.sin(t) * p["c"]


P = {
    "a": jnp.array(-0.7),
    "b": jnp.array(0.15),
    "c": jnp.array(0.4),
}
Y0 = jnp.array([1.0, 0.5, -0.3])


def _integrate(stepper, n, t_end=1.0, y0=Y0, params=P):
    """Jitted fixed-step integration via lax.scan (fast under pytest)."""
    dt = t_end / n
    ts = jnp.arange(n) * dt

    @jax.jit
    def run(y0, params):
        def body(y, t):
            y1, _, _ = stepper.step(t, jnp.asarray(dt), y, params)
            return y1, None

        y, _ = jax.lax.scan(body, y0, ts)
        return y

    return run(y0, params)


def _convergence_order(stepper_factory, ns, t_end=1.0, params=P):
    """Empirical order from successive refinements against a finer run."""
    sols = [
        _integrate(stepper_factory(), n, t_end, params=params)
        for n in ns + (ns[-1] * 4,)
    ]
    ref = sols[-1]
    errs = [float(jnp.max(jnp.abs(s - ref))) for s in sols[:-1]]
    # only trust pairs above the fp64 roundoff floor
    orders = [
        np.log2(errs[i] / errs[i + 1])
        for i in range(len(errs) - 1)
        if errs[i + 1] > 1e-12
    ]
    return orders, errs


_NS_BY_ORDER = {1: (40, 80, 160), 2: (20, 40, 80), 3: (10, 20, 40), 4: (5, 10, 20), 5: (8, 16, 32)}


@pytest.mark.parametrize(
    "tab", [EULER, MIDPOINT, BOSH3, RK4, DOPRI5], ids=lambda t: t.name
)
def test_explicit_rk_convergence_order(tab):
    orders, errs = _convergence_order(
        lambda: ExplicitRK(tab, f_poly), _NS_BY_ORDER[tab.order]
    )
    assert errs[-1] < errs[0]
    assert orders, f"all errors at roundoff floor: {errs}"
    # measured order should be within 0.5 of nominal at these resolutions
    assert orders[-1] == pytest.approx(tab.order, abs=0.5)


def _default_setup(kind="gmres", **kw):
    return ImplicitSolveSetup(
        lin_cfg=LinearSolveConfig(kind=kind, rtol=1e-12, **kw),
        newton_cfg=NewtonConfig(rtol=1e-12, max_it=50),
    )


@pytest.mark.parametrize("theta", [1.0, 0.5], ids=["beuler", "cn"])
def test_theta_convergence_order(theta):
    expected = 1 if theta == 1.0 else 2
    orders, errs = _convergence_order(
        lambda: Theta(theta, f_poly, _default_setup()), _NS_BY_ORDER[expected]
    )
    assert orders[-1] == pytest.approx(expected, abs=0.5)


def f_im(t, y, p):
    return p["a"] * y


def f_ex(t, y, p):
    return p["b"] * y**2 + jnp.cos(t) * p["c"]


P_IMEX = ({"a": jnp.array(-2.0)}, {"b": jnp.array(0.2), "c": jnp.array(0.5)})


@pytest.mark.parametrize("ark", ["1bee", "ars122", "l2", "3",
                                 pytest.param("4", marks=pytest.mark.slow),
                                 pytest.param("5", marks=pytest.mark.slow)])
def test_ark_imex_convergence_order(ark):
    tab = get_ark_tableau(ark)

    orders, errs = _convergence_order(
        lambda: ARKIMEX(tab, f_im, f_ex, _default_setup()),
        _NS_BY_ORDER[tab.order],
        params=P_IMEX,
    )
    assert orders, f"all errors at roundoff floor: {errs}"
    assert orders[-1] == pytest.approx(tab.order, abs=0.5)


# ---------------------------------------------------------------------------
# adjoint exactness: hand-written step_adj vs autodiff / finite differences
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "tab", [EULER, MIDPOINT, BOSH3, RK4, DOPRI5], ids=lambda t: t.name
)
def test_explicit_step_adjoint_matches_autodiff(tab):
    stepper = ExplicitRK(tab, f_poly)
    t, dt = jnp.asarray(0.3), jnp.asarray(0.05)
    lam = jnp.array([0.2, -1.1, 0.7])

    def step_y1(y, p):
        y1, _, _ = stepper.step(t, dt, y, p)
        return y1

    _, vjp = jax.vjp(step_y1, Y0, P)
    dly_ref, dlp_ref = vjp(lam)

    _, aux, _ = stepper.step(t, dt, Y0, P)
    for aux_arg in (aux, None):  # stored stages and recompute paths
        dly, dlp = stepper.step_adj(t, dt, Y0, P, aux_arg, lam)
        np.testing.assert_allclose(dly, dly_ref, rtol=1e-12, atol=1e-13)
        for k in P:
            np.testing.assert_allclose(dlp[k], dlp_ref[k], rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("theta", [1.0, 0.5], ids=["beuler", "cn"])
@pytest.mark.parametrize("kind", ["gmres", "direct"])
def test_theta_step_adjoint_matches_fd(theta, kind):
    stepper = Theta(theta, f_poly, _default_setup(kind=kind))
    t, dt = jnp.asarray(0.3), jnp.asarray(0.1)
    lam = jnp.array([0.2, -1.1, 0.7])

    stepper_p = stepper.prepare(t, Y0, P)
    _, aux, _ = stepper_p.step(t, dt, Y0, P)
    dly, dlp = stepper_p.step_adj(t, dt, Y0, P, aux, lam)

    @jax.jit
    def _scalar(y, p):
        y1, _, _ = stepper.prepare(t, y, p).step(t, dt, y, p)
        return jnp.vdot(lam, y1)

    def scalar(y, p):
        return float(_scalar(y, p))

    eps = 1e-6
    for i in range(3):
        e = jnp.zeros_like(Y0).at[i].set(eps)
        fd = (scalar(Y0 + e, P) - scalar(Y0 - e, P)) / (2 * eps)
        assert fd == pytest.approx(float(dly[i]), rel=2e-5, abs=1e-8)
    for k in P:
        pp = {kk: vv for kk, vv in P.items()}
        pp[k] = P[k] + eps
        pm = {kk: vv for kk, vv in P.items()}
        pm[k] = P[k] - eps
        fd = (scalar(Y0, pp) - scalar(Y0, pm)) / (2 * eps)
        assert fd == pytest.approx(float(dlp[k]), rel=2e-5, abs=1e-8)


@pytest.mark.parametrize("ark", ["ars122", "l2", "3",
                                 pytest.param("4", marks=pytest.mark.slow),
                                 pytest.param("5", marks=pytest.mark.slow)])
def test_ark_step_adjoint_matches_fd(ark):
    tab = get_ark_tableau(ark)
    stepper = ARKIMEX(tab, f_im, f_ex, _default_setup())
    t, dt = jnp.asarray(0.3), jnp.asarray(0.1)
    lam = jnp.array([0.2, -1.1, 0.7])

    _, aux, _ = stepper.step(t, dt, Y0, P_IMEX)
    dly, (g_im, g_ex) = stepper.step_adj(t, dt, Y0, P_IMEX, aux, lam)

    @jax.jit
    def _scalar(y, p):
        y1, _, _ = stepper.step(t, dt, y, p)
        return jnp.vdot(lam, y1)

    def scalar(y, p):
        return float(_scalar(y, p))

    eps = 1e-6
    for i in range(3):
        e = jnp.zeros_like(Y0).at[i].set(eps)
        fd = (scalar(Y0 + e, P_IMEX) - scalar(Y0 - e, P_IMEX)) / (2 * eps)
        assert fd == pytest.approx(float(dly[i]), rel=2e-5, abs=1e-8)
    pim, pex = P_IMEX
    fd = (
        scalar(Y0, ({"a": pim["a"] + eps}, pex))
        - scalar(Y0, ({"a": pim["a"] - eps}, pex))
    ) / (2 * eps)
    assert fd == pytest.approx(float(g_im["a"]), rel=2e-5, abs=1e-8)
    for k in pex:
        pp = dict(pex)
        pp[k] = pex[k] + eps
        pm = dict(pex)
        pm[k] = pex[k] - eps
        fd = (scalar(Y0, (pim, pp)) - scalar(Y0, (pim, pm))) / (2 * eps)
        assert fd == pytest.approx(float(g_ex[k]), rel=2e-5, abs=1e-8)


def test_theta_dae_mass_matrix():
    """Index-1 DAE: y0' = -y0, 0 = y1 - y0 (algebraic), via singular mass."""
    M = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, p):
        return jnp.stack([-p["k"] * y[0], y[1] - y[0]])

    stepper = Theta(1.0, f, _default_setup(), mass=M)
    p = {"k": jnp.array(1.0)}
    y = _integrate(
        stepper, 100, t_end=1.0, y0=jnp.array([1.0, 1.0]), params=p
    )
    # exact solution exp(-1); BE is first order
    assert float(y[0]) == pytest.approx(np.exp(-1.0), abs=3e-3)
    # algebraic constraint enforced at every accepted step
    assert float(jnp.abs(y[1] - y[0])) < 1e-10


# ---------------------------------------------------------------------------
# linear solver unit tests
# ---------------------------------------------------------------------------

def test_gmres_solves_nonsymmetric():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((40, 40)) + 6 * np.eye(40))
    b = jnp.asarray(rng.standard_normal(40))
    res = gmres(lambda v: A @ v, b, rtol=1e-12, restart=40, max_restarts=4)
    np.testing.assert_allclose(A @ res.x, b, rtol=0, atol=1e-8)
    assert bool(res.converged)


def test_gmres_restart_path():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((60, 60)) + 8 * np.eye(60))
    b = jnp.asarray(rng.standard_normal(60))
    res = gmres(lambda v: A @ v, b, rtol=1e-10, restart=15, max_restarts=30)
    np.testing.assert_allclose(A @ res.x, b, rtol=0, atol=1e-6)


def test_stage_operator_transpose_identity():
    """<(sM - gJ) v, w> == <v, (sM - gJ)^T w> on the GMRES operator."""

    def f_flat(z):
        return f_poly(0.3, z, P).reshape(-1)

    y = Y0.reshape(-1)
    solver = make_stage_solver(
        f_flat, y, None, sigma=1.0, gamma=0.05,
        cfg=LinearSolveConfig(kind="gmres", rtol=1e-12),
    )
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(3))
    w = jnp.asarray(rng.standard_normal(3))
    lhs = float(jnp.vdot(solver._apply(v), w))
    rhs = float(jnp.vdot(v, solver._apply_T(w)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_dense_vs_gmres_stage_solve_agree():
    def f_flat(z):
        return f_poly(0.3, z, P).reshape(-1)

    y = Y0.reshape(-1)
    rhs = jnp.array([0.3, -0.2, 1.0])
    s_g = make_stage_solver(
        f_flat, y, None, 1.0, 0.05, LinearSolveConfig(kind="gmres", rtol=1e-13)
    )
    s_d = make_stage_solver(
        f_flat, y, None, 1.0, 0.05, LinearSolveConfig(kind="direct")
    )
    np.testing.assert_allclose(s_g.solve(rhs), s_d.solve(rhs), atol=1e-9)
    np.testing.assert_allclose(
        s_g.solve_transpose(rhs), s_d.solve_transpose(rhs), atol=1e-9
    )


def test_newton_solves_nonlinear_system():
    def residual(z):
        return z**3 + z - jnp.array([1.0, 2.0, 3.0])

    def make_solver(z):
        def f_flat(zz):
            return -(zz**3 + zz)  # residual = -f + const => J_r = -J_f

        return make_stage_solver(
            f_flat, z, None, 0.0, 1.0, LinearSolveConfig(kind="gmres", rtol=1e-14)
        )

    z, stats = newton_solve(
        residual, make_solver, jnp.zeros(3), NewtonConfig(rtol=1e-14)
    )
    np.testing.assert_allclose(residual(z), 0.0, atol=1e-10)
    assert bool(stats.converged)


@pytest.mark.slow
def test_ark_step_adjoint_recompute_path_matches_stored():
    """aux=None (solution_only trajectories, adaptive adjoints) re-solves the
    stages; gradients must match the stored-stage path exactly."""
    tab = get_ark_tableau("3")
    stepper = ARKIMEX(tab, f_im, f_ex, _default_setup())
    t, dt = jnp.asarray(0.2), jnp.asarray(0.1)
    lam = jnp.array([0.4, -0.2, 0.9])
    _, aux, _ = stepper.step(t, dt, Y0, P_IMEX)
    dly_a, g_a = stepper.step_adj(t, dt, Y0, P_IMEX, aux, lam)
    dly_b, g_b = stepper.step_adj(t, dt, Y0, P_IMEX, None, lam)
    np.testing.assert_allclose(dly_a, dly_b, rtol=1e-10)
    for ga, gb in zip(jax.tree_util.tree_leaves(g_a),
                      jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(ga, gb, rtol=1e-10)


def test_time_shifted_windows_refreeze_jacobian():
    """Regression (r2 code review): the solve-fn cache must key on the
    static grid t0 — a frozen Jacobian of a NON-autonomous implicit part
    linearized at the first window's t0 must not be reused for a
    time-shifted window of identical geometry."""
    import pnode_tpu
    from pnode_tpu import Func, ODESolver

    def f(t, y, p):
        return -(1.0 + t) * y

    pnode_tpu.clear_options()
    pnode_tpu.init(["p"])
    ode = ODESolver()
    y0 = jnp.array([1.0])
    ode.setupTS(y0, Func(f, {}), step_size=0.05, method="beuler",
                implicit_form=True, linear_solver="lu", fixed_jacobian=True)
    s1, _ = ode.solve(y0, jnp.array([0.0, 1.0]))
    s2, _ = ode.solve(y0, jnp.array([10.0, 11.0]))
    # ground truth: y(t1) = y0 * exp(-(t1-t0) - (t1^2-t0^2)/2)
    ref1 = float(np.exp(-1.0 - 0.5))
    ref2 = float(np.exp(-1.0 - (121.0 - 100.0) / 2.0))
    np.testing.assert_allclose(float(s1[-1][0]), ref1, rtol=5e-2)
    # order-1 BE at dt=0.05 on e^{-21t}-scale decay is coarse: assert the
    # decade, not the digit
    np.testing.assert_allclose(float(s2[-1][0]), ref2, rtol=0, atol=2e-4)
    # the real assertion: no blow-up from a stale frozen Jacobian
    assert np.isfinite(float(s2[-1][0])) and abs(float(s2[-1][0])) < 1.0
