"""ROBER stiff-ODE parity suite — the rebuild of the reference's test suite.

Mirrors /root/reference/tests/test_pnode.py one-for-one: the ROBER problem
with slightly-perturbed rate constants is integrated on a log-spaced grid
with a per-step dt list (one step per output interval), compared against
scipy BDF ground truth at the reference's asserted tolerances, and — going
beyond the reference, which printed gradients without asserting them
(test_pnode.py:149-150) — the discrete-adjoint gradients are asserted
against finite differences of the loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

import pnode_tpu
from pnode_tpu import Func, ODESolver

# -- ground truth (identical setup to test_pnode.py:15-76) -------------------

endtime = 1.1e-3
t = np.concatenate([[0.0], np.logspace(-5, -3, 3)])
step_size = list(np.diff(t))


def fun(tt, state):
    k1, k2, k3 = 0.04, 3e7, 1e4
    f1 = -k1 * state[0] + k3 * state[1] * state[2]
    f2 = k1 * state[0] - k3 * state[1] * state[2] - k2 * state[1] ** 2
    f3 = k2 * state[1] ** 2
    return np.array([f1, f2, f3])


def jac(tt, state):
    k1, k2, k3 = 0.04, 3e7, 1e4
    return np.array(
        [
            [-k1, k3 * state[2], k3 * state[1]],
            [k1, -2.0 * k2 * state[1] - k3 * state[2], -k3 * state[1]],
            [0, 2.0 * k2 * state[1], 0],
        ]
    )


path = solve_ivp(
    fun=fun,
    jac=jac,
    t_span=[0, endtime],
    y0=np.array([1.0, 0.0, 0.0]),
    t_eval=t,
    method="BDF",
    rtol=1e-11,
    atol=1e-14,
)
true_y = jnp.asarray(path["y"].T)
true_y0 = true_y[0]
t_jnp = jnp.asarray(t)


# -- perturbed-parameter dynamics (Lambda/LambdaIM/LambdaEX equivalents) -----

def rober(tt, y, p):
    k1, k2, k3 = p["k"][0], p["k"][1], p["k"][2]
    f1 = -k1 * y[0] + k3 * y[1] * y[2]
    f2 = k1 * y[0] - k3 * y[1] * y[2] - k2 * y[1] ** 2
    f3 = k2 * y[1] ** 2
    return jnp.stack([f1, f2, f3], -1)


def rober_im(tt, y, p):
    k1, k3 = p["k1"][0], p["k3"][0]
    f1 = -k1 * y[0] + k3 * y[1] * y[2]
    f2 = k1 * y[0] - k3 * y[1] * y[2]
    return jnp.stack([f1, f2, jnp.zeros_like(f1)], -1)


def rober_ex(tt, y, p):
    k2 = p["k2"][0]
    f2 = -k2 * y[1] ** 2
    return jnp.stack([jnp.zeros_like(f2), f2, -f2], -1)


P_FULL = {"k": jnp.array([0.05, 4e7, 2e4])}
P_IM = {"k1": jnp.array([0.05]), "k3": jnp.array([2e4])}
P_EX = {"k2": jnp.array([4e7])}


def _loss_and_grads(ode, params):
    def loss_fn(p, y0):
        pred = ode.odeint_adjoint(y0, t_jnp, params=p)
        return jnp.mean(jnp.abs(pred - true_y))

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, true_y0)
    return loss, grads


def _fd_check(loss_fn, params, grads, keys, rel=5e-5):
    """Central finite differences on each scalar entry of each key."""
    for key in keys:
        arr = np.asarray(params[key], dtype=np.float64)
        for idx in np.ndindex(arr.shape):
            base = arr[idx]
            eps = max(abs(base), 1.0) * 3e-7
            pp = {k: jnp.asarray(np.array(v)) for k, v in params.items()}
            pm = {k: jnp.asarray(np.array(v)) for k, v in params.items()}
            pp[key] = pp[key].at[idx].set(base + eps)
            pm[key] = pm[key].at[idx].set(base - eps)
            fd = (float(loss_fn(pp)) - float(loss_fn(pm))) / (2 * eps)
            got = float(np.asarray(grads[key])[idx])
            assert got == pytest.approx(fd, rel=rel, abs=1e-13), (key, idx)


def test_implicit_odesolver_cn():
    """CN implicit solve: reference asserts loss 1.85e-6 +- 1e-6
    (test_pnode.py:151-152)."""
    ode = ODESolver()
    ode.setupTS(
        true_y0,
        Func(rober, P_FULL),
        step_size=step_size,
        method="cn",
        enable_adjoint=True,
        implicit_form=True,
    )
    loss, (gp, gy0) = _loss_and_grads(ode, P_FULL)
    loss_std = jnp.std(jnp.abs(ode.odeint_adjoint(true_y0, t_jnp) - true_y))
    assert float(loss) == pytest.approx(1.85e-6, abs=1e-6)
    assert float(loss_std) == pytest.approx(3.36e-6, abs=1e-6)

    def loss_fn(p):
        pred = ode.odeint_adjoint(true_y0, t_jnp, params=p)
        return jnp.mean(jnp.abs(pred - true_y))

    _fd_check(loss_fn, P_FULL, gp, ["k"])


def test_imex_odesolver():
    """ARKIMEX split: reference asserts loss 3.11e-6 +- 3e-6
    (test_pnode.py:179-180)."""
    ode = ODESolver()
    ode.setupTS(
        true_y0,
        Func(rober_im, P_IM),
        step_size=step_size,
        method="imex",
        enable_adjoint=True,
        implicit_form=True,
        imex_form=True,
        func2=Func(rober_ex, P_EX),
    )
    params = (P_IM, P_EX)
    loss, ((g_im, g_ex), gy0) = _loss_and_grads(ode, params)
    assert float(loss) == pytest.approx(3.11e-6, abs=3e-6)

    def loss_im(p):
        pred = ode.odeint_adjoint(true_y0, t_jnp, params=(p, P_EX))
        return jnp.mean(jnp.abs(pred - true_y))

    def loss_ex(p):
        pred = ode.odeint_adjoint(true_y0, t_jnp, params=(P_IM, p))
        return jnp.mean(jnp.abs(pred - true_y))

    _fd_check(loss_im, P_IM, g_im, ["k1", "k3"])
    _fd_check(loss_ex, P_EX, g_ex, ["k2"])


def test_explicit_odesolver_default_rk():
    """Unknown "rk3" falls through to the default RK tableau (3bs) with a
    warning — reference behavior is a silent fall-through
    (test_pnode.py:191, SURVEY.md 2.1); asserted loss 1.85e-6 +- 1e-6."""
    ode = ODESolver()
    with pytest.warns(UserWarning, match="unknown explicit method"):
        ode.setupTS(
            true_y0,
            Func(rober, P_FULL),
            step_size=step_size,
            method="rk3",
            enable_adjoint=True,
        )
    loss, (gp, gy0) = _loss_and_grads(ode, P_FULL)
    loss_std = jnp.std(jnp.abs(ode.odeint_adjoint(true_y0, t_jnp) - true_y))
    assert float(loss) == pytest.approx(1.85e-6, abs=1e-6)
    assert float(loss_std) == pytest.approx(3.21e-6, abs=1e-6)

    def loss_fn(p):
        pred = ode.odeint_adjoint(true_y0, t_jnp, params=p)
        return jnp.mean(jnp.abs(pred - true_y))

    _fd_check(loss_fn, P_FULL, gp, ["k"])


def test_adjoint_matches_autodiff_through_solver():
    """Discrete adjoint == autodiff of the same discrete map (explicit)."""
    ode = ODESolver()
    ode.setupTS(
        true_y0, Func(rober, P_FULL), step_size=step_size, method="rk4"
    )

    def loss_adj(p, y0):
        pred = ode.odeint_adjoint(y0, t_jnp, params=p)
        return jnp.mean(jnp.abs(pred - true_y))

    def loss_ad(p, y0):
        # differentiate straight through the no-adjoint scan (XLA autodiff)
        pred, _ = ode.solve(y0, t_jnp, params=p, with_adjoint=False)
        return jnp.mean(jnp.abs(pred - true_y))

    g_adj = jax.grad(loss_adj, argnums=(0, 1))(P_FULL, true_y0)
    g_ad = jax.grad(loss_ad, argnums=(0, 1))(P_FULL, true_y0)
    np.testing.assert_allclose(g_adj[0]["k"], g_ad[0]["k"], rtol=1e-8)
    np.testing.assert_allclose(g_adj[1], g_ad[1], rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("solver", ["petsc", "torch", "hpddm"])
def test_linear_solver_strategies_agree(solver):
    """All three linear-solver strategies produce the same CN solution
    (reference exposes the same three via ``linear_solver`` —
    petsc_adjoint.py:581)."""
    ode = ODESolver()
    ode.setupTS(
        true_y0,
        Func(rober, P_FULL),
        step_size=step_size,
        method="cn",
        implicit_form=True,
        linear_solver=solver,
        batch_size=1,
    )
    sol, _ = ode.solve(true_y0, t_jnp, with_adjoint=False)
    loss = float(jnp.mean(jnp.abs(sol - true_y)))
    assert loss == pytest.approx(1.85e-6, abs=1.5e-6)


def test_trajectory_policies_gradients_identical():
    """store_all / solution_only / checkpoint(c) give identical gradients
    (the TSTrajectory memory/recompute trade must not change values —
    reference README.md:91-100)."""
    grads = {}
    for flags, name in [
        ([], "store_all"),
        (["-ts_trajectory_solution_only", "1"], "solution_only"),
        (["-ts_trajectory_max_cps_ram", "2"], "checkpoint"),
    ]:
        pnode_tpu.clear_options()
        pnode_tpu.init(["prog"] + flags)
        ode = ODESolver()
        ode.setupTS(
            true_y0, Func(rober, P_FULL), step_size=step_size, method="cn",
            implicit_form=True,
        )

        def loss_fn(p):
            pred = ode.odeint_adjoint(true_y0, t_jnp, params=p)
            return jnp.mean(jnp.abs(pred - true_y))

        grads[name] = np.asarray(jax.grad(loss_fn)(P_FULL)["k"])
    np.testing.assert_allclose(grads["store_all"], grads["solution_only"], rtol=1e-10)
    np.testing.assert_allclose(grads["store_all"], grads["checkpoint"], rtol=1e-10)


def test_single_time_point():
    """t with one element integrates [0, t0] and returns one state
    (petsc_adjoint.py:818-820, 830-843)."""
    ode = ODESolver()
    ode.setupTS(true_y0, Func(rober, P_FULL), step_size=1e-5, method="rk4")
    sol = ode.odeint(true_y0, jnp.asarray([1e-4]))
    assert sol.shape == (1, 3)
    ode2 = ODESolver()
    ode2.setupTS(true_y0, Func(rober, P_FULL), step_size=1e-5, method="rk4")
    sol2 = ode2.odeint(true_y0, jnp.asarray([0.0, 1e-4]))
    np.testing.assert_allclose(sol[0], sol2[1], rtol=1e-12)
