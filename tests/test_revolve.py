"""Revolve schedule planner + revolve-policy adjoint correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import lru_cache

import pnode_tpu
from pnode_tpu import Func, ODESolver
from pnode_tpu.revolve import (
    optimal_cost,
    revolve_plan,
    using_native,
    validate_plan,
)


@lru_cache(maxsize=None)
def _dp(n, c):
    """Brute-force optimal recompute cost (ground truth)."""
    if n <= 1:
        return 0
    if c == 0:
        return n * (n - 1) // 2
    return min(m + _dp(m, c) + _dp(n - m, c - 1) for m in range(1, n))


@pytest.mark.parametrize("c", [1, 2, 3, 5])
def test_closed_form_cost_matches_dp(c):
    for n in range(1, 40):
        assert optimal_cost(n, c) == _dp(n, c), (n, c)


@pytest.mark.parametrize("n,c", [(1, 2), (7, 1), (20, 3), (64, 6), (200, 10)])
def test_plan_is_valid_and_optimal(n, c):
    plan = revolve_plan(n, c)
    stats = validate_plan(plan, n, c)
    assert stats["advance_cost"] == optimal_cost(n, c)
    assert stats["max_live"] <= c + 1


def test_native_library_loaded():
    # the C++ planner must be built and loadable (make -C csrc)
    assert using_native()


def test_revolve_policy_gradients_match_store_all():
    def f(t, y, p):
        return p["a"] * y + p["b"] * jnp.tanh(y)

    P = {"a": jnp.array(-0.4), "b": jnp.array(0.3)}
    y0 = jnp.array([1.0, -0.7, 0.2])
    t = jnp.asarray([0.0, 0.4, 0.8])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")

        @jax.jit
        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2) + jnp.sum(sol[1] ** 2)

        return jax.grad(loss)(P)

    g_ref = grad_with([])
    g_rev = grad_with(
        ["-ts_trajectory_max_cps_ram", "3",
         "-ts_trajectory_schedule", "revolve"]
    )
    np.testing.assert_allclose(g_rev["a"], g_ref["a"], rtol=1e-12)
    np.testing.assert_allclose(g_rev["b"], g_ref["b"], rtol=1e-12)


def test_revolve_policy_implicit_cn():
    def f(t, y, p):
        return -p["k"] * y**3

    P = {"k": jnp.array(2.0)}
    y0 = jnp.array([1.0, 0.5])
    t = jnp.asarray([0.0, 1.0])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="cn",
                    implicit_form=True)

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2)

        return jax.grad(loss)(P)

    g_ref = grad_with([])
    g_rev = grad_with(
        ["-ts_trajectory_max_cps_ram", "2",
         "-ts_trajectory_schedule", "revolve"]
    )
    np.testing.assert_allclose(g_rev["k"], g_ref["k"], rtol=1e-9)


def test_disk_trajectory_policy_gradients_match():
    """-ts_trajectory_type disk streams states to a host memmap (PETSc's
    default backend); gradients must match the in-memory policy."""
    import shutil

    def f(t, y, p):
        return p["a"] * y + p["b"] * jnp.sin(y)

    P = {"a": jnp.array(-0.5), "b": jnp.array(0.3)}
    y0 = jnp.array([1.0, -0.4])
    t = jnp.asarray([0.0, 0.5, 1.0])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2) + jnp.sum(sol[1] ** 2)

        return loss(P), jax.grad(loss)(P)

    l_ref, g_ref = grad_with([])
    l_dsk, g_dsk = grad_with(
        ["-ts_trajectory_type", "disk",
         "-ts_trajectory_dirname", "/tmp/pnode_traj_test"]
    )
    np.testing.assert_allclose(float(l_dsk), float(l_ref), rtol=1e-12)
    np.testing.assert_allclose(g_dsk["a"], g_ref["a"], rtol=1e-10)
    np.testing.assert_allclose(g_dsk["b"], g_ref["b"], rtol=1e-10)
    shutil.rmtree("/tmp/pnode_traj_test", ignore_errors=True)


def test_bf16_trajectory_compression():
    """-pnode_trajectory_dtype bfloat16 halves trajectory storage; gradients
    stay within bf16-perturbation distance of the exact ones."""
    def f(t, y, p):
        return p["a"] * y + p["b"] * jnp.tanh(y)

    P = {"a": jnp.array(-0.5, jnp.float32), "b": jnp.array(0.3, jnp.float32)}
    y0 = jnp.array([1.0, -0.4], jnp.float32)
    t = jnp.asarray([0.0, 1.0])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2)

        return jax.grad(loss)(P)

    g_ref = grad_with([])
    g_c = grad_with(["-pnode_trajectory_dtype", "bfloat16"])
    np.testing.assert_allclose(g_c["a"], g_ref["a"], rtol=2e-2)
    np.testing.assert_allclose(g_c["b"], g_ref["b"], rtol=2e-2)


def test_disk_policy_with_implicit_cn():
    """disk trajectory + implicit stepper: bwd re-solves Newton per step."""
    import shutil

    def f(t, y, p):
        return -p["k"] * y**3

    P = {"k": jnp.array(1.5)}
    y0 = jnp.array([1.0, 0.6])
    t = jnp.asarray([0.0, 0.6])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="cn",
                    implicit_form=True)

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2)

        return jax.grad(loss)(P)

    g_ref = grad_with([])
    g_dsk = grad_with(["-ts_trajectory_type", "disk",
                       "-ts_trajectory_dirname", "/tmp/pnode_traj_cn"])
    np.testing.assert_allclose(g_dsk["k"], g_ref["k"], rtol=1e-9)
    shutil.rmtree("/tmp/pnode_traj_cn", ignore_errors=True)


def test_bf16_compression_with_solution_only():
    def f(t, y, p):
        return p["a"] * jnp.sin(y)

    P = {"a": jnp.array(-0.8, jnp.float32)}
    y0 = jnp.array([1.2, -0.3], jnp.float32)
    t = jnp.asarray([0.0, 1.0])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.05, method="bosh3")

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2)

        return jax.grad(loss)(P)

    g_ref = grad_with([])
    g_c = grad_with(["-pnode_trajectory_dtype", "bfloat16",
                     "-ts_trajectory_solution_only", "1"])
    np.testing.assert_allclose(g_c["a"], g_ref["a"], rtol=2e-2)


def test_revolve_scan_executor_matches_unrolled():
    """The scanned action-machine executor must produce identical gradients
    to the unrolled plan walker."""
    def f(t, y, p):
        return p["a"] * y + p["b"] * jnp.tanh(y)

    P = {"a": jnp.array(-0.4), "b": jnp.array(0.3)}
    y0 = jnp.array([1.0, -0.7, 0.2])
    t = jnp.asarray([0.0, 0.4, 0.8])

    def grad_with(executor):
        pnode_tpu.clear_options()
        pnode_tpu.init([
            "p", "-ts_trajectory_max_cps_ram", "3",
            "-ts_trajectory_schedule", "revolve",
            "-pnode_revolve_executor", executor,
        ])
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.1, method="rk4")

        @jax.jit
        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2) + jnp.sum(sol[1] ** 2)

        return jax.grad(loss)(P)

    g_unr = grad_with("unrolled")
    g_scn = grad_with("scan")
    np.testing.assert_allclose(g_scn["a"], g_unr["a"], rtol=1e-12)
    np.testing.assert_allclose(g_scn["b"], g_unr["b"], rtol=1e-12)


@pytest.mark.slow
def test_revolve_scan_compile_time_flat_large_n():
    """n=5000 steps, c=16 slots: the scanned executor must trace+lower in
    bounded time (the unrolled plan would emit ~25k stepper bodies)."""
    import time as _time

    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-0.2)}
    y0 = jnp.array([1.0, 0.5])
    n = 5000
    t = jnp.asarray([0.0, n * 1e-3])

    pnode_tpu.clear_options()
    pnode_tpu.init([
        "p", "-ts_trajectory_max_cps_ram", "16",
        "-ts_trajectory_schedule", "revolve",
    ])
    ode = ODESolver()
    ode.setupTS(y0, Func(f, P), step_size=1e-3, method="rk4")

    def loss(p):
        sol = ode.odeint_adjoint(y0, t, params=p)
        return jnp.sum(sol[-1] ** 2)

    t0 = _time.time()
    g = jax.jit(jax.grad(loss)).lower(P).compile()
    elapsed = _time.time() - t0
    assert elapsed < 120, f"compile took {elapsed:.0f}s"
    # and the gradient is right (vs store_all)
    pnode_tpu.clear_options()
    ode2 = ODESolver()
    ode2.setupTS(y0, Func(f, P), step_size=1e-3, method="rk4")

    def loss2(p):
        sol = ode2.odeint_adjoint(y0, t, params=p)
        return jnp.sum(sol[-1] ** 2)

    g_ref = jax.grad(loss2)(P)
    g_val = g(P)
    np.testing.assert_allclose(g_val["a"], g_ref["a"], rtol=1e-9)
