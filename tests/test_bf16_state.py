"""bf16 time integration: the solver carries/stores the state at its own
dtype (the HBM-traffic term), computes stage math and implicit solves at
promoted >= f32 precision, and returns f32 parameter gradients.

This is a TPU-native capability beyond the reference (PETSc builds are
fp32/fp64 only): on bandwidth-bound workloads (conv ODE-nets) the stored
trajectory/stage aux halves. Steppers cast at the step boundary
(steppers.py step/step_adj returns); VJP seeds are cast to the dynamics'
output dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu import ODESolver


def _f(t, y, p):
    return jnp.tanh(y) * p["w"]


def _grad(method, dtype):
    ode = ODESolver()
    y0 = jnp.linspace(0.1, 1.0, 32, dtype=jnp.float32).reshape(4, 8)
    y0 = y0.astype(dtype)
    params = {"w": jnp.float32(0.5)}
    ode.setupTS(y0, (_f, params), step_size=0.25, method=method,
                enable_adjoint=True)
    t_out = np.array([1.0])

    def loss(p, y0):
        s, _ = ode.solve(y0, t_out, params=p, with_adjoint=True)
        return jnp.sum(s[-1].astype(jnp.float32))

    sol, _ = ode.solve(y0, t_out, params=params)
    g = jax.grad(loss)(params, y0)
    return sol, g


@pytest.mark.parametrize("method", ["rk4", "dopri5", "cn", "beuler"])
def test_bf16_state_dtype_and_grad(method):
    sol, g = _grad(method, jnp.bfloat16)
    assert sol.dtype == jnp.bfloat16          # state stays bf16 end-to-end
    assert g["w"].dtype == jnp.float32        # param grads at param dtype
    _, g32 = _grad(method, jnp.float32)
    np.testing.assert_allclose(
        float(g["w"]), float(g32["w"]), rtol=2e-2
    )


def test_bf16_state_imex():
    from pnode_tpu import FlaxFunc  # noqa: F401  (import parity)

    def f_im(t, y, p):
        return -0.5 * y

    def f_ex(t, y, p):
        return jnp.sin(y) * p["w"]

    ode = ODESolver()
    y0 = jnp.linspace(0.1, 1.0, 32, jnp.float32).reshape(4, 8)
    params = ({}, {"w": jnp.float32(0.8)})
    kw = dict(step_size=0.25, method="imex", imex_form=True,
              implicit_form=True, enable_adjoint=True)

    def run(dtype):
        o = ODESolver()
        yy = y0.astype(dtype)
        o.setupTS(yy, (f_im, {}), func2=(f_ex, params[1]), **kw)
        t_out = np.array([1.0])

        def loss(p, y):
            s, _ = o.solve(y, t_out, params=p, with_adjoint=True)
            return jnp.sum(s[-1].astype(jnp.float32))

        s, _ = o.solve(yy, t_out, params=params)
        g = jax.grad(loss)(params, yy)
        return s, g

    sol_b, g_b = run(jnp.bfloat16)
    sol_f, g_f = run(jnp.float32)
    assert sol_b.dtype == jnp.bfloat16
    assert g_b[1]["w"].dtype == jnp.float32
    np.testing.assert_allclose(
        float(g_b[1]["w"]), float(g_f[1]["w"]), rtol=3e-2
    )


def test_bf16_state_frozen_jacobian_block_solver():
    """The Burgers/KS production stiff config at bf16: hpddm shared-block
    solver + fixed_jacobian + ksponly. The frozen Jacobian must be
    assembled at >= f32 from a promoted linearization state (the models
    are dtype-polymorphic, so a bf16 state would both round the stiff
    operator to 8 mantissa bits and hand lapack an unsupported bf16
    matrix — linsolve.assemble_block_jacobian). Also exercises the bf16
    WEIGHT stream: master f32 params cast to bf16 inside the loss, grads
    flowing back to the f32 masters (bench.py --dtype bf16)."""
    import pnode_tpu

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-snes_type", "ksponly"])

    def f_im(t, y, p):
        # stiff linear stencil (circular second difference)
        return 40.0 * (jnp.roll(y, 1, -1) - 2 * y + jnp.roll(y, -1, -1))

    def f_ex(t, y, p):
        return jnp.tanh(y @ p["w"].astype(y.dtype))

    batch, d = 4, 8
    y0 = jnp.linspace(0.1, 1.0, batch * d, jnp.float32).reshape(batch, d)
    w0 = 0.3 * jnp.eye(d, dtype=jnp.float32)
    t_out = np.array([0.5])

    def run(dtype):
        o = ODESolver()
        yy = y0.astype(dtype)
        o.setupTS(yy, (f_im, {}), func2=(f_ex, {"w": w0}),
                  step_size=0.25, method="imex", imex_form=True,
                  implicit_form=True, enable_adjoint=True,
                  linear_solver="hpddm", fixed_jacobian=True,
                  batch_size=batch)

        def loss(p, y):
            pp = ({}, jax.tree_util.tree_map(
                lambda a: a.astype(dtype), p[1]))
            s, _ = o.solve(y, t_out, params=pp, with_adjoint=True)
            return jnp.sum(s[-1].astype(jnp.float32))

        params = ({}, {"w": w0})
        s, _ = o.solve(yy, t_out, params=(
            {}, {"w": w0.astype(dtype)}))
        g = jax.grad(loss)(params, yy)
        return s, g

    sol_b, g_b = run(jnp.bfloat16)
    sol_f, g_f = run(jnp.float32)
    assert sol_b.dtype == jnp.bfloat16
    assert g_b[1]["w"].dtype == jnp.float32  # grads land on f32 masters
    assert np.all(np.isfinite(np.asarray(sol_b, np.float32)))
    np.testing.assert_allclose(
        np.asarray(g_b[1]["w"], np.float64),
        np.asarray(g_f[1]["w"], np.float64),
        rtol=5e-2, atol=5e-3,
    )
    pnode_tpu.clear_options()


def test_bf16_state_adaptive():
    """Adaptive controller over a bf16 state: time/dt/error-norm arithmetic
    must ride at f32 (bf16 eps ~8e-3 cannot accumulate t+dt or land on
    outputs), while the carried state stays bf16."""
    import pnode_tpu

    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-2",
                    "-ts_atol", "1e-2"])
    y0 = jnp.linspace(0.1, 1.0, 32, dtype=jnp.float32).reshape(4, 8)
    params = {"w": jnp.float32(0.5)}
    t_out = np.array([0.0, 1.0])  # adaptive t_out[0] = initial time

    def run(dtype):
        o = ODESolver()
        yy = y0.astype(dtype)
        o.setupTS(yy, (_f, params), step_size=0.1, method="dopri5",
                  enable_adjoint=True)

        def loss(p, y):
            s, _ = o.solve(y, t_out, params=p, with_adjoint=True)
            return jnp.sum(s[-1].astype(jnp.float32))

        s, _ = o.solve(yy, t_out, params=params)
        g = jax.grad(loss)(params, yy)
        return s, g

    sol_b, g_b = run(jnp.bfloat16)
    sol_f, g_f = run(jnp.float32)
    assert sol_b.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(sol_b, np.float32)))
    # landed on the output and produced the f32 trajectory to bf16 accuracy
    np.testing.assert_allclose(
        np.asarray(sol_b[-1], np.float32), np.asarray(sol_f[-1], np.float32),
        rtol=3e-2, atol=3e-2,
    )
    np.testing.assert_allclose(
        float(g_b["w"]), float(g_f["w"]), rtol=5e-2
    )
