"""Options-database and time-grid unit tests."""

import numpy as np
import pytest

import pnode_tpu
from pnode_tpu.grid import build_time_grid
from pnode_tpu.options import Options


def test_options_parse_and_typed_getters():
    rest = pnode_tpu.init(
        ["prog", "pos", "-ts_type", "cn", "-ksp_rtol", "1e-8",
         "-ts_monitor", "-snes_max_it", "25"]
    )
    assert rest == ["pos"]
    o = Options()
    assert o.get_string("ts_type") == "cn"
    assert o.get_real("ksp_rtol") == 1e-8
    assert o.get_int("snes_max_it") == 25
    assert o.get_bool("ts_monitor") is True
    assert o.get_bool("nonexistent", False) is False


def test_options_prefix_scoping():
    pnode_tpu.init(["prog", "-pnode_inner_ksp_rtol", "1e-3", "-ksp_rtol", "1e-6"])
    inner = Options("pnode_inner_")
    outer = Options()
    assert inner.get_real("ksp_rtol") == 1e-3
    assert outer.get_real("ksp_rtol") == 1e-6


def test_options_cli_overrides_programmatic():
    pnode_tpu.init(["prog", "-ts_type", "cn"])
    pnode_tpu.set_option("ts_type", "rk")  # programmatic default loses
    assert Options().get_string("ts_type") == "cn"


def test_options_left_tracks_unused():
    pnode_tpu.init(["prog", "-used_flag", "1", "-unused_flag", "2"])
    Options().get_int("used_flag")
    assert pnode_tpu.options_left() == ["unused_flag"]


def test_grid_scalar_step_matchstep_truncation():
    g = build_time_grid(np.array([0.0, 1.0]), 0.4)
    np.testing.assert_allclose(g.dts, [0.4, 0.4, 0.2], rtol=1e-12)
    assert list(g.out_idx) == [0, 3]


def test_grid_step_list_per_interval():
    t = np.concatenate([[0.0], np.logspace(-5, -3, 3)])
    sizes = list(np.diff(t))
    g = build_time_grid(t, sizes)
    assert g.n_steps == 3
    np.testing.assert_allclose(g.dts, sizes, rtol=1e-12)
    assert list(g.out_idx) == [0, 1, 2, 3]


def test_grid_list_reuses_last_entry():
    g = build_time_grid(np.array([0.0, 1.0]), [0.25])
    assert g.n_steps == 4
    np.testing.assert_allclose(g.dts, [0.25] * 4)


def test_grid_list_mismatch_raises():
    with pytest.raises(RuntimeError, match="fails to land"):
        build_time_grid(np.array([0.0, 1.0]), [0.3])


def test_grid_multiple_steps_between_outputs():
    g = build_time_grid(np.array([0.0, 0.3, 1.0]), 0.1)
    assert list(g.out_idx) == [0, 3, 10]
    assert g.n_steps == 10


def test_inner_ksp_prefix_overrides():
    """Inner-solver flags use the reference's pnode_inner_ prefix
    (hpddm_linearsolve.py:15), overriding plain -ksp_* values."""
    import jax.numpy as jnp

    from pnode_tpu import Func, ODESolver

    pnode_tpu.init(["p", "-ksp_rtol", "1e-6", "-pnode_inner_ksp_rtol", "1e-3"])
    ode = ODESolver()
    ode.setupTS(jnp.zeros(2), Func(lambda t, y, p: -y, {}), step_size=0.1,
                method="cn", implicit_form=True)
    assert ode.lin_cfg.rtol == 1e-3

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ksp_rtol", "1e-6"])
    ode2 = ODESolver()
    ode2.setupTS(jnp.zeros(2), Func(lambda t, y, p: -y, {}), step_size=0.1,
                 method="cn", implicit_form=True)
    assert ode2.lin_cfg.rtol == 1e-6


def test_help_registry_accumulates_queried_options():
    """-help parity: every queried option lands in the registry with its
    default (printed at exit when -help is set)."""
    import pnode_tpu
    from pnode_tpu.options import options_help

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_type", "cn"])
    import jax.numpy as jnp

    from pnode_tpu import ODESolver

    ode = ODESolver()
    ode.setupTS(jnp.ones((1, 2)), lambda t, y: -y, step_size=0.1,
                method="dopri5")
    reg = options_help()
    assert "ts_type" in reg
    assert "snes_rtol" in reg and reg["snes_rtol"] == "1e-08"
    assert "ts_trajectory_max_cps_ram" in reg


def test_newton_tolerance_defaults_scale_with_dtype():
    """Newton tolerance defaults derive from machine epsilon (~50*eps,
    floored at PETSc's fp64 1e-8): fp32 gets a reachable ~6e-6, bf16
    ~0.39 instead of an impossible sub-eps target; explicit flags always
    win (found on hardware: unreachable fp64-calibrated rtol spun stages
    to max_it and flagged converged=False on machine-precision solves)."""
    import jax.numpy as jnp
    import numpy as np

    import pnode_tpu
    from pnode_tpu import Func, ODESolver

    def f(t, y, p):
        return -y

    pnode_tpu.clear_options()
    pnode_tpu.init(["p"])
    ode32 = ODESolver()
    ode32.setupTS(jnp.zeros((2,), jnp.float32), Func(f, {}), step_size=0.1,
                  method="cn", implicit_form=True)
    tol32 = 50.0 * float(np.finfo(np.float32).eps)
    assert ode32.newton_cfg.rtol == tol32
    assert ode32.newton_cfg.stol == tol32

    ode16 = ODESolver()
    ode16.setupTS(jnp.zeros((2,), jnp.bfloat16), Func(f, {}), step_size=0.1,
                  method="cn", implicit_form=True)
    # bf16 eps ~7.8e-3: the default must stay above it, not at fp32's 5e-6
    assert ode16.newton_cfg.rtol >= float(jnp.finfo(jnp.bfloat16).eps)

    ode64 = ODESolver()
    ode64.setupTS(jnp.zeros((2,), jnp.float64), Func(f, {}), step_size=0.1,
                  method="cn", implicit_form=True)
    assert ode64.newton_cfg.rtol == 1e-8

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-snes_rtol", "1e-3"])
    ode_flag = ODESolver()
    ode_flag.setupTS(jnp.zeros((2,), jnp.float32), Func(f, {}),
                     step_size=0.1, method="cn", implicit_form=True)
    assert ode_flag.newton_cfg.rtol == 1e-3
