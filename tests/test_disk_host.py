"""Host-orchestrated disk trajectory (pnode_tpu/disk_host.py): the real
-ts_trajectory_type disk engine for backends without host callbacks.

Gradient parity bar: identical to jax.grad of the in-memory store-all path
(the adjoint math is the same; only the storage medium differs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pnode_tpu
from pnode_tpu.solver import ODESolver


def f_lin(t, y, p):
    return p["a"] * y + p["b"] * jnp.sin(t)


def f_stiff(t, y, p):
    return p["a"] * y**3 - 4.0 * y


P = {"a": jnp.array(-1.3), "b": jnp.array(0.7)}
Y0 = jnp.asarray(np.linspace(0.3, 1.1, 5))


def _setup(method, implicit, f=f_lin, step=0.05):
    pnode_tpu.clear_options()
    pnode_tpu.init(["p"])
    ode = ODESolver()
    ode.setupTS(Y0, (f, P), step_size=step, method=method,
                implicit_form=implicit, enable_adjoint=True)
    return ode


def _loss(outputs):
    return jnp.sum(outputs ** 2) + jnp.sum(outputs[-1] * 0.5)


@pytest.mark.parametrize("method,implicit", [
    ("rk4", False), ("dopri5", False), ("cn", True), ("beuler", True),
])
def test_disk_host_grads_match_inmemory(method, implicit, tmp_path):
    """value_and_grad through the disk engine == jax.grad of ode.solve,
    including interior-output forcing."""
    t = jnp.linspace(0.0, 1.0, 4)  # interior outputs exercise the forcing
    ode = _setup(method, implicit)

    def loss_mem(p, y0):
        sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
        return _loss(sol)

    l_ref, (gp_ref, gy_ref) = jax.value_and_grad(
        loss_mem, argnums=(0, 1))(P, Y0)

    pnode_tpu.init(["p", "-ts_trajectory_dirname", str(tmp_path)])
    ode2 = _setup(method, implicit)
    dsk = ode2.disk_trajectory_solver(t, chunk=3)  # ragged last chunk
    l_dsk, (gy, gp) = dsk.value_and_grad(_loss, Y0, P)

    np.testing.assert_allclose(float(l_dsk), float(l_ref), rtol=1e-12)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-10, atol=1e-13)
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=1e-10, atol=1e-13)
    dsk.close()


def test_disk_host_outputs_match_and_memmap_on_disk(tmp_path):
    t = jnp.linspace(0.0, 0.8, 3)
    ode = _setup("cn", True)
    sol_ref, _ = ode.solve(Y0, t, params=P, with_adjoint=False)

    dsk = ode.disk_trajectory_solver(t, chunk=4)
    dsk.dirname = str(tmp_path)
    dsk._path = os.path.join(str(tmp_path), "traj.npy")
    sol, stats = dsk.solve(Y0, P)
    np.testing.assert_allclose(sol, sol_ref, rtol=1e-12, atol=1e-14)

    # the trajectory actually lives on disk, full length
    mm = np.load(dsk._path, mmap_mode="r")
    assert mm.shape == (int(dsk.grid.n_steps) + 1,) + tuple(Y0.shape)
    # node 0 is y0; the final node is the final state
    np.testing.assert_allclose(mm[0], np.asarray(Y0))
    np.testing.assert_allclose(mm[-1], np.asarray(sol[-1]), rtol=1e-12)
    dsk.close()
    assert not os.path.exists(dsk._path)


def test_disk_host_two_compiles_regardless_of_length(tmp_path):
    """Chunking compiles at most 2 forward kernels (full + remainder)."""
    t = jnp.linspace(0.0, 2.0, 2)  # 40 steps at 0.05
    ode = _setup("rk4", False)
    dsk = ode.disk_trajectory_solver(t, chunk=7)
    dsk.dirname = str(tmp_path)
    dsk._path = os.path.join(str(tmp_path), "traj.npy")
    dsk.solve(Y0, P)
    assert len(dsk._fwd_fns) <= 2
    _, _ = dsk.adjoint_solve(jnp.ones((2,) + Y0.shape), P)
    assert len(dsk._bwd_fns) <= 2
    dsk.close()


def test_disk_host_stiff_newton_and_single_output(tmp_path):
    """Nonlinear implicit dynamics (real Newton in both sweeps) and the
    single-output-time selection path (sel)."""
    ode = _setup("cn", True, f=f_stiff, step=0.02)
    t = jnp.asarray([0.6])  # single time: integrate [0, 0.6], endpoint only

    def loss_mem(p, y0):
        sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
        return jnp.sum(sol ** 2)

    l_ref, (gp_ref, gy_ref) = jax.value_and_grad(
        loss_mem, argnums=(0, 1))(P, Y0)

    pnode_tpu.init(["p", "-ts_trajectory_dirname", str(tmp_path)])
    ode2 = _setup("cn", True, f=f_stiff, step=0.02)
    dsk = ode2.disk_trajectory_solver(t, chunk=8)
    l_dsk, (gy, gp) = dsk.value_and_grad(
        lambda outs: jnp.sum(outs ** 2), Y0, P)
    np.testing.assert_allclose(float(l_dsk), float(l_ref), rtol=1e-11)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-9, atol=1e-12)
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=1e-9, atol=1e-12)
    dsk.close()


def test_disk_host_fixed_jacobian_nonlinear_linearization_point(tmp_path):
    """REGRESSION (round-3 review): with fixed_jacobian=True the frozen
    Jacobian must be assembled at the SOLVE's initial state y0 — the first
    cut prepared the forward kernels at each chunk's carry state and the
    backward kernels at the adjoint cotangent lam, which for nonlinear
    dynamics produces different outputs per chunk boundary and garbage
    reverse operators."""
    t = jnp.linspace(0.0, 0.6, 4)

    def build(tmp=None):
        pnode_tpu.clear_options()
        flags = ["p"]
        if tmp is not None:
            flags += ["-ts_trajectory_dirname", str(tmp)]
        pnode_tpu.init(flags)
        ode = ODESolver()
        ode.setupTS(Y0, (f_stiff, P), step_size=0.02, method="cn",
                    implicit_form=True, enable_adjoint=True,
                    fixed_jacobian=True, linear_solver="torch")
        return ode

    ode = build()
    sol_ref, _ = ode.solve(Y0, t, params=P, with_adjoint=True)

    def loss_mem(p, y0):
        sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
        return _loss(sol)

    l_ref, (gp_ref, gy_ref) = jax.value_and_grad(
        loss_mem, argnums=(0, 1))(P, Y0)

    ode2 = build(tmp_path)
    dsk = ode2.disk_trajectory_solver(t, chunk=7)  # chunk boundaries interior
    sol, _ = dsk.solve(Y0, P)
    # outputs bit-match: same frozen-J (at y0) in every chunk
    np.testing.assert_array_equal(np.asarray(sol), np.asarray(sol_ref))
    l_dsk, (gy, gp) = dsk.value_and_grad(_loss, Y0, P)
    np.testing.assert_allclose(float(l_dsk), float(l_ref), rtol=1e-12)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-10, atol=1e-13)
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=1e-10, atol=1e-13)
    dsk.close()


def test_disk_host_dtype_cast_matches_solver(tmp_path):
    """The engine casts y0 to the solver's configured dtype exactly like
    ODESolver.solve (review finding: an f64 y0 under x64 silently compiled
    f64 kernels and doubled the disk/tunnel traffic)."""
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_trajectory_dirname", str(tmp_path)])
    ode = ODESolver()
    ode.setupTS(Y0.astype(jnp.float32), (f_lin, P), step_size=0.05,
                method="rk4", enable_adjoint=True)
    dsk = ode.disk_trajectory_solver(jnp.linspace(0.0, 0.5, 2), chunk=4)
    pf = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), P)
    sol, _ = dsk.solve(np.asarray(Y0, np.float64), pf)  # f64 input
    assert sol.dtype == jnp.float32
    assert dsk._mm.dtype == np.float32
    dsk.close()


def test_disk_host_zero_steps_value_and_grad():
    """Degenerate 0-step grid (unreachable via the public API, which
    rejects non-increasing t — constructed directly like the in-memory
    engine's own n_steps==0 branch): value_and_grad must not crash;
    grad_y0 is the sum of the output cotangents (all outputs = y0)."""
    from pnode_tpu.disk_host import HostDiskTrajectory
    from pnode_tpu.grid import TimeGrid

    pnode_tpu.clear_options()
    pnode_tpu.init(["p"])
    ode = ODESolver()
    ode.setupTS(Y0, (f_lin, P), step_size=0.05, method="rk4",
                enable_adjoint=True)
    grid = TimeGrid(ts=np.zeros((0,)), dts=np.zeros((0,)),
                    out_idx=np.asarray([0, 0]), n_steps=0)
    dsk = HostDiskTrajectory(ode._stepper, grid)
    loss, (gy, gp) = dsk.value_and_grad(lambda o: jnp.sum(o ** 2), Y0, P)
    np.testing.assert_allclose(gy, 2.0 * 2.0 * np.asarray(Y0), rtol=1e-12)
    for k in gp:
        np.testing.assert_allclose(gp[k], 0.0, atol=1e-15)


def test_disk_host_bf16_compression(tmp_path):
    """-pnode_trajectory_dtype bf16 stores the memmap compressed; gradients
    stay close to full precision (same bar as the in-memory bf16 store)."""
    import ml_dtypes

    t = jnp.linspace(0.0, 1.0, 2)
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_trajectory_dirname", str(tmp_path),
                    "-pnode_trajectory_dtype", "bf16"])
    ode = ODESolver()
    ode.setupTS(Y0.astype(jnp.float32), (f_lin, P), step_size=0.05,
                method="rk4", enable_adjoint=True)
    dsk = ode.disk_trajectory_solver(t, chunk=6)
    y0f = Y0.astype(jnp.float32)
    pf = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), P)
    _, (gy, gp) = dsk.value_and_grad(lambda o: jnp.sum(o ** 2), y0f, pf)
    mm = np.load(dsk._path, mmap_mode="r")
    # npy reload shows the raw 2-byte descr; the live memmap keeps the type
    assert mm.dtype.itemsize == 2
    assert dsk._mm.dtype == ml_dtypes.bfloat16

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_trajectory_dirname", str(tmp_path)])
    ode2 = ODESolver()
    ode2.setupTS(y0f, (f_lin, P), step_size=0.05, method="rk4",
                 enable_adjoint=True)
    dsk2 = ode2.disk_trajectory_solver(t, chunk=6)
    _, (gy_ref, gp_ref) = dsk2.value_and_grad(
        lambda o: jnp.sum(o ** 2), y0f, pf)
    np.testing.assert_allclose(gy, gy_ref, rtol=2e-2, atol=1e-4)
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=2e-2, atol=1e-4)
    dsk.close()
    dsk2.close()


def _setup_adaptive(method, implicit, max_steps=512, tmp=None):
    pnode_tpu.clear_options()
    flags = ["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-4",
             "-ts_atol", "1e-6", "-ts_adapt_max_steps", str(max_steps)]
    if tmp is not None:
        flags += ["-ts_trajectory_dirname", str(tmp)]
    pnode_tpu.init(flags)
    ode = ODESolver()
    ode.setupTS(Y0, (f_lin, P), step_size=0.05, method=method,
                implicit_form=implicit, enable_adjoint=True)
    return ode


@pytest.mark.parametrize("method,implicit", [("cn", True), ("dopri5", False)])
def test_adaptive_disk_host_bit_parity(method, implicit, tmp_path):
    """The host-orchestrated adaptive disk engine must reproduce the
    in-memory adaptive engine EXACTLY: same outputs, same step counts,
    identical gradients (the controller body is a mirror — this test is
    the tether against drift)."""
    t = jnp.linspace(0.0, 1.0, 3)
    ode = _setup_adaptive(method, implicit)

    def loss_mem(p, y0):
        sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
        return _loss(sol)

    l_ref, (gp_ref, gy_ref) = jax.value_and_grad(
        loss_mem, argnums=(0, 1))(P, Y0)
    sol_ref, st_ref = ode.solve(Y0, t, params=P, with_adjoint=True)

    ode2 = _setup_adaptive(method, implicit, tmp=tmp_path)
    dsk = ode2.disk_trajectory_solver(t, chunk=7)  # ragged trial chunks
    sol, st = dsk.solve(Y0, P)
    np.testing.assert_array_equal(np.asarray(sol), np.asarray(sol_ref))
    assert int(st.accepted) == int(st_ref.accepted)
    assert int(st.rejected) == int(st_ref.rejected)
    assert bool(st.completed)

    l_dsk, (gy, gp) = dsk.value_and_grad(_loss, Y0, P)
    np.testing.assert_allclose(float(l_dsk), float(l_ref), rtol=1e-12)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-10, atol=1e-13)
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=1e-10, atol=1e-13)

    # the trial-axis trajectory is on disk, trial-step states included
    mm = np.load(dsk._path, mmap_mode="r")
    assert mm.shape == (int(dsk.cfg.max_steps),) + tuple(Y0.shape)
    assert len(dsk._fwd_fns) <= 2 and len(dsk._bwd_fns) <= 2
    dsk.close()
    assert not os.path.exists(dsk._path)
