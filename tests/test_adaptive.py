"""Adaptive stepping (-ts_adapt_type basic): accuracy, landing, adjoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pnode_tpu
from pnode_tpu import Func, ODESolver


def f_decay(t, y, p):
    return p["a"] * y + jnp.sin(t) * p["c"]


P = {"a": jnp.array(-0.6), "c": jnp.array(0.3)}
Y0 = jnp.array([1.0, -0.5])


def _exact(t_arr):
    # integrate very finely with fixed-step dopri5 as reference
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=1e-3, method="dopri5",
                enable_adjoint=False)
    return ode.odeint(Y0, jnp.asarray(t_arr))


def test_adaptive_forward_accuracy_and_landing():
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-8",
                    "-ts_atol", "1e-8"])
    t = np.array([0.0, 0.7, 1.3, 2.0])
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=0.05, method="dopri5",
                enable_adjoint=False)
    sol, stats = ode.solve(Y0, jnp.asarray(t), with_adjoint=False)
    ref = _exact(t)
    assert bool(stats.completed)
    np.testing.assert_allclose(sol, ref, rtol=1e-6, atol=1e-8)
    # adaptivity actually took fewer steps than fixed 0.05 stepping would
    assert int(stats.accepted) < 2.0 / 0.05


def test_adaptive_rejects_then_grows():
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-10",
                    "-ts_atol", "1e-10"])
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=1.0, method="bosh3",
                enable_adjoint=False)
    sol, stats = ode.solve(Y0, jnp.asarray([0.0, 2.0]), with_adjoint=False)
    assert bool(stats.completed)
    assert int(stats.rejected) >= 1  # initial dt=1.0 must be rejected
    ref = _exact([0.0, 2.0])
    np.testing.assert_allclose(sol[-1], ref[-1], rtol=1e-6, atol=1e-7)


def test_adaptive_adjoint_matches_fixed_step_gradient():
    """Adaptive-path gradients replay the recorded steps; compare against a
    tight fixed-step discrete adjoint (values should agree to solver tol)."""
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-10",
                    "-ts_atol", "1e-10"])
    t = jnp.asarray([0.0, 1.0])
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=0.05, method="dopri5",
                enable_adjoint=True)

    def loss_adaptive(p, y0):
        sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
        return jnp.sum(sol[-1] ** 2)

    g_ad = jax.grad(loss_adaptive, argnums=(0, 1))(P, Y0)

    pnode_tpu.clear_options()
    ode2 = ODESolver()
    ode2.setupTS(Y0, Func(f_decay, P), step_size=0.005, method="dopri5",
                 enable_adjoint=True)

    def loss_fixed(p, y0):
        sol = ode2.odeint_adjoint(y0, t, params=p)
        return jnp.sum(sol[-1] ** 2)

    g_fx = jax.grad(loss_fixed, argnums=(0, 1))(P, Y0)
    np.testing.assert_allclose(g_ad[0]["a"], g_fx[0]["a"], rtol=1e-6)
    np.testing.assert_allclose(g_ad[0]["c"], g_fx[0]["c"], rtol=1e-6)
    np.testing.assert_allclose(g_ad[1], g_fx[1], rtol=1e-6)


def test_adaptive_adjoint_consistent_with_own_forward_fd():
    """Gradient of the adaptive solve matches FD of the SAME adaptive solve
    (dt treated as data: the recorded schedule is replayed, not re-adapted,
    so use loose FD tolerance)."""
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-9",
                    "-ts_atol", "1e-9"])
    t = jnp.asarray([0.0, 1.0])
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=0.05, method="dopri5",
                enable_adjoint=True)

    def loss(p):
        sol, _ = ode.solve(Y0, t, params=p, with_adjoint=True)
        return jnp.sum(sol[-1] ** 2)

    g = jax.grad(loss)(P)
    eps = 1e-6
    for k in ["a", "c"]:
        pp = dict(P); pp[k] = P[k] + eps
        pm = dict(P); pm[k] = P[k] - eps
        fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        assert float(g[k]) == pytest.approx(fd, rel=1e-4, abs=1e-9)


def test_adaptive_imex_ark3():
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-7",
                    "-ts_atol", "1e-7"])

    def f_im(t, y, p):
        return p["a"] * y

    def f_ex(t, y, p):
        return p["b"] * y**2

    params = ({"a": jnp.array(-3.0)}, {"b": jnp.array(0.1)})
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_im, params[0]), step_size=0.1, method="imex",
                imex_form=True, implicit_form=True,
                func2=Func(f_ex, params[1]), enable_adjoint=False)
    sol, stats = ode.solve(Y0, jnp.asarray([0.0, 1.0]), params=params,
                           with_adjoint=False)
    assert bool(stats.completed)
    # reference: tight fixed-step CN-free comparison via fixed-step ark3
    pnode_tpu.clear_options()
    ode2 = ODESolver()
    ode2.setupTS(Y0, Func(f_im, params[0]), step_size=0.002, method="imex",
                 imex_form=True, implicit_form=True,
                 func2=Func(f_ex, params[1]), enable_adjoint=False)
    ref, _ = ode2.solve(Y0, jnp.asarray([0.0, 1.0]), params=params,
                        with_adjoint=False)
    np.testing.assert_allclose(sol[-1], ref[-1], rtol=1e-5, atol=1e-7)


def test_adaptive_imex_ark5_embedded():
    """The L-stable derived ARK5(4) pair must drive -ts_adapt_type basic at
    order 5 via its embedded order-4 weights (VERDICT r1, missing #5)."""
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-8",
                    "-ts_atol", "1e-8", "-ts_arkimex_type", "5"])

    def f_im(t, y, p):
        return p["a"] * y

    def f_ex(t, y, p):
        return p["b"] * jnp.sin(y)

    params = ({"a": jnp.array(-4.0)}, {"b": jnp.array(0.3)})
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_im, params[0]), step_size=0.1, method="imex",
                imex_form=True, implicit_form=True,
                func2=Func(f_ex, params[1]), enable_adjoint=False)
    sol, stats = ode.solve(Y0, jnp.asarray([0.0, 1.0]), params=params,
                           with_adjoint=False)
    assert bool(stats.completed)
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_arkimex_type", "5"])
    ode2 = ODESolver()
    ode2.setupTS(Y0, Func(f_im, params[0]), step_size=0.002, method="imex",
                 imex_form=True, implicit_form=True,
                 func2=Func(f_ex, params[1]), enable_adjoint=False)
    ref, _ = ode2.solve(Y0, jnp.asarray([0.0, 1.0]), params=params,
                        with_adjoint=False)
    np.testing.assert_allclose(sol[-1], ref[-1], rtol=1e-6, atol=1e-8)


def test_pi_controller_and_adapt_clip():
    """-ts_adapt_type pi (two-error-history controller) + -ts_adapt_clip
    parity: both accepted, solution matches basic's to tolerance, clip
    bounds honored (a tiny high-clip forces more steps)."""
    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-1.5)}

    def run(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p", "-ts_rtol", "1e-7", "-ts_atol", "1e-9"] + flags)
        ode = ODESolver()
        ode.setupTS(Y0, Func(f, P), step_size=0.05, method="dopri5",
                    enable_adjoint=False)
        return ode.solve(Y0, jnp.asarray([0.0, 1.0]), params=P,
                         with_adjoint=False)

    sol_b, st_b = run(["-ts_adapt_type", "basic"])
    sol_pi, st_pi = run(["-ts_adapt_type", "pi"])
    assert bool(st_pi.completed)
    np.testing.assert_allclose(np.asarray(sol_pi[-1]), np.asarray(sol_b[-1]),
                               rtol=1e-6)
    exact = np.asarray(Y0) * np.exp(-1.5)
    np.testing.assert_allclose(np.asarray(sol_pi[-1]), exact, rtol=1e-5)

    # clip: capping growth at 1.05x forces many more accepted steps
    sol_c, st_c = run(["-ts_adapt_type", "basic",
                       "-ts_adapt_clip", "0.5,1.05"])
    assert int(st_c.accepted) > int(st_b.accepted)
    np.testing.assert_allclose(np.asarray(sol_c[-1]), exact, rtol=1e-5)


def test_adaptive_fused_path_matches_generic():
    """Adaptive trial steps through the fused forward kernel (embedded error
    computed in-kernel, stage inverse per trial step) must reproduce the
    generic path's solutions AND gradients — interpret mode on CPU."""
    from pnode_tpu import FlaxFunc
    from pnode_tpu.models import KSFuncEX, KSFuncIM

    batch, nx = 4, 16
    key = jax.random.PRNGKey(3)
    y0 = jax.random.normal(key, (batch, nx), jnp.float32) * 0.1
    t_out = jnp.array([0.0, 0.4])

    def run(mode):
        pnode_tpu.clear_options()
        pnode_tpu.init([
            "p", "-snes_type", "ksponly", "-ts_arkimex_type", "3",
            "-ts_adapt_type", "basic", "-ts_rtol", "1e-4",
            "-ts_atol", "1e-6",
            "-pnode_fused_ark_adjoint", mode,
        ])
        im = KSFuncIM(nx=nx)
        ex = KSFuncEX(nx=nx, hidden=24, use_pallas=True)
        k = jax.random.PRNGKey(0)
        y_tmpl = jnp.zeros((batch, nx), jnp.float32)
        vim = im.init(k, 0.0, y_tmpl)
        vex = ex.init(k, 0.0, y_tmpl)
        ode = ODESolver()
        ode.setupTS(
            y_tmpl, FlaxFunc(im, vim), step_size=0.05, method="imex",
            imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
            linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
        )
        params = (vim, vex)

        def loss(p):
            pred, _ = ode.solve(y0, t_out, params=p)
            return jnp.sum(pred[-1] ** 2)

        if mode == "interpret":
            # the fused trial step must actually trigger
            stp = ode._stepper.prepare(0.0, y0, params, dt0=None)
            assert stp._fused_reverse_args(
                params, dt=jnp.float32(0.05)
            ) is not None
        return jax.value_and_grad(loss)(params)

    l_g, g_g = run("off")
    l_f, g_f = run("interpret")
    np.testing.assert_allclose(float(l_f), float(l_g), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


# -- trajectory policies on the adaptive path (round-3: PETSc TSTrajectory
#    applies to adaptive runs too, /root/reference/README.md:91-100) --------

def _adaptive_grads(flags, method="cn", implicit=True, n_t=3):
    """grad of sum(sol[-1]^2) wrt (params, y0) under the given flag tail."""
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-7",
                    "-ts_atol", "1e-7"] + flags)
    t = jnp.linspace(0.0, 1.0, n_t)
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=0.05, method=method,
                implicit_form=implicit, enable_adjoint=True)

    def loss(p, y0):
        sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
        return jnp.sum(sol ** 2)

    return jax.grad(loss, argnums=(0, 1))(P, Y0)


@pytest.mark.parametrize("flags", [
    ["-ts_trajectory_solution_only", "1"],
    ["-ts_trajectory_max_cps_ram", "4"],
    ["-ts_trajectory_max_cps_ram", "4", "-ts_trajectory_schedule", "revolve"],
    ["-ts_trajectory_max_cps_ram", "4", "-ts_trajectory_schedule", "cams"],
], ids=["solution_only", "checkpoint", "revolve", "cams"])
@pytest.mark.parametrize("method,implicit", [("cn", True), ("dopri5", False)])
def test_adaptive_policy_gradients_match_store_all(flags, method, implicit):
    """-ts_adapt_type basic + every trajectory policy produces gradients
    identical (1e-10) to the store-all record, on CN and explicit RK."""
    gp_ref, gy_ref = _adaptive_grads([], method=method, implicit=implicit)
    gp, gy = _adaptive_grads(flags, method=method, implicit=implicit)
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("sched", ["uniform", "revolve", "cams"])
def test_adaptive_policy_gradients_match_store_all_ark(sched):
    """Same policy-invariance assertion on the ARK IMEX family."""
    def f_im(t, y, p):
        return p["a"] * y

    def f_ex(t, y, p):
        return p["b"] * y**2

    params = ({"a": jnp.array(-3.0)}, {"b": jnp.array(0.1)})
    t = jnp.asarray([0.0, 1.0])

    def grads(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-7",
                        "-ts_atol", "1e-7"] + flags)
        ode = ODESolver()
        ode.setupTS(Y0, Func(f_im, params[0]), step_size=0.1, method="imex",
                    imex_form=True, implicit_form=True,
                    func2=Func(f_ex, params[1]), enable_adjoint=True)

        def loss(p, y0):
            sol, _ = ode.solve(y0, t, params=p, with_adjoint=True)
            return jnp.sum(sol[-1] ** 2)

        return jax.grad(loss, argnums=(0, 1))(params, Y0)

    (gpi_ref, gpe_ref), gy_ref = grads([])
    flags = ["-ts_trajectory_max_cps_ram", "4"]
    if sched != "uniform":
        flags += ["-ts_trajectory_schedule", sched]
    (gpi, gpe), gy = grads(flags)
    np.testing.assert_allclose(gpi["a"], gpi_ref["a"], rtol=1e-10)
    np.testing.assert_allclose(gpe["b"], gpe_ref["b"], rtol=1e-10)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-10, atol=1e-12)


def test_adaptive_policy_trajectory_memory_shapes():
    """The per-trial-step record is SCALAR (O(max_steps)); states appear
    only in the policy's bounded checkpoint buffers: peak trajectory
    memory O(c) for revolve, O(c + max_steps/c) for uniform segments —
    never O(max_steps * state)."""
    from pnode_tpu.adaptive import AdaptConfig, make_adaptive_odeint
    from pnode_tpu.adjoint import TrajectoryConfig
    from pnode_tpu.steppers import ExplicitRK
    from pnode_tpu.tableaus import get_rk_tableau

    stepper = ExplicitRK(get_rk_tableau("dopri5"),
                         lambda t, y, p: p["a"] * y)
    cfg = AdaptConfig(rtol=1e-6, atol=1e-6, max_steps=256)
    params = {"a": jnp.array(-0.5)}
    y0 = jnp.ones((8, 4))
    state_sz = y0.size

    def rec_state_elems(traj):
        solve = make_adaptive_odeint(stepper, np.array([0.0, 1.0]), cfg,
                                     0.05, with_adjoint=True, traj=traj)
        out = jax.eval_shape(solve.forward_for_test, y0, params)
        _, _, recs, bufs = out
        rec_elems = sum(int(np.prod(l.shape))
                        for l in jax.tree_util.tree_leaves(recs))
        buf_elems = sum(int(np.prod(l.shape))
                        for l in jax.tree_util.tree_leaves(bufs))
        return rec_elems, buf_elems

    # store_all: O(max_steps * state * stages) — the baseline
    rec_sa, _ = rec_state_elems(TrajectoryConfig(kind="store_all"))
    assert rec_sa >= 256 * state_sz

    # revolve: scalar record only, nothing stored forward
    rec_rv, buf_rv = rec_state_elems(
        TrajectoryConfig(kind="revolve", max_cps=4))
    assert rec_rv == 4 * 256  # (t, dt, accept, out_slot) scalars
    assert buf_rv == 0

    # uniform checkpoints: scalar record + c segment-start states
    rec_cp, buf_cp = rec_state_elems(
        TrajectoryConfig(kind="checkpoint", max_cps=4))
    assert rec_cp == 4 * 256
    assert buf_cp == 4 * state_sz

    # cams: scalar record + bounded solution/stage buffers
    rec_cm, buf_cm = rec_state_elems(TrajectoryConfig(kind="cams", max_cps=4))
    assert rec_cm == 4 * 256
    assert buf_cm <= (4 + 2) * state_sz * (1 + stepper.tab.stages)


def _jaxpr_has_shape(jaxpr, shape):
    """True if any equation in the (nested) jaxpr touches an array of
    exactly ``shape``."""
    import jax.extend.core as jex_core

    def walk(jx):
        for eqn in jx.eqns:
            for v in list(eqn.invars) + list(eqn.outvars):
                aval = getattr(v, "aval", None)
                if aval is not None and tuple(
                        getattr(aval, "shape", ())) == shape:
                    return True
            for p in eqn.params.values():
                subs = p if isinstance(p, (list, tuple)) else (p,)
                for s in subs:
                    inner = getattr(s, "jaxpr", None)
                    if isinstance(s, jex_core.Jaxpr) and walk(s):
                        return True
                    if inner is not None and isinstance(
                            inner, jex_core.Jaxpr) and walk(inner):
                        return True
        return False

    return walk(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)


def test_adaptive_revolve_backward_never_materializes_forcing():
    """The BACKWARD pass must gather the per-step output forcing from the
    O(n_out * state) cotangents inside the reverse scan — materializing it
    up front is an O(max_steps * state) array, which defeats the
    low-memory policies (round-3 review finding: solve_bwd once built
    exactly that buffer before dispatching to the engines)."""
    from pnode_tpu.adaptive import AdaptConfig, make_adaptive_odeint
    from pnode_tpu.adjoint import TrajectoryConfig
    from pnode_tpu.steppers import ExplicitRK
    from pnode_tpu.tableaus import get_rk_tableau

    stepper = ExplicitRK(get_rk_tableau("dopri5"),
                         lambda t, y, p: p["a"] * y)
    cfg = AdaptConfig(rtol=1e-6, atol=1e-6, max_steps=256)
    params = {"a": jnp.array(-0.5)}
    y0 = jnp.ones((8, 4))
    for kind in ("revolve", "cams"):
        solve = make_adaptive_odeint(
            stepper, np.array([0.0, 1.0]), cfg, 0.05, with_adjoint=True,
            traj=TrajectoryConfig(kind=kind, max_cps=4))

        def loss(y0_, p_):
            out, _ = solve(y0_, p_)
            return jnp.sum(out[-1] ** 2)

        jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(y0, params)
        assert not _jaxpr_has_shape(jaxpr, (256,) + y0.shape), (
            f"{kind}: backward materializes an O(max_steps * state) array")


def test_adaptive_policies_via_solver_flags_disk(tmp_path):
    """-ts_trajectory_type disk on the CPU backend streams the adaptive
    trial trajectory to a host memmap and reproduces store-all gradients."""
    gp_ref, gy_ref = _adaptive_grads([])
    gp, gy = _adaptive_grads(
        ["-ts_trajectory_type", "disk", "-ts_trajectory_dirname",
         str(tmp_path)])
    for k in gp_ref:
        np.testing.assert_allclose(gp[k], gp_ref[k], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-10, atol=1e-12)


def test_adaptive_dt_warm_start():
    """stats.dt_last fed back as solve(dt0=...) warm-starts the controller:
    no worse rejection count than the cold solve, same solution, and the
    gradient path accepts a traced dt0 (zero cotangent: dt is data)."""
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-6",
                    "-ts_atol", "1e-6"])
    ode = ODESolver()
    # deliberately oversized dt0: the cold solve pays a rejection descent
    ode.setupTS(Y0, Func(f_decay, P), step_size=5.0, method="dopri5")
    t = jnp.asarray([0.0, 1.0])

    sol_cold, st_cold = ode.solve(Y0, t, params=P)
    assert bool(st_cold.completed)
    sol_warm, st_warm = ode.solve(Y0, t, params=P, dt0=st_cold.dt_last)
    assert bool(st_warm.completed)
    assert int(st_warm.rejected) <= int(st_cold.rejected)
    assert float(st_warm.dt_last) > 0.0
    # dt_first = the first ACCEPTED trial's dt: re-solving the same window
    # from it must land in the accept region immediately (zero rejections)
    assert float(st_cold.dt_first) > 0.0
    sol_first, st_first = ode.solve(Y0, t, params=P, dt0=st_cold.dt_first)
    assert bool(st_first.completed)
    assert int(st_first.rejected) == 0
    np.testing.assert_allclose(
        np.asarray(sol_first[-1]), np.asarray(sol_cold[-1]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sol_warm[-1]), np.asarray(sol_cold[-1]), rtol=1e-5)

    def loss(p, dtc):
        pred, stats = ode.solve(Y0, t, params=p, dt0=dtc)
        return jnp.sum(pred[-1] ** 2), stats

    (l1, st), g = jax.value_and_grad(loss, has_aux=True)(P, st_cold.dt_last)
    g_ref = jax.grad(lambda p: jnp.sum(ode.solve(Y0, t, params=p)[0][-1]
                                       ** 2))(P)
    # warm-started gradient within controller-schedule distance of cold
    np.testing.assert_allclose(g["a"], g_ref["a"], rtol=1e-4)
    np.testing.assert_allclose(g["c"], g_ref["c"], rtol=1e-4)


def test_adaptive_no_growth_after_rejection():
    """The trial following a rejection must not grow dt (Hairer DOPRI5
    post-reject rule): with a wildly oversized dt0 the controller's
    rejection count stays bounded by the geometric descent length."""
    pnode_tpu.init(["p", "-ts_adapt_type", "basic", "-ts_rtol", "1e-7",
                    "-ts_atol", "1e-7"])
    ode = ODESolver()
    ode.setupTS(Y0, Func(f_decay, P), step_size=50.0, method="bosh3")
    t = jnp.asarray([0.0, 0.5])
    _, st = ode.solve(Y0, t, params=P)
    assert bool(st.completed)
    # descent from dt=50 at clip 0.1/step is <= ~4 rejections to reach
    # the ~0.05-0.1 working dt; oscillation would multiply this
    assert int(st.rejected) <= 6
