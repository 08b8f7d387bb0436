"""CAMS multistage checkpoint schedules: planner optimality + adjoint parity.

The planner (csrc/cams.cpp + pnode_tpu/cams.py) must be (a) exactly optimal
against exhaustive search over the FULL action space — including dual-use
stage checkpoints as restore points and drop-at-final-restore, the tricks
that defeat naive DPs — and (b) produce gradients identical to store_all
when executed by the adjoint driver. Mirrors what tests/test_revolve.py does
for the revolve planner; reference capability: PETSc TSTrajectory CAMS
(/root/reference/README.md:91-100, arXiv 2106.13879).
"""

import heapq
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pnode_tpu
from pnode_tpu import Func, ODESolver
from pnode_tpu import cams
from pnode_tpu import revolve as rv


# ---------------------------------------------------------------------------
# exhaustive ground truth: Dijkstra over the full schedule action space
# ---------------------------------------------------------------------------


def _search(n, m, w, sols0, stg0):
    start = (sols0, stg0, n, n - 1)
    dist = {start: 0}
    pq = [(0, 0, start)]
    cnt = 0
    while pq:
        d, _, st = heapq.heappop(pq)
        (sols, stgs, cur, nxt) = st
        if d > dist.get(st, 1 << 60):
            continue
        if nxt < 0:
            return d
        units = (len(sols) - 1) + w * len(stgs)
        succs = []
        if nxt in stgs:  # reverse from stage checkpoint (free)
            succs.append((d, (sols, frozenset(stgs - {nxt}), cur, nxt - 1)))
        if cur == nxt:  # reverse by stage recompute
            succs.append((d + 1, (sols, stgs, cur, nxt - 1)))
        for j in sols:  # restore (solution cps AND stage-cp y-components)
            if j != cur and j <= nxt:
                succs.append((d, (sols, stgs, j, nxt)))
        for k in stgs:
            if k != cur and k <= nxt:
                succs.append((d, (sols, stgs, k, nxt)))
        if cur < nxt:  # advance one step
            succs.append((d + 1, (sols, stgs, cur + 1, nxt)))
        if cur not in sols and cur <= nxt and units + 1 <= m:
            succs.append((d, (frozenset(sols | {cur}), stgs, cur, nxt)))
        if cur < n and cur not in stgs and cur <= nxt and units + w <= m:
            succs.append((d + 1, (sols, frozenset(stgs | {cur}), cur + 1, nxt)))
        for j in sols:  # drops are free, any time
            if j != 0:
                succs.append((d, (frozenset(sols - {j}), stgs, cur, nxt)))
        for k in stgs:
            succs.append((d, (sols, frozenset(stgs - {k}), cur, nxt)))
        for nd, s in succs:
            if nd < dist.get(s, 1 << 60):
                dist[s] = nd
                cnt += 1
                heapq.heappush(pq, (nd, cnt, s))
    return 1 << 60


def _exhaustive_opt(n, m, w):
    best = None
    for ns in range(0, min(m, n - 1) + 1):
        for sols in itertools.combinations(range(1, n), ns):
            rem = m - ns
            for nq in range(0, min(rem // w, n) + 1):
                for stg in itertools.combinations(range(n), nq):
                    c = _search(n, m, w, frozenset(sols) | {0}, frozenset(stg))
                    if best is None or c < best:
                        best = c
    return best


def test_planner_matches_exhaustive_small_grid():
    for n in range(1, 5):
        for m in range(0, 4):
            for w in (1, 2, 3):
                assert cams.optimal_cost(n, m, w) == _exhaustive_opt(n, m, w), (
                    n, m, w
                )


@pytest.mark.slow
def test_planner_matches_exhaustive_larger_grid():
    for n in (5, 6):
        for m in range(0, 5):
            for w in (1, 2, 3):
                assert cams.optimal_cost(n, m, w) == _exhaustive_opt(n, m, w), (
                    n, m, w
                )


# ---------------------------------------------------------------------------
# plan validity, fallback parity, cost dominance
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "n,m,w",
    [(1, 0, 2), (7, 3, 2), (20, 6, 3), (64, 9, 4), (200, 12, 5), (613, 17, 5)],
)
def test_plan_is_valid_and_achieves_dp_cost(n, m, w):
    fwd, rev = cams.cams_plan(n, m, w)
    stats = cams.validate_plan(fwd, rev, n, m, w)
    assert stats["cost"] == cams.optimal_cost(n, m, w)
    assert stats["max_units"] <= m


def test_two_level_plan_beyond_exact_cap():
    n, m, w = 3000, 20, 4
    fwd, rev = cams.cams_plan(n, m, w)
    stats = cams.validate_plan(fwd, rev, n, m, w)
    assert stats["max_units"] <= m
    # exactness is per-segment above the cap; still far below solution-only
    assert stats["cost"] < n * (n + 1) // 4


def test_native_library_loaded():
    assert cams.using_native()


def test_python_fallback_matches_native():
    for n, m, w in [(5, 2, 2), (17, 5, 3), (40, 8, 2)]:
        t_nat = cams._solve_tables(n, m, w)
        t_py = cams._solve_tables_py(n, m, w)
        assert t_nat.cost == t_py.cost, (n, m, w)
        em = cams._Emitter(t_py)
        em.emit_F(0, n, m, 0, 0, anchor=0, pending=False)
        st = cams.validate_plan(em.fwd, em.rev, n, m, w)
        assert st["cost"] == t_py.cost


def test_cams_dominates_revolve_executor_cost():
    """At equal budget, the CAMS schedule's recompute cost must beat the
    revolve executor's (T(n,c) advances + n stage recomputes): the whole
    point of multistage-aware checkpointing."""
    for n, c in [(100, 8), (500, 12)]:
        for w in (2, 5):
            assert cams.optimal_cost(n, c, w) < rv.optimal_cost(n, c) + n


def test_saturated_budget_is_free():
    # m >= n*w: capture everything during the forward pass -> zero recompute
    assert cams.optimal_cost(12, 12 * 3, 3) == 0
    fwd, rev = cams.cams_plan(12, 12 * 3, 3)
    assert cams.validate_plan(fwd, rev, 12, 36, 3)["cost"] == 0


# ---------------------------------------------------------------------------
# adjoint executor: gradient identity vs store_all
# ---------------------------------------------------------------------------


def _grad_with(flags, y0, t, P, f, **setup):
    pnode_tpu.clear_options()
    pnode_tpu.init(["p"] + flags)
    ode = ODESolver()
    ode.setupTS(y0, Func(f, P), **setup)

    @jax.jit
    def loss(p):
        sol = ode.odeint_adjoint(y0, t, params=p)
        return jnp.sum(sol[-1] ** 2) + jnp.sum(sol[1] ** 2)

    return jax.grad(loss)(P)


def test_cams_policy_gradients_match_store_all_rk4():
    def f(t, y, p):
        return p["a"] * y + p["b"] * jnp.tanh(y)

    P = {"a": jnp.array(-0.4), "b": jnp.array(0.3)}
    y0 = jnp.array([1.0, -0.7, 0.2])
    t = jnp.asarray([0.0, 0.5, 1.0])
    kw = dict(step_size=0.1, method="rk4")

    g_ref = _grad_with([], y0, t, P, f, **kw)
    g_cam = _grad_with(
        ["-ts_trajectory_max_cps_ram", "6",
         "-ts_trajectory_schedule", "cams"], y0, t, P, f, **kw
    )
    np.testing.assert_allclose(g_cam["a"], g_ref["a"], rtol=1e-12)
    np.testing.assert_allclose(g_cam["b"], g_ref["b"], rtol=1e-12)


@pytest.mark.slow
def test_cams_policy_gradients_match_store_all_ark_imex():
    """The flagship case: ARK IMEX stages are Newton solves, so CAMS stage
    checkpoints skip real work; gradients must still be bit-identical in
    structure to store_all (same math, same solves at the same points)."""
    def f_im(t, y, p):
        return p["k"] * y

    def f_ex(t, y, p):
        return p["c"] * jnp.sin(y)

    P = ({"k": jnp.array(-2.0)}, {"c": jnp.array(0.5)})
    y0 = jnp.array([1.0, -0.5])
    t = jnp.asarray([0.0, 0.3, 0.6])

    def grad_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(
            y0,
            Func(f_im, P[0]),
            step_size=0.1,
            method="imex",
            imex_form=True,
            implicit_form=True,
            func2=Func(f_ex, P[1]),
        )

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2) + jnp.sum(sol[1] ** 2)

        return jax.grad(loss)(P)

    g_ref = grad_with([])
    g_cam = grad_with(
        ["-ts_trajectory_max_cps_ram", "8",
         "-ts_trajectory_schedule", "cams"]
    )
    np.testing.assert_allclose(g_cam[0]["k"], g_ref[0]["k"], rtol=1e-9)
    np.testing.assert_allclose(g_cam[1]["c"], g_ref[1]["c"], rtol=1e-9)


def test_cams_policy_implicit_cn_tight_budget():
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
    g_cam = grad_with(
        ["-ts_trajectory_max_cps_ram", "2",
         "-ts_trajectory_schedule", "cams"]
    )
    np.testing.assert_allclose(g_cam["k"], g_ref["k"], rtol=1e-9)


def test_cams_solve_values_match_store_all():
    """Forward outputs (interior + final) must be identical too — the CAMS
    forward pass collects outputs on the fly like solve_noadj."""
    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-0.7)}
    y0 = jnp.array([2.0, 1.0, -1.0])
    t = jnp.asarray([0.0, 0.3, 0.8, 1.2])

    def sol_with(flags):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p"] + flags)
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.05, method="bosh3")
        return ode.odeint_adjoint(y0, t, params=P)

    s_ref = sol_with([])
    s_cam = sol_with(["-ts_trajectory_max_cps_ram", "4",
                      "-ts_trajectory_schedule", "cams"])
    np.testing.assert_allclose(np.asarray(s_cam), np.asarray(s_ref),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# scanned executor: compiled unit-action table (adjoint._cams_bwd_scan)
# ---------------------------------------------------------------------------


def _simulate_compiled(comp, n):
    """Independent replay of a compiled action table: every step must be
    reversed exactly once in order n-1..0, every read must hit a slot that
    holds the node the action expects."""
    n_sol, n_stage = comp["n_sol"], comp["n_stage"]
    sol = [None] * (n_sol + 1)
    stage = [None] * (n_stage + 1)
    sol[0] = 0  # y0 pre-seeded by the executor
    for k in range(n):
        if comp["fwd_sol"][k] < n_sol:
            sol[comp["fwd_sol"][k]] = k
        if comp["fwd_stage"][k] < n_stage:
            stage[comp["fwd_stage"][k]] = k
    cursor = 0
    next_rev = n - 1
    for op, slot, k in comp["actions"]:
        if op == cams.A_RESTORE_SOL:
            assert sol[slot] is not None, "restore of empty sol slot"
            cursor = sol[slot]
        elif op == cams.A_RESTORE_STAGE:
            assert stage[slot] is not None, "restore of empty stage slot"
            cursor = stage[slot]
        elif op == cams.A_ADVANCE:
            assert cursor == k, f"advance at node {k}, cursor {cursor}"
            cursor = k + 1
        elif op == cams.A_STORE:
            sol[slot] = cursor
        elif op == cams.A_REVERSE:
            assert cursor == k == next_rev, (cursor, k, next_rev)
            next_rev -= 1
        elif op == cams.A_CAPTURE:
            assert cursor == k
            stage[slot] = k
            cursor = k + 1
        elif op == cams.A_REVERSE_STAGE:
            assert stage[slot] == k == next_rev, (stage[slot], k, next_rev)
            next_rev -= 1
        else:
            raise AssertionError(f"unknown opcode {op}")
    assert next_rev == -1, f"reversal stopped at step {next_rev}"


def _type_peaks(fwd, rev, n):
    """Peak simultaneously-live checkpoint counts per type over the whole
    plan (sols include the always-live y0 node until dropped)."""
    sols, stages = {0}, set()
    ps, pg = 1, 0
    for op, k in list(fwd) + list(rev):
        if op == cams.STORE:
            sols.add(k)
        elif op == cams.CAPTURE:
            stages.add(k)
        elif op == cams.REVERSE_STAGE:
            stages.discard(k)
        elif op == cams.DROP:
            sols.discard(k)
        ps, pg = max(ps, len(sols)), max(pg, len(stages))
    return ps, pg


@pytest.mark.parametrize("n,m,w", [
    (1, 1, 2), (5, 2, 2), (7, 3, 2), (9, 4, 3), (16, 5, 2), (25, 6, 4),
    (40, 8, 2), (64, 7, 3),
])
def test_compile_plan_replays_consistently(n, m, w):
    fwd, rev = cams.cams_plan(n, m, w)
    comp = cams.compile_plan(fwd, rev, n)
    _simulate_compiled(comp, n)
    # allocator tightness: each buffer is exactly the peak number of
    # simultaneously-live checkpoints of its type (slot reuse works)
    ps, pg = _type_peaks(fwd, rev, n)
    assert comp["n_sol"] == ps
    assert comp["n_stage"] == pg


def test_cams_scan_executor_matches_unrolled_rk4():
    def f(t, y, p):
        return p["a"] * y + p["b"] * jnp.tanh(y)

    P = {"a": jnp.array(-0.4), "b": jnp.array(0.3)}
    y0 = jnp.array([1.0, -0.7, 0.2])
    t = jnp.asarray([0.0, 0.5, 1.0])
    kw = dict(step_size=0.05, method="rk4")
    base = ["-ts_trajectory_max_cps_ram", "5",
            "-ts_trajectory_schedule", "cams"]

    g_unr = _grad_with(base + ["-pnode_cams_executor", "unrolled"],
                       y0, t, P, f, **kw)
    g_scn = _grad_with(base + ["-pnode_cams_executor", "scan"],
                       y0, t, P, f, **kw)
    np.testing.assert_allclose(g_scn["a"], g_unr["a"], rtol=1e-12)
    np.testing.assert_allclose(g_scn["b"], g_unr["b"], rtol=1e-12)


def test_cams_scan_executor_matches_unrolled_imex():
    """Stage checkpoints (CAPTURE/REVERSE_STAGE) are exercised hardest by
    IMEX: the scanned machine must route aux stage sets through its second
    buffer identically to the dict-based walker."""
    def f_im(t, y, p):
        return p["k"] * y

    def f_ex(t, y, p):
        return p["c"] * jnp.sin(y)

    P = ({"k": jnp.array(-2.0)}, {"c": jnp.array(0.5)})
    y0 = jnp.array([1.0, -0.5])
    t = jnp.asarray([0.0, 0.3, 0.6])

    def grad_with(executor):
        pnode_tpu.clear_options()
        pnode_tpu.init([
            "p", "-ts_trajectory_max_cps_ram", "8",
            "-ts_trajectory_schedule", "cams",
            "-pnode_cams_executor", executor,
        ])
        ode = ODESolver()
        ode.setupTS(
            y0, Func(f_im, P[0]), step_size=0.05, method="imex",
            imex_form=True, implicit_form=True, func2=Func(f_ex, P[1]),
        )

        def loss(p):
            sol = ode.odeint_adjoint(y0, t, params=p)
            return jnp.sum(sol[-1] ** 2) + jnp.sum(sol[1] ** 2)

        return jax.grad(loss)(P)

    g_unr = grad_with("unrolled")
    g_scn = grad_with("scan")
    np.testing.assert_allclose(g_scn[0]["k"], g_unr[0]["k"], rtol=1e-10)
    np.testing.assert_allclose(g_scn[1]["c"], g_unr[1]["c"], rtol=1e-10)


def test_cams_scan_forward_outputs_match():
    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-0.7)}
    y0 = jnp.array([2.0, 1.0, -1.0])
    t = jnp.asarray([0.0, 0.3, 0.8, 1.2])

    def sol_with(executor):
        pnode_tpu.clear_options()
        pnode_tpu.init(["p", "-ts_trajectory_max_cps_ram", "4",
                        "-ts_trajectory_schedule", "cams",
                        "-pnode_cams_executor", executor])
        ode = ODESolver()
        ode.setupTS(y0, Func(f, P), step_size=0.05, method="bosh3")
        return ode.odeint_adjoint(y0, t, params=P)

    np.testing.assert_allclose(
        np.asarray(sol_with("scan")), np.asarray(sol_with("unrolled")),
        rtol=1e-12,
    )


@pytest.mark.slow
def test_cams_scan_compile_time_flat_large_n():
    """n=5000 (two-level plan beyond the exact-DP cap): the scanned machine
    must trace+lower in bounded time and match store_all gradients."""
    import time as _time

    def f(t, y, p):
        return p["a"] * y

    P = {"a": jnp.array(-0.2)}
    y0 = jnp.array([1.0, 0.5])
    n = 5000
    t = jnp.asarray([0.0, n * 1e-3])

    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-ts_trajectory_max_cps_ram", "24",
                    "-ts_trajectory_schedule", "cams",
                    "-pnode_cams_executor", "scan"])
    ode = ODESolver()
    ode.setupTS(y0, Func(f, P), step_size=1e-3, method="rk4")

    def loss(p):
        sol = ode.odeint_adjoint(y0, t, params=p)
        return jnp.sum(sol[-1] ** 2)

    t0 = _time.time()
    g = jax.jit(jax.grad(loss)).lower(P).compile()
    elapsed = _time.time() - t0
    assert elapsed < 120, f"compile took {elapsed:.0f}s"

    pnode_tpu.clear_options()
    ode2 = ODESolver()
    ode2.setupTS(y0, Func(f, P), step_size=1e-3, method="rk4")

    def loss2(p):
        sol = ode2.odeint_adjoint(y0, t, params=p)
        return jnp.sum(sol[-1] ** 2)

    g_ref = jax.grad(loss2)(P)
    np.testing.assert_allclose(g(P)["a"], g_ref["a"], rtol=1e-9)
