"""Fused ADAPTIVE training-loop kernel vs the generic adaptive engine.

K complete adaptive training iterations inside one pallas_call (embedded
trial loop + gated reverse + Adam, ops/fused_adaptive_loop.py) must
reproduce the reference loop — adaptive.make_adaptive_odeint through the
public ODESolver + optax.adam, with the bench.py dt_first warm-start
threading — iteration for iteration: controller decisions (accepted /
rejected counts), per-iteration losses, dt warm-start sequence, and the
final parameter state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pnode_tpu
from pnode_tpu import FlaxFunc, ODESolver
from pnode_tpu.models import KSFuncEX, KSFuncIM
from pnode_tpu.ops.fused_adaptive_loop import (
    fused_adaptive_loop_fits,
    fused_adaptive_train_loop,
)

LR = 5e-3
RTOL = ATOL = 1e-4
MAX_TRIALS = 16
GAMMA = 0.435866521508459  # ARK3 ESDIRK diagonal


def _build(batch, nx, dt=0.2):
    pnode_tpu.clear_options()
    pnode_tpu.init([
        "p", "-snes_type", "ksponly", "-ts_arkimex_type", "3",
        "-ts_adapt_type", "basic", "-ts_rtol", str(RTOL),
        "-ts_atol", str(ATOL), "-ts_adapt_max_steps", str(MAX_TRIALS),
        "-pnode_fused_ark_adjoint", "off",
        "-pnode_fused_ark_precision", "highest",
    ])
    dtype = jnp.float32
    im = KSFuncIM(nx=nx)
    ex = KSFuncEX(nx=nx, hidden=24, use_pallas=True)
    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), dtype)
    vim = im.init(key, 0.0, y_tmpl)
    vex = ex.init(key, 0.0, y_tmpl)
    ode = ODESolver()
    ode.setupTS(
        y_tmpl, FlaxFunc(im, vim), step_size=dt, method="imex",
        imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
        linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
    )
    return ode, (vim, vex), dt


def _reference_loop(ode, params, y_stack, tgt_stack, K, dt0):
    """The bench.py --workload adaptive protocol: per-iteration solve with
    dt0 warm-started from the previous solve's first-accepted dt."""
    opt = optax.adam(LR)
    state = opt.init(params)
    t_out = np.array([0.0, 0.2])
    losses, accs, rejs, dt_firsts = [], [], [], []
    dtc = jnp.float32(dt0)
    for k in range(K):
        def loss_fn(p, dtc=dtc, k=k):
            pred, stats = ode.solve(y_stack[k], t_out, params=p, dt0=dtc)
            return jnp.mean((pred[-1] - tgt_stack[k]) ** 2), stats

        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        losses.append(float(loss))
        accs.append(int(stats.accepted))
        rejs.append(int(stats.rejected))
        dt_firsts.append(float(stats.dt_first))
        dtc = stats.dt_first
    return params, losses, accs, rejs, dt_firsts


def _kernel_operands(ode, params, batch, nx):
    vim, vex = params
    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    stp = ode._stepper.prepare(0.0, y_tmpl, params, dt0=None)
    spec = stp.fused_ex_spec(vex)
    assert spec is not None
    J = stp.setup.frozen_J_blocks[0]
    basis = stp._spectral_stage_basis(J)
    assert basis is not None, "KS implicit operator must be symmetric"
    lam, Q = basis
    tbl = (stp._aI, stp._aE, stp._bI, stp._bE, stp._bIe, stp._bEe)
    return spec, J, lam, Q, tbl


def test_fused_adaptive_loop_matches_engine():
    batch, nx, K = 8, 16, 6
    ode, params, dt = _build(batch, nx)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32) * 0.3
    tgt_stack = y_stack + 0.05 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)
    # dt0 choice: at 0.05-0.06 the controller growth factor sits exactly at
    # the MATCHSTEP landing boundary (fac ~ 3 vs the 0.15 truncation), where
    # LU-vs-spectral rounding legitimately flips a 2-accept window into a
    # 3-accept one (both within tolerance; losses still agree to ~1e-6).
    # 0.08 is measurably off the boundary: decisions, dt_first, losses AND
    # Adam-updated params all match (probe: param maxdiff 3e-4 vs 2e-2 at
    # the boundary, where Adam's sqrt(v) normalization amplifies rounding
    # in near-zero gradient coordinates).
    dt0 = 0.08

    ref_params, ref_losses, ref_acc, ref_rej, ref_dtf = _reference_loop(
        ode, params, y_stack, tgt_stack, K, dt0)

    spec, J, lam, Q, tbl = _kernel_operands(ode, params, batch, nx)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]
    Ws_o, bs_o, _, _, losses, stats = fused_adaptive_train_loop(
        tbl, GAMMA, lam, Q, J, 0.2, dt0, y_stack, tgt_stack,
        Ws, bs, (zW, zb), (zW, zb), 0, MAX_TRIALS,
        rtol=RTOL, atol=ATOL, order=3,
        activation=spec["activation"], sign=spec["sign"], lr=LR,
        interpret=True, stiff_prec="highest",
    )

    assert np.all(np.asarray(stats["completed"]) == 1.0)
    np.testing.assert_array_equal(
        np.asarray(stats["accepted"], np.int64), np.asarray(ref_acc))
    np.testing.assert_array_equal(
        np.asarray(stats["rejected"], np.int64), np.asarray(ref_rej))
    np.testing.assert_allclose(np.asarray(stats["dt_first"]),
                               np.asarray(ref_dtf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=2e-3, atol=1e-8)

    got_tree = spec["rebuild"](Ws_o, bs_o)
    want_tree = ref_params[1]
    for a, b in zip(jax.tree_util.tree_leaves(got_tree),
                    jax.tree_util.tree_leaves(want_tree)):
        scale = max(float(np.max(np.abs(np.asarray(b)))), 1e-12)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3 * scale)


def test_fused_adaptive_loop_decision_parity_clipped_regime():
    """Exact controller-decision parity, asserted in a regime where every
    decision is far from a boundary: loose tolerances put enorm orders of
    magnitude below 1, so the growth factor CLIPS at dt_max_factor
    deterministically for both paths and the trial sequence is decided by
    the clip + MATCHSTEP truncation alone."""
    batch, nx, K = 8, 16, 4
    ode, params, dt = _build(batch, nx)
    # loosen the tolerances well past the boundary (flag re-init)
    import pnode_tpu as _p
    _p.set_option("ts_rtol", "1e-1")
    _p.set_option("ts_atol", "1e-1")
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32) * 0.1
    tgt_stack = y_stack + 0.02 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)
    dt0 = 0.01

    ref_params, ref_losses, ref_acc, ref_rej, ref_dtf = _reference_loop(
        ode, params, y_stack, tgt_stack, K, dt0)

    spec, J, lam, Q, tbl = _kernel_operands(ode, params, batch, nx)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]
    Ws_o, bs_o, _, _, losses, stats = fused_adaptive_train_loop(
        tbl, GAMMA, lam, Q, J, 0.2, dt0, y_stack, tgt_stack,
        Ws, bs, (zW, zb), (zW, zb), 0, MAX_TRIALS,
        rtol=1e-1, atol=1e-1, order=3,
        activation=spec["activation"], sign=spec["sign"], lr=LR,
        interpret=True, stiff_prec="highest",
    )
    np.testing.assert_array_equal(
        np.asarray(stats["accepted"], np.int64), np.asarray(ref_acc))
    np.testing.assert_array_equal(
        np.asarray(stats["rejected"], np.int64), np.asarray(ref_rej))
    assert np.all(np.asarray(stats["completed"]) == 1.0)
    np.testing.assert_allclose(np.asarray(stats["dt_first"]),
                               np.asarray(ref_dtf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=5e-5, atol=1e-8)
    got_tree = spec["rebuild"](Ws_o, bs_o)
    for a, b in zip(jax.tree_util.tree_leaves(got_tree),
                    jax.tree_util.tree_leaves(ref_params[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_fused_adaptive_loop_rejections_are_gated():
    """A deliberately large dt0 forces rejections on the way down; the
    kernel must count them like the engine and keep GRADIENTS equal
    (rejected slots reverse as identities).

    The gradient check is direct, not params-after-Adam: after K=1 Adam
    iteration from a zero moment state, m = (1-beta1)*g, so the kernel's
    returned first moment recovers its raw gradient exactly — immune to
    the sqrt(v) sign-noise that Adam injects into near-zero gradient
    coordinates over multiple steps."""
    batch, nx, K = 4, 16, 3
    ode, params, dt = _build(batch, nx)
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    # scale 3 drives the KS nonlinearity hard enough that the first trial
    # at dt0=0.2 exceeds tolerance and rejects (measured: rej=[1,1,0])
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32) * 3.0
    tgt_stack = 0.9 * y_stack
    dt0 = 0.2  # full window: the first trials reject at these tolerances

    ref_params, ref_losses, ref_acc, ref_rej, _ = _reference_loop(
        ode, params, y_stack, tgt_stack, K, dt0)
    assert sum(ref_rej) > 0, "test must exercise the rejection path"

    spec, J, lam, Q, tbl = _kernel_operands(ode, params, batch, nx)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]
    _, _, _, _, losses, stats = fused_adaptive_train_loop(
        tbl, GAMMA, lam, Q, J, 0.2, dt0, y_stack, tgt_stack,
        Ws, bs, (zW, zb), (zW, zb), 0, MAX_TRIALS,
        rtol=RTOL, atol=ATOL, order=3,
        activation=spec["activation"], sign=spec["sign"], lr=LR,
        interpret=True, stiff_prec="highest",
    )
    np.testing.assert_array_equal(
        np.asarray(stats["accepted"], np.int64), np.asarray(ref_acc))
    np.testing.assert_array_equal(
        np.asarray(stats["rejected"], np.int64), np.asarray(ref_rej))
    # scale-3 states carry more fp32 rounding than the small-state tests
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=5e-4, atol=1e-8)

    # Direct gradient parity through the rejected trial (iteration 0 only):
    # engine gradient via value_and_grad vs the kernel's m/(1-beta1).
    def loss0(p):
        pred, _ = ode.solve(y_stack[0], np.array([0.0, 0.2]), params=p,
                            dt0=jnp.float32(dt0))
        return jnp.mean((pred[-1] - tgt_stack[0]) ** 2)

    g_ref = jax.grad(loss0)(params)[1]
    _, _, (mW, mb), _, _, _ = fused_adaptive_train_loop(
        tbl, GAMMA, lam, Q, J, 0.2, dt0, y_stack[:1], tgt_stack[:1],
        Ws, bs, (zW, zb), (zW, zb), 0, MAX_TRIALS,
        rtol=RTOL, atol=ATOL, order=3,
        activation=spec["activation"], sign=spec["sign"], lr=LR,
        interpret=True, stiff_prec="highest",
    )
    g_tree = spec["rebuild"]([w / 0.1 for w in mW], [b / 0.1 for b in mb])
    # Comparison is GLOBAL, not per-element: the MLP is ReLU, and at these
    # scale-3 states isolated preactivations sit near zero, where
    # LU-vs-spectral rounding flips a relu mask and moves that one unit's
    # gradient discretely (measured: 1/24 coords off by 2.9e-5 while the
    # other 23 agree to ~1e-6). A rejected-slot bug corrupts the WHOLE
    # gradient at full scale, which both bounds below catch.
    got = np.concatenate([np.asarray(l).ravel()
                          for l in jax.tree_util.tree_leaves(g_tree)])
    want = np.concatenate([np.asarray(l).ravel()
                           for l in jax.tree_util.tree_leaves(g_ref)])
    rel_l2 = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel_l2 < 5e-3, f"gradient rel L2 err {rel_l2:.2e}"
    gscale = float(np.max(np.abs(want)))
    assert float(np.max(np.abs(got - want))) < 5e-3 * gscale


def test_fused_adaptive_loop_interior_growth_regime():
    """Decision parity where the controller exponent MATTERS.

    The clipped-regime and MATCHSTEP-landing tests are insensitive to the
    controller exponent 1/(order+1) (growth clips at dt_max_factor or is
    truncated by the landing); this cost a real on-chip divergence — the
    kernel silently defaulting to order=5 against ARK3's order=3 did 27
    accepted steps per KS window where the engine did 23, every window
    (tolerance-valid, 17% more device work). Tight tolerances + small dt0
    put ~15 consecutive growth factors in the interior (1, facmax) where
    the exponent shapes every decision. The sensitivity guard at the end
    proves the regime works: order=5 must yield MORE accepted steps."""
    batch, nx, K = 8, 16, 3
    pnode_tpu.clear_options()
    pnode_tpu.init([
        "p", "-snes_type", "ksponly", "-ts_arkimex_type", "3",
        "-ts_adapt_type", "basic", "-ts_rtol", "1e-7",
        "-ts_atol", "1e-7", "-ts_adapt_max_steps", "24",
        "-pnode_fused_ark_adjoint", "off",
        "-pnode_fused_ark_precision", "highest",
    ])
    im = KSFuncIM(nx=nx)
    ex = KSFuncEX(nx=nx, hidden=24, use_pallas=True)
    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    vim = im.init(key, 0.0, y_tmpl)
    vex = ex.init(key, 0.0, y_tmpl)
    ode = ODESolver()
    ode.setupTS(
        y_tmpl, FlaxFunc(im, vim), step_size=0.2, method="imex",
        imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
        linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
    )
    params = (vim, vex)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32)
    tgt_stack = y_stack + 0.05 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)
    dt0 = 0.0005

    ref_params, ref_losses, ref_acc, ref_rej, ref_dtf = _reference_loop(
        ode, params, y_stack, tgt_stack, K, dt0)
    assert max(ref_acc) >= 10, "regime must have a long growth phase"

    spec, J, lam, Q, tbl = _kernel_operands(ode, params, batch, nx)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]

    def run(order):
        return fused_adaptive_train_loop(
            tbl, GAMMA, lam, Q, J, 0.2, dt0, y_stack, tgt_stack,
            Ws, bs, (zW, zb), (zW, zb), 0, 24,
            rtol=1e-7, atol=1e-7, order=order,
            activation=spec["activation"], sign=spec["sign"], lr=LR,
            interpret=True, stiff_prec="highest",
        )

    _, _, _, _, losses, stats = run(3)
    assert np.all(np.asarray(stats["completed"]) == 1.0)
    np.testing.assert_array_equal(
        np.asarray(stats["accepted"], np.int64), np.asarray(ref_acc))
    np.testing.assert_array_equal(
        np.asarray(stats["rejected"], np.int64), np.asarray(ref_rej))
    np.testing.assert_allclose(np.asarray(stats["dt_first"]),
                               np.asarray(ref_dtf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=2e-3, atol=1e-8)

    # sensitivity guard: a wrong exponent must be VISIBLE here
    _, _, _, _, _, stats5 = run(5)
    assert (np.asarray(stats5["accepted"]).sum()
            > np.asarray(stats["accepted"]).sum()), (
        "interior regime lost its exponent sensitivity")


def test_fused_adaptive_loop_requires_order():
    import pytest
    with pytest.raises(TypeError, match="order is required"):
        fused_adaptive_train_loop(
            ((0.0,),) * 6, 0.4, jnp.zeros(4), jnp.eye(4), jnp.eye(4),
            0.2, 0.01, jnp.zeros((1, 2, 4)), jnp.zeros((1, 2, 4)),
            [jnp.zeros((4, 4))], [jnp.zeros(4)],
            ([jnp.zeros((4, 4))], [jnp.zeros(4)]),
            ([jnp.zeros((4, 4))], [jnp.zeros(4)]), 0, 4)


def test_fused_adaptive_loop_vmem_gate():
    assert fused_adaptive_loop_fits(256, 64, [64, 64], 32)
    assert not fused_adaptive_loop_fits(4096, 2048, [4096, 4096], 64)
