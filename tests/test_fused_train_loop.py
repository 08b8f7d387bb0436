"""Fused training-loop kernel vs the generic ODESolver + optax.adam loop.

K complete training iterations inside one pallas_call (grid=(K,), weights
and Adam moments VMEM-resident — ops/fused_train_loop.py) must reproduce
the reference loop (generic stage-exact adjoint + optax.adam) step for
step: per-iteration losses and the final parameter/moment state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import pnode_tpu
from pnode_tpu import FlaxFunc, ODESolver
from pnode_tpu.models import KSFuncEX, KSFuncIM
from pnode_tpu.ops.fused_train_loop import fused_train_loop

LR = 5e-3


def _build(batch, nx, dt=0.2):
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-snes_type", "ksponly", "-ts_arkimex_type", "3",
                    "-pnode_fused_ark_adjoint", "off",
                    "-pnode_fused_ark_precision", "highest"])
    dtype = jnp.float32
    im = KSFuncIM(nx=nx)
    ex = KSFuncEX(nx=nx, hidden=24, use_pallas=True)
    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), dtype)
    vim = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                 im.init(key, 0.0, y_tmpl))
    vex = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                 ex.init(key, 0.0, y_tmpl))
    ode = ODESolver()
    ode.setupTS(
        y_tmpl, FlaxFunc(im, vim), step_size=dt, method="imex",
        imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
        linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
    )
    return ode, (vim, vex), dt


def _reference_loop(ode, params, y_stack, tgt_stack, K):
    opt = optax.adam(LR)
    state = opt.init(params)
    t_out = np.array([0.0, 0.2])
    losses = []
    for k in range(K):
        def loss_fn(p):
            pred, _ = ode.solve(y_stack[k], t_out, params=p)
            return jnp.mean((pred[-1] - tgt_stack[k]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
        losses.append(float(loss))
    return params, state, losses


def test_fused_train_loop_matches_reference():
    batch, nx, K = 8, 16, 4
    ode, params, dt = _build(batch, nx)
    vim, vex = params
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32)
    tgt_stack = y_stack + 0.05 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)

    ref_params, ref_state, ref_losses = _reference_loop(
        ode, params, y_stack, tgt_stack, K)

    # kernel operands from the prepared stepper (same source as the
    # per-step fused kernels)
    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    stp = ode._stepper.prepare(0.0, y_tmpl, params, dt0=jnp.float32(dt))
    fused = stp._fused_reverse_args(params, dt=jnp.float32(dt))
    assert fused is None  # adjoint mode "off" — extract spec directly
    spec = stp.fused_ex_spec(vex)
    assert spec is not None
    J = stp.setup.frozen_J_blocks[0]
    gamma = 0.435866521508459
    inv = stp.setup.solver_cache[gamma]._inv[0]
    tbl = (stp._aI, stp._aE, stp._bI, stp._bE)

    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]
    Ws_o, bs_o, (mW, mb), (vW, vb), losses = fused_train_loop(
        tbl, dt, y_stack, tgt_stack, J, inv, Ws, bs,
        (zW, zb), (zW, zb), 0,
        activation=spec["activation"], sign=spec["sign"], lr=LR,
        interpret=True, stiff_prec="highest",
    )

    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=2e-5, atol=1e-8)

    # final explicit-part parameters must match the reference's updated
    # tree; rebuild maps kernel (W, b) lists into the flax tree layout
    got_tree = spec["rebuild"](Ws_o, bs_o)
    want_tree = ref_params[1]
    for a, b in zip(jax.tree_util.tree_leaves(got_tree),
                    jax.tree_util.tree_leaves(want_tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-6)

    # Adam moments too (second-moment v is tiny — compare loosely)
    mu_ref = ref_state[0].mu[1]
    nu_ref = ref_state[0].nu[1]
    got_mu = spec["rebuild"](mW, mb)
    got_nu = spec["rebuild"](vW, vb)
    for got, want in ((got_mu, mu_ref), (got_nu, nu_ref)):
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-9)


def test_fused_train_loop_distinct_minibatches():
    """Each grid step must consume ITS OWN (y, target) block — a stacked
    epoch of distinct minibatches equals running them one at a time."""
    batch, nx, K = 8, 16, 3
    ode, params, dt = _build(batch, nx)
    vim, vex = params
    y_stack = jax.random.normal(jax.random.PRNGKey(7), (K, batch, nx),
                                jnp.float32) * jnp.arange(
        1, K + 1, dtype=jnp.float32).reshape(K, 1, 1)
    tgt_stack = 0.9 * y_stack

    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    stp = ode._stepper.prepare(0.0, y_tmpl, params, dt0=jnp.float32(dt))
    spec = stp.fused_ex_spec(vex)
    J = stp.setup.frozen_J_blocks[0]
    inv = stp.setup.solver_cache[0.435866521508459]._inv[0]
    tbl = (stp._aI, stp._aE, stp._bI, stp._bE)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]

    # all K at once
    *_, losses_all = fused_train_loop(
        tbl, dt, y_stack, tgt_stack, J, inv, Ws, bs, (zW, zb), (zW, zb), 0,
        activation=spec["activation"], sign=spec["sign"], lr=LR,
        interpret=True, stiff_prec="highest",
    )
    # one at a time, threading state
    cw, cb, cm, cv, t0 = Ws, bs, (zW, zb), (zW, zb), 0
    seq = []
    for k in range(K):
        cw, cb, cm, cv, ls = fused_train_loop(
            tbl, dt, y_stack[k:k + 1], tgt_stack[k:k + 1], J, inv, cw, cb,
            cm, cv, t0, activation=spec["activation"], sign=spec["sign"],
            lr=LR, interpret=True, stiff_prec="highest",
        )
        t0 += 1
        seq.append(float(ls[0]))
    np.testing.assert_allclose(np.asarray(losses_all), np.asarray(seq),
                               rtol=1e-6, atol=1e-9)


def test_fused_train_loop_vmem_gate():
    """Gate scales with -pnode_vmem_mb (default 100 MB raised limit,
    measured round 4 — tools/probe_vmem_limit.py); Burgers-512 shapes
    now fit at chunk<=16, absurd shapes never do, and shrinking the
    budget back to Mosaic's 16 MB default re-gates Burgers out."""
    import pnode_tpu
    from pnode_tpu.ops.fused_train_loop import fused_train_loop_fits

    pnode_tpu.clear_options()
    assert fused_train_loop_fits(256, 64, [64, 64])
    assert fused_train_loop_fits(200, 512, [576] * 4 + [512], chunk=16)
    assert not fused_train_loop_fits(4096, 2048, [4096, 4096])
    pnode_tpu.init(["p", "-pnode_vmem_mb", "16"])
    try:
        assert not fused_train_loop_fits(200, 512, [576] * 4 + [512],
                                         chunk=16)
    finally:
        pnode_tpu.clear_options()


def test_fused_train_loop_chunked_grid_persistence():
    """K=32 with chunk=16 runs TWO grid steps: the carried parameter and
    moment state written back at the end of grid step 0 must seed grid
    step 1 exactly (the stacked resident layout carries state in
    registers within a chunk and in the constant-index output blocks
    across chunks). Equality against the chunk=1 path covers both."""
    batch, nx, K = 8, 16, 32
    ode, params, dt = _build(batch, nx)
    vim, vex = params
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32)
    tgt_stack = y_stack + 0.1 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)

    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    stp = ode._stepper.prepare(0.0, y_tmpl, params, dt0=jnp.float32(dt))
    spec = stp.fused_ex_spec(vex)
    J = stp.setup.frozen_J_blocks[0]
    inv = stp.setup.solver_cache[0.435866521508459]._inv[0]
    tbl = (stp._aI, stp._aE, stp._bI, stp._bE)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]

    out = {}
    for chunk in (16, 1):
        Ws_o, bs_o, (mW, mb), (vW, vb), losses = fused_train_loop(
            tbl, dt, y_stack, tgt_stack, J, inv, Ws, bs, (zW, zb),
            (zW, zb), 0, activation=spec["activation"], sign=spec["sign"],
            lr=LR, interpret=True, stiff_prec="highest", chunk=chunk,
        )
        out[chunk] = (Ws_o, bs_o, mW, mb, vW, vb, losses)
    # losses are the sharp persistence detector: if grid step 1 lost the
    # carried state, iterations 16..31 would diverge by orders of
    # magnitude. They agree to f32 rounding between the two chunkings.
    np.testing.assert_allclose(np.asarray(out[16][6]),
                               np.asarray(out[1][6]),
                               rtol=1e-5, atol=1e-10)
    # parameters/moments: the two chunkings are different XLA programs
    # (different fusion/FMA choices), and Adam's 1/sqrt(v) amplifies the
    # ULP-level gradient noise into ~1e-3 RELATIVE differences on
    # noise-scale elements over 32 steps — so compare at each tensor's
    # own scale (an indexing or persistence bug is O(scale) wrong)
    for a, b in zip(jax.tree_util.tree_leaves(out[16][:6]),
                    jax.tree_util.tree_leaves(out[1][:6])):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(b))), 1e-12)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3 * scale)


def test_fused_train_loop_nonuniform_layer_widths():
    """Layer widths that pad to DIFFERENT tile multiples (here 128 and
    256) exercise the stacked layout's maxP column padding: the dW/db
    blocks are padded to the stack width before the Adam update and the
    per-layer views slice back out. Asserts against a pure-JAX replica
    of the same math (forward ARK step -> MSE -> adjoint -> adam)."""
    import optax

    batch, nx, K = 4, 16, 3
    ode, params, dt = _build(batch, nx)
    vim, _ = params
    # hand-built non-uniform MLP: 16 -> 136 -> 24 -> 16 (136 pads to 256)
    # NONZERO biases + batch 4 (pads to 8 sublanes) are load-bearing:
    # they regression-test the phantom-row mask — unmasked padded rows
    # enter the MLP as x=0 but MLP(0) != 0 with biases, which corrupted
    # the loss and the db gradients by ~50% before the mask (round-3
    # review finding)
    dims = [nx, 136, 24, nx]
    keys = jax.random.split(jax.random.PRNGKey(5), 2 * (len(dims) - 1))
    Ws = [jax.random.normal(k, (a, b), jnp.float32) * 0.05
          for k, a, b in zip(keys[::2], dims[:-1], dims[1:])]
    bs = [jax.random.normal(k, (b,), jnp.float32) * 0.1
          for k, b in zip(keys[1::2], dims[1:])]

    stp = ode._stepper.prepare(0.0, jnp.zeros((batch, nx), jnp.float32),
                               params, dt0=jnp.float32(dt))
    J = stp.setup.frozen_J_blocks[0]
    inv = stp.setup.solver_cache[0.435866521508459]._inv[0]
    aI, aE, bI, bE = stp._aI, stp._aE, stp._bI, stp._bE
    s = len(bI)

    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32)
    tgt_stack = y_stack + 0.1 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)

    def mlp(p, x):
        h = x
        for i, (W, b) in enumerate(zip(*p)):
            h = h @ W + b
            if i < len(p[0]) - 1:
                h = jnp.maximum(h, 0.0)
        return h

    def ark_step(p, y):
        kI = [None] * s
        kE = [None] * s
        y1 = y
        for i in range(s):
            G = y
            for j in range(i):
                if aI[i][j]:
                    G = G + (dt * aI[i][j]) * kI[j]
                if aE[i][j]:
                    G = G + (dt * aE[i][j]) * kE[j]
            if aI[i][i]:
                Yi = G @ inv.T  # row-vector convention, as the kernel
                kI[i] = (Yi - G) / (dt * aI[i][i])
            else:
                Yi = G
                kI[i] = Yi @ J.T
            kE[i] = -mlp(p, Yi)
            if bI[i]:
                y1 = y1 + (dt * bI[i]) * kI[i]
            if bE[i]:
                y1 = y1 + (dt * bE[i]) * kE[i]
        return y1

    opt = optax.adam(LR)
    p_ref = (Ws, bs)
    st = opt.init(p_ref)
    ref_losses = []
    with jax.default_matmul_precision("highest"):
        for k in range(K):
            def loss_fn(p):
                return jnp.mean((ark_step(p, y_stack[k])
                                 - tgt_stack[k]) ** 2)

            lv, g = jax.value_and_grad(loss_fn)(p_ref)
            up, st = opt.update(g, st)
            p_ref = optax.apply_updates(p_ref, up)
            ref_losses.append(float(lv))

    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]
    Ws_o, bs_o, (mW, mb), _, losses = fused_train_loop(
        (aI, aE, bI, bE), dt, y_stack, tgt_stack, J, inv, Ws, bs,
        (zW, zb), (zW, zb), 0, activation="relu", sign=-1.0, lr=LR,
        interpret=True, stiff_prec="highest",
    )
    # loss trajectory: rounding noise is Adam-amplified (zero-init
    # moments make step 1 ~ -lr*sign(g), so noise-level gradient
    # elements take sign-flipped updates) — 1e-3 relative is the honest
    # bound; a maxP-padding or slicing bug produces O(1) garbage here
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-3, atol=1e-8)

    # exact check, immune to the Adam sign noise: the kernel's raw
    # first-step gradient. Run ONE iteration from fresh moments — then
    # m = (1 - b1) * g — and compare against autodiff of the replica.
    _, _, (mW1, mb1), _, _ = fused_train_loop(
        (aI, aE, bI, bE), dt, y_stack[:1], tgt_stack[:1], J, inv, Ws, bs,
        (zW, zb), (zW, zb), 0, activation="relu", sign=-1.0, lr=LR,
        interpret=True, stiff_prec="highest",
    )
    with jax.default_matmul_precision("highest"):
        def loss0(p):
            return jnp.mean((ark_step(p, y_stack[0]) - tgt_stack[0]) ** 2)

        g0 = jax.grad(loss0)((Ws, bs))
    for got_m, want_g in zip(mW1 + mb1, list(g0[0]) + list(g0[1])):
        scale = max(float(jnp.max(jnp.abs(want_g))), 1e-12)
        np.testing.assert_allclose(np.asarray(got_m) / 0.1,
                                   np.asarray(want_g),
                                   rtol=1e-4, atol=1e-5 * scale)
