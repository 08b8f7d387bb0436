"""Decompose the SINODE scan-path training step into component costs.

The Burgers-512 headline config (reference run_a100_512.sh: nx=512,
batch=200, ARK-IMEX, ksponly, frozen J) measures ~134 us per training
step on the chip while the analytic roofline says ~40 us — this probe
locates the gap by timing, under the exact bench protocol (inner-scan
dispatches, device sync via scalar fetch):

  fwd        forward solve + loss only (no grad)
  grad       jax.value_and_grad of the loss (no optimizer)
  train      full step: value_and_grad + flat Adam (== bench.py)
  mlp_chain  microprobe: the explicit MLP evaluated fwd-count times
  stiff_hst  microprobe: one HIGHEST (B,d)@(d,d) dot chain, stiff count
  stiff_b3   same chain with the hand-split bf16x3 "high" emulation

Usage: python tools/profile_sinode.py [--workload burgers|ks]
       [--inner 400] [--windows 3] [--dispatches 10]

Timings print per-step microseconds; stderr carries the raw windows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x).astype(jnp.float32))


def _time(step, n_disp, windows, inner):
    rates = []
    for _ in range(windows):
        t0 = time.time()
        out = None
        for _ in range(n_disp):
            out = step()
        _sync(out)
        rates.append(n_disp / (time.time() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    return 1e6 / (med * inner)  # us per inner step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["ks", "burgers"],
                    default="burgers")
    ap.add_argument("--inner", type=int, default=400)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dispatches", type=int, default=10)
    ap.add_argument("--probes", type=str, default="all",
                    help="comma list: solve,opt,micro (default all)")
    args, unknown = ap.parse_known_args()
    probes = set(("solve,opt,micro" if args.probes == "all"
                  else args.probes).split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    import pnode_tpu
    from pnode_tpu import FlaxFunc, ODESolver
    from pnode_tpu.models import (
        BurgersFuncEX, BurgersFuncIM, KSFuncEX, KSFuncIM,
    )

    pnode_tpu.init([sys.argv[0]] + unknown)
    pnode_tpu.set_option("snes_type", "ksponly")
    pnode_tpu.set_option("ksp_rtol", "1e-6")

    if args.workload == "burgers":
        nx, batch, dt = 512, 200, 0.02
        im, ex = BurgersFuncIM(nx=nx), BurgersFuncEX(nx=nx, use_pallas=True)
        dims = [nx * 9 // 8] * 4 + [nx]
    else:
        nx, batch, dt = 64, 256, 0.2
        im, ex = KSFuncIM(nx=nx), KSFuncEX(nx=nx, use_pallas=True)
        dims = [104] * 4 + [nx]

    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    vim = im.init(key, 0.0, y_tmpl)
    vex = ex.init(key, 0.0, y_tmpl)
    ode = ODESolver()
    ode.setupTS(
        y_tmpl, FlaxFunc(im, vim), step_size=dt, method="imex",
        imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
        linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
    )
    t_out = np.array([0.0, dt])
    params = (vim, vex)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y0 = jax.random.normal(k1, (batch, nx), jnp.float32)
    target = y0 + 0.05 * jax.random.normal(k2, (batch, nx), jnp.float32)
    inner = args.inner

    # warm the fetch channel before any timing
    _ = float(jnp.zeros((), jnp.float32) + 1.0)
    t0 = time.time()
    _ = float(jnp.zeros((), jnp.float32) + 2.0)
    print(f"steady-state fetch: {time.time() - t0:.3f}s", file=sys.stderr)

    def loss_fn(p, y0, target):
        pred, _ = ode.solve(y0, t_out, params=p)
        d = (pred[-1] - target).astype(jnp.float32)
        return jnp.mean(d * d)

    results = {}

    # ---- fwd ----
    # the carry must PERTURB THE SOLVE'S INPUT or XLA hoists the whole
    # loop-invariant ODE solve out of the scan and the probe measures one
    # subtract+mean (the first cut of this probe did exactly that and
    # read 6.8 us for a ~40 us forward)
    def fwd_steps(p, y0, target):
        def body(carry, _):
            # 1e-30*carry is numerically invisible next to O(1) states but
            # defeats constant-folding (0.0*carry would invite x*0 -> 0)
            loss = loss_fn(p, y0 + 1e-30 * carry, target)
            return loss, loss
        _, losses = lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=inner)
        return losses[-1]

    if "solve" in probes:
        cf = jax.jit(fwd_steps).lower(params, y0, target).compile()

        def stepf():
            return cf(params, y0, target)

        _sync(stepf())
        results["fwd"] = _time(stepf, args.dispatches, args.windows, inner)

    # ---- grad ----
    def grad_steps(p, y0, target):
        def body(carry, _):
            loss, g = jax.value_and_grad(loss_fn)(carry, y0, target)
            # consume g so XLA cannot DCE the backward; keep p flowing
            return jax.tree_util.tree_map(
                lambda a, b: a - 0.0 * b, carry, g), loss
        p, losses = lax.scan(body, p, None, length=inner)
        return losses[-1]

    if "solve" in probes:
        cg = jax.jit(grad_steps).lower(params, y0, target).compile()

        def stepg():
            return cg(params, y0, target)

        _sync(stepg())
        results["grad"] = _time(stepg, args.dispatches, args.windows, inner)

    # ---- train (bench.py protocol; also a tree-mode-Adam variant) ----
    def train_probe(opt, label):
        opt_state = opt.init(params)

        def train_steps(p, s, y0, target):
            def body(carry, _):
                p, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, y0, target)
                updates, s = opt.update(grads, s)
                return (optax.apply_updates(p, updates), s), loss
            (p, s), losses = lax.scan(body, (p, s), None, length=inner)
            return p, s, losses[-1]

        ct = jax.jit(train_steps).lower(
            params, opt_state, y0, target).compile()
        st = {"p": params, "s": opt_state}

        def stept():
            st["p"], st["s"], loss = ct(st["p"], st["s"], y0, target)
            return loss

        _sync(stept())
        results[label] = _time(stept, args.dispatches, args.windows, inner)

    from pnode_tpu.utils import flat_adam

    if "solve" in probes:
        train_probe(optax.flatten(optax.adam(5e-3)), "train")
        train_probe(flat_adam(5e-3), "train_tree_adam")

    # ---- optimizer-isolation probes (fixed gradient, no solve) ----
    g_fix = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, 1e-4), params)

    def opt_probe(opt):
        s0 = opt.init(params)

        def steps(p, s):
            def body(carry, _):
                p, s = carry
                u, s = opt.update(g_fix, s, p)
                return (optax.apply_updates(p, u), s), ()
            (p, s), _ = lax.scan(body, (p, s), None, length=inner)
            return p, s

        c = jax.jit(steps).lower(params, s0).compile()
        st = {"v": (params, s0)}

        def stepo():
            st["v"] = c(*st["v"])
            return st["v"][0]

        out = stepo()
        _sync(jax.tree_util.tree_leaves(out)[0])
        rates = []
        for _ in range(args.windows):
            t0 = time.time()
            for _ in range(args.dispatches):
                out = stepo()
            _sync(jax.tree_util.tree_leaves(out)[0])
            rates.append(args.dispatches / (time.time() - t0))
        rates.sort()
        return 1e6 / (rates[len(rates) // 2] * inner)

    if "opt" in probes:
        results["adam_f32_alone"] = opt_probe(
            optax.flatten(flat_adam(5e-3, moment_dtype="f32")))
        results["adam_bf16_alone"] = opt_probe(
            optax.flatten(flat_adam(5e-3, moment_dtype="bf16")))
        results["adam_tree_alone"] = opt_probe(
            flat_adam(5e-3, moment_dtype="f32"))
        results["adam_optax_tree"] = opt_probe(optax.adam(5e-3))
        results["sgd_alone"] = opt_probe(optax.sgd(5e-3))

    # ---- microprobes ----
    stp = ode._stepper
    s = stp.tab.stages
    if "micro" in probes:
        # MLP evals per training step: s_exp stage evals fwd + ~2x bwd
        n_mlp = 3 * s  # fwd evals + backprop ~2x
        Ws = [jax.random.normal(
                  jax.random.PRNGKey(i), (a, b), jnp.float32) * 0.05
              for i, (a, b) in enumerate(zip([nx] + dims[:-1], dims))]

        def mlp_chain(y):
            def body(carry, _):
                h = carry
                for W in Ws:
                    h = jnp.maximum(h @ W, 0.0)
                # fold back to state width to keep the carry shape
                return h[:, :nx] + carry[:, :nx] * 0.5, ()
            out, _ = lax.scan(body, y, None, length=inner * n_mlp)
            return out

        cm = jax.jit(mlp_chain).lower(y0).compile()

        def stepm():
            return cm(y0)

        _sync(stepm())
        per_chain = _time(stepm, args.dispatches, args.windows, inner)
        results[f"mlp_chain(x{n_mlp})"] = per_chain

        # stiff dots per training step: s fwd inverse applies + s reverse
        n_stiff = 2 * s
        A = jax.random.normal(jax.random.PRNGKey(9), (nx, nx), jnp.float32)
        A = A / (1.2 * jnp.linalg.norm(A, 2))

        def stiff_hst(y):
            def body(carry, _):
                return lax.dot_general(
                    carry, A, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST), ()
            out, _ = lax.scan(body, y, None, length=inner * n_stiff)
            return out

        ch = jax.jit(stiff_hst).lower(y0).compile()

        def steph():
            return ch(y0)

        _sync(steph())
        results[f"stiff_highest(x{n_stiff})"] = _time(
            steph, args.dispatches, args.windows, inner)

        Ah = A.astype(jnp.bfloat16).astype(jnp.float32)
        Al = A - Ah

        def stiff_b3(y):
            def body(carry, _):
                xh = carry.astype(jnp.bfloat16).astype(jnp.float32)
                xl = carry - xh
                out = (xh @ Ah + xh @ Al) + xl @ Ah
                return out, ()
            out, _ = lax.scan(body, y, None, length=inner * n_stiff)
            return out

        cb = jax.jit(stiff_b3).lower(y0).compile()

        def stepb():
            return cb(y0)

        _sync(stepb())
        results[f"stiff_bf16x3(x{n_stiff})"] = _time(
            stepb, args.dispatches, args.windows, inner)

    print(f"\n{args.workload} nx={nx} B={batch} stages={s} "
          f"inner={inner}:")
    for k, v in results.items():
        print(f"  {k:>22}: {v:8.2f} us/step")
    if "solve" in probes:
        print(f"  {'reverse(=grad-fwd)':>22}: "
              f"{results['grad'] - results['fwd']:8.2f} us/step")
        print(f"  {'adam(=train-grad)':>22}: "
              f"{results['train'] - results['grad']:8.2f} us/step")


if __name__ == "__main__":
    main()
