"""Decompose the ADAPTIVE training step (bench.py --workload adaptive).

Round-4 measured 390 steps/s at the KS headline shapes with a ~31-slot
trial axis — ~12.1k trial-steps/s vs 71k steps/s on the scanned
fixed-step path. This probe locates the 6x under the exact bench
protocol (inner-scan dispatches, device sync via scalar fetch):

  fwd          adaptive forward solve + loss only (no grad)
  grad         jax.value_and_grad (records + gated reverse engines)
  train        + flat Adam (== bench.py --workload adaptive)
  fwd@K        forward with the trial axis pinned to K slots (marginal
               per-slot cost = d(fwd)/dK; intercept = fixed overhead)
  emb_fused    microprobe: stp.step_embedded chained with a VARYING dt
               (the controller's operating point: per-trial stage inverse)
  emb_cached   same chain at the prepare-time dt (pre-inverted operator)
  inv_chain    microprobe: jnp.linalg.inv(I - a*J) HIGHEST, chained
  eig_chain    microprobe: (Q*w)@Q^T reconstruction of the same inverse
  adj_chain    microprobe: stp.step_adj chained (varying dt)

Usage: python tools/profile_adaptive.py [--inner 100] [--windows 3]
       [--dispatches 5] [--probes solve,axis,micro]

Per-step microseconds print at the end; stderr carries raw windows.
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
    ap.add_argument("--inner", type=int, default=100)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dispatches", type=int, default=5)
    ap.add_argument("--probes", type=str, default="all",
                    help="comma list: solve,axis,micro (default all)")
    args, unknown = ap.parse_known_args()
    probes = set(("solve,axis,micro" if args.probes == "all"
                  else args.probes).split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    import pnode_tpu
    from pnode_tpu import FlaxFunc, ODESolver
    from pnode_tpu.models import KSFuncEX, KSFuncIM

    pnode_tpu.init([sys.argv[0]] + unknown)
    pnode_tpu.set_option("snes_type", "ksponly")
    pnode_tpu.set_option("ksp_rtol", "1e-6")
    for name, val in (("ts_adapt_type", "basic"), ("ts_rtol", "1e-4"),
                      ("ts_atol", "1e-4")):
        pnode_tpu.set_option(name, val)

    nx, batch, dt = 64, 256, 0.2
    use_pallas = jax.default_backend() in ("tpu", "axon")
    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    im = KSFuncIM(nx=nx)
    ex = KSFuncEX(nx=nx, use_pallas=use_pallas)
    vim = im.init(key, 0.0, y_tmpl)
    vex = ex.init(key, 0.0, y_tmpl)
    params = (vim, vex)
    inner = args.inner

    def make_ode():
        ode = ODESolver()
        ode.setupTS(
            y_tmpl, FlaxFunc(im, vim), step_size=dt, method="imex",
            imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
            linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
        )
        return ode

    t_out = jnp.asarray([0.0, dt], jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y0 = jax.random.normal(k1, (batch, nx), jnp.float32)
    target = y0 + 0.05 * jax.random.normal(k2, (batch, nx), jnp.float32)

    # probe the warm demand + auto-size exactly like bench.py
    pnode_tpu.set_option("ts_adapt_max_steps", "32")
    ode = make_ode()
    _, stats = ode.solve(y0, t_out, params=params)
    _, stats = ode.solve(y0, t_out, params=params, dt0=stats.dt_first)
    demand = int(stats.accepted) + int(stats.rejected)
    auto = demand + 8
    dt_first = jnp.asarray(stats.dt_first, jnp.float32)
    print(f"warm demand {demand} (acc {int(stats.accepted)} / "
          f"rej {int(stats.rejected)}), axis -> {auto}", file=sys.stderr)
    pnode_tpu.set_option("ts_adapt_max_steps", str(auto))
    ode = make_ode()

    # warm the fetch channel
    _ = float(jnp.zeros((), jnp.float32) + 1.0)

    def loss_fn(p, y0, target):
        pred, _ = ode.solve(y0, t_out, params=p, dt0=dt_first)
        d = (pred[-1] - target).astype(jnp.float32)
        return jnp.mean(d * d)

    results = {}

    def fwd_probe(od, label):
        def loss_f(p, y0, target):
            pred, _ = od.solve(y0, t_out, params=p, dt0=dt_first)
            d = (pred[-1] - target).astype(jnp.float32)
            return jnp.mean(d * d)

        def fwd_steps(p, y0, target):
            def body(carry, _):
                loss = loss_f(p, y0 + 1e-30 * carry, target)
                return loss, loss
            _, losses = lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=inner)
            return losses[-1]

        cf = jax.jit(fwd_steps).lower(params, y0, target).compile()

        def stepf():
            return cf(params, y0, target)

        _sync(stepf())
        results[label] = _time(stepf, args.dispatches, args.windows, inner)

    if "solve" in probes:
        fwd_probe(ode, "fwd")

        def grad_steps(p, y0, target):
            def body(carry, _):
                loss, g = jax.value_and_grad(loss_fn)(carry, y0, target)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 0.0 * b, carry, g), loss
            p, losses = lax.scan(body, p, None, length=inner)
            return losses[-1]

        cg = jax.jit(grad_steps).lower(params, y0, target).compile()

        def stepg():
            return cg(params, y0, target)

        _sync(stepg())
        results["grad"] = _time(stepg, args.dispatches, args.windows, inner)

        from pnode_tpu.utils import flat_adam

        opt = flat_adam(1e-4)
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
        results["train"] = _time(stept, args.dispatches, args.windows,
                                 inner)

    if "axis" in probes:
        for k_axis in (16, auto, 48):
            pnode_tpu.set_option("ts_adapt_max_steps", str(k_axis))
            fwd_probe(make_ode(), f"fwd@{k_axis}")
        pnode_tpu.set_option("ts_adapt_max_steps", str(auto))

    # ---- microprobes -------------------------------------------------------
    if "micro" in probes:
        stp0 = ode._stepper
        t0s = jnp.asarray(0.0, jnp.float32)
        stp = stp0.prepare(t0s, y0, params, dt0=None) \
            if hasattr(stp0, "prepare") else stp0
        stp_c = stp0.prepare(t0s, y0, params, dt0=float(dt)) \
            if hasattr(stp0, "prepare") else stp0

        def emb_chain(stpx, label, vary_dt):
            def steps(y, d0):
                def body(carry, k):
                    y, d = carry
                    dd = d * (1.0 + 1e-7 * k.astype(jnp.float32)) \
                        if vary_dt else d
                    y1, err, aux, st = stpx.step_embedded(t0s, dd, y,
                                                          params)
                    return (y1 + 1e-30 * jnp.mean(err), d), ()
                (y, _), _ = lax.scan(body, (y, d0),
                                     jnp.arange(inner))
                return y

            d0 = dt_first if vary_dt else jnp.asarray(dt, jnp.float32)
            c = jax.jit(steps).lower(y0, d0).compile()

            def stepe():
                return c(y0, d0)

            _sync(stepe())
            results[label] = _time(stepe, args.dispatches, args.windows,
                                   inner)

        emb_chain(stp, "emb_fused(vary dt)", True)
        emb_chain(stp_c, "emb_cached(dt=0.2)", False)

        # the raw inverse formation, isolated
        J = stp.setup.frozen_J_blocks[0]
        gamma = 0.435866521508459  # ARK3 ESDIRK diagonal
        eye = jnp.eye(J.shape[-1], dtype=J.dtype)

        def inv_chain(d0):
            def body(carry, k):
                d = d0 * (1.0 + 1e-7 * k.astype(jnp.float32))
                with jax.default_matmul_precision("highest"):
                    inv = jnp.linalg.inv(eye - (d * gamma) * J)
                return carry + 1e-30 * inv[0, 0], ()
            out, _ = lax.scan(body, jnp.zeros((), J.dtype),
                              jnp.arange(inner))
            return out

        c_inv = jax.jit(inv_chain).lower(dt_first).compile()
        _sync(c_inv(dt_first))
        results["inv_chain(LU)"] = _time(
            lambda: c_inv(dt_first), args.dispatches, args.windows, inner)

        # eigendecomposition form: J symmetric (KS stencil) -> one eigh at
        # prepare time, per-trial inverse = (Q * w) @ Q^T (two MXU dots)
        lam, Q = jnp.linalg.eigh(J.astype(jnp.float64)
                                 if J.dtype == jnp.float32 else J)
        lam = lam.astype(J.dtype)
        Q = Q.astype(J.dtype)
        sym_err = float(jnp.max(jnp.abs(J - J.T)))
        rec_err = float(jnp.max(jnp.abs((Q * lam) @ Q.T - J)))
        print(f"J symmetry |J-J^T|max = {sym_err:.2e}, "
              f"eigh reconstruction err = {rec_err:.2e}", file=sys.stderr)

        def eig_chain(d0):
            def body(carry, k):
                d = d0 * (1.0 + 1e-7 * k.astype(jnp.float32))
                w = 1.0 / (1.0 - (d * gamma) * lam)
                with jax.default_matmul_precision("highest"):
                    inv = (Q * w) @ Q.T
                return carry + 1e-30 * inv[0, 0], ()
            out, _ = lax.scan(body, jnp.zeros((), J.dtype),
                              jnp.arange(inner))
            return out

        c_eig = jax.jit(eig_chain).lower(dt_first).compile()
        _sync(c_eig(dt_first))
        results["eig_chain(QwQ^T)"] = _time(
            lambda: c_eig(dt_first), args.dispatches, args.windows, inner)

        # reverse-step chain (varying dt, accepted branch)
        y1, err, aux, _ = stp.step_embedded(t0s, dt_first, y0, params)
        lam0 = jnp.ones_like(y0)

        def adj_chain(y, lamv):
            def body(carry, k):
                lamv, acc = carry
                d = dt_first * (1.0 + 1e-7 * k.astype(jnp.float32))
                lam_n, gstep = stp.step_adj(t0s, d, y, params, aux, lamv)
                acc = jax.tree_util.tree_map(
                    lambda a, b: a + 0.0 * jnp.sum(b), acc, gstep)
                return (lam_n, acc), ()
            (lamv, acc), _ = lax.scan(
                body, (lamv, jax.tree_util.tree_map(
                    lambda a: jnp.zeros((), jnp.float32), params)),
                jnp.arange(inner))
            return lamv

        c_adj = jax.jit(adj_chain).lower(y0, lam0).compile()
        _sync(c_adj(y0, lam0))
        results["adj_chain(vary dt)"] = _time(
            lambda: c_adj(y0, lam0), args.dispatches, args.windows, inner)

    print(f"\nadaptive KS nx={nx} B={batch} axis={auto} inner={inner}:")
    for k, v in results.items():
        print(f"  {k:>22}: {v:9.2f} us/iter")
    if "solve" in probes:
        print(f"  {'reverse(=grad-fwd)':>22}: "
              f"{results['grad'] - results['fwd']:9.2f} us/iter")
        print(f"  {'adam(=train-grad)':>22}: "
              f"{results['train'] - results['grad']:9.2f} us/iter")


if __name__ == "__main__":
    main()
