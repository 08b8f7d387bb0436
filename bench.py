"""Benchmark: KS SINODE training throughput (the reference's headline config).

Measures full training steps/sec (forward IMEX solve + discrete adjoint +
Adam update) for the KS workload at the reference's A100 configuration
(/root/reference/examples-sinode/KS/runs64_a100.sh: 64-point grid, batch 256,
dt 0.2, ARKIMEX) on whatever backend JAX selects (the driver runs this on one
real TPU chip).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no wall-clock numbers (BASELINE.md: "measured at
run time; no stored values in repo"), so vs_baseline is reported against the
first recorded round of this framework (BENCH_r1.json) when present, else 1.0.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timed steps")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--no_pallas", action="store_true")
    args, unknown = ap.parse_known_args()

    import jax
    import jax.numpy as jnp
    import optax

    import pnode_tpu
    from pnode_tpu import FlaxFunc, ODESolver
    from pnode_tpu.models import KSFuncEX, KSFuncIM

    pnode_tpu.init([sys.argv[0]] + unknown)
    dtype = jnp.float32
    batch, nx = args.batch, args.nx
    n_steps = 10 if args.quick else args.steps

    print(f"benchmark device: {jax.devices()[0]}", file=sys.stderr)

    # production stiff config: single linearized solve per implicit stage,
    # shared-block LU (the linear KS stencil makes it exact)
    pnode_tpu.set_option("snes_type", "ksponly")
    pnode_tpu.set_option("ksp_rtol", "1e-6")
    use_pallas = (not args.no_pallas) and jax.default_backend() in ("tpu", "axon")

    # note: f_im stays on the roll-chain path: its Jacobian is assembled
    # with jacfwd, and custom_vjp Pallas ops do not support forward-mode
    im = KSFuncIM(nx=nx)
    ex = KSFuncEX(nx=nx, use_pallas=use_pallas)
    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), dtype)
    vim = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), im.init(key, 0.0, y_tmpl)
    )
    vex = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), ex.init(key, 0.0, y_tmpl)
    )

    ode = ODESolver()
    ode.setupTS(
        y_tmpl,
        FlaxFunc(im, vim),
        step_size=0.2,
        method="imex",
        imex_form=True,
        implicit_form=True,
        func2=FlaxFunc(ex, vex),
        linear_solver="hpddm",
        fixed_jacobian=True,
        batch_size=batch,
    )

    # one training window: predict the next dt_data (time_window_size=1)
    t_out = jnp.array([0.0, 0.2])
    params = (vim, vex)
    opt = optax.adam(5e-3)

    def loss_fn(p, y0, target):
        pred, _ = ode.solve(y0, t_out, params=p)
        return jnp.mean((pred[-1] - target) ** 2)

    @jax.jit
    def train_step(p, opt_state, y0, target):
        loss, grads = jax.value_and_grad(loss_fn)(p, y0, target)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y0 = jax.random.normal(k1, (batch, nx), dtype)
    target = y0 + 0.05 * jax.random.normal(k2, (batch, nx), dtype)
    opt_state = opt.init(params)

    # warmup (compile)
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, y0, target)
    jax.block_until_ready(loss)
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)
    for _ in range(2):
        params, opt_state, loss = train_step(params, opt_state, y0, target)
    jax.block_until_ready(loss)

    # three timing windows, best-of (the tunneled chip shows ~15% run-to-run
    # variance from host-side hiccups; max filters them, losses are
    # deterministic regardless)
    rates = []
    for rep in range(3):
        t0 = time.time()
        for _ in range(n_steps):
            params, opt_state, loss = train_step(params, opt_state, y0, target)
        jax.block_until_ready(loss)
        dt_wall = time.time() - t0
        rates.append(n_steps / dt_wall)
        print(
            f"window {rep}: {n_steps} steps in {dt_wall:.3f}s "
            f"({rates[-1]:.1f}/s); loss {float(loss):.6f}",
            file=sys.stderr,
        )
    steps_per_sec = max(rates)

    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_r1.json")
    if os.path.exists(base_path):
        try:
            with open(base_path) as f:
                base = json.load(f)
            if base.get("value"):
                vs_baseline = steps_per_sec / float(base["value"])
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "ks_sinode_train_steps_per_sec_b256_nx64_imex",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
