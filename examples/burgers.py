"""Burgers SINODE training: IMEX split with a known stiff linear part.

Rebuild of /root/reference/examples-sinode/Burgers/Burgers.py: viscous
Burgers trajectories (100 ICs, T=5, saved every 0.1), IMEX split = fixed
circular-conv Laplacian implicit (ODEFuncIM, :170-195) + learned ReLU stack
explicit (ODEFuncEX, :134-166), random (IC, window) minibatch sampling
(get_batch, :243-280), all three linear solvers selectable, NFE bookkeeping.
The reference's torchdiffeq fallback (--node mode, :437-448) maps to
autodiff-through-the-solver (with_adjoint=False) here::

    python examples/burgers.py --imex --linear_solver hpddm --fixed_jacobian \
        -ts_arkimex_type l2 -snes_type ksponly
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
from examples.common import init_flags, to_jax_tree  # noqa: E402

parser = argparse.ArgumentParser("burgers")
parser.add_argument("--nx", type=int, default=512)
parser.add_argument("--imex", action="store_true", default=True)
parser.add_argument("--no-imex", dest="imex", action="store_false")
parser.add_argument("--method", type=str, default="imex")
parser.add_argument("--batch_time", type=int, default=20)
parser.add_argument("--batch_size", type=int, default=200)
parser.add_argument("--epochs", type=int, default=20)
parser.add_argument("--step_size", type=float, default=1e-3)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--test_freq", type=int, default=10)
parser.add_argument("--double_prec", action="store_true")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--train_dir", type=str, default="./train_results_burgers")
parser.add_argument("--linear_solver", type=str,
                    choices=["petsc", "hpddm", "torch"], default="petsc")
parser.add_argument("--fixed_jacobian", action="store_true")
parser.add_argument("--node", action="store_true",
                    help="autodiff-through-solver mode (torchdiffeq analogue)")
parser.add_argument("--iters_per_epoch", type=int, default=0,
                    help="override the data-derived iteration count")
parser.add_argument("--cpu", action="store_true")
args = init_flags(parser)

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if args.double_prec:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

from pnode_tpu import FlaxFunc, ODESolver
from pnode_tpu.data import generate_burgers_data
from pnode_tpu.models import BurgersFuncEX, BurgersFuncIM
from pnode_tpu.utils import RunningAverageMeter

dtype = jnp.float64 if args.double_prec else jnp.float32
DT_DATA = 0.1


def get_batch(u, rng, batch_size, batch_time):
    """Random (IC, start) windows: y0 (B, nx), targets (T, B, nx)
    (Burgers.py get_batch, :243-280; uniform dt so the window offsets are
    shared)."""
    n_ic, n_t, nx = u.shape
    ics = rng.integers(0, n_ic, size=batch_size)
    starts = rng.integers(0, n_t - batch_time, size=batch_size)
    y0 = u[ics, starts]
    y = np.stack([u[ics, starts + j] for j in range(batch_time)], axis=0)
    return jnp.asarray(y0, dtype), jnp.asarray(y, dtype)


def main():
    rng = np.random.default_rng(args.seed)
    u, t_data = generate_burgers_data(
        nx=args.nx, n_ic=100,
        cache_dir=os.path.join(args.train_dir, "data"),
    )
    n_train_ic = int(0.8 * u.shape[0])
    u_train, u_test = u[:n_train_ic], u[n_train_ic:]
    print(f"Burgers data: {u.shape}, dt {DT_DATA}")

    window_t = np.arange(args.batch_time) * DT_DATA

    key = jax.random.PRNGKey(args.seed)
    y_tmpl = jnp.zeros((args.batch_size, args.nx), dtype)
    im = BurgersFuncIM(nx=args.nx)
    ex = BurgersFuncEX(nx=args.nx)
    vim = to_jax_tree(im.init(key, 0.0, y_tmpl), dtype)
    vex = to_jax_tree(ex.init(key, 0.0, y_tmpl), dtype)
    params = (vim, vex)

    ode = ODESolver()
    if args.node:
        # torchdiffeq-analogue baseline: integrate the COMBINED rhs with an
        # explicit method and differentiate straight through the solver
        # (the reference's --node path does the same with torchdiffeq,
        # Burgers.py:437-448)
        def combined(t, y, p):
            pim, pex = p
            return im.apply(pim, t, y) + ex.apply(pex, t, y)

        ode.setupTS(
            y_tmpl, (combined, params), step_size=args.step_size,
            method="dopri5", enable_adjoint=False,
        )
    else:
        ode.setupTS(
            y_tmpl, FlaxFunc(im, vim), step_size=args.step_size,
            method=args.method if args.imex else "cn",
            imex_form=args.imex, implicit_form=True,
            func2=FlaxFunc(ex, vex) if args.imex else None,
            linear_solver=args.linear_solver,
            fixed_jacobian=args.fixed_jacobian,
            batch_size=args.batch_size,
        )

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, opt_state, y0, target):
        def loss_fn(pp):
            if args.node:
                pred, _ = ode.solve(y0, window_t, params=pp, with_adjoint=False)
            else:
                pred = ode.odeint_adjoint(y0, window_t, params=pp)
            return jnp.mean(jnp.abs(pred - target))

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    iters_per_epoch = args.iters_per_epoch or max(
        1, u_train.shape[0] * (u.shape[1] - args.batch_time) // args.batch_size
    )
    loss_meter = RunningAverageMeter(0.97)
    rng_test = np.random.default_rng(12345)
    itr = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for _ in range(iters_per_epoch):
            y0, target = get_batch(u_train, rng, args.batch_size, args.batch_time)
            params, opt_state, loss = train_step(params, opt_state, y0, target)
            loss_meter.update(float(loss))
            itr += 1
            if np.isnan(loss_meter.val):
                print("NaN loss - stopping (reference breaks the same way, "
                      "Burgers.py:502)")
                return float("nan")
        ty0, ttgt = get_batch(u_test, rng_test, args.batch_size, args.batch_time)
        tl = float(train_step(params, opt_state, ty0, ttgt)[2])
        print(
            f"Epoch {epoch:03d} | {time.time()-t0:.2f}s | "
            f"Train {loss_meter.avg:.6e} | Test {tl:.6e} | "
            f"NFE-F {ode.nfe_forward}"
        )
    return loss_meter.avg


if __name__ == "__main__":
    final = main()
    print(f"final train loss {final:.6e}")
