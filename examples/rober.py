"""ROBER stiff-ODE training: implicit methods on a log-spaced time grid.

Rebuild of /root/reference/examples-pnode/ROBER.py: the stiff ROBER kinetics
fit with a small GELU MLP over t in [0, 100] on a log grid (logspace(-5, 2)),
per-step dt lists landing on every observation (:74-85), minmax/mean
normalization (:126-133), best-checkpoint + --hotstart resume (:408-421,
485-501), per-iter Time/Loss/NFE telemetry and metrics logging::

    python examples/rober.py --double_prec --method cn --niters 200
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
from examples.common import (  # noqa: E402
    init_flags,
    load_checkpoint,
    save_checkpoint,
    to_jax_tree,
)

parser = argparse.ArgumentParser("ROBER")
parser.add_argument("--method", type=str, default="cn")
parser.add_argument("--data_size", type=int, default=20)
parser.add_argument("--steps_per_data_point", type=int, default=2)
parser.add_argument("--niters", type=int, default=500)
parser.add_argument("--test_freq", type=int, default=10)
parser.add_argument("--lr", type=float, default=5e-3)
parser.add_argument("--normalize", type=str,
                    choices=["minmax", "mean"], default="minmax")
parser.add_argument("--double_prec", action="store_true")
parser.add_argument("--implicit_form", action="store_true", default=True)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--train_dir", type=str, default="./train_results_rober")
parser.add_argument("--hotstart", action="store_true")
parser.add_argument("--linear_solver", type=str,
                    choices=["petsc", "hpddm", "torch"], default="petsc")
parser.add_argument("--cpu", action="store_true")
args = init_flags(parser)

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if args.double_prec:
    jax.config.update("jax_enable_x64", True)

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax
from scipy.integrate import solve_ivp

from pnode_tpu import FlaxFunc, ODESolver
from pnode_tpu.utils import MetricsWriter, RunningAverageMeter

dtype = jnp.float64 if args.double_prec else jnp.float32
endtime = 100.0

# log-spaced observation grid + finer per-step dt list (ROBER.py:68-85)
t_obs = np.concatenate([[0.0], np.logspace(-5, 2, args.data_size)])
t_traj = np.concatenate(
    [[0.0], np.logspace(
        -5, 2,
        args.data_size + (args.data_size - 1) * (args.steps_per_data_point - 1),
    )]
)
step_size = list(np.diff(t_traj))


def rober_rhs(tt, state):
    k1, k2, k3 = 0.04, 3e7, 1e4
    return np.array([
        -k1 * state[0] + k3 * state[1] * state[2],
        k1 * state[0] - k3 * state[1] * state[2] - k2 * state[1] ** 2,
        k2 * state[1] ** 2,
    ])


def rober_jac(tt, state):
    k1, k2, k3 = 0.04, 3e7, 1e4
    return np.array([
        [-k1, k3 * state[2], k3 * state[1]],
        [k1, -2 * k2 * state[1] - k3 * state[2], -k3 * state[1]],
        [0.0, 2 * k2 * state[1], 0.0],
    ])


class ODEFunc(nn.Module):
    """GELU MLP 3->5x6->3, no bias, init N(0, 0.5) (ROBER.py:276-318)."""

    @nn.compact
    def __call__(self, tt, y):
        h = y
        init = nn.initializers.normal(stddev=0.5)
        for _ in range(6):
            h = nn.gelu(nn.Dense(5, use_bias=False, kernel_init=init)(h))
        return nn.Dense(3, use_bias=False, kernel_init=init)(h)


def main():
    path = solve_ivp(
        rober_rhs, [0, endtime * 1.1], np.array([1.0, 0.0, 0.0]),
        t_eval=t_obs, jac=rober_jac, method="BDF", rtol=1e-11, atol=1e-14,
    )
    data = path["y"].T
    shift, scale = 0.0, 1.0
    if args.normalize == "minmax":
        shift = data.min(0, keepdims=True)
        scale = data.max(0, keepdims=True) - shift
        data = (data - shift) / scale
    elif args.normalize == "mean":
        shift = data.mean(0, keepdims=True)
        scale = data.std(0, keepdims=True)
        data = (data - shift) / scale
    true_y = jnp.asarray(data, dtype)
    true_y0 = true_y[0]
    t_out = np.asarray(t_obs)

    func = ODEFunc()
    params = to_jax_tree(
        func.init(jax.random.PRNGKey(args.seed), 0.0, true_y0), dtype
    )

    ode = ODESolver()
    ode.setupTS(
        true_y0, FlaxFunc(func, params), step_size=step_size,
        method=args.method, implicit_form=args.implicit_form,
        linear_solver=args.linear_solver, enable_adjoint=True,
    )

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    start_iter, best_loss = 0, float("inf")
    ckpt = os.path.join(args.train_dir, "best.ckpt")
    if args.hotstart and os.path.exists(ckpt):
        ck = load_checkpoint(ckpt)
        if ck.get("normalize") != args.normalize:
            raise RuntimeError("hotstart normalization mismatch "
                               "(ROBER.py:411-416 guard)")
        params = to_jax_tree(ck["params"], dtype)
        start_iter, best_loss = ck["iter"] + 1, ck["best_loss"]
        print(f"hotstart at iter {start_iter}, best {best_loss:.3e}")

    @jax.jit
    def train_step(p, opt_state):
        def loss_fn(pp):
            pred = ode.odeint_adjoint(true_y0, t_out, params=pp)
            return jnp.mean(jnp.abs(pred - true_y))

        loss, g = jax.value_and_grad(loss_fn)(p)
        gnorm = optax.global_norm(g)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss, gnorm

    writer = MetricsWriter(args.train_dir)
    time_meter = RunningAverageMeter(0.97)
    loss_meter = RunningAverageMeter(0.97)
    end = time.time()
    nfe_b = 0
    for itr in range(start_iter, args.niters):
        params, opt_state, loss, gnorm = train_step(params, opt_state)
        time_meter.update(time.time() - end)
        loss_meter.update(float(loss))
        nfe_b = ode.nfe_forward  # adjoint replays the same trajectory
        if itr % args.test_freq == 0:
            print(
                f"Iter {itr:04d} | Time {time_meter.avg:.4f}s | "
                f"Loss {loss_meter.avg:.6e} | Grad {float(gnorm):.3e} | "
                f"NFE-F {ode.nfe_forward} | NFE-B {nfe_b}"
            )
            writer.add_scalar("Train/Loss", float(loss), itr)
            writer.add_scalar("Train/Gradient", float(gnorm), itr)
            if float(loss) < best_loss:
                best_loss = float(loss)
                save_checkpoint(ckpt, {
                    "iter": itr, "params": params, "best_loss": best_loss,
                    "normalize": args.normalize,
                })
        end = time.time()
    writer.close()
    return loss_meter.avg


if __name__ == "__main__":
    final = main()
    print(f"final loss {final:.6e}")
