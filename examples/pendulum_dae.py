"""Pendulum index-1 DAE training: singular mass matrix through the adjoint.

Rebuild of /root/reference/examples-pnode/pendulum_DAE.py: Cartesian pendulum
as a 5-state DAE (x, y, vx, vy, lambda) with mass M = diag(1,1,1,1,0)
(:119-121), Crank-Nicolson implicit solve, two learning modes —
known algebraic constraint (NN learns only the differential part) vs
--unknown_alg (a second NN learns the constraint, warm-startable from a
--pretrained known-constraint checkpoint, :368-386), plus constraint-violation
reporting (:487)::

    python examples/pendulum_dae.py --double_prec --niters 200
    python examples/pendulum_dae.py --double_prec --unknown_alg --pretrained
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

parser = argparse.ArgumentParser("pendulum_DAE")
parser.add_argument("--method", type=str, default="cn")
parser.add_argument("--data_size", type=int, default=100)
parser.add_argument("--steps_per_data_point", type=int, default=1)
parser.add_argument("--batch_size", type=int, default=50)
parser.add_argument("--niters", type=int, default=500)
parser.add_argument("--test_freq", type=int, default=10)
parser.add_argument("--lr", type=float, default=2e-3)
parser.add_argument("--double_prec", action="store_true")
parser.add_argument("--unknown_alg", action="store_true")
parser.add_argument("--pretrained", action="store_true")
parser.add_argument("--hotstart", action="store_true")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--train_dir", type=str, default="./train_results_pendulum")
parser.add_argument("--init_mean", type=float, default=0.0)
parser.add_argument("--init_std", type=float, default=0.01)
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

from pnode_tpu import Func, FlaxFunc, ODESolver
from pnode_tpu.utils import RunningAverageMeter

dtype = jnp.float64 if args.double_prec else jnp.float32
G = 9.81

# mass matrix: last (algebraic) row zero (pendulum_DAE.py:119-121)
M = np.eye(5)
M[-1, -1] = 0.0

endtime = 0.5
t_obs = np.linspace(0.0, endtime, args.data_size + 1)
step_size = float(t_obs[1] - t_obs[0]) / args.steps_per_data_point


def pendulum_true(tt, y, p):
    """True DAE rhs: index-1 formulation with lambda dynamics in the
    algebraic row (pendulum_DAE.py Lambda, :108-116)."""
    return jnp.stack([
        y[2],
        y[3],
        -y[0] * y[4],
        -y[1] * y[4] - G,
        y[4] * (y[0] ** 2 + y[1] ** 2) + G * y[1] - (y[2] ** 2 + y[3] ** 2),
    ])


class DiffNet(nn.Module):
    """Learned differential part: 5 -> 10 -> 10 -> 5, no bias, GELU."""

    @nn.compact
    def __call__(self, y):
        init = nn.initializers.normal(stddev=0.01)
        h = nn.gelu(nn.Dense(10, use_bias=False, kernel_init=init)(y))
        h = nn.gelu(nn.Dense(10, use_bias=False, kernel_init=init)(h))
        return nn.Dense(5, use_bias=False, kernel_init=init)(h)


class AlgNet(nn.Module):
    """Learned algebraic constraint: 5 -> 10 -> 10 -> 1, no bias."""

    @nn.compact
    def __call__(self, y):
        init = nn.initializers.normal(stddev=args.init_std)
        h = nn.gelu(nn.Dense(10, use_bias=False, kernel_init=init)(y))
        h = nn.gelu(nn.Dense(10, use_bias=False, kernel_init=init)(h))
        return nn.Dense(1, use_bias=False, kernel_init=init)(h)


def main():
    # consistent initial condition: theta0, at rest, lambda from constraint
    th0 = 0.5
    x0, y0c = np.sin(th0), -np.cos(th0)
    lam0 = -G * y0c  # v=0 => lambda = -g*y
    true_y0 = jnp.asarray([x0, y0c, 0.0, 0.0, lam0], dtype)

    ode0 = ODESolver()
    ode0.setupTS(
        true_y0, Func(pendulum_true, {}), step_size=step_size, method="cn",
        implicit_form=True, mass=M, enable_adjoint=False,
    )
    t_out = np.asarray(t_obs)
    true_y = ode0.odeint(true_y0, t_out)
    print("data: constraint violation",
          float(jnp.max(jnp.abs(true_y[:, 0] ** 2 + true_y[:, 1] ** 2 - 1.0))))

    key = jax.random.PRNGKey(args.seed)
    diff_net, alg_net = DiffNet(), AlgNet()
    p_diff = to_jax_tree(diff_net.init(key, true_y0), dtype)
    p_alg = to_jax_tree(alg_net.init(key, true_y0), dtype)
    params = {"diff": p_diff, "alg": p_alg}

    ckpt_known = os.path.join(args.train_dir, "best_pendulum_dae.ckpt")
    ckpt_path = os.path.join(
        args.train_dir,
        "best_pendulum_dae_unknown_alg.ckpt" if args.unknown_alg
        else "best_pendulum_dae.ckpt",
    )
    if args.pretrained and os.path.exists(ckpt_known):
        ck = load_checkpoint(ckpt_known)
        params["diff"] = to_jax_tree(ck["params"]["diff"], dtype)
        print("warm-started differential net from pretrained checkpoint")

    def learned_dae(tt, y, p):
        f_diff = diff_net.apply(p["diff"], y)
        if args.unknown_alg:
            f_alg = alg_net.apply(p["alg"], y)[0]
        else:
            f_alg = (
                y[4] * (y[0] ** 2 + y[1] ** 2) + G * y[1]
                - (y[2] ** 2 + y[3] ** 2)
            )
        return jnp.concatenate([f_diff[:4], jnp.asarray([f_alg])])

    ode = ODESolver()
    ode.setupTS(
        true_y0, Func(learned_dae, params), step_size=step_size,
        method=args.method, implicit_form=True, mass=M, enable_adjoint=True,
    )

    # pretrained mode freezes the differential net (pendulum_DAE.py:371-390)
    frozen_diff = args.pretrained and args.unknown_alg
    if frozen_diff:
        opt = optax.multi_transform(
            {"train": optax.adamw(args.lr), "frozen": optax.set_to_zero()},
            param_labels={"diff": "frozen", "alg": "train"},
        )
    else:
        opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    start_iter, best_loss = 0, float("inf")
    if args.hotstart and os.path.exists(ckpt_path):
        ck = load_checkpoint(ckpt_path)
        params = to_jax_tree(ck["params"], dtype)
        start_iter, best_loss = ck["iter"] + 1, ck["best_loss"]
        print(f"hotstart at iter {start_iter}")

    rng = np.random.default_rng(args.seed)

    @jax.jit
    def train_step(p, opt_state):
        def loss_fn(pp):
            pred = ode.odeint_adjoint(true_y0, t_out, params=pp)
            return jnp.mean(jnp.abs(pred - true_y))

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(g, opt_state, params=p)
        return optax.apply_updates(p, updates), opt_state, loss

    @jax.jit
    def constraint_violation(p):
        pred, _ = ode.solve(true_y0, t_out, params=p, with_adjoint=False)
        return jnp.sum((pred[:, 0] ** 2 + pred[:, 1] ** 2 - 1.0) ** 2)

    time_meter = RunningAverageMeter(0.97)
    loss_meter = RunningAverageMeter(0.97)
    end = time.time()
    for itr in range(start_iter, args.niters):
        params, opt_state, loss = train_step(params, opt_state)
        time_meter.update(time.time() - end)
        loss_meter.update(float(loss))
        if itr % args.test_freq == 0:
            cv = float(constraint_violation(params))
            print(
                f"Iter {itr:04d} | Time {time_meter.avg:.4f}s | "
                f"Loss {loss_meter.avg:.6e} | "
                f"Constraint dev {cv:.3e} | NFE-F {ode.nfe_forward}"
            )
            if float(loss) < best_loss:
                best_loss = float(loss)
                save_checkpoint(ckpt_path, {
                    "iter": itr, "params": params, "best_loss": best_loss,
                })
        end = time.time()
    return loss_meter.avg


if __name__ == "__main__":
    final = main()
    print(f"final loss {final:.6e}")
