"""Unstable-spiral fit: implicit CN vs autodiff-through-solver comparison.

Rebuild of /root/reference/examples-pnode/spiral_unstable.py: an unstable
linear-cubed spiral (positive real part) where explicit integration drifts,
trained side-by-side with (a) the discrete-adjoint implicit path (PNODE) and
(b) plain autodiff through the same discrete solver (the reference compares
against torchdiffeq's adaptive adjoint, ode_REF vs ode_PNODE) — losses and
gradients are printed for both every test interval, with seeded determinism
(:54-58)::

    python examples/spiral_unstable.py --double_prec --niters 100
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")
from examples.common import init_flags, to_jax_tree  # noqa: E402

parser = argparse.ArgumentParser("spiral_unstable")
parser.add_argument("--method", type=str, default="cn")
parser.add_argument("--data_size", type=int, default=200)
parser.add_argument("--batch_time", type=int, default=10)
parser.add_argument("--batch_size", type=int, default=20)
parser.add_argument("--niters", type=int, default=500)
parser.add_argument("--test_freq", type=int, default=20)
parser.add_argument("--step_size", type=float, default=0.025)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--double_prec", action="store_true")
parser.add_argument("--seed", type=int, default=42)
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

from pnode_tpu import FlaxFunc, ODESolver
from pnode_tpu.utils import RunningAverageMeter

dtype = jnp.float64 if args.double_prec else jnp.float32

# unstable spiral: positive real part (spiral_unstable.py true_A variant)
true_A = jnp.asarray([[0.1, 2.0], [-2.0, 0.1]], dtype)
true_y0 = jnp.asarray([0.5, 0.0], dtype)
t = np.linspace(0.0, 5.0, args.data_size)


class ODEFunc(nn.Module):
    @nn.compact
    def __call__(self, tt, y):
        init = nn.initializers.normal(0.1)
        h = nn.tanh(nn.Dense(50, kernel_init=init)(y**3))
        return nn.Dense(2, kernel_init=init)(h)


def main():
    data_ode = ODESolver()
    data_ode.setupTS(
        true_y0, lambda tt, y: (y**3) @ true_A, step_size=args.step_size / 4,
        method="cn", implicit_form=True, enable_adjoint=False,
    )
    true_y = data_ode.odeint(true_y0, t)

    rng = np.random.default_rng(args.seed)
    func = ODEFunc()
    params0 = to_jax_tree(
        func.init(jax.random.PRNGKey(args.seed), 0.0, true_y0[None]), dtype
    )

    window_t = t[: args.batch_time] - t[0]

    ode_pnode = ODESolver()
    ode_pnode.setupTS(
        jnp.zeros((args.batch_size, 2), dtype), FlaxFunc(func, params0),
        step_size=args.step_size, method=args.method, implicit_form=True,
        enable_adjoint=True,
    )
    # comparison baseline: explicit dopri5 differentiated by plain autodiff
    # (the reference compares against torchdiffeq's dopri5 the same way,
    # spiral_unstable.py ode_REF)
    ode_ref = ODESolver()
    ode_ref.setupTS(
        jnp.zeros((args.batch_size, 2), dtype), FlaxFunc(func, params0),
        step_size=args.step_size, method="dopri5", enable_adjoint=False,
    )

    def get_batch():
        s = rng.choice(args.data_size - args.batch_time, size=args.batch_size,
                       replace=False)
        y0 = true_y[s]
        yt = jnp.stack([true_y[s + i] for i in range(args.batch_time)])
        return y0, yt

    opt = optax.rmsprop(args.lr)

    def build_step(ode, adjoint):
        @jax.jit
        def step(p, opt_state, y0, yt):
            def loss_fn(pp):
                if adjoint:
                    pred = ode.odeint_adjoint(y0, window_t, params=pp)
                else:
                    pred, _ = ode.solve(y0, window_t, params=pp,
                                        with_adjoint=False)
                return jnp.mean(jnp.abs(pred - yt))

            loss, g = jax.value_and_grad(loss_fn)(p)
            gnorm = optax.global_norm(g)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(p, updates), opt_state, loss, gnorm

        return step

    step_pnode = build_step(ode_pnode, True)
    step_ref = build_step(ode_ref, False)

    p_a, s_a = params0, opt.init(params0)
    p_b, s_b = params0, opt.init(params0)
    meter_a, meter_b = RunningAverageMeter(0.97), RunningAverageMeter(0.97)
    for itr in range(1, args.niters + 1):
        y0, yt = get_batch()
        p_a, s_a, la, ga = step_pnode(p_a, s_a, y0, yt)
        p_b, s_b, lb, gb = step_ref(p_b, s_b, y0, yt)
        meter_a.update(float(la))
        meter_b.update(float(lb))
        if itr % args.test_freq == 0:
            print(
                f"Iter {itr:04d} | PNODE(CN) loss {meter_a.avg:.6f} "
                f"(|g| {float(ga):.3e}) | dopri5-AD loss {meter_b.avg:.6f} "
                f"(|g| {float(gb):.3e})"
            )
    return meter_a.avg, meter_b.avg


if __name__ == "__main__":
    la, lb = main()
    print(f"final: PNODE {la:.6f} | AD reference {lb:.6f}")
