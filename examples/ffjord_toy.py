"""FFJORD on 2-D toy densities, with flow visualization.

Rebuild of the reference's toy-data CNF training path
(/root/reference/ffjord-pnode/lib/toy_data.py + visualize_flow): train a CNF
on a 2-D toy distribution, periodically save a figure with (data samples,
flow samples, learned density) like lib/visualize_flow.py::

    python examples/ffjord_toy.py --data 8gaussians --niters 500 --viz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
from examples.common import init_flags  # noqa: E402

parser = argparse.ArgumentParser("ffjord-toy")
parser.add_argument("--data", type=str, default="8gaussians")
parser.add_argument("--dims", type=str, default="64-64-64")
parser.add_argument("--layer_type", type=str, default="concatsquash")
parser.add_argument("--nonlinearity", type=str, default="tanh")
parser.add_argument("--time_length", type=float, default=0.5)
parser.add_argument("--solver", type=str, default="dopri5")
parser.add_argument("--step_size", type=float, default=0.05)
parser.add_argument("--niters", type=int, default=2000)
parser.add_argument("--batch_size", type=int, default=512)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--viz", action="store_true")
parser.add_argument("--viz_freq", type=int, default=200)
parser.add_argument("--save", type=str, default="./train_results_ffjord_toy")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--cpu", action="store_true")
args = init_flags(parser)

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from pnode_tpu.ffjord import build_model_tabular, standard_normal_logprob
from pnode_tpu.ffjord.toy_data import inf_train_gen
from pnode_tpu.utils import RunningAverageMeter


def visualize(model, params, itr):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.join(args.save, "png"), exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    data = inf_train_gen(args.data, np.random.default_rng(0), 2000)
    axes[0].scatter(data[:, 0], data[:, 1], s=2, alpha=0.5)
    axes[0].set_title("data")
    z = np.random.default_rng(1).normal(size=(2000, 2)).astype(np.float32)
    x_gen, _, _ = model.apply(params, jnp.asarray(z),
                              key=jax.random.PRNGKey(0), training=False,
                              reverse=True)
    axes[1].scatter(np.asarray(x_gen)[:, 0], np.asarray(x_gen)[:, 1], s=2,
                    alpha=0.5)
    axes[1].set_title("flow samples")
    g = np.linspace(-4, 4, 80).astype(np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], 1))
    zz, dlp, _ = model.apply(params, pts, key=jax.random.PRNGKey(2),
                             training=False, exact_div=True)
    logp = standard_normal_logprob(zz)[:, None] - dlp
    axes[2].imshow(np.exp(np.asarray(logp)).reshape(80, 80),
                   extent=[-4, 4, -4, 4], origin="lower")
    axes[2].set_title("learned density")
    for ax in axes:
        ax.set_xlim(-4, 4)
        ax.set_ylim(-4, 4)
    fig.tight_layout()
    path = os.path.join(args.save, "png", f"{itr:06d}.png")
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def main():
    hidden = tuple(int(d) for d in args.dims.split("-"))
    model = build_model_tabular(
        dim=2, num_blocks=1, hidden_dims=hidden, layer_type=args.layer_type,
        nonlinearity=args.nonlinearity, time_length=args.time_length,
        solver=args.solver, step_size=args.step_size, rademacher=True,
    )
    rng = np.random.default_rng(args.seed)
    x0 = jnp.asarray(inf_train_gen(args.data, rng, args.batch_size))
    params = model.init(jax.random.PRNGKey(args.seed), x0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def nll(p, x, key):
        z, dlp, _ = model.apply(p, x, key=key, training=True)
        return -jnp.mean(standard_normal_logprob(z)[:, None] - dlp)

    @jax.jit
    def step(p, s, x, key):
        loss, g = jax.value_and_grad(nll)(p, x, key)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    loss_meter = RunningAverageMeter(0.97)
    end = time.time()
    for itr in range(1, args.niters + 1):
        x = jnp.asarray(inf_train_gen(args.data, rng, args.batch_size))
        params, opt_state, loss = step(params, opt_state, x,
                                       jax.random.PRNGKey(itr))
        loss_meter.update(float(loss))
        if itr % 100 == 0:
            print(f"Iter {itr:05d} | Time {time.time()-end:.2f}s | "
                  f"NLL {loss_meter.avg:.4f}")
            end = time.time()
        if args.viz and itr % args.viz_freq == 0:
            print("saved", visualize(model, params, itr))
    return loss_meter.avg


if __name__ == "__main__":
    final = main()
    print(f"final NLL {final:.4f}")
