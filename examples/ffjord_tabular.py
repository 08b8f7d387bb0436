"""FFJORD tabular density estimation — the reference's CNF benchmark driver.

Rebuild of /root/reference/ffjord-pnode/train_tabular.py: MAF-dataset NLL
training with Adam + weight decay, early stopping with staged LR decay
(update_lr, :169-181: lr/10 then lr/100 as validation stalls), val/test NLL,
NFE + wall-clock meters, best-checkpoint save/restore, and a final
brute-force-divergence test evaluation (:418-424). Default recipe matches
the reference's miniboone header (train_tabular.py:5): nhidden 2,
hdim_factor 20, 1 block, softplus, batch 1000, lr 1e-3, rk4 dt 0.25::

    python examples/ffjord_tabular.py --data miniboone --max_iters 2000
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

parser = argparse.ArgumentParser("ffjord-tabular")
parser.add_argument("--data", type=str, default="miniboone",
                    choices=["power", "gas", "hepmass", "miniboone", "bsds300"])
parser.add_argument("--nhidden", type=int, default=2)
parser.add_argument("--hdim_factor", type=int, default=20)
parser.add_argument("--num_blocks", type=int, default=1)
parser.add_argument("--layer_type", type=str, default="concatsquash")
parser.add_argument("--nonlinearity", type=str, default="softplus")
parser.add_argument("--solver", type=str, default="rk4")
parser.add_argument("--step_size", type=float, default=0.25)
parser.add_argument("--time_length", type=float, default=1.0)
parser.add_argument("--batch_size", type=int, default=1000)
parser.add_argument("--test_batch_size", type=int, default=5000)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--weight_decay", type=float, default=1e-6)
parser.add_argument("--max_iters", type=int, default=10000)
parser.add_argument("--val_freq", type=int, default=200)
parser.add_argument("--early_stopping", type=int, default=30)
parser.add_argument("--batch_norm", action="store_true")
parser.add_argument("--rademacher", action="store_true", default=True)
parser.add_argument("--l2int", type=float, default=None)
parser.add_argument("--JFrobint", type=float, default=None)
parser.add_argument("--save", type=str, default="./train_results_ffjord")
parser.add_argument("--resume", type=str, default=None)
parser.add_argument("--evaluate", action="store_true")
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--log_freq", type=int, default=1,
                    help="fetch the device loss every N iters. The reference "
                    "logs per-iter on a local GPU (train_tabular.py:303); on "
                    "the tunneled TPU every device->host fetch costs "
                    "~30-70 ms, so chip runs should amortize it (e.g. 20).")
parser.add_argument("--timeit", type=int, default=0,
                    help="after warmup, time N-iteration windows (5x) and "
                    "report time/iter + MFU from XLA cost analysis, then "
                    "exit. 0 = train normally.")
parser.add_argument("--inner", type=int, default=0,
                    help="scan N training steps inside one dispatch (the KS "
                    "fused-loop protocol): the dataset lives on-device and "
                    "each inner step gathers a FRESH random minibatch; one "
                    "loss fetch per dispatch chain. 0 = one dispatch per "
                    "iteration (the reference's per-iter protocol). "
                    "tools/profile_ffjord.py measured ~4 ms/iter of "
                    "per-dispatch overhead on the tunneled chip at the "
                    "miniboone recipe; --inner amortizes it.")
args = init_flags(parser)

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from pnode_tpu.ffjord import build_model_tabular, standard_normal_logprob
from pnode_tpu.ffjord.datasets import load_tabular
from pnode_tpu.utils import MetricsWriter, RunningAverageMeter, get_logger


def main():
    logger = get_logger(os.path.join(args.save, "logs"), name="ffjord")
    data = load_tabular(args.data)
    if data.synthetic:
        logger.info(
            f"MAF files for {args.data} not found; training on the synthetic "
            f"surrogate (dim {data.dim})"
        )
    D = data.dim

    regs = []
    reg_coeffs = []
    for name in ("l2int", "JFrobint"):
        coef = getattr(args, name)
        if coef is not None:
            regs.append(name)
            reg_coeffs.append(coef)

    hidden = (args.hdim_factor * D,) * args.nhidden
    model = build_model_tabular(
        dim=D,
        num_blocks=args.num_blocks,
        hidden_dims=hidden,
        layer_type=args.layer_type,
        nonlinearity=args.nonlinearity,
        time_length=args.time_length,
        solver=args.solver,
        step_size=args.step_size,
        batch_norm=args.batch_norm,
        rademacher=args.rademacher,
        regularization_fns=regs,
    )

    x_sample = jnp.asarray(data.trn[: args.batch_size])
    params = model.init(jax.random.PRNGKey(args.seed), x_sample)
    if args.resume:
        params = to_jax_tree(load_checkpoint(args.resume)["params"])
        logger.info(f"restored from {args.resume}")

    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    logger.info(f"Number of trainable parameters: {n_params}")

    # staged LR decay driven by validation stalls (update_lr, :169-181)
    lr_scale = jnp.asarray(1.0)
    opt = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(args.lr),
    )
    opt_state = opt.init(params)

    def nll_and_regs(p, x, key, training):
        z, dlp, _ = model.apply(p, x, key=key, training=training)
        logpx = standard_normal_logprob(z)[:, None] - dlp
        loss = -jnp.mean(logpx)
        reg_loss = 0.0
        for layer in model.layers:
            if getattr(layer, "last_regs", None) is not None and reg_coeffs:
                r = jnp.mean(layer.last_regs, axis=0)
                for i, c in enumerate(reg_coeffs):
                    reg_loss = reg_loss + c * r[i]
        return loss + reg_loss, loss

    @jax.jit
    def train_step(p, opt_state, x, key, scale):
        (total, nll), g = jax.value_and_grad(nll_and_regs, has_aux=True)(
            p, x, key, True
        )
        g = jax.tree_util.tree_map(lambda a: a * scale, g)
        updates, opt_state = opt.update(g, opt_state, params=p)
        return optax.apply_updates(p, updates), opt_state, nll

    @jax.jit
    def eval_nll(p, x, key):
        _, nll = nll_and_regs(p, x, key, False)
        return nll

    # scanned training chunk (--inner): the whole train split lives on the
    # device (MAF tabular sets are a few MB) and each scanned step gathers a
    # FRESH random minibatch + a fresh Hutchinson key, so the protocol trains
    # exactly what the per-dispatch loop trains — only the host round-trips
    # are amortized (one dispatch + one loss fetch per `inner` iterations).
    trn_dev = jnp.asarray(data.trn) if args.inner else None
    n_trn = len(data.trn)

    @jax.jit
    def train_chunk(p, s, base_itr, scale):
        def body(carry, it):
            p, s = carry
            kb = jax.random.fold_in(jax.random.PRNGKey(args.seed), it)
            ki, kh = jax.random.split(kb)
            idx = jax.random.randint(ki, (args.batch_size,), 0, n_trn)
            x = trn_dev[idx]
            (_, nll), g = jax.value_and_grad(nll_and_regs, has_aux=True)(
                p, x, kh, True
            )
            g = jax.tree_util.tree_map(lambda a: a * scale, g)
            updates, s = opt.update(g, s, params=p)
            return (optax.apply_updates(p, updates), s), nll
        (p, s), nlls = jax.lax.scan(
            body, (p, s), base_itr + jnp.arange(args.inner)
        )
        return p, s, nlls[-1]

    def full_nll(p, xs, seed=0, bs=None):
        bs = bs or args.test_batch_size
        tot, n = 0.0, 0
        for i in range(0, len(xs) - bs + 1, bs):
            x = jnp.asarray(xs[i:i + bs])
            tot += float(eval_nll(p, x, jax.random.PRNGKey(seed + i))) * len(x)
            n += len(x)
        if n == 0:
            x = jnp.asarray(xs[:bs])
            return float(eval_nll(p, x, jax.random.PRNGKey(seed)))
        return tot / n

    def _nfe_total():
        # ODESolver counts trace-time NFE (solver.py nfe_forward); each CNF
        # layer caches its solvers per (shape, mode) key. The delta across
        # one jit trace IS the per-iteration forward NFE (the reference's
        # NFE-F meter, train_tabular.py:303-339); the discrete adjoint
        # replays every accepted step stage-exactly, so NFE-B/iter equals
        # NFE-F/iter by construction.
        return sum(
            int(ode.nfe_forward)
            for layer in model.layers
            for ode in getattr(getattr(layer, "cnf", layer),
                               "_solvers", {}).values()
        )

    if args.timeit:
        import statistics

        from pnode_tpu.utils.roofline import roofline

        nfe0 = _nfe_total()
        t0 = time.time()
        if args.inner:
            compiled = train_chunk.lower(
                params, opt_state, jnp.zeros((), jnp.int32), lr_scale
            ).compile()
        else:
            compiled = train_step.lower(
                params, opt_state, x_sample, jax.random.PRNGKey(0), lr_scale
            ).compile()
        compile_s = time.time() - t0
        # the scan body (one training iteration) is traced exactly once in
        # either path, so the traced NFE delta already IS the per-iteration
        # count — no division by `inner`.
        nfe_iter = _nfe_total() - nfe0
        state = {"p": params, "s": opt_state}

        def step(i):
            if args.inner:
                state["p"], state["s"], loss = compiled(
                    state["p"], state["s"],
                    jnp.asarray(i * args.inner, jnp.int32), lr_scale,
                )
            else:
                state["p"], state["s"], loss = compiled(
                    state["p"], state["s"], x_sample, jax.random.PRNGKey(i),
                    lr_scale,
                )
            return loss

        per_disp = max(args.inner, 1)
        float(step(0))  # first dispatch + device->host channel warm-up
        rates = []
        for w in range(5):
            t0 = time.time()
            loss = None
            for i in range(args.timeit):
                loss = step(w * args.timeit + i + 1)
            float(loss)  # fetch = the only real sync on the axon backend
            rates.append(args.timeit * per_disp / (time.time() - t0))
            logger.info(f"window {w}: {rates[-1]:.2f} it/s")
        med = statistics.median(rates)
        rf = roofline(compiled, med, work_per_program=per_disp)
        mfu = None if rf["mfu"] is None else round(rf["mfu"], 4)
        logger.info(
            f"TIMEIT {args.data} D={D} batch={args.batch_size} "
            f"inner={args.inner}: "
            f"{med:.2f} it/s ({1e3 / med:.2f} ms/iter) | "
            f"NFE-F/iter {nfe_iter} (NFE-B equal: stage-exact replay) | "
            f"mfu {mfu} hbm_frac {rf['hbm_frac']} "
            f"flops/iter {rf['flops_per_unit']:.3g} | "
            f"compile {compile_s:.1f}s | final train NLL {float(loss):.4f}"
        )
        return None  # timeit mode: no test NLL to report

    writer = MetricsWriter(args.save)
    rng = np.random.default_rng(args.seed)
    time_meter = RunningAverageMeter(0.98)
    loss_meter = RunningAverageMeter(0.98)
    best_val = float("inf")
    n_vals_without_improvement = 0
    ndecs = 0
    ckpt = os.path.join(args.save, "checkpt.ckpt")

    if args.evaluate:
        tst = full_nll(params, data.tst)
        logger.info(f"test NLL {tst:.6f}")
        return tst

    nfe_before_loop = _nfe_total()
    end = time.time()
    for itr in range(1, args.max_iters + 1):
        if args.early_stopping > 0 and n_vals_without_improvement > args.early_stopping:
            break
        idx = rng.integers(0, len(data.trn), args.batch_size)
        x = jnp.asarray(data.trn[idx])
        params, opt_state, loss = train_step(
            params, opt_state, x, jax.random.PRNGKey(itr), lr_scale
        )
        if itr % args.log_freq == 0:
            loss_meter.update(float(loss))
            writer.add_scalar("Train/NLL", float(loss), itr)
        time_meter.update(time.time() - end)
        if itr == 1:
            logger.info(
                f"NFE-F/iter {_nfe_total() - nfe_before_loop} (NFE-B equal: "
                f"the discrete adjoint replays every step stage-exactly)"
            )

        if itr % args.val_freq == 0:
            val = full_nll(params, data.val, bs=args.batch_size)
            writer.add_scalar("Val/NLL", val, itr)
            if val < best_val - 1e-4:
                best_val = val
                n_vals_without_improvement = 0
                save_checkpoint(ckpt, {"params": params, "itr": itr,
                                       "best_val": best_val})
            else:
                n_vals_without_improvement += 1
            # staged decay: lr/10 at 1/3 patience, lr/100 at 2/3
            if ndecs == 0 and n_vals_without_improvement > args.early_stopping // 3:
                lr_scale = jnp.asarray(0.1)
                ndecs = 1
            elif ndecs == 1 and (
                n_vals_without_improvement > args.early_stopping // 3 * 2
            ):
                lr_scale = jnp.asarray(0.01)
                ndecs = 2
            logger.info(
                f"Iter {itr:06d} | Time {time_meter.avg:.3f}s | "
                f"NLL {loss_meter.avg:.4f} | Val NLL {val:.4f} | "
                f"no-improve {n_vals_without_improvement}"
            )
        end = time.time()

    # final: restore best, exact-divergence test NLL (train_tabular.py:418-424)
    if os.path.exists(ckpt):
        params = to_jax_tree(load_checkpoint(ckpt)["params"])
    val = full_nll(params, data.val, bs=args.batch_size)
    tst = full_nll(params, data.tst, bs=args.batch_size)
    logger.info(f"FINAL (Hutchinson) val NLL {val:.6f} | test NLL {tst:.6f}")

    def exact_nll(p, x):
        z, dlp, _ = model.apply(p, x, training=False, exact_div=True)
        return -float(jnp.mean(standard_normal_logprob(z)[:, None] - dlp))

    x = jnp.asarray(data.tst[: min(len(data.tst), 1000)])
    logger.info(f"FINAL exact-divergence test NLL {exact_nll(params, x):.6f}")
    writer.close()
    return tst


if __name__ == "__main__":
    final = main()
    if final is not None:
        print(f"final test NLL {final:.6f}")
