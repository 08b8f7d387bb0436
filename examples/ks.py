"""KS (Kuramoto-Sivashinsky) SINODE training — the flagship stiff-PDE workload.

Rebuild of /root/reference/examples-sinode/KS/KS.py: learned chaotic-PDE
dynamics on a 64-point L=22 grid, model choices mlp/snode/imex (KS.py:38-43),
windowed time minibatches (DistFuncDataset, KS.py:226-255), Adam +
reduce-on-plateau, best-val checkpointing with --hotstart (KS.py:570-591),
and flag-selectable numerics::

    python examples/ks.py --pnode_model imex --linear_solver hpddm \
        --fixed_jacobian -ts_arkimex_type ars122 -snes_type ksponly

Data is self-generated with the spectral ETDRK4 generator (the reference
loads a non-vendored pickle, KS.py:124).
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

parser = argparse.ArgumentParser("KS")
parser.add_argument("--pnode_model", type=str,
                    choices=["mlp", "snode", "imex"], default="snode")
parser.add_argument("--pnode_method", type=str, default="cn")
parser.add_argument("--normalize", type=str,
                    choices=["minmax", "mean"], default=None)
parser.add_argument("--step_size", type=float, default=0.2)
parser.add_argument("--data_size", type=int, default=2000)
parser.add_argument("--batch_size", type=int, default=128)
parser.add_argument("--time_window_size", type=int, default=1)
parser.add_argument("--time_window_endpoint", action="store_true")
parser.add_argument("--max_epochs", type=int, default=100)
parser.add_argument("--validate_freq", type=int, default=1)
parser.add_argument("--implicit_form", action="store_true")
parser.add_argument("--double_prec", action="store_true")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--train_dir", type=str, default="./train_results_ks")
parser.add_argument("--hotstart", action="store_true")
parser.add_argument("--lr", type=float, default=5e-3)
parser.add_argument("--linear_solver", type=str,
                    choices=["petsc", "hpddm", "torch"], default="petsc")
parser.add_argument("--fixed_jacobian", action="store_true")
parser.add_argument("--use_pallas", action="store_true",
                    help="fused Pallas MLP for the explicit dynamics (TPU)")
parser.add_argument("--fused_loop", action="store_true",
                    help="run each training epoch as ONE fused Pallas "
                         "kernel launch (ops/fused_train_loop.py): forward "
                         "ARK step + stage-exact reverse + Adam in-kernel, "
                         "weights/moments VMEM-resident. Requires the "
                         "fused-kernel gate (imex + ksponly + "
                         "fixed_jacobian, time_window_size 1, f32, TPU)")
parser.add_argument("--node", action="store_true",
                    help="autodiff-through-solver baseline (the reference's "
                         "KS_node torchdiffeq comparison)")
parser.add_argument("--dp", type=int, default=0,
                    help="data-parallel training over N devices (-1 = all): "
                         "batch axis sharded over a jax.sharding Mesh, the "
                         "IMEX solve + discrete adjoint local per device, "
                         "one gradient pmean per step "
                         "(pnode_tpu.parallel). N must divide --batch_size")
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
from pnode_tpu.data import WindowedLoader, generate_ks_data
from pnode_tpu.models import KSFuncEX, KSFuncIM, KSMLPFunc, KSSnodeFunc
from pnode_tpu.utils import MetricsWriter, RunningAverageMeter

dtype = jnp.float64 if args.double_prec else jnp.float32
NX, L = 64, 22.0


def window_starts(n, W):
    return np.arange(n - W)


def make_batches(u, rng, W, batch_size, endpoint):
    """Windowed minibatches: y0 = u[i], targets u[i+1..i+W] (or endpoint)."""
    starts = window_starts(len(u), W)
    rng.shuffle(starts)
    n_batches = len(starts) // batch_size
    for b in range(n_batches):
        s = starts[b * batch_size:(b + 1) * batch_size]
        y0 = u[s]
        if endpoint:
            tgt = u[s + W][:, None]
        else:
            tgt = np.stack([u[s + 1 + j] for j in range(W)], axis=1)
        yield jnp.asarray(y0, dtype), jnp.asarray(tgt, dtype)


def main():
    rng = np.random.default_rng(args.seed)
    u_all, dt_data = generate_ks_data(
        nx=NX, L=L, n_samples=args.data_size, dt_data=args.step_size,
        cache_dir=os.path.join(args.train_dir, "data"),
    )
    if args.normalize == "minmax":
        lo, hi = u_all.min(), u_all.max()
        u_all = 2 * (u_all - lo) / (hi - lo) - 1
    elif args.normalize == "mean":
        u_all = (u_all - u_all.mean()) / u_all.std()
    n_train = int(0.8 * len(u_all))
    u_train, u_val = u_all[:n_train], u_all[n_train:]
    print(f"KS data: train {u_train.shape}, val {u_val.shape}, dt {dt_data}")

    W = args.time_window_size
    if args.time_window_endpoint:
        t_out = np.asarray([0.0, W * dt_data])
    else:
        t_out = np.arange(W + 1) * dt_data

    key = jax.random.PRNGKey(args.seed)
    y_tmpl = jnp.zeros((args.batch_size, NX), dtype)
    ode = ODESolver()
    if args.pnode_model == "imex":
        im = KSFuncIM(nx=NX, L=L)
        ex = KSFuncEX(nx=NX, use_pallas=args.use_pallas)
        vim = to_jax_tree(im.init(key, 0.0, y_tmpl), dtype)
        vex = to_jax_tree(ex.init(key, 0.0, y_tmpl), dtype)
        params = (vim, vex)
        if args.node:
            # autodiff baseline integrates the combined rhs explicitly
            # (differentiating through implicit Newton solves is the
            # discrete adjoint's job, not plain autodiff's)
            def combined(t, y, p):
                pim, pex = p
                return im.apply(pim, t, y) + ex.apply(pex, t, y)

            ode.setupTS(y_tmpl, (combined, params),
                        step_size=args.step_size / 100, method="dopri5",
                        enable_adjoint=False)
        else:
            ode.setupTS(
                y_tmpl, FlaxFunc(im, vim), step_size=args.step_size,
                method="imex", imex_form=True, implicit_form=True,
                func2=FlaxFunc(ex, vex), linear_solver=args.linear_solver,
                fixed_jacobian=args.fixed_jacobian,
                batch_size=args.batch_size,
            )
    else:
        mod = (
            KSSnodeFunc(nx=NX, L=L) if args.pnode_model == "snode"
            else KSMLPFunc(nx=NX)
        )
        params = to_jax_tree(mod.init(key, 0.0, y_tmpl), dtype)
        ode.setupTS(
            y_tmpl, FlaxFunc(mod, params), step_size=args.step_size,
            method=args.pnode_method,
            implicit_form=args.implicit_form
            or args.pnode_method in ("cn", "beuler"),
            linear_solver=args.linear_solver, fixed_jacobian=args.fixed_jacobian,
            batch_size=args.batch_size,
        )

    # plateau LR decay on the per-EPOCH validation loss, the reference's
    # torch.optim.lr_scheduler.ReduceLROnPlateau semantics (KS.py steps the
    # scheduler once per validation). NOTE: optax's reduce_on_plateau as a
    # per-step chained transform halves the LR after `patience` consecutive
    # non-improving MINIBATCH losses — on noisy one-step-prediction batches
    # that collapsed the LR within the first epochs and froze training
    # (found on hardware: snode plateaued at its initial loss; plain Adam
    # reached 2e-3).
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    opt_state = opt.init(params)
    lr_now, lr_best, lr_bad = args.lr, float("inf"), 0

    def plateau_epoch(vl):
        """Halve the LR after 10 non-improving validation epochs."""
        nonlocal lr_now, lr_best, lr_bad
        if vl < lr_best * (1.0 - 1e-4):
            lr_best, lr_bad = vl, 0
            return
        lr_bad += 1
        if lr_bad > 10:
            lr_now, lr_bad = lr_now * 0.5, 0
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr_now, jnp.float32
            )
            print(f"plateau: lr -> {lr_now:.2e}")

    start_epoch, best_val = 0, float("inf")
    ckpt_path = os.path.join(args.train_dir, f"best_{args.pnode_model}.ckpt")
    if args.hotstart and os.path.exists(ckpt_path):
        ck = load_checkpoint(ckpt_path)
        if ck.get("normalize") != args.normalize:
            raise RuntimeError(
                "checkpoint normalization mismatch (the reference guards the "
                "same way, ROBER.py:411-416)"
            )
        params = to_jax_tree(ck["params"], dtype)
        start_epoch = ck["epoch"] + 1
        best_val = ck["best_val"]
        print(f"hotstart from epoch {start_epoch} (best val {best_val:.6e})")

    # --fused_loop: the whole epoch as one Pallas kernel launch. The
    # kernel owns the explicit-part weights + Adam moments in VMEM for
    # the launch; params are rebuilt into the flax tree at epoch end for
    # validation/checkpointing (asserted equal to this generic loop in
    # tests/test_fused_train_loop.py). LR rides an SMEM scalar, so the
    # plateau schedule never recompiles.
    fused_ctx = None
    if args.fused_loop:
        from pnode_tpu.ops.fused_train_loop import (
            fused_train_loop,
            fused_train_loop_fits,
        )

        fused = None
        if (args.pnode_model == "imex" and not args.node and W == 1
                and dtype == jnp.float32):
            stp = ode._stepper.prepare(
                0.0, y_tmpl, params, dt0=jnp.asarray(args.step_size, dtype))
            fused = stp._fused_reverse_args(
                params, dt=jnp.asarray(args.step_size, dtype))
        if fused is None:
            raise SystemExit(
                "--fused_loop requires the fused-kernel gate: "
                "--pnode_model imex --fixed_jacobian -snes_type ksponly "
                "(frozen linear implicit part), --time_window_size 1, "
                "f32, TPU backend")
        spec, J_blk, inv_op, _itp, wdt, stiff_prec = fused
        dims = [int(w.shape[1]) for w in spec["Ws"]]
        if wdt != "f32" or not fused_train_loop_fits(
                args.batch_size, NX, dims):
            raise SystemExit("--fused_loop: configuration does not fit "
                             "VMEM (weights + Adam moments resident)")
        tbl = (stp._aI, stp._aE, stp._bI, stp._bE)

        @jax.jit
        def fused_epoch(y_stack, tgt_stack, Ws, bs, m, v, t0, lr):
            return fused_train_loop(
                tbl, float(args.step_size), y_stack, tgt_stack, J_blk,
                inv_op, Ws, bs, m, v, t0, activation=spec["activation"],
                sign=spec["sign"], lr=lr, stiff_prec=stiff_prec)

        zW = [jnp.zeros_like(w) for w in spec["Ws"]]
        zb = [jnp.zeros_like(b) for b in spec["bs"]]
        fused_ctx = {
            "run": fused_epoch, "rebuild": spec["rebuild"],
            "state": (list(spec["Ws"]), list(spec["bs"]),
                      (zW, zb), ([jnp.zeros_like(w) for w in zW],
                                 [jnp.zeros_like(b) for b in zb])),
            "t": 0,
        }

    def data_loss(pp, data):
        y0, tgt = data
        if args.node:
            pred, _ = ode.solve(y0, t_out, params=pp, with_adjoint=False)
        else:
            pred = ode.odeint_adjoint(y0, t_out, params=pp)
        # pred[0] is y0 itself; targets align with pred[1:]
        return jnp.mean((jnp.swapaxes(pred[1:], 0, 1) - tgt) ** 2)

    # --dp: batch-sharded training over a device mesh — the solve stays
    # device-local (the reference's COMM_SELF semantics), one pmean pair
    # reduces loss/grads. Per-shard solves need the solver's internal
    # batch bookkeeping to match the LOCAL batch, which it does: the
    # stepper is shape-polymorphic over the leading axis.
    dp_mesh = None
    if args.dp:
        if args.fused_loop:
            raise SystemExit("--dp composes with the scanned training path; "
                             "--fused_loop is a single-chip VMEM-resident "
                             "kernel — drop one of the two flags")
        from pnode_tpu.parallel import (
            dp_value_and_grad, make_mesh, replicate, shard_batch,
        )
        n_dev = args.dp if args.dp > 0 else len(jax.devices())
        if args.batch_size % n_dev:
            raise SystemExit(f"--dp {n_dev} must divide --batch_size "
                             f"{args.batch_size}")
        dp_mesh = make_mesh(n_dev)
        print(f"data-parallel: {n_dev} device(s), "
              f"{args.batch_size // n_dev} samples/device")
        vg = dp_value_and_grad(data_loss, dp_mesh)
        params = replicate(params, dp_mesh)
        opt_state = replicate(opt_state, dp_mesh)
    else:
        vg = jax.value_and_grad(data_loss)

    @jax.jit
    def train_step(p, opt_state, y0, tgt):
        loss, g = vg(p, (y0, tgt))
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    @jax.jit
    def val_loss_fn(p, y0, tgt):
        pred, _ = ode.solve(y0, t_out, params=p, with_adjoint=False)
        return jnp.mean((jnp.swapaxes(pred[1:], 0, 1) - tgt) ** 2)

    writer = MetricsWriter(args.train_dir)
    loss_meter = RunningAverageMeter(0.97)
    step = 0
    # native prefetching windowed loader (csrc/windowed_loader.cpp); batch
    # assembly overlaps device compute, numpy fallback off-toolchain
    train_loader = WindowedLoader(
        u_train, window=W, batch=args.batch_size, seed=args.seed,
        endpoint_only=args.time_window_endpoint,
    )
    for epoch in range(start_epoch, args.max_epochs):
        t0 = time.time()
        # keep losses on-device during the epoch: a float() per iteration
        # costs one host round-trip each (on the tunneled chip that
        # dominated the epoch) — sync once at epoch end
        epoch_losses = []
        if fused_ctx is not None:
            ys, tgts = [], []
            for y0_np, tgt_np in train_loader:
                ys.append(np.asarray(y0_np))
                tgts.append(np.asarray(tgt_np)[:, 0])
            y_stack = jnp.asarray(np.stack(ys), dtype)
            tgt_stack = jnp.asarray(np.stack(tgts), dtype)
            Ws, bs, m, v = fused_ctx["state"]
            Ws, bs, m, v, losses = fused_ctx["run"](
                y_stack, tgt_stack, Ws, bs, m, v, fused_ctx["t"],
                jnp.asarray(lr_now, jnp.float32))
            fused_ctx["state"] = (Ws, bs, m, v)
            fused_ctx["t"] += int(y_stack.shape[0])
            params = (vim, fused_ctx["rebuild"](Ws, bs))
            epoch_losses = list(losses)
            step += int(y_stack.shape[0])
        else:
            for y0_np, tgt_np in train_loader:
                y0 = jnp.asarray(y0_np, dtype)
                tgt = jnp.asarray(tgt_np, dtype)
                if dp_mesh is not None:
                    y0, tgt = shard_batch((y0, tgt), dp_mesh)
                params, opt_state, loss = train_step(
                    params, opt_state, y0, tgt)
                epoch_losses.append(loss)
                step += 1
        for i, lv in enumerate(np.asarray(
                jax.device_get(jnp.stack(epoch_losses)))):
            loss_meter.update(float(lv))
            writer.add_scalar(
                "Train/Loss", float(lv), step - len(epoch_losses) + i
            )
        if epoch % args.validate_freq == 0:
            # single full-validation batch, like the reference's
            # len(val)-window loader (KS.py:200-210)
            val_bs = len(u_val) - W
            vlosses = [
                float(val_loss_fn(params, y0, tgt))
                for y0, tgt in make_batches(
                    u_val, np.random.default_rng(0), W, val_bs,
                    args.time_window_endpoint,
                )
            ]
            vl = float(np.mean(vlosses)) if vlosses else float("nan")
            plateau_epoch(vl)
            writer.add_scalar("Val/Loss", vl, step)
            print(
                f"Epoch {epoch:04d} | Time {time.time()-t0:.2f}s | "
                f"Train {loss_meter.avg:.6e} | Val {vl:.6e} | "
                f"NFE-F {ode.nfe_forward}"
            )
            if vl < best_val:
                best_val = vl
                save_checkpoint(ckpt_path, {
                    "epoch": epoch, "params": params, "best_val": best_val,
                    "normalize": args.normalize,
                })
    writer.close()
    return best_val


if __name__ == "__main__":
    bv = main()
    print(f"best val loss {bv:.6e}")
