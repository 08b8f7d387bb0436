"""Image CNF training: ODENVP / MultiscaleParallelCNF on MNIST/CIFAR-10.

Driver for the image half of the FFJORD stack (the reference vendors the
models — /root/reference/ffjord-pnode/lib/odenvp.py:8-200 and
lib/multiscale_parallel.py:8-186 — but not the original train_cnf.py; this
follows that script's protocol): uniform dequantization ``(255 x + u)/256``,
bits/dim objective, Adam, per-iter NFE/loss telemetry, best-checkpoint +
``--hotstart``, and a sample grid written per epoch (the multiscale
INVERSE path exercised in training).

Dataset pickles are loaded from --data_dir when present; otherwise a
synthetic image surrogate keeps the pipeline runnable offline::

    python examples/ffjord_image.py --data mnist --model odenvp --epochs 2
"""

from __future__ import annotations

import argparse
import math
import os
import pickle
import sys
import time

sys.path.insert(0, ".")
from examples.common import init_flags  # noqa: E402

parser = argparse.ArgumentParser("ffjord-image")
parser.add_argument("--data", choices=["mnist", "cifar10"], default="mnist")
parser.add_argument("--model", choices=["odenvp", "multiscale-parallel"],
                    default="odenvp")
parser.add_argument("--n_scales", type=int, default=2)
parser.add_argument("--n_blocks", type=int, default=1)
parser.add_argument("--hidden_dims", type=str, default="32,32")
parser.add_argument("--layer_type", type=str, default="concat")
parser.add_argument("--solver", type=str, default="rk4")
parser.add_argument("--step_size", type=float, default=0.25)
parser.add_argument("--time_length", type=float, default=0.5)
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--batch_size", type=int, default=64)
parser.add_argument("--iters_per_epoch", type=int, default=0)
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--data_dir", type=str, default="./data")
parser.add_argument("--train_dir", type=str, default="./train_results_ffjord_img")
parser.add_argument("--n_sample", type=int, default=16)
parser.add_argument("--hotstart", action="store_true")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--cpu", action="store_true")
args = init_flags(parser)

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from pnode_tpu.ffjord.odenvp import ODENVP, MultiscaleParallelCNF
from pnode_tpu.utils import MetricsWriter, RunningAverageMeter, makedirs

SHAPES = {"mnist": (28, 28, 1), "cifar10": (32, 32, 3)}


def load_mnist_idx(data_dir):
    """Standard MNIST IDX format (train-images-idx3-ubyte[.gz]) — what the
    reference's torchvision download leaves on disk."""
    import gzip
    import struct

    for fname in ("train-images-idx3-ubyte", "train-images.idx3-ubyte"):
        for opener, suff in ((gzip.open, ".gz"), (open, "")):
            path = os.path.join(data_dir, fname + suff)
            if not os.path.exists(path):
                continue
            with opener(path, "rb") as f:
                magic, n, h, w = struct.unpack(">IIII", f.read(16))
                if magic != 0x803:
                    raise ValueError(f"bad IDX magic {magic:#x} in {path}")
                x = np.frombuffer(f.read(n * h * w), np.uint8)
            return x.reshape(n, h, w, 1)
    raise FileNotFoundError("no MNIST IDX file")


def load_images(name, data_dir):
    """uint8 images in [0, 255]; synthetic surrogate when files absent."""
    try:
        if name == "cifar10":
            xs = []
            for i in range(1, 6):
                with open(os.path.join(data_dir, "cifar-10-batches-py",
                                       f"data_batch_{i}"), "rb") as f:
                    d = pickle.load(f, encoding="bytes")
                xs.append(np.asarray(d[b"data"]))
            x = np.concatenate(xs).reshape(-1, 3, 32, 32)
            return x.transpose(0, 2, 3, 1).astype(np.uint8), False
        try:
            return load_mnist_idx(data_dir), False
        except FileNotFoundError:
            pass
        with open(os.path.join(data_dir, "mnist.pkl"), "rb") as f:
            x = pickle.load(f)["train_x"]
        return x.reshape(-1, 28, 28, 1).astype(np.uint8), False
    except (FileNotFoundError, OSError):
        h, w, c = SHAPES[name]
        rng = np.random.default_rng(0)
        n = 4096
        # smooth blobs: low-frequency random fields, quantized to uint8
        yy, xx = np.mgrid[0:h, 0:w] / max(h, w)
        x = np.zeros((n, h, w, c), np.float32)
        cx = rng.random((n, 1, 1, 1))
        cy = rng.random((n, 1, 1, 1))
        r = 0.08 + 0.12 * rng.random((n, 1, 1, 1))
        d2 = (xx[None, :, :, None] - cx) ** 2 + (yy[None, :, :, None] - cy) ** 2
        x = np.exp(-d2 / (2 * r**2)).astype(np.float32)
        x = np.broadcast_to(x, (n, h, w, c))
        return (255 * x).astype(np.uint8), True


def main():
    makedirs(args.train_dir)
    x_all, synthetic = load_images(args.data, args.data_dir)
    if synthetic:
        print("image files not found; using the synthetic surrogate")
    shape = SHAPES[args.data]
    D = int(np.prod(shape))
    hidden = tuple(int(s) for s in args.hidden_dims.split(","))

    if args.model == "odenvp":
        model = ODENVP(
            shape, n_scales=args.n_scales, n_blocks=args.n_blocks,
            hidden_dims=hidden, layer_type=args.layer_type,
            solver=args.solver, step_size=args.step_size,
            time_length=args.time_length,
        )
    else:
        model = MultiscaleParallelCNF(
            shape, n_blocks=args.n_blocks, intermediate_dims=hidden,
            solver=args.solver, step_size=args.step_size,
            time_length=args.time_length, alpha=0.05,
        )

    key = jax.random.PRNGKey(args.seed)
    key, sub = jax.random.split(key)
    x0 = jnp.asarray(x_all[: args.batch_size], jnp.float32) / 256.0
    params = model.init(sub, x0)
    n_params = sum(int(a.size) for a in jax.tree_util.tree_leaves(params))
    print(f"{args.model} on {args.data}{shape}: {n_params/1e6:.3f}M params")

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s, key, batch_u8):
        key, kd, kh = jax.random.split(key, 3)
        # uniform dequantization: (255 x + u) / 256, x in [0, 1]
        x = (batch_u8.astype(jnp.float32)
             + jax.random.uniform(kd, batch_u8.shape)) / 256.0

        def loss_fn(pp):
            logpx, _ = model.log_prob(pp, x, key=kh, training=True)
            # bits/dim: -log2 p(x-scaled); +8 bits for the 1/256 scaling
            bpd = -jnp.mean(logpx) / (D * math.log(2)) + 8.0
            return bpd

        bpd, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, bpd, key

    iters = args.iters_per_epoch or max(1, len(x_all) // args.batch_size)
    writer = MetricsWriter(args.train_dir)
    meter = RunningAverageMeter(0.95)
    best = float("inf")
    ckpt_path = os.path.join(args.train_dir, "ckpt.pkl")
    if args.hotstart and os.path.exists(ckpt_path):
        with open(ckpt_path, "rb") as f:
            saved = pickle.load(f)
        params, opt_state, best = saved["params"], saved["opt"], saved["best"]
        print(f"hotstart: resumed (best {best:.4f})")

    rng = np.random.default_rng(args.seed)
    step = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        perm = rng.permutation(len(x_all))
        bpds = []
        for it in range(iters):
            idx = perm[it * args.batch_size:(it + 1) * args.batch_size]
            if len(idx) < args.batch_size:
                break
            params, opt_state, bpd, key = train_step(
                params, opt_state, key, jnp.asarray(x_all[idx])
            )
            bpds.append(bpd)
            step += 1
        bpds = np.asarray(jax.device_get(jnp.stack(bpds)))
        for b in bpds:
            meter.update(float(b))
        epoch_s = time.time() - t0
        writer.add_scalar("Train/bits_per_dim", float(bpds.mean()), epoch)
        print(f"Epoch {epoch:03d} | {epoch_s:.1f}s | "
              f"bits/dim {bpds.mean():.4f} (ema {meter.avg:.4f})")
        if float(bpds.mean()) < best:
            best = float(bpds.mean())
            with open(ckpt_path, "wb") as f:
                pickle.dump({"params": params, "opt": opt_state,
                             "best": best, "args": vars(args)}, f)
        # sample grid through the inverse path
        key, sub = jax.random.split(key)
        samples = model.sample(params, sub, args.n_sample)
        np.save(os.path.join(args.train_dir, f"samples_ep{epoch:03d}.npy"),
                np.asarray(jax.device_get(samples)))
    writer.close()
    return best


if __name__ == "__main__":
    main()
