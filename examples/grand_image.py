"""GRAND image classification — pixel-grid graph diffusion.

Rebuild of /root/reference/examples-sinode/grand/src/GNN_image.py +
run_image.py: raw pixel intensities diffuse on the 4-/8-neighbor grid
graph (data_image.py edge_index_calc), then one Linear over the flattened
diffused image decodes class logits. Trains on MNIST when the raw IDX
files are present in ``--data_dir`` (train-images-idx3-ubyte etc.,
optionally .gz), a quadrant-blob synthetic surrogate offline::

    python examples/grand_image.py --epochs 5 --batch_size 256
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys
import time

sys.path.insert(0, ".")
from examples.common import init_flags  # noqa: E402

parser = argparse.ArgumentParser("grand-image")
parser.add_argument("--data_dir", type=str, default="./data/mnist")
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--batch_size", type=int, default=256)
parser.add_argument("--train_size", type=int, default=8192,
                    help="cap on training images (the reference trains "
                         "image GNNs on subsets)")
parser.add_argument("--time", type=float, default=1.0)
parser.add_argument("--step_size", type=float, default=0.25)
parser.add_argument("--method", type=str, default="rk4")
parser.add_argument("--diags", action="store_true",
                    help="8-neighbor grid (reference --diags)")
parser.add_argument("--lr", type=float, default=0.01)
parser.add_argument("--input_dropout", type=float, default=0.0)
parser.add_argument("--dropout", type=float, default=0.0)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--cpu", action="store_true")
args = init_flags(parser)

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from pnode_tpu.models.grand_image import GRANDImage  # noqa: E402


def _read_idx(path):
    """IDX format: \\x00\\x00 <dtype> <ndim>, then ndim big-endian
    uint32 dims, then the uint8 payload."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        raw = f.read()
    ndim = raw[3]
    dims = [int.from_bytes(raw[4 + 4 * i: 8 + 4 * i], "big")
            for i in range(ndim)]
    return np.frombuffer(raw, np.uint8,
                         offset=4 + 4 * ndim).reshape(dims)


def load_mnist(data_dir):
    def find(stem):
        for suf in ("", ".gz"):
            p = os.path.join(data_dir, stem + suf)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(stem)

    xtr = _read_idx(find("train-images-idx3-ubyte")).astype(np.float32)
    ytr = _read_idx(find("train-labels-idx1-ubyte")).astype(np.int32)
    xte = _read_idx(find("t10k-images-idx3-ubyte")).astype(np.float32)
    yte = _read_idx(find("t10k-labels-idx1-ubyte")).astype(np.int32)
    return (xtr[..., None] / 255.0, ytr, xte[..., None] / 255.0, yte,
            False)


def synthetic(n, H, W, n_cls, seed):
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, n_cls, size=n)
    xs = np.zeros((n, H, W, 1), np.float32)
    qh, qw = H // 2, W // 2
    for i, c in enumerate(ys):
        oy, ox = (c // 2) * qh, (c % 2) * qw
        xs[i, oy + 2: oy + qh - 2, ox + 2: ox + qw - 2, 0] = 1.0
    xs += rng.normal(scale=0.2, size=xs.shape).astype(np.float32)
    return xs, ys.astype(np.int32)


def main():
    try:
        x_tr, y_tr, x_te, y_te, syn = load_mnist(args.data_dir)
        n_cls, H, W = 10, x_tr.shape[1], x_tr.shape[2]
    except FileNotFoundError:
        print("MNIST files not found; using the quadrant-blob surrogate")
        H = W = 16
        n_cls = 4
        x_tr, y_tr = synthetic(4096, H, W, n_cls, args.seed)
        x_te, y_te = synthetic(1024, H, W, n_cls, args.seed + 1)
        syn = True
    x_tr, y_tr = x_tr[: args.train_size], y_tr[: args.train_size]
    print(f"train {x_tr.shape} test {x_te.shape} "
          f"({'synthetic' if syn else 'MNIST'})")

    model = GRANDImage(H, W, n_cls, T=args.time, step_size=args.step_size,
                       method=args.method, diags=args.diags,
                       input_dropout=args.input_dropout,
                       dropout=args.dropout)
    B = args.batch_size
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(x_tr[:B]))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, s, xb, yb, key):
        def loss(pp):
            logits = model.apply(pp, xb, training=True, rng=key)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb))

        l, g = jax.value_and_grad(loss)(p)
        u, s2 = opt.update(g, s)
        return optax.apply_updates(p, u), s2, l

    @jax.jit
    def eval_acc(p, xb, yb):
        logits = model.apply(p, xb, training=False)
        return jnp.mean((jnp.argmax(logits, -1) == yb).astype(jnp.float32))

    n = (len(x_tr) // B) * B
    key = jax.random.PRNGKey(args.seed + 7)
    for epoch in range(args.epochs):
        t0 = time.time()
        perm = np.random.default_rng(epoch).permutation(len(x_tr))[:n]
        tot = 0.0
        for i in range(0, n, B):
            key, k = jax.random.split(key)
            idx = perm[i: i + B]
            params, opt_state, l = train_step(
                params, opt_state, jnp.asarray(x_tr[idx]),
                jnp.asarray(y_tr[idx]), k)
            tot += float(l)
        accs = [float(eval_acc(params, jnp.asarray(x_te[i: i + B]),
                               jnp.asarray(y_te[i: i + B])))
                for i in range(0, min(len(x_te), 4 * B), B)]
        print(f"epoch {epoch:03d} | loss {tot / (n // B):.4f} | "
              f"test acc {np.mean(accs):.4f} | {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
