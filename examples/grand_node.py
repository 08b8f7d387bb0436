"""GRAND node classification — graph neural diffusion training.

Rebuild of /root/reference/examples-sinode/grand/src/grand.py (the driver
wired for ``--block pnode``, model_configurations.py:38-39): encoder ->
GRAND diffusion ODE -> decoder on a node-classification task, Adam with
weight decay, early stopping on validation accuracy, the CSV Recorder for
sweep aggregation (recorder.py:5-38), and the IMEX identity-diffusion option
(block_pnode.py ODEFuncIM)::

    python examples/grand_node.py --function transformer --block imex
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
from examples.common import init_flags  # noqa: E402

parser = argparse.ArgumentParser("grand")
parser.add_argument("--dataset", type=str, default="synthetic")
parser.add_argument("--data_dir", type=str, default="./data/planetoid")
parser.add_argument("--function", type=str, default="laplacian",
                    choices=["laplacian", "transformer", "gat", "hbnode",
                             "cgnn"])
parser.add_argument("--cgnn_alpha", type=float, default=1.0,
                    help="cgnn: per-node alpha_train init (CGNN.py)")
parser.add_argument("--block", type=str, default="pnode",
                    choices=["pnode", "imex", "hard_att", "heavyball",
                             "rewire_att"])
parser.add_argument("--rw_addD", type=float, default=0.2,
                    help="block=rewire_att: keep ~(1+rw_addD)x the base "
                    "edge count from the candidate set each forward "
                    "(reference block_transformer_rewiring.py threshold "
                    "target)")
parser.add_argument("--rewire_candidates", type=str, default="two_hop",
                    choices=["two_hop", "random"],
                    help="block=rewire_att: static candidate edge pool "
                    "(base + 2-hop, or base + random extras)")
parser.add_argument("--rewire_knn", type=int, default=0,
                    help="every N epochs, rebuild the graph as the "
                    "feature-kNN graph (GNN_KNN.py rewire_KNN_epoch; "
                    "0 = off). Static N*k edge count; each rewiring "
                    "re-jits the step (shapes unchanged)")
parser.add_argument("--knn_k", type=int, default=16,
                    help="kNN degree for --rewire_knn "
                    "(reference --rewire_KNN_k)")
parser.add_argument("--knn_t", type=str, default="T0",
                    choices=["raw", "T0", "TN"],
                    help="features the kNN graph is built on: raw inputs, "
                    "encoder output, or post-diffusion state "
                    "(graph_rewiring.py apply_KNN)")
parser.add_argument("--att_samp_pct", type=float, default=1.0,
                    help="hard_att block: fraction of edges kept per "
                         "training solve (quantile threshold on the "
                         "head-mean attention)")
parser.add_argument("--use_flux", action="store_true",
                    help="hard_att block: weight the sampling score by "
                         "||h_src - h_dst||")
parser.add_argument("--attention_norm_idx", type=int, default=0,
                    choices=[0, 1])
parser.add_argument("--hidden_dim", type=int, default=64)
parser.add_argument("--heads", type=int, default=4)
parser.add_argument("--time", type=float, default=3.0)
parser.add_argument("--step_size", type=float, default=0.5)
parser.add_argument("--method", type=str, default="dopri5")
parser.add_argument("--lr", type=float, default=0.01)
parser.add_argument("--decay", type=float, default=5e-4)
parser.add_argument("--epochs", type=int, default=100)
parser.add_argument("--patience", type=int, default=30)
parser.add_argument("--input_dropout", type=float, default=0.5)
parser.add_argument("--dropout", type=float, default=0.5)
parser.add_argument("--early_stop_int", action="store_true",
                    help="evaluate at intermediate integration times and "
                         "report the best (the reference's early-stop-solver "
                         "mode, grand/src/early_stop_solver.py)")
parser.add_argument("--rewiring", type=str, default="none",
                    choices=["none", "two_hop", "gdc"],
                    help="graph rewiring (ref graph_rewiring.py)")
parser.add_argument("--gdc_alpha", type=float, default=0.05)
parser.add_argument("--gdc_k", type=int, default=64)
parser.add_argument("--beltrami", action="store_true",
                    help="positional-encoding (beltrami) mode")
parser.add_argument("--pos_enc_dim", type=int, default=16)
parser.add_argument("--pos_enc_hidden", type=int, default=16)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--split", type=int, default=0,
                    help="heterophilic datasets: which of the 10 "
                         "public Geom-GCN splits to use")
parser.add_argument("--train_dir", type=str, default="./train_results_grand")
parser.add_argument("--cpu", action="store_true")
args = init_flags(parser)

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from pnode_tpu.models.grand import (
    GRANDModel,
    Graph,
    gdc_rewiring,
    gcn_norm_adj,
    get_rw_adj,
    knn_graph,
    laplacian_positional_encoding,
    load_heterophilic,
    load_planetoid,
    synthetic_sbm,
    two_hop,
)

HETEROPHILIC = ("cornell", "texas", "wisconsin", "chameleon", "squirrel",
                "film", "actor")
from pnode_tpu.utils import Recorder, makedirs


def main():
    if args.dataset != "synthetic":
        try:
            if args.dataset in HETEROPHILIC:
                data = load_heterophilic(args.data_dir, args.dataset,
                                         split=args.split)
                print(f"loaded heterophilic {args.dataset!r}: "
                      f"{data['x'].shape[0]} nodes")
            else:
                data = load_planetoid(args.data_dir, args.dataset)
                print(f"loaded planetoid {args.dataset!r}: "
                      f"{data['x'].shape[0]} nodes")
        except (FileNotFoundError, OSError):
            print(f"dataset {args.dataset!r} files not found in "
                  f"{args.data_dir}; using the SBM surrogate")
            data = synthetic_sbm(seed=args.seed)
    else:
        data = synthetic_sbm(seed=args.seed)
    n = len(data["y"])
    edge_index = data["edge_index"]
    if args.rewiring == "two_hop":
        edge_index = two_hop(edge_index, n)
        print(f"two-hop rewiring: {data['edge_index'].shape[1]} -> "
              f"{edge_index.shape[1]} edges")
    if args.rewiring == "gdc":
        edge_index, ew = gdc_rewiring(edge_index, n, alpha=args.gdc_alpha,
                                      k=args.gdc_k)
        print(f"gdc rewiring: {data['edge_index'].shape[1]} -> "
              f"{edge_index.shape[1]} edges")
        graph = Graph(jnp.asarray(edge_index), jnp.asarray(ew), n)
    elif args.function == "cgnn":
        # the CGNN baseline diffuses on the SYM-normalized adjacency
        # (CGNN.py:295 gcn_norm_fill_val), not GRAND's rw normalization
        graph = gcn_norm_adj(edge_index, n, self_loop_weight=1.0)
    else:
        graph = get_rw_adj(edge_index, n, self_loop_weight=1.0)
    pos_enc = None
    if args.beltrami:
        pos_enc = jnp.asarray(laplacian_positional_encoding(
            data["edge_index"], n, args.pos_enc_dim))
    n_classes = int(data["y"].max()) + 1
    print(f"graph: {n} nodes, {graph.edge_index.shape[1]} edges, "
          f"{n_classes} classes")

    model = GRANDModel(
        graph, data["x"].shape[1], args.hidden_dim, n_classes,
        function=args.function, block=args.block, T=args.time,
        step_size=args.step_size, method=args.method, heads=args.heads,
        input_dropout=args.input_dropout, dropout=args.dropout,
        pos_dim=args.pos_enc_dim if args.beltrami else 0,
        pos_hidden=args.pos_enc_hidden,
        att_samp_pct=args.att_samp_pct, use_flux=args.use_flux,
        attention_norm_idx=args.attention_norm_idx,
        cgnn_alpha=args.cgnn_alpha,
        rw_addD=args.rw_addD, rewire_candidates=args.rewire_candidates,
        rewire_seed=args.seed,
    )
    if args.block == "rewire_att":
        print(f"rewire_att: {model.diffusion_graph.edge_index.shape[1]} "
              f"candidate edges ({args.rewire_candidates}), top-"
              f"{model.rewire_K} kept per forward")
    x = jnp.asarray(data["x"])
    y = jnp.asarray(data["y"])
    masks = {k: jnp.asarray(data[k]) for k in
             ("train_mask", "val_mask", "test_mask")}
    params = model.init(jax.random.PRNGKey(args.seed), x,
                        pos_encoding=pos_enc)

    opt = optax.adamw(args.lr, weight_decay=args.decay)
    opt_state = opt.init(params)

    eval_times = np.linspace(0.0, args.time, 5)[1:]

    def make_fns():
        """Freshly-jitted step/eval closures. Rebuilt after each kNN
        rewiring: the graph's edge constants are baked into the traces,
        so a rewired model needs new traces (same shapes — N*k edges —
        so compile stays cheap and cache-friendly)."""

        @jax.jit
        def train_step(p, s, rng):
            def loss_fn(pp):
                logits = model.apply(pp, x, training=True, rng=rng,
                                     pos_encoding=pos_enc)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.sum(ce * masks["train_mask"]) / jnp.sum(
                    masks["train_mask"]
                )

            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, params=p)
            return optax.apply_updates(p, updates), s, loss

        @jax.jit
        def accuracy(p):
            logits = model.apply(p, x, training=False, pos_encoding=pos_enc)
            pred = jnp.argmax(logits, -1)
            out = {}
            for k, m in masks.items():
                out[k] = jnp.sum((pred == y) * m) / jnp.sum(m)
            return out

        @jax.jit
        def accuracy_multi(p):
            logits_t = model.apply_multi(p, x, eval_times,
                                         pos_encoding=pos_enc)
            pred_t = jnp.argmax(logits_t, -1)  # (n_t, N)
            val_acc = jnp.sum(
                (pred_t == y) * masks["val_mask"], -1) / jnp.sum(
                masks["val_mask"]
            )
            test_acc = jnp.sum(
                (pred_t == y) * masks["test_mask"], -1) / jnp.sum(
                masks["test_mask"]
            )
            i = jnp.argmax(val_acc)
            return val_acc[i], test_acc[i], jnp.asarray(eval_times)[i]

        return train_step, accuracy, accuracy_multi

    train_step, accuracy, accuracy_multi = make_fns()

    def knn_features(p):
        if args.knn_t == "raw":
            return data["x"]
        if args.knn_t == "T0":
            return model.forward_encoder(p, x, pos_encoding=pos_enc)
        return model.forward_ode(p, x, pos_encoding=pos_enc)

    rec = Recorder()
    best_val, best_test, patience = 0.0, 0.0, 0
    for epoch in range(args.epochs):
        t0 = time.time()
        if args.rewire_knn and epoch % args.rewire_knn == 0 and epoch != 0:
            # periodic feature-kNN rewiring (run_GNN.py:294-295)
            ei = knn_graph(np.asarray(knn_features(params)), args.knn_k)
            model.rewire(get_rw_adj(ei, n, self_loop_weight=1.0))
            train_step, accuracy, accuracy_multi = make_fns()
            print(f"Epoch {epoch:03d} | kNN rewiring ({args.knn_t}, "
                  f"k={args.knn_k}): {ei.shape[1]} edges")
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.PRNGKey(epoch)
        )
        if args.early_stop_int:
            va, ta, tbest = accuracy_multi(params)
            accs = {"train_mask": float("nan"), "val_mask": float(va),
                    "test_mask": float(ta)}
        else:
            accs = {k: float(v) for k, v in accuracy(params).items()}
        if accs["val_mask"] > best_val:
            best_val, best_test, patience = accs["val_mask"], accs["test_mask"], 0
        else:
            patience += 1
        if epoch % 10 == 0:
            print(
                f"Epoch {epoch:03d} | {time.time()-t0:.2f}s | "
                f"Loss {float(loss):.4f} | train {accs['train_mask']:.3f} | "
                f"val {accs['val_mask']:.3f} | test {accs['test_mask']:.3f}"
            )
        if patience > args.patience:
            print("early stopping")
            break
    rec.record(
        dataset=args.dataset, function=args.function, block=args.block,
        hidden=args.hidden_dim, T=args.time, best_val=best_val,
        best_test=best_test,
    )
    makedirs(args.train_dir)
    rec.save(os.path.join(args.train_dir, "results.csv"))
    print(f"best val {best_val:.4f} | test at best val {best_test:.4f}")
    return best_test


if __name__ == "__main__":
    main()
