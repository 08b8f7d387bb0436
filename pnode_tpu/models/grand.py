"""GRAND: graph neural diffusion as a neural ODE (flax/jax).

Rebuild of the reference's vendored GRAND stack
(/root/reference/examples-sinode/grand/src/): node features diffuse under
du/dt = alpha (A u - u) (+ beta u0), where A is either the rw-normalized
adjacency (LaplacianODEFunc, function_laplacian_diffusion.py:16-60) or a
multi-head scaled-dot transformer attention recomputed at every evaluation
(SpGraphTransAttentionLayer, function_transformer_attention.py:82-190).
The PNODEblock integrates this with the discrete-adjoint solver; the IMEX
variant treats an identity diffusion -sigmoid(alpha) y implicitly
(block_pnode.py ODEFuncIM, :13-25) with the attention part explicit.

Sparse ops are edge-list based: spmm = segment_sum of weighted source
features; attention softmax = segment-normalized exp over incident edges —
the jax-native replacement for torch_sparse.spmm / torch_geometric.softmax.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Graph(NamedTuple):
    edge_index: jnp.ndarray   # (2, E) [src, dst]
    edge_weight: jnp.ndarray  # (E,)
    num_nodes: int


def add_self_loops(edge_index, num_nodes, fill_value=1.0, edge_weight=None):
    E = edge_index.shape[1]
    loops = np.stack([np.arange(num_nodes)] * 2)
    ei = np.concatenate([np.asarray(edge_index), loops], axis=1)
    ew = np.concatenate([
        np.ones(E) if edge_weight is None else np.asarray(edge_weight),
        np.full(num_nodes, fill_value),
    ])
    return ei, ew


def get_rw_adj(edge_index, num_nodes, self_loop_weight=1.0):
    """Row-normalized random-walk adjacency with self loops
    (grand/src/utils.py get_rw_adj, norm_dim=1)."""
    ei, ew = add_self_loops(edge_index, num_nodes, self_loop_weight)
    src, dst = ei
    deg = np.zeros(num_nodes)
    np.add.at(deg, src, ew)
    w = ew / np.maximum(deg[src], 1e-12)
    return Graph(jnp.asarray(ei), jnp.asarray(w), num_nodes)


def spmm(graph: Graph, w, x):
    """A @ x with per-edge weights w: segment-sum of weighted src features."""
    src, dst = graph.edge_index
    w = w.astype(x.dtype)  # graph weights are built in fp64 on the host
    return jax.ops.segment_sum(w[:, None] * x[src], dst, graph.num_nodes)


def segment_softmax(scores, segment_ids, num_segments):
    smax = jax.ops.segment_max(scores, segment_ids, num_segments)
    ex = jnp.exp(scores - smax[segment_ids])
    norm = jax.ops.segment_sum(ex, segment_ids, num_segments)
    return ex / jnp.maximum(norm[segment_ids], 1e-16)


class TransAttention(nn.Module):
    """Multi-head scaled-dot graph attention over the edge list
    (SpGraphTransAttentionLayer)."""

    hidden_dim: int
    heads: int = 4
    norm_idx: int = 0  # softmax over src (0) or dst (1) incidences

    @nn.compact
    def __call__(self, x, graph: Graph):
        d = self.hidden_dim
        dk = max(1, d // self.heads)
        init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        Q = nn.Dense(dk * self.heads, kernel_init=init)(x)
        K = nn.Dense(dk * self.heads, kernel_init=init)(x)
        src, dst = graph.edge_index
        Qh = Q.reshape(-1, self.heads, dk)
        Kh = K.reshape(-1, self.heads, dk)
        scores = jnp.sum(Qh[src] * Kh[dst], axis=-1) / jnp.sqrt(
            jnp.asarray(dk, x.dtype)
        )  # (E, heads)
        seg = graph.edge_index[self.norm_idx]
        att = jax.vmap(
            lambda s: segment_softmax(s, seg, graph.num_nodes),
            in_axes=1, out_axes=1,
        )(scores)
        return att  # (E, heads)


class LaplacianFunc(nn.Module):
    """du/dt = alpha (A u - u) + beta u0 with fixed rw adjacency."""

    hidden_dim: int
    add_source: bool = True
    no_alpha_sigmoid: bool = False

    @nn.compact
    def __call__(self, t, x, graph: Graph, x0):
        alpha_train = self.param(
            "alpha_train", nn.initializers.ones, (), x.dtype
        )
        beta_train = self.param(
            "beta_train", nn.initializers.ones, (), x.dtype
        )
        alpha = alpha_train if self.no_alpha_sigmoid else nn.sigmoid(alpha_train)
        ax = spmm(graph, graph.edge_weight, x)
        f = alpha * (ax - x)
        if self.add_source:
            f = f + beta_train * x0
        return f


class AttentionFunc(nn.Module):
    """du/dt = alpha (A(u) u - u) + beta u0, attention recomputed per eval."""

    hidden_dim: int
    heads: int = 4
    add_source: bool = True
    no_alpha_sigmoid: bool = False

    @nn.compact
    def __call__(self, t, x, graph: Graph, x0):
        alpha_train = self.param(
            "alpha_train", nn.initializers.ones, (), x.dtype
        )
        beta_train = self.param(
            "beta_train", nn.initializers.ones, (), x.dtype
        )
        alpha = alpha_train if self.no_alpha_sigmoid else nn.sigmoid(alpha_train)
        att = TransAttention(self.hidden_dim, self.heads)(x, graph)
        mean_att = jnp.mean(att, axis=1)
        ax = spmm(graph, mean_att, x)
        f = alpha * (ax - x)
        if self.add_source:
            f = f + beta_train * x0
        return f


class GRANDModel:
    """Encoder -> GRAND ODE block -> decoder (GNN.py:9-80 + base_classes).

    Functional API:
        model = GRANDModel(graph, in_dim, hidden_dim, n_classes,
                           function="laplacian"|"transformer",
                           block="pnode"|"imex", T=1.0, step_size=0.25)
        params = model.init(key, x)
        logits = model.apply(params, x, training=True, rng=dropout_key)
    """

    def __init__(
        self,
        graph: Graph,
        in_dim: int,
        hidden_dim: int,
        n_classes: int,
        function: str = "laplacian",
        block: str = "pnode",
        T: float = 1.0,
        step_size: float = 0.25,
        method: str = "dopri5",
        heads: int = 4,
        input_dropout: float = 0.5,
        dropout: float = 0.5,
        add_source: bool = True,
    ):
        from ..solver import ODESolver

        self.graph = graph
        self.hidden = hidden_dim
        self.T = T
        self.block = block
        self.input_dropout = input_dropout
        self.dropout = dropout
        self.enc = nn.Dense(hidden_dim)
        self.dec = nn.Dense(n_classes)
        if function == "laplacian":
            self.func = LaplacianFunc(hidden_dim, add_source=add_source)
        else:
            self.func = AttentionFunc(hidden_dim, heads=heads,
                                      add_source=add_source)
        self._ODESolver = ODESolver
        self.method = method
        self.step_size = step_size
        self._solvers = {}

    def init(self, key, x):
        k1, k2, k3 = jax.random.split(key, 3)
        h = jnp.zeros((x.shape[0], self.hidden), x.dtype)
        return {
            "enc": self.enc.init(k1, x),
            "func": self.func.init(k2, 0.0, h, self.graph, h),
            "dec": self.dec.init(k3, h),
        }

    def _get_solver(self, shape, dtype, training):
        key = (shape, str(dtype), training, self.block)
        ode = self._solvers.get(key)
        if ode is None:
            ode = self._ODESolver()
            if self.block == "imex":
                # implicit part: -sigmoid(alpha) y (identity diffusion,
                # block_pnode.py ODEFuncIM); explicit: full f + alpha y
                def f_im(t, y, p):
                    a = nn.sigmoid(p["func"]["params"]["alpha_train"])
                    return -a * y

                def f_ex(t, y, p):
                    x0 = jax.lax.stop_gradient(p["x0"])
                    a = nn.sigmoid(p["func"]["params"]["alpha_train"])
                    return self.func.apply(p["func"], t, y, self.graph, x0) + a * y

                ode.setupTS(
                    jnp.zeros(shape, dtype), (f_im, {}), func2=(f_ex, {}),
                    step_size=self.step_size, method="imex", imex_form=True,
                    implicit_form=True, enable_adjoint=training,
                )
            else:
                def f(t, y, p):
                    x0 = jax.lax.stop_gradient(p["x0"])
                    return self.func.apply(p["func"], t, y, self.graph, x0)

                ode.setupTS(
                    jnp.zeros(shape, dtype), (f, {}),
                    step_size=self.step_size, method=self.method,
                    enable_adjoint=training,
                )
            self._solvers[key] = ode
        return ode

    def apply_multi(self, params, x, times):
        """Decoded logits at several integration times (n_t, N, C).

        The evaluation mode behind the reference's early-stop solver
        (grand/src/early_stop_solver.py:36-280, which patches torchdiffeq to
        monitor validation accuracy at intermediate times and keep the best):
        here the solver returns all requested interior outputs in one solve
        and the caller selects the best time on the validation mask.
        """
        import numpy as np_

        h0 = self.enc.apply(params["enc"], x)
        ode = self._get_solver(h0.shape, h0.dtype, False)
        p = {"func": params["func"], "x0": h0}
        if self.block == "imex":
            p = (p, p)
        t_out = np_.asarray(times, dtype=np_.float64)
        sol, _ = ode.solve(h0, t_out, params=p, with_adjoint=False)
        return jax.vmap(lambda h: self.dec.apply(params["dec"], h))(sol)

    def apply(self, params, x, training: bool = True, rng=None):
        if training and rng is not None:
            k1, k2 = jax.random.split(rng)
            x = x * jax.random.bernoulli(
                k1, 1 - self.input_dropout, x.shape
            ) / (1 - self.input_dropout)
        h0 = self.enc.apply(params["enc"], x)
        ode = self._get_solver(h0.shape, h0.dtype, training)
        p = {"func": params["func"], "x0": h0}
        if self.block == "imex":
            p = (p, p)
        t_out = np.array([0.0, self.T])
        sol, _ = ode.solve(h0, t_out, params=p, with_adjoint=training)
        h = sol[-1]
        if training and rng is not None:
            h = h * jax.random.bernoulli(k2, 1 - self.dropout, h.shape) / (
                1 - self.dropout
            )
        return self.dec.apply(params["dec"], h)


def synthetic_sbm(n_nodes=400, n_classes=4, feat_dim=32, p_in=0.06,
                  p_out=0.005, seed=0):
    """Stochastic-block-model node-classification dataset (Cora surrogate;
    the planetoid files are not available without network egress)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_classes, n_nodes)
    src, dst = [], []
    for i in range(n_nodes):
        for j in range(i + 1, n_nodes):
            p = p_in if labels[i] == labels[j] else p_out
            if rng.random() < p:
                src += [i, j]
                dst += [j, i]
    edge_index = np.stack([np.array(src), np.array(dst)])
    centers = rng.normal(size=(n_classes, feat_dim))
    x = centers[labels] + 1.5 * rng.normal(size=(n_nodes, feat_dim))
    masks = rng.random(n_nodes)
    return {
        "x": x.astype(np.float32),
        "y": labels.astype(np.int32),
        "edge_index": edge_index,
        "train_mask": masks < 0.4,
        "val_mask": (masks >= 0.4) & (masks < 0.6),
        "test_mask": masks >= 0.6,
    }
