"""GRAND on pixel-grid graphs — image classification via graph diffusion.

Rebuild of the reference's image GNN (/root/reference/examples-sinode/
grand/src/GNN_image.py:11-123 + data_image.py edge_index_calc:69-179):
each image is a graph whose nodes are pixels connected 4-neighbor (8 with
``diags``); raw pixel intensities diffuse under du/dt = alpha (A u - u)
(+ beta u0) with NO encoder, then a single Linear over the flattened
diffused image produces class logits (GNN_image.forward:40-63 — dropout,
ODE block, relu, dropout, view, m2).

TPU-first design: the grid adjacency is IDENTICAL for every image, so the
whole batch diffuses in ONE spmm per evaluation by folding (batch, chan)
into the feature dimension of a single (n_pixels, batch*chan) state —
no python loop over images, no per-image graph replication (the
reference materializes a block-diagonal batch graph via PyG DataLoader).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .grand import Graph, LaplacianFunc, get_rw_adj


def grid_edge_index(H: int, W: int, diags: bool = False) -> np.ndarray:
    """(2, E) directed edge list of the H x W pixel grid (both directions
    present). Matches data_image.py edge_index_calc:69-179: E =
    2*(2HW - H - W) without diagonals, + 4*(H-1)*(W-1) with."""
    idx = np.arange(H * W).reshape(H, W)
    pairs = []
    # horizontal + vertical neighbors
    pairs.append(np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()]))
    pairs.append(np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()]))
    if diags:
        pairs.append(np.stack([idx[:-1, :-1].ravel(), idx[1:, 1:].ravel()]))
        pairs.append(np.stack([idx[:-1, 1:].ravel(), idx[1:, :-1].ravel()]))
    fwd = np.concatenate(pairs, axis=1)
    return np.concatenate([fwd, fwd[::-1]], axis=1)


class GRANDImage:
    """Pixel-diffusion classifier (GNN_image equivalent).

    Functional API::

        model = GRANDImage(28, 28, n_classes=10)
        params = model.init(key, x)            # x (B, H, W, C)
        logits = model.apply(params, x, training=True, rng=key)
    """

    def __init__(self, H: int, W: int, n_classes: int, chan: int = 1,
                 T: float = 1.0, step_size: float = 0.25,
                 method: str = "dopri5", diags: bool = False,
                 input_dropout: float = 0.5, dropout: float = 0.5,
                 self_loop_weight: float = 1.0,
                 enable_adjoint: bool = True):
        from ..solver import ODESolver

        self.H, self.W, self.chan = H, W, chan
        self.n_pix = H * W
        self.graph = get_rw_adj(grid_edge_index(H, W, diags), self.n_pix,
                                self_loop_weight)
        self.func = LaplacianFunc(hidden_dim=chan)
        self.dec = nn.Dense(n_classes)
        self.input_dropout = input_dropout
        self.dropout = dropout
        self.T = T
        self._ODESolver = ODESolver
        self.method = method
        self.step_size = step_size
        self.enable_adjoint = enable_adjoint
        self._solvers = {}

    def _state(self, x):
        """(B, H, W, C) or (B, N, C) -> (N, B*C) diffusion state."""
        B = x.shape[0]
        u = x.reshape(B, self.n_pix, self.chan)
        return jnp.transpose(u, (1, 0, 2)).reshape(self.n_pix,
                                                   B * self.chan)

    def init(self, key, x):
        u = self._state(x)
        kf, kd = jax.random.split(key)
        pf = self.func.init(kf, 0.0, u, self.graph, u)
        pd = self.dec.init(kd, jnp.zeros((x.shape[0],
                                          self.n_pix * self.chan)))
        return {"func": pf, "dec": pd}

    def _solver(self, shape, dtype):
        key = (shape, str(dtype))
        ode = self._solvers.get(key)
        if ode is None:
            ode = self._ODESolver()
            ode.setupTS(
                jnp.zeros(shape, dtype),
                ((lambda t, y, p: self.func.apply(
                    p["fp"], t, y, self.graph, p["x0"])), {}),
                step_size=self.step_size, method=self.method,
                enable_adjoint=self.enable_adjoint,
            )
            self._solvers[key] = ode
        return ode

    def apply(self, params, x, training: bool = False, rng=None):
        B = x.shape[0]
        u0 = self._state(x)
        if training and self.input_dropout > 0:
            rng, k = jax.random.split(rng)
            keep = jax.random.bernoulli(k, 1 - self.input_dropout,
                                        u0.shape)
            u0 = jnp.where(keep, u0 / (1 - self.input_dropout), 0)
        ode = self._solver(u0.shape, u0.dtype)
        sol, _ = ode.solve(
            u0, np.array([self.T]),
            params={"fp": params["func"], "x0": u0},
            with_adjoint=training and self.enable_adjoint,
        )
        z = nn.relu(sol[-1])
        if training and self.dropout > 0:
            rng, k = jax.random.split(rng)
            keep = jax.random.bernoulli(k, 1 - self.dropout, z.shape)
            z = jnp.where(keep, z / (1 - self.dropout), 0)
        # (N, B*C) -> (B, N*C) flattened image per sample (GNN_image view)
        z = jnp.transpose(z.reshape(self.n_pix, B, self.chan),
                          (1, 0, 2)).reshape(B, self.n_pix * self.chan)
        return self.dec.apply(params["dec"], z)
