"""Model builders + loss helpers for FFJORD training.

Rebuild of /root/reference/ffjord-pnode/train_misc.py: build_model_tabular
(:15-60, a chain of CNF blocks with optional MovingBatchNorm), the
standard-normal base log-density, and regularization bookkeeping.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp

from .cnf import CNF
from .flows import CNFLayer, MovingBatchNorm, SequentialFlow
from .odefunc import ODEnet


def standard_normal_logprob(z: jnp.ndarray) -> jnp.ndarray:
    """Per-sample log N(0, I) density, summed over feature dims."""
    logz = -0.5 * math.log(2 * math.pi)
    red = tuple(range(1, z.ndim))
    return jnp.sum(logz - 0.5 * z**2, axis=red)


def build_model_tabular(
    dim: int,
    num_blocks: int = 1,
    hidden_dims: Sequence[int] = (64, 64),
    layer_type: str = "concatsquash",
    nonlinearity: str = "softplus",
    time_length: float = 0.5,
    solver: str = "dopri5",
    step_size: float = 0.05,
    batch_norm: bool = False,
    bn_lag: float = 0.0,
    rademacher: bool = False,
    regularization_fns: Sequence[str] = (),
    solver_options: Optional[dict] = None,
) -> SequentialFlow:
    """Chain of CNF blocks (+ optional MovingBatchNorm between blocks),
    mirroring build_model_tabular (train_misc.py:15-60)."""

    def make_cnf():
        net = ODEnet(
            hidden_dims=tuple(hidden_dims),
            input_dim=dim,
            layer_type=layer_type,
            nonlinearity=nonlinearity,
        )
        return CNFLayer(
            CNF(
                net,
                input_dim=dim,
                T=time_length,
                solver=solver,
                step_size=step_size,
                rademacher=rademacher,
                regularization_fns=regularization_fns,
                solver_options=solver_options,
            )
        )

    layers = [make_cnf() for _ in range(num_blocks)]
    if batch_norm:
        bn_layers = [MovingBatchNorm(dim, bn_lag=bn_lag)
                     for _ in range(num_blocks)]
        chained = [MovingBatchNorm(dim, bn_lag=bn_lag)]
        for a, b in zip(layers, bn_layers):
            chained += [a, b]
        layers = chained
    return SequentialFlow(layers)
