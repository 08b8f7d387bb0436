"""CNF dynamics nets and divergence estimators.

Rebuild of /root/reference/ffjord-pnode/lib/layers/odefunc.py: the ODEnet
stack of time-dependent layers with configurable nonlinearity (:150-220),
exact brute-force divergence (divergence_bf, :13) and the Hutchinson
estimator (divergence_approx, :24) with a probe vector fixed per solve
(before_odeint, :339-353).

TPU-native twist: the Hutchinson term e . (df/dy) e uses a single
forward-mode ``jax.jvp`` — the reference needs a reverse-mode
``autograd.grad`` per evaluation (odefunc.py:375-385); forward mode is one
pass and fuses into the dynamics evaluation under XLA. Brute-force
divergence is a vmapped ``jacfwd`` trace (used for the exact test-NLL
evaluation, train_tabular.py:418-424).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import build_diffeq_layer

NONLINEARITIES = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "softplus": nn.softplus,
    "elu": nn.elu,
    "swish": nn.swish,
    "square": lambda x: x**2,
    "identity": lambda x: x,
}


class ODEnet(nn.Module):
    """Stack of time-dependent layers: hidden dims + final map back to dim.

    Mirrors ODEnet (odefunc.py:150-220): layer_type selects how t enters,
    nonlinearity applied between layers (not after the last).
    """

    hidden_dims: Sequence[int]
    input_dim: int
    layer_type: str = "concatsquash"
    nonlinearity: str = "softplus"

    @nn.compact
    def __call__(self, t, y):
        act = NONLINEARITIES[self.nonlinearity]
        h = y
        for d in self.hidden_dims:
            h = build_diffeq_layer(self.layer_type, d)(t, h)
            h = act(h)
        return build_diffeq_layer(self.layer_type, self.input_dim)(t, h)


def divergence_approx_fn(f_closed, z, e):
    """Hutchinson estimator: (dz, e.(df/dz)e) per sample, via one jvp.

    f_closed: z -> dz (t and params bound); z, e: (B, D).
    """
    dz, Je = jax.jvp(f_closed, (z,), (e,))
    div = jnp.sum(e * Je, axis=-1)
    return dz, div


def divergence_bf_fn(f_closed, z):
    """Exact divergence: batched trace of the per-sample Jacobian."""
    def per_sample(zi):
        J = jax.jacfwd(lambda x: f_closed(x[None])[0])(zi)
        return jnp.trace(J)

    dz = f_closed(z)
    div = jax.vmap(per_sample)(z)
    return dz, div


def sample_probe(key, shape, dtype, kind: str = "rademacher"):
    """Hutchinson probe, fixed per solve (odefunc.py before_odeint).

    rademacher keeps the estimator variance minimal for Frobenius-type
    quantities; gaussian matches the reference default option set.
    """
    if kind == "gaussian":
        return jax.random.normal(key, shape, dtype)
    return jax.random.bernoulli(key, 0.5, shape).astype(dtype) * 2.0 - 1.0
