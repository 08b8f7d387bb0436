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


class AutoencoderDiffEqNet(nn.Module):
    """Encoder/decoder split of the dynamics net for cheap divergence.

    Mirrors AutoencoderDiffEqNet (reference odefunc.py:207-319): the first
    ``len(hidden_dims)//2 + 1`` layers form the encoder (nonlinearity after
    EVERY encoder layer), the rest the decoder (nonlinearity between, not
    after the last). ``__call__`` returns ``(h, dy)`` so the divergence can
    be estimated through the bottleneck h (AutoencoderODEfunc,
    :388-445) at O(bottleneck) probe cost instead of O(dim).

    Same layer_type restriction as the reference (:362): types whose
    conditioning composes per-layer.
    """

    hidden_dims: Sequence[int]
    input_dim: int
    layer_type: str = "concat"
    nonlinearity: str = "softplus"

    def setup(self):
        if self.layer_type not in ("ignore", "hyper", "concat", "concatcoord", "blend"):
            raise ValueError(
                f"layer_type {self.layer_type!r} unsupported for the "
                "autoencoder net (reference odefunc.py:362)"
            )
        dims = tuple(self.hidden_dims) + (self.input_dim,)
        n_enc = len(self.hidden_dims) // 2 + 1  # i <= len(hidden)//2
        self.encoder_layers = [
            build_diffeq_layer(self.layer_type, d) for d in dims[:n_enc]
        ]
        self.decoder_layers = [
            build_diffeq_layer(self.layer_type, d) for d in dims[n_enc:]
        ]

    @property
    def bottleneck_dim(self) -> int:
        n_enc = len(self.hidden_dims) // 2 + 1
        return (tuple(self.hidden_dims) + (self.input_dim,))[n_enc - 1]

    def encode(self, t, y):
        act = NONLINEARITIES[self.nonlinearity]
        h = y
        for layer in self.encoder_layers:
            h = act(layer(t, h))
        return h

    def decode(self, t, h):
        act = NONLINEARITIES[self.nonlinearity]
        dy = h
        for i, layer in enumerate(self.decoder_layers):
            dy = layer(t, dy)
            if i < len(self.decoder_layers) - 1:
                dy = act(dy)
        return dy

    def __call__(self, t, y):
        h = self.encode(t, y)
        return h, self.decode(t, h)


def autoencoder_divergence_fn(encode_closed, decode_closed, y, e):
    """(dy, Hutchinson divergence) through the bottleneck.

    With J_enc = dh/dy and J_dec = d(dy)/dh, the estimator is
    e^T (J_enc J_dec) e whose expectation is tr(J_enc J_dec) =
    tr(J_dec J_enc) = the true divergence of decode(encode(y)) — but the
    probe lives in the (small) bottleneck space. The reference computes it
    with two reverse-mode VJPs (odefunc.py:424-428); forward-mode is
    two jvps with no transposes, which XLA fuses into the primal pass.

    encode_closed: y -> h; decode_closed: h -> dy; y: (B, D); e: (B, H).
    """
    h = encode_closed(y)
    dy, w = jax.jvp(decode_closed, (h,), (e,))   # w  = J_dec e   (B, D)
    _, Jw = jax.jvp(encode_closed, (y,), (w,))   # Jw = J_enc w   (B, H)
    div = jnp.sum(e * Jw, axis=-1)
    return dy, div


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
