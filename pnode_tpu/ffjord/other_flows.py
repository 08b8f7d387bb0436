"""Non-ODE flow layers: affine coupling, planar flow, spectral norm.

Rebuild of the reference's remaining flow infrastructure
(/root/reference/ffjord-pnode/lib/layers/coupling.py, planar.py and
lib/spectral_norm.py:12-184): discrete flow baselines that the FFJORD paper
compares against, plus power-iteration spectral normalization for Lipschitz
control of dynamics nets.

These follow the FlowLayer protocol of ``pnode_tpu.ffjord.flows``
(delta-accumulation convention: log p_x(x) = log p_z(z) - delta).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .flows import FlowLayer


class _CouplingNet(nn.Module):
    hidden: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = x
        for w in self.hidden:
            h = nn.relu(nn.Dense(w)(h))
        return nn.Dense(
            2 * self.out_dim, kernel_init=nn.initializers.zeros
        )(h)


class CouplingLayer(FlowLayer):
    """Affine coupling (RealNVP-style, lib/layers/coupling.py): the masked
    half conditions scale/shift of the other half; exact log-det."""

    def __init__(self, dim: int, hidden: Sequence[int] = (64, 64),
                 swap: bool = False):
        self.dim = dim
        self.d = dim // 2
        self.swap = swap
        self.net = _CouplingNet(hidden, dim - self.d)

    def _split(self, x):
        if self.swap:
            return x[:, self.d:], x[:, : self.d]
        return x[:, : self.d], x[:, self.d:]

    def _merge(self, a, b):
        if self.swap:
            return jnp.concatenate([b, a], axis=1)
        return jnp.concatenate([a, b], axis=1)

    def init(self, key, x):
        a, _ = self._split(x)
        return self.net.init(key, a)

    def apply(self, params, x, delta, state, reverse=False, **kw):
        a, b = self._split(x)
        sb = self.net.apply(params, a)
        shift, log_scale = sb[:, : b.shape[1]], sb[:, b.shape[1]:]
        log_scale = jnp.tanh(log_scale)  # bounded scales, stable training
        if reverse:
            b_new = (b - shift) * jnp.exp(-log_scale)
            delta = delta + jnp.sum(log_scale, axis=1, keepdims=True)
        else:
            b_new = b * jnp.exp(log_scale) + shift
            delta = delta - jnp.sum(log_scale, axis=1, keepdims=True)
        return self._merge(a, b_new), delta, state


def sample_mask(dim: int, mask_type: str = "alternate", swap: bool = False):
    """Binary conditioning mask (reference coupling.py:90-106): 'alternate'
    = MAF index masking (even indices 1), 'channel' = RealNVP half-split."""
    mask = jnp.zeros((dim,))
    if mask_type == "alternate":
        mask = mask.at[::2].set(1.0)
    elif mask_type == "channel":
        mask = mask.at[: dim // 2].set(1.0)
    else:
        raise ValueError(f"Unknown mask_type {mask_type!r}")
    if swap:
        mask = 1.0 - mask
    return mask


class _MaskedNet(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    activation: str  # "relu" | "tanh"

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.activation == "relu" else nn.tanh
        h = x
        for w in self.hidden:
            h = act(nn.Dense(w)(h))
        return nn.Dense(self.out_dim)(h)


class MaskedCouplingLayer(FlowLayer):
    """Masked affine coupling for the tabular experiments (reference
    coupling.py:56-87 MaskedCouplingLayer): masked input conditions
    elementwise exp-scale (tanh net) and shift (relu net); masked positions
    pass through with unit scale, so log|det| = sum of unmasked log-scales.
    """

    def __init__(self, dim: int, hidden: Sequence[int] = (64, 64),
                 mask_type: str = "alternate", swap: bool = False):
        self.dim = dim
        self.mask = sample_mask(dim, mask_type, swap)[None, :]
        self.net_scale = _MaskedNet(tuple(hidden), dim, "tanh")
        self.net_shift = _MaskedNet(tuple(hidden), dim, "relu")

    def init(self, key, x):
        k1, k2 = jax.random.split(key)
        xm = x * self.mask.astype(x.dtype)
        return {
            "scale": self.net_scale.init(k1, xm),
            "shift": self.net_shift.init(k2, xm),
        }

    def apply(self, params, x, delta, state, reverse=False, **kw):
        mask = self.mask.astype(x.dtype)
        xm = x * mask
        log_s = self.net_scale.apply(params["scale"], xm)
        shift = self.net_shift.apply(params["shift"], xm)
        # masked positions: scale 1, shift 0 (identity)
        masked_log_s = log_s * (1.0 - mask)
        masked_shift = shift * (1.0 - mask)
        logdet = jnp.sum(masked_log_s, axis=1, keepdims=True)
        if reverse:
            y = (x - masked_shift) * jnp.exp(-masked_log_s)
            delta = delta + logdet
        else:
            y = x * jnp.exp(masked_log_s) + masked_shift
            delta = delta - logdet
        return y, delta, state


class PlanarFlow(FlowLayer):
    """Planar flow x + u tanh(w.x + b) (lib/layers/planar.py); invertibility
    enforced by the u-hat reparameterization; forward direction only (the
    inverse has no closed form — the reference has the same restriction)."""

    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key, x):
        k1, k2 = jax.random.split(key)
        return {
            "u": 0.1 * jax.random.normal(k1, (self.dim,), x.dtype),
            "w": 0.1 * jax.random.normal(k2, (self.dim,), x.dtype),
            "b": jnp.zeros((), x.dtype),
        }

    def apply(self, params, x, delta, state, reverse=False, **kw):
        if reverse:
            raise NotImplementedError("planar flows have no closed-form inverse")
        u, w, b = params["u"], params["w"], params["b"]
        # u-hat: ensure w.u >= -1 for invertibility
        wu = jnp.dot(w, u)
        m = -1.0 + jax.nn.softplus(wu)
        u_hat = u + (m - wu) * w / jnp.maximum(jnp.dot(w, w), 1e-12)
        lin = x @ w + b
        y = x + u_hat[None, :] * jnp.tanh(lin)[:, None]
        psi = (1 - jnp.tanh(lin) ** 2)[:, None] * w[None, :]
        det = 1.0 + psi @ u_hat
        delta = delta - jnp.log(jnp.abs(det) + 1e-12)[:, None]
        return y, delta, state


def spectral_normalize(kernel: jnp.ndarray, u, n_iters: int = 1,
                       eps: float = 1e-12):
    """One (or more) power-iteration steps; returns (W/sigma, new_u).

    The reference mutates module weights in-place with an explicit
    power-iteration hook (lib/spectral_norm.py:12-184); functionally the
    estimate vector u is explicit state threaded by the caller.
    """
    W = kernel.reshape(-1, kernel.shape[-1])  # (in, out)
    for _ in range(n_iters):
        v = W @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = W.T @ v
        u = u / (jnp.linalg.norm(u) + eps)
    sigma = v @ (W @ u)
    return kernel / jnp.maximum(sigma, eps), u


class SpectralDense(nn.Module):
    """Dense layer with spectral normalization (power-iteration state in the
    'spectral' variable collection; update with mutable=['spectral'])."""

    features: int
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        u = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
        )
        W_sn, new_u = spectral_normalize(
            kernel, u.value.astype(x.dtype), self.n_power_iterations
        )
        if not self.is_initializing():
            u.value = jax.lax.stop_gradient(new_u)
        return x @ W_sn + bias


class BruteForceLayer(FlowLayer):
    """Invertible dense linear flow with exact log|det| (glow-style 1x1
    without the LU parameterization): y = x W^T, delta -= log|det W|
    (/root/reference/ffjord-pnode/lib/layers/glow.py:6-28 BruteForceLayer —
    weight initialized to the identity, inverse materialized on the reverse
    pass, log-det by direct determinant)."""

    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key, x):
        return {"weight": jnp.eye(self.dim, dtype=x.dtype)}

    def apply(self, params, x, delta, state, key=None, training=True,
              reverse=False, **kw):
        W = params["weight"]
        sign, logdet = jnp.linalg.slogdet(W)
        ld = logdet * jnp.ones_like(delta)
        if reverse:
            y = x @ jnp.linalg.inv(W).T
            return y, delta + ld, state
        y = x @ W.T
        return y, delta - ld, state
