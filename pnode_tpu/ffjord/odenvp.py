"""ODENVP: multiscale image CNF (real-NVP-style factor-out architecture).

Rebuild of /root/reference/ffjord-pnode/lib/odenvp.py:8-200 (and the sibling
MultiscaleParallelCNF): dequantized images pass a logit transform, then per
scale: a stack of conv-ODEnet CNF blocks at that resolution, a squeeze
(space-to-channel), and a factor-out of half the channels to the standard
normal prior; the final scale sends everything to the prior. Log-density is
the sum of prior terms minus all accumulated delta_logp contributions.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .cnf import CNF
from .flows import LogitTransform, SqueezeLayer
from .layers import DIFFEQ_CONV_LAYERS


class ConvODEnet(nn.Module):
    """Conv stack of time-dependent layers for image CNFs (ODEnet with
    conv=True, odefunc.py:150-220)."""

    hidden_dims: Sequence[int]
    out_channels: int
    layer_type: str = "concat"
    nonlinearity: str = "softplus"

    @nn.compact
    def __call__(self, t, y):
        act = {"softplus": nn.softplus, "tanh": nn.tanh, "relu": nn.relu}[
            self.nonlinearity
        ]
        Layer = DIFFEQ_CONV_LAYERS[self.layer_type]
        h = y
        for d in self.hidden_dims:
            h = Layer(dim_out=d)(t, h)
            h = act(h)
        return Layer(dim_out=self.out_channels)(t, h)


def standard_normal_logprob(z):
    logz = -0.5 * math.log(2 * math.pi)
    red = tuple(range(1, z.ndim))
    return jnp.sum(logz - 0.5 * z**2, axis=red)


class ODENVP:
    """Functional multiscale CNF.

        model = ODENVP((H, W, C), n_scales=2, n_blocks=2)
        params = model.init(key, x)
        logpx, zs = model.log_prob(params, x, key, training=True)
    """

    def __init__(
        self,
        input_shape: Tuple[int, int, int],
        n_scales: int = 2,
        n_blocks: int = 2,
        hidden_dims: Sequence[int] = (32, 32),
        layer_type: str = "concat",
        nonlinearity: str = "softplus",
        alpha: float = 0.05,
        time_length: float = 0.5,
        solver: str = "rk4",
        step_size: float = 0.25,
    ):
        self.input_shape = tuple(input_shape)
        self.alpha = alpha
        self.logit = LogitTransform(alpha)
        self.squeeze = SqueezeLayer(2)
        self.scales: List[List[CNF]] = []
        h, w, c = input_shape
        shapes = []
        for s in range(n_scales):
            blocks = []
            for _ in range(n_blocks):
                net = ConvODEnet(
                    hidden_dims=tuple(hidden_dims),
                    out_channels=c,
                    layer_type=layer_type,
                    nonlinearity=nonlinearity,
                )
                blocks.append(
                    CNF(net, event_shape=(h, w, c), T=time_length,
                        solver=solver, step_size=step_size)
                )
            self.scales.append(blocks)
            shapes.append((h, w, c))
            if s < n_scales - 1:
                # squeeze then factor out half the channels
                h, w, c = h // 2, w // 2, 4 * c
                c = c // 2
        self.scale_shapes = shapes

    def init(self, key, x):
        params = []
        h = x
        lp = jnp.zeros((x.shape[0], 1), x.dtype)
        h, _, _ = self.logit.apply({}, h, lp, {})
        for s, blocks in enumerate(self.scales):
            scale_params = []
            for blk in blocks:
                key, sub = jax.random.split(key)
                scale_params.append(blk.init(sub, h))
            params.append(scale_params)
            if s < len(self.scales) - 1:
                h, _, _ = self.squeeze.apply({}, h, lp, {})
                c = h.shape[-1]
                h = h[..., : c // 2]
        return params

    def forward(self, params, x, key=None, training=True):
        """x -> (z_list, delta); log p(x) = sum priors(z) - delta."""
        B = x.shape[0]
        delta = jnp.zeros((B, 1), x.dtype)
        h, delta, _ = self.logit.apply({}, x, delta, {})
        zs = []
        for s, (blocks, scale_params) in enumerate(
            zip(self.scales, params)
        ):
            for blk, bp in zip(blocks, scale_params):
                if key is not None:
                    key, sub = jax.random.split(key)
                else:
                    sub = None
                (h, dlp, _), _ = blk.apply(bp, h, key=sub, training=training,
                                           exact_div=key is None)
                delta = delta + dlp
            if s < len(self.scales) - 1:
                h, delta, _ = self.squeeze.apply({}, h, delta, {})
                c = h.shape[-1]
                zs.append(h[..., c // 2:])
                h = h[..., : c // 2]
        zs.append(h)
        return zs, delta

    def log_prob(self, params, x, key=None, training=True):
        zs, delta = self.forward(params, x, key=key, training=training)
        logpz = sum(standard_normal_logprob(z) for z in zs)
        return logpz[:, None] - delta, zs

    @property
    def z_shapes(self):
        """Shapes of the factored-out latents, matching forward()'s zs."""
        shapes = []
        for s, (h, w, c) in enumerate(self.scale_shapes):
            if s < len(self.scale_shapes) - 1:
                shapes.append((h // 2, w // 2, 2 * c))
            else:
                shapes.append((h, w, c))
        return shapes

    def inverse(self, params, zs, key=None):
        """Latents -> image: exact inverse of forward() (the factor-out
        real-NVP inverse the reference's odenvp.py:8-200 implements with
        reverse=True). Returns (x, delta_rev) with delta_rev = -delta_fwd,
        so log p(x) = sum priors(zs) + delta_rev."""
        n_scales = len(self.scales)
        B = zs[-1].shape[0]
        delta = jnp.zeros((B, 1), zs[-1].dtype)
        h = zs[-1]
        for s in range(n_scales - 1, -1, -1):
            if s < n_scales - 1:
                # undo the factor-out (h was the kept first half) + squeeze
                h = jnp.concatenate([h, zs[s]], axis=-1)
                h, delta, _ = self.squeeze.apply({}, h, delta, {},
                                                 reverse=True)
            for blk, bp in zip(reversed(self.scales[s]),
                               reversed(params[s])):
                if key is not None:
                    key, sub = jax.random.split(key)
                else:
                    sub = None
                (h, dlp, _), _ = blk.apply(
                    bp, h, key=sub, training=False, reverse=True,
                    exact_div=key is None,
                )
                delta = delta + dlp
        x, delta, _ = self.logit.apply({}, h, delta, {}, reverse=True)
        return x, delta

    def sample(self, params, key, n: int, temp: float = 1.0,
               dtype=jnp.float32):
        """Prior samples pushed backwards through the flow (odenvp sampling:
        z ~ temp * N(0, I) per factored scale, then the exact inverse)."""
        zs = []
        for shape in self.z_shapes:
            key, sub = jax.random.split(key)
            zs.append(temp * jax.random.normal(sub, (n,) + shape, dtype))
        key, sub = jax.random.split(key)
        x, _ = self.inverse(params, zs, key=sub)
        return x


def _squeeze(x, f=2):
    b, h, w, c = x.shape
    y = x.reshape(b, h // f, f, w // f, f, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _unsqueeze(x, f=2):
    b, h, w, c = x.shape
    c2 = c // (f * f)
    y = x.reshape(b, h, w, f, f, c2).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h * f, w * f, c2)


class ParallelScaleDyn(nn.Module):
    """Sum of conv nets applied at multiple squeezed scales.

    The dynamics of MultiscaleParallelCNF
    (/root/reference/ffjord-pnode/lib/multiscale_parallel.py
    ParallelSumModules, :126-134): each scale squeezes k times, runs its own
    conv ODEnet, unsqueezes back, and the contributions are summed.
    """

    n_scale: int
    channels: int
    hidden_dims: Sequence[int] = (32,)
    layer_type: str = "concat"

    @nn.compact
    def __call__(self, t, y):
        out = jnp.zeros_like(y)
        for k in range(self.n_scale):
            z = y
            for _ in range(k):
                z = _squeeze(z)
            dz = ConvODEnet(
                hidden_dims=tuple(self.hidden_dims),
                out_channels=z.shape[-1],
                layer_type=self.layer_type,
            )(t, z)
            for _ in range(k):
                dz = _unsqueeze(dz)
            out = out + dz
        return out


class MultiscaleParallelCNF:
    """One full-resolution CNF whose dynamics sums per-scale conv nets
    (multiscale_parallel.py MultiscaleParallelCNF, :8-122). Downsamples
    until a spatial dim would drop below 4 (n_scale auto)."""

    def __init__(
        self,
        input_shape: Tuple[int, int, int],
        n_scale: int = 0,
        n_blocks: int = 1,
        intermediate_dims: Sequence[int] = (32,),
        alpha: float = -1.0,
        time_length: float = 1.0,
        solver: str = "rk4",
        step_size: float = 0.25,
    ):
        h, w, c = input_shape
        max_scale = 0
        hh, ww = h, w
        while hh >= 4 and ww >= 4:
            max_scale += 1
            hh //= 2
            ww //= 2
        self.n_scale = min(n_scale or max_scale, max_scale)
        self.input_shape = tuple(input_shape)
        self.pre = (LogitTransform(alpha) if alpha > 0
                    else __import__("pnode_tpu.ffjord.flows",
                                    fromlist=["ZeroMeanTransform"]
                                    ).ZeroMeanTransform())
        self.blocks = [
            CNF(
                ParallelScaleDyn(
                    n_scale=self.n_scale, channels=c,
                    hidden_dims=tuple(intermediate_dims),
                ),
                event_shape=input_shape,
                T=time_length,
                solver=solver,
                step_size=step_size,
            )
            for _ in range(n_blocks)
        ]

    def init(self, key, x):
        params = []
        for blk in self.blocks:
            key, sub = jax.random.split(key)
            params.append(blk.init(sub, x))
        return params

    def log_prob(self, params, x, key=None, training=True):
        B = x.shape[0]
        delta = jnp.zeros((B, 1), x.dtype)
        h, delta, _ = self.pre.apply({}, x, delta, {})
        for blk, bp in zip(self.blocks, params):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            (h, dlp, _), _ = blk.apply(bp, h, key=sub, training=training,
                                       exact_div=key is None)
            delta = delta + dlp
        logpz = standard_normal_logprob(h)
        return logpz[:, None] - delta, h

    def inverse(self, params, z, key=None):
        """Latent -> image (single full-resolution latent)."""
        delta = jnp.zeros((z.shape[0], 1), z.dtype)
        h = z
        for blk, bp in zip(reversed(self.blocks), reversed(params)):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            (h, dlp, _), _ = blk.apply(bp, h, key=sub, training=False,
                                       reverse=True, exact_div=key is None)
            delta = delta + dlp
        x, delta, _ = self.pre.apply({}, h, delta, {}, reverse=True)
        return x, delta

    def sample(self, params, key, n: int, temp: float = 1.0,
               dtype=jnp.float32):
        key, sub = jax.random.split(key)
        z = temp * jax.random.normal(sub, (n,) + self.input_shape, dtype)
        key, sub = jax.random.split(key)
        x, _ = self.inverse(params, z, key=sub)
        return x
