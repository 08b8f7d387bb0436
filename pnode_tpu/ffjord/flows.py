"""Flow containers and non-ODE flow layers.

Rebuild of the reference's flow infrastructure:
- SequentialFlow (/root/reference/ffjord-pnode/lib/layers/container.py:4-25):
  chains layers forward/reverse, threading log-density.
- MovingBatchNorm1d (lib/layers/normalization.py:8-145): affine batch norm
  with running stats and exact log-det contribution.
- Elementwise transforms (lib/layers/elemwise.py): ZeroMean / Logit /
  Sigmoid with exact log-dets (used by the image pipelines).
- SqueezeLayer (lib/layers/squeeze.py): space-to-channel reshuffle for
  multiscale image CNFs.

All layers use one functional protocol:

    layer.init(key, x) -> params (a pytree; {} if stateless)
    layer.apply(params, x, delta, state, key, training, reverse)
        -> (y, delta', new_state)

where ``delta`` is the accumulated log-density change with the REFERENCE
convention ``log p_x(x) = log p_z(z) - delta`` (train_tabular.py
compute_loss: ``logpx = logpz - delta_logp``); ``state`` carries running
statistics (MovingBatchNorm); stateless layers pass both through unchanged.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


class FlowLayer:
    def init(self, key, x):
        return {}

    def init_state(self, x):
        return {}

    def apply(self, params, x, logpx, state, key=None, training=True,
              reverse=False, **kw):
        raise NotImplementedError


class CNFLayer(FlowLayer):
    """Adapter embedding a CNF block into a flow chain."""

    def __init__(self, cnf):
        self.cnf = cnf
        self.last_regs = None
        self.last_stats = None

    def init(self, key, x):
        return self.cnf.init(key, x)

    def apply(self, params, x, delta, state, key=None, training=True,
              reverse=False, exact_div=False):
        (z, dlp, regs), stats = self.cnf.apply(
            params, x, key=key, training=training, reverse=reverse,
            exact_div=exact_div,
        )
        self.last_regs = regs
        self.last_stats = stats
        # each integration direction measures its own -int div; accumulating
        # it directly makes forward+reverse cancel on a round trip
        return z, delta + dlp, state


class MovingBatchNorm(FlowLayer):
    """Affine normalization with running stats + exact log-det
    (normalization.py:8-145). Running stats live in explicit flow state."""

    def __init__(self, dim: int, bn_lag: float = 0.0, decay: float = 0.1,
                 affine: bool = True, eps: float = 1e-4):
        self.dim = dim
        self.decay = decay
        self.bn_lag = bn_lag
        self.affine = affine
        self.eps = eps

    def init(self, key, x):
        if not self.affine:
            return {}
        return {
            "log_gamma": jnp.zeros((self.dim,), x.dtype),
            "beta": jnp.zeros((self.dim,), x.dtype),
        }

    def init_state(self, x):
        return {
            "running_mean": jnp.zeros((self.dim,), x.dtype),
            "running_var": jnp.ones((self.dim,), x.dtype),
        }

    def apply(self, params, x, logpx, state, key=None, training=True,
              reverse=False, **kw):
        if reverse:
            return self._reverse(params, x, logpx, state)
        if training:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            new_state = {
                "running_mean": (1 - self.decay) * state["running_mean"]
                + self.decay * mean,
                "running_var": (1 - self.decay) * state["running_var"]
                + self.decay * var,
            }
            use_mean, use_var = mean, var
        else:
            new_state = state
            use_mean, use_var = state["running_mean"], state["running_var"]
        y = (x - use_mean) / jnp.sqrt(use_var + self.eps)
        ldj = -0.5 * jnp.log(use_var + self.eps)
        if self.affine:
            y = y * jnp.exp(params["log_gamma"]) + params["beta"]
            ldj = ldj + params["log_gamma"]
        # log p_x = log p_y + sum(ldj)  =>  delta -= sum(ldj)
        delta_out = logpx - jnp.sum(ldj) * jnp.ones_like(logpx)
        return y, delta_out, new_state

    def _reverse(self, params, y, delta, state):
        use_mean, use_var = state["running_mean"], state["running_var"]
        ldj = -0.5 * jnp.log(use_var + self.eps)
        if self.affine:
            y = (y - params["beta"]) * jnp.exp(-params["log_gamma"])
            ldj = ldj + params["log_gamma"]
        x = y * jnp.sqrt(use_var + self.eps) + use_mean
        delta_out = delta + jnp.sum(ldj) * jnp.ones_like(delta)
        return x, delta_out, state


class ZeroMeanTransform(FlowLayer):
    """x -> x - 0.5 (image preprocessing; zero log-det)."""

    def apply(self, params, x, logpx, state, reverse=False, **kw):
        return (x + 0.5 if reverse else x - 0.5), logpx, state


class LogitTransform(FlowLayer):
    """x -> logit(alpha + (1-2 alpha) x) with exact log-det
    (elemwise logit used for image dequantization pipelines)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha

    def apply(self, params, x, delta, state, reverse=False, **kw):
        a = self.alpha

        def _acc(delta, ldj, ndim):
            red = tuple(range(1, ndim))
            d = jnp.sum(ldj, axis=red).reshape(delta.shape[0], *([1] * (delta.ndim - 1)))
            return delta - d  # delta -= log|dy/dx|

        if reverse:
            s = jax.nn.sigmoid(x)
            y = (s - a) / (1 - 2 * a)
            ldj = jnp.log(s) + jnp.log1p(-s) - jnp.log(jnp.asarray(1 - 2 * a))
            return y, _acc(delta, ldj, x.ndim), state
        s = a + (1 - 2 * a) * x
        y = jnp.log(s) - jnp.log1p(-s)
        ldj = jnp.log(jnp.asarray(1 - 2 * a)) - jnp.log(s) - jnp.log1p(-s)
        return y, _acc(delta, ldj, x.ndim), state


class SigmoidTransform(FlowLayer):
    """Inverse of LogitTransform(alpha=0)."""

    def apply(self, params, x, logpx, state, reverse=False, **kw):
        lt = LogitTransform(0.0)
        return lt.apply(params, x, logpx, state, reverse=not reverse, **kw)


class SqueezeLayer(FlowLayer):
    """Space-to-channel (squeeze.py): (B,H,W,C) -> (B,H/2,W/2,4C); volume
    preserving (zero log-det)."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def apply(self, params, x, logpx, state, reverse=False, **kw):
        f = self.factor
        b, h, w, c = x.shape
        if reverse:
            c2 = c // (f * f)
            y = x.reshape(b, h, w, f, f, c2).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, h * f, w * f, c2)
        else:
            y = x.reshape(b, h // f, f, w // f, f, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)
        return y, logpx, state


class SequentialFlow:
    """Chain of FlowLayers threading (x, logpx, state)
    (container.py:4-25; reverse iterates the chain backwards)."""

    def __init__(self, layers: Sequence[FlowLayer]):
        self.layers = list(layers)

    def init(self, key, x):
        params = []
        keys = jax.random.split(key, len(self.layers))
        xx = x
        for k, layer in zip(keys, self.layers):
            params.append(layer.init(k, xx))
            # advance a sample through to size later layers correctly
            lp = jnp.zeros((x.shape[0], 1), x.dtype)
            st = layer.init_state(xx)
            xx, _, _ = layer.apply(params[-1], xx, lp, st, key=k,
                                   training=False)
        return params

    def init_state(self, x):
        states = []
        xx = x
        for layer in self.layers:
            states.append(layer.init_state(xx))
            lp = jnp.zeros((x.shape[0], 1), x.dtype)
            xx, _, _ = layer.apply(
                layer.init(jax.random.PRNGKey(0), xx), xx, lp, states[-1],
                key=jax.random.PRNGKey(0), training=False,
            )
        return states

    def apply(self, params, x, logpx=None, states=None, key=None,
              training=True, reverse=False, **kw):
        if logpx is None:
            logpx = jnp.zeros((x.shape[0], 1), x.dtype)
        if states is None:
            states = [layer.init_state(x) for layer in self.layers]
        idx = range(len(self.layers) - 1, -1, -1) if reverse else range(
            len(self.layers)
        )
        new_states = list(states)
        keys = jax.random.split(
            key if key is not None else jax.random.PRNGKey(0), len(self.layers)
        )
        for i in idx:
            x, logpx, new_states[i] = self.layers[i].apply(
                params[i], x, logpx, states[i], key=keys[i],
                training=training, reverse=reverse, **kw,
            )
        return x, logpx, new_states
