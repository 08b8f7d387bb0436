"""Time-dependent diffeq layer zoo (flax).

Rebuild of /root/reference/ffjord-pnode/lib/layers/diffeq_layers/basic.py:
the Ignore/Concat/Squash/ConcatSquash/Hyper/Blend/ConcatCoord families, for
dense (tabular) and 2-D conv (image) variants. Each layer maps
``(t, y) -> y'`` where t is a scalar; how t enters distinguishes the family:

- ignore:        f(y)                      (IgnoreLinear, basic.py:13)
- concat:        f([y, t])                 (ConcatLinear, :64)
- squash:        f(y) * sigmoid(gate(t))   (SquashLinear, :46)
- concatsquash:  f(y)*sigmoid(g(t)) + b(t) (ConcatSquashLinear, :90)
- hyper:         weights generated from t  (HyperLinear, :25)
- blend:         W0 + t (W1 - W0)          (BlendLinear, :107)
- concat_v2:     f(y) + a*t                (ConcatLinear_v2, :77)
- concatcoord:   conv variant concatenating coordinate grids
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


def _t_feat(t, batch_shape):
    """Broadcast scalar t to (..., 1) matching the batch dims."""
    return jnp.broadcast_to(jnp.asarray(t, jnp.result_type(float)), batch_shape + (1,))


class IgnoreLinear(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, t, y):
        return nn.Dense(self.dim_out)(y)


class ConcatLinear(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, t, y):
        ty = jnp.concatenate([_t_feat(t, y.shape[:-1]).astype(y.dtype), y], -1)
        return nn.Dense(self.dim_out)(ty)


class ConcatLinearV2(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, t, y):
        out = nn.Dense(self.dim_out)(y)
        t_part = nn.Dense(self.dim_out, use_bias=False)(
            _t_feat(t, y.shape[:-1]).astype(y.dtype)
        )
        return out + t_part


class SquashLinear(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, t, y):
        gate = nn.Dense(self.dim_out)(_t_feat(t, y.shape[:-1]).astype(y.dtype))
        return nn.Dense(self.dim_out)(y) * nn.sigmoid(gate)


class ConcatSquashLinear(nn.Module):
    """The FFJORD default: f(y)*sigmoid(gate(t)) + bias(t)
    (ConcatSquashLinear, basic.py:90-104)."""

    dim_out: int

    @nn.compact
    def __call__(self, t, y):
        tf = _t_feat(t, y.shape[:-1]).astype(y.dtype)
        gate = nn.Dense(self.dim_out)(tf)
        bias = nn.Dense(self.dim_out, use_bias=False)(tf)
        return nn.Dense(self.dim_out)(y) * nn.sigmoid(gate) + bias


class HyperLinear(nn.Module):
    """Weights generated from t by a hypernetwork (HyperLinear, basic.py:25)."""

    dim_out: int
    hypernet_dim: int = 8

    @nn.compact
    def __call__(self, t, y):
        dim_in = y.shape[-1]
        n_params = self.dim_out * dim_in + self.dim_out
        tf = jnp.asarray(t, y.dtype).reshape(1)
        h = nn.tanh(nn.Dense(self.hypernet_dim)(tf))
        wb = nn.Dense(n_params, kernel_init=nn.initializers.normal(0.01))(h)
        b = wb[: self.dim_out]
        W = wb[self.dim_out:].reshape(self.dim_out, dim_in)
        return y @ W.T + b


class BlendLinear(nn.Module):
    """W(t) = W0 + t (W1 - W0) (BlendLinear, basic.py:107)."""

    dim_out: int

    @nn.compact
    def __call__(self, t, y):
        f0 = nn.Dense(self.dim_out)(y)
        f1 = nn.Dense(self.dim_out)(y)
        tt = jnp.asarray(t, y.dtype)
        return f0 + tt * (f1 - f0)


# -- conv (image) variants ---------------------------------------------------

class IgnoreConv2d(nn.Module):
    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        return Conv(self.dim_out, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride), padding="SAME")(y)


class ConcatConv2d(nn.Module):
    """Concatenate a constant-t channel (ConcatConv2d, basic.py:190)."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        # y: (B, H, W, C) in NHWC
        tt = jnp.full(y.shape[:-1] + (1,), jnp.asarray(t, y.dtype))
        ty = jnp.concatenate([tt, y], -1)
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        return Conv(self.dim_out, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride), padding="SAME")(ty)


class ConcatCoordConv2d(nn.Module):
    """Concatenate t and normalized coordinate grids (ConcatCoordConv2d)."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        b, h, w, _ = y.shape
        hh = jnp.linspace(-1.0, 1.0, h, dtype=y.dtype)
        ww = jnp.linspace(-1.0, 1.0, w, dtype=y.dtype)
        gy, gx = jnp.meshgrid(hh, ww, indexing="ij")
        coords = jnp.stack([gy, gx], -1)[None].repeat(b, axis=0)
        tt = jnp.full((b, h, w, 1), jnp.asarray(t, y.dtype))
        ty = jnp.concatenate([tt, coords, y], -1)
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        return Conv(self.dim_out, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride), padding="SAME")(ty)


class SquashConv2d(nn.Module):
    """conv(y) * sigmoid(gate(t)) (SquashConv2d, basic.py:179-210)."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        tf = jnp.asarray(t, y.dtype).reshape(1)
        gate = nn.Dense(self.dim_out)(tf)
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        out = Conv(self.dim_out, (self.ksize, self.ksize),
                   strides=(self.stride, self.stride), padding="SAME")(y)
        return out * nn.sigmoid(gate)


class ConcatConv2dV2(nn.Module):
    """conv(y) + bias(t) broadcast over H,W (ConcatConv2d_v2,
    basic.py:244-272)."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        tf = jnp.asarray(t, y.dtype).reshape(1)
        bias = nn.Dense(self.dim_out, use_bias=False)(tf)
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        out = Conv(self.dim_out, (self.ksize, self.ksize),
                   strides=(self.stride, self.stride), padding="SAME")(y)
        return out + bias


class BlendConv2d(nn.Module):
    """conv0(y) + t (conv1(y) - conv0(y)) (BlendConv2d, basic.py:435-475)."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        conv = lambda: Conv(self.dim_out, (self.ksize, self.ksize),
                            strides=(self.stride, self.stride),
                            padding="SAME")
        f0 = conv()(y)
        f1 = conv()(y)
        tt = jnp.asarray(t, y.dtype)
        return f0 + tt * (f1 - f0)


class HyperConv2d(nn.Module):
    """Conv kernel+bias generated from t by a hypernetwork (HyperConv2d,
    basic.py:89-153). The generated kernel is applied with
    ``lax.conv_general_dilated`` in NHWC/HWIO layout."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        dim_in = y.shape[-1]
        k = self.ksize
        n_w = dim_in * self.dim_out * k * k
        tf = jnp.asarray(t, y.dtype).reshape(1)
        wb = nn.Dense(n_w + self.dim_out,
                      kernel_init=nn.initializers.normal(0.01))(tf)
        kernel = wb[:n_w].reshape(k, k, dim_in, self.dim_out)
        bias = wb[n_w:]
        if self.transpose:
            out = jax.lax.conv_transpose(
                y, kernel, strides=(self.stride, self.stride),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            out = jax.lax.conv_general_dilated(
                y, kernel, window_strides=(self.stride, self.stride),
                padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return out + bias


class ConcatSquashConv2d(nn.Module):
    dim_out: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, t, y):
        tf = jnp.asarray(t, y.dtype).reshape(1)
        gate = nn.Dense(self.dim_out)(tf)
        bias = nn.Dense(self.dim_out, use_bias=False)(tf)
        Conv = nn.ConvTranspose if self.transpose else nn.Conv
        out = Conv(self.dim_out, (self.ksize, self.ksize),
                   strides=(self.stride, self.stride), padding="SAME")(y)
        return out * nn.sigmoid(gate) + bias


class GatedLinear(nn.Module):
    """f(x) * sigmoid(g(x)) — the gated dense unit
    (/root/reference/ffjord-pnode/lib/layers/diffeq_layers/basic.py:344-353).
    Not time-dependent: the reference's gated family comes from its VAE-flow
    heritage and takes only x."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        f = nn.Dense(self.dim_out)(x)
        g = nn.Dense(self.dim_out)(x)
        return f * nn.sigmoid(g)


class GatedConv(nn.Module):
    """Gated 2-D convolution (basic.py:356-383). NHWC layout."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    padding: str = "SAME"
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        conv = lambda: nn.Conv(
            self.dim_out, (self.ksize, self.ksize),
            strides=(self.stride, self.stride), padding=self.padding,
            feature_group_count=self.groups,
        )
        return conv()(x) * nn.sigmoid(conv()(x))


class GatedConvTranspose(nn.Module):
    """Gated transposed 2-D convolution (basic.py:386-424). NHWC layout."""

    dim_out: int
    ksize: int = 3
    stride: int = 1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        conv = lambda: nn.ConvTranspose(
            self.dim_out, (self.ksize, self.ksize),
            strides=(self.stride, self.stride), padding=self.padding,
        )
        return conv()(x) * nn.sigmoid(conv()(x))


DIFFEQ_LAYERS = {
    "ignore": IgnoreLinear,
    "concat": ConcatLinear,
    "concat_v2": ConcatLinearV2,
    "squash": SquashLinear,
    "concatsquash": ConcatSquashLinear,
    "hyper": HyperLinear,
    "blend": BlendLinear,
    # the reference maps concatcoord -> ConcatLinear for the dense path
    # (odefunc.py:136: coordinates only exist for images)
    "concatcoord": ConcatLinear,
}

DIFFEQ_CONV_LAYERS = {
    "ignore": IgnoreConv2d,
    "concat": ConcatConv2d,
    "concat_v2": ConcatConv2dV2,
    "concatcoord": ConcatCoordConv2d,
    "concatsquash": ConcatSquashConv2d,
    "squash": SquashConv2d,
    "blend": BlendConv2d,
    "hyper": HyperConv2d,
}


def build_diffeq_layer(layer_type: str, dim_out: int, conv: bool = False, **kw):
    table = DIFFEQ_CONV_LAYERS if conv else DIFFEQ_LAYERS
    if layer_type not in table:
        raise ValueError(
            f"unknown layer_type {layer_type!r}; options: {sorted(table)}"
        )
    return table[layer_type](dim_out=dim_out, **kw)
