"""SINODE PDE model zoo (flax): learned stiff-PDE dynamics for Burgers & KS.

TPU-native equivalents of the reference's semi-implicit models:

- Burgers: fixed 3-point circular Laplacian implicit part
  (alpha/dx^2 [1,-2,1], /root/reference/examples-sinode/Burgers/Burgers.py:170-195
  ODEFuncIM) + learned ReLU stack explicit part (ODEFuncEX, :134-166).
- KS: fixed/learnable 5-point circular stencil implicit part
  (-d4/dx^4 - d2/dx^2, /root/reference/examples-sinode/KS/models/imex.py:6-43)
  + learned ReLU MLP explicit part (imex.py:47-80 ODEFuncEX returns -F(y));
  plus the "snode" (conv - MLP, models/snode.py) and "mlp"
  (sigmoid MLP, models/mlp.py) single-function variants.

Circular convolutions are expressed as k static `jnp.roll` AXPYs — XLA fuses
them into one VPU pass over the (batch, nx) block, which beats a length-3/5
conv1d dispatch on TPU.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def ks_fixed_kernel(dx: float) -> np.ndarray:
    """5-point stencil of -(d^4/dx^4) - (d^2/dx^2) (KS linear operator),
    matching /root/reference/examples-sinode/KS/models/imex.py:21-31."""
    return np.array(
        [
            -1.0 / dx**4,
            4.0 / dx**4 - 1.0 / dx**2,
            -6.0 / dx**4 + 2.0 / dx**2,
            4.0 / dx**4 - 1.0 / dx**2,
            -1.0 / dx**4,
        ]
    )


def burgers_fixed_kernel(dx: float, alpha: float = 8e-4) -> np.ndarray:
    """3-point stencil of alpha d^2/dx^2 (viscous term), matching
    /root/reference/examples-sinode/Burgers/Burgers.py:181-184."""
    return np.array([alpha / dx**2, -2.0 * alpha / dx**2, alpha / dx**2])


def circular_stencil_apply(y: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply a periodic cross-correlation stencil along the last axis.

    out[i] = sum_j kernel[j] * y[(i + j - k//2) mod N]  (torch conv1d with
    circular "same" padding). Unrolled as k rolls for XLA fusion.
    """
    k = kernel.shape[0]
    half = k // 2
    out = kernel[0] * jnp.roll(y, half, axis=-1)
    for j in range(1, k):
        out = out + kernel[j] * jnp.roll(y, half - j, axis=-1)
    return out


class CircularConv1D(nn.Module):
    """Single-channel circular conv (no bias); optionally a fixed stencil.

    fixed_kernel given -> non-trainable constant (the reference marks the
    torch parameter requires_grad=False); otherwise initialized
    U(-sqrt(1/k), sqrt(1/k)) like torch's Conv1d default.
    use_pallas: apply via the fused single-kernel stencil op on TPU.
    """

    kernel_size: int = 5
    fixed_kernel: Optional[tuple] = None  # hashable static field
    use_pallas: bool = False

    @nn.compact
    def __call__(self, y):
        if self.fixed_kernel is not None:
            kernel = jnp.asarray(np.asarray(self.fixed_kernel), y.dtype)
        else:
            bound = math.sqrt(1.0 / self.kernel_size)
            kernel = self.param(
                "kernel",
                lambda key, shape: jax.random.uniform(
                    key, shape, minval=-bound, maxval=bound
                ),
                (self.kernel_size,),
            ).astype(y.dtype)
        if self.use_pallas and jax.default_backend() in ("tpu", "axon"):
            from ..ops.circular_stencil import circular_stencil

            return circular_stencil(y, kernel)
        return circular_stencil_apply(y, kernel)


class StackedMLP(nn.Module):
    """Dense stack with configurable activation and init std (the reference
    initializes N(0, std) weights, zero bias — e.g. imex.py:56-58)."""

    features: Sequence[int]
    activation: Callable = nn.relu
    w_std: float = 0.01
    final_activation: bool = False

    @nn.compact
    def __call__(self, y):
        h = y
        n = len(self.features)
        for i, width in enumerate(self.features):
            h = nn.Dense(
                width,
                kernel_init=nn.initializers.normal(stddev=self.w_std),
                bias_init=nn.initializers.zeros,
            )(h)
            if i < n - 1 or self.final_activation:
                h = self.activation(h)
        return h


class FusedStackedMLP(nn.Module):
    """StackedMLP evaluated by ONE Pallas kernel on TPU.

    Profiling showed the SINODE training step is op-latency bound; the fused
    kernel (pnode_tpu/ops/fused_mlp.py) keeps every layer in VMEM and cuts
    the per-evaluation op count from ~15 to 1 (2.6x faster gradients on a
    v5e at the KS sizes). Off-TPU the same parameters run through plain jnp
    matmuls, so checkpoints are portable across backends. Supports
    relu/tanh activations (zero-padding-exact); no final activation.
    """

    features: Sequence[int]
    activation_name: str = "relu"
    w_std: float = 0.01

    @nn.compact
    def __call__(self, y):
        from ..ops import fused_mlp

        d_in = y.shape[-1]
        dims = [d_in] + list(self.features)
        Ws, bs = [], []
        for i in range(len(self.features)):
            Ws.append(self.param(
                f"kernel_{i}", nn.initializers.normal(stddev=self.w_std),
                (dims[i], dims[i + 1]),
            ).astype(y.dtype))
            bs.append(self.param(
                f"bias_{i}", nn.initializers.zeros, (dims[i + 1],)
            ).astype(y.dtype))
        backend = jax.default_backend()
        batch_shape = y.shape[:-1]
        y2 = y.reshape(-1, d_in)
        if backend in ("tpu", "axon") and y.dtype == jnp.float32:
            out = fused_mlp(y2, Ws, bs, self.activation_name)
        else:
            act = {"relu": nn.relu, "tanh": nn.tanh}[self.activation_name]
            h = y2
            for i, (W, b) in enumerate(zip(Ws, bs)):
                h = h @ W + b
                if i < len(Ws) - 1:
                    h = act(h)
            out = h
        return out.reshape(batch_shape + (dims[-1],))


class KSFuncIM(nn.Module):
    """KS implicit part: 5-point circular stencil (fixed or learnable)."""

    nx: int = 64
    L: float = 22.0
    fixed_linear: bool = True
    use_pallas: bool = False

    @property
    def linear_in_y(self):
        """True when f(t, y) is exactly linear in y with no affine part —
        the certification the fused ARK kernels need (their J applies use
        the frozen Jacobian, exact only for linear dynamics)."""
        return self.fixed_linear

    @nn.compact
    def __call__(self, t, y):
        dx = self.L / self.nx
        fixed = tuple(ks_fixed_kernel(dx)) if self.fixed_linear else None
        return CircularConv1D(kernel_size=5, fixed_kernel=fixed,
                              use_pallas=self.use_pallas)(y)


def _fused_stack_spec(variables, activation, sign):
    """Extract (Ws, bs, rebuild) from a single-FusedStackedMLP variable tree
    for the fused reverse-step kernel (ops/fused_ark_adjoint.py)."""
    p = variables.get("params", {})
    if len(p) != 1:
        return None
    sub_name = next(iter(p))
    sub = p[sub_name]
    n = len([k for k in sub if str(k).startswith("kernel_")])
    if n == 0 or len(sub) != 2 * n:
        return None
    Ws = [sub[f"kernel_{i}"] for i in range(n)]
    bs = [sub[f"bias_{i}"] for i in range(n)]

    def rebuild(dWs, dbs):
        leaf = {}
        for i in range(n):
            leaf[f"kernel_{i}"] = dWs[i]
            leaf[f"bias_{i}"] = dbs[i]
        return {"params": {sub_name: leaf}}

    return {"Ws": Ws, "bs": bs, "activation": activation, "sign": sign,
            "rebuild": rebuild}


class KSFuncEX(nn.Module):
    """KS explicit part: -MLP(y), hidden 104, ReLU (imex.py ODEFuncEX).

    use_pallas selects the fused single-kernel evaluation on TPU.
    """

    nx: int = 64
    hidden: int = 104
    use_pallas: bool = False

    @nn.compact
    def __call__(self, t, y):
        feats = (self.hidden,) * 4 + (self.nx,)
        if self.use_pallas:
            return -FusedStackedMLP(features=feats, activation_name="relu",
                                    w_std=0.01)(y)
        return -StackedMLP(features=feats, activation=nn.relu, w_std=0.01)(y)

    def fused_mlp_spec(self, variables):
        """Opt-in for the fused ARK reverse-step kernel: f_ex = -MLP."""
        if not self.use_pallas:
            return None
        return _fused_stack_spec(variables, "relu", -1.0)


class KSSnodeFunc(nn.Module):
    """KS "snode" single function: conv(y) - MLP(y) (models/snode.py)."""

    nx: int = 64
    L: float = 22.0
    hidden: int = 200
    fixed_linear: bool = True

    @nn.compact
    def __call__(self, t, y):
        dx = self.L / self.nx
        fixed = tuple(ks_fixed_kernel(dx)) if self.fixed_linear else None
        lin = CircularConv1D(kernel_size=5, fixed_kernel=fixed)(y)
        feats = (self.hidden,) * 4 + (self.nx,)
        return lin - StackedMLP(features=feats, activation=nn.relu, w_std=0.01)(y)


class KSMLPFunc(nn.Module):
    """KS "mlp" single function: sigmoid MLP (models/mlp.py)."""

    nx: int = 64
    hidden: int = 104

    @nn.compact
    def __call__(self, t, y):
        feats = (self.hidden,) * 4 + (self.nx,)
        return StackedMLP(features=feats, activation=nn.sigmoid, w_std=0.01)(y)


class BurgersFuncIM(nn.Module):
    """Burgers implicit part: fixed circular Laplacian alpha d2/dx2."""

    nx: int = 512
    alpha: float = 8e-4
    use_pallas: bool = False

    @property
    def linear_in_y(self):
        return True  # fixed stencil, no bias

    @nn.compact
    def __call__(self, t, y):
        dx = 1.0 / self.nx
        fixed = tuple(burgers_fixed_kernel(dx, self.alpha))
        return CircularConv1D(kernel_size=3, fixed_kernel=fixed,
                              use_pallas=self.use_pallas)(y)


class BurgersFuncEX(nn.Module):
    """Burgers explicit part: ReLU stack N -> 9N/8 x4 -> N, init N(0, 0.1)
    (Burgers.py:137-160). use_pallas selects the fused single-kernel
    evaluation on TPU (weights resident in VMEM)."""

    nx: int = 512
    use_pallas: bool = False

    @nn.compact
    def __call__(self, t, y):
        w = self.nx * 9 // 8
        feats = (w, w, w, w, self.nx)
        if self.use_pallas:
            return FusedStackedMLP(features=feats, activation_name="relu",
                                   w_std=0.1)(y)
        return StackedMLP(features=feats, activation=nn.relu, w_std=0.1)(y)

    def fused_mlp_spec(self, variables):
        """Opt-in for the fused ARK reverse-step kernel: f_ex = +MLP."""
        if not self.use_pallas:
            return None
        return _fused_stack_spec(variables, "relu", 1.0)
