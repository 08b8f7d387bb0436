"""FFJORD CNF stack: exact log-density, inverse consistency, training step."""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.ffjord import (
    CNF,
    SequentialFlow,
    build_model_tabular,
    standard_normal_logprob,
)
from pnode_tpu.ffjord.flows import CNFLayer, MovingBatchNorm
from pnode_tpu.ffjord.layers import DIFFEQ_LAYERS
from pnode_tpu.ffjord.odefunc import ODEnet
from pnode_tpu.ffjord.toy_data import inf_train_gen
from pnode_tpu.ffjord.datasets import load_tabular


class LinearDyn(nn.Module):
    """dz/dt = z @ A^T with learnable A — analytically tractable flow."""

    dim: int

    @nn.compact
    def __call__(self, t, y):
        A = self.param("A", nn.initializers.zeros, (self.dim, self.dim))
        return y @ A.T


def test_cnf_exact_logdet_linear_flow():
    """For dz/dt = A z: z(T) = expm(AT) x and int div = T tr(A); the CNF's
    delta_logp must equal -T tr(A) exactly (brute-force divergence)."""
    import scipy.linalg

    D, T = 3, 0.7
    A = np.array([[0.3, 0.2, 0.0], [-0.1, -0.4, 0.1], [0.0, 0.2, 0.1]])
    cnf = CNF(LinearDyn(dim=D), input_dim=D, T=T, solver="dopri5",
              step_size=0.01)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, D)))
    params = cnf.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(A, a.dtype) if a.shape == (D, D) else a, params
    )
    (z, dlp, _), _ = cnf.apply(params, x, exact_div=True, training=False)
    z_exact = x @ jnp.asarray(scipy.linalg.expm(A * T)).T
    np.testing.assert_allclose(z, z_exact, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        dlp, -T * np.trace(A) * np.ones((5, 1)), rtol=1e-8
    )


def test_cnf_reverse_inverts_forward():
    D = 2
    net = ODEnet(hidden_dims=(16,), input_dim=D, layer_type="concatsquash")
    cnf = CNF(net, input_dim=D, T=0.5, step_size=0.02)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, D)))
    params = cnf.init(jax.random.PRNGKey(1), x)
    key = jax.random.PRNGKey(2)
    (z, dlp, _), _ = cnf.apply(params, x, key=key, training=False)
    (x_back, dlp_back, _), _ = cnf.apply(params, z, key=key, training=False,
                                         reverse=True)
    np.testing.assert_allclose(x_back, x, rtol=1e-5, atol=1e-7)
    # density changes cancel along the round trip
    np.testing.assert_allclose(dlp + dlp_back, 0.0, atol=1e-6)


def test_hutchinson_vs_exact_divergence():
    """Hutchinson with many probes converges to the exact divergence."""
    D = 2
    net = ODEnet(hidden_dims=(8,), input_dim=D)
    cnf = CNF(net, input_dim=D, T=0.3, step_size=0.05, rademacher=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(6, D)))
    params = cnf.init(jax.random.PRNGKey(3), x)
    (_, dlp_exact, _), _ = cnf.apply(params, x, exact_div=True, training=False)
    ests = []
    for i in range(64):
        (_, dlp, _), _ = cnf.apply(params, x, key=jax.random.PRNGKey(i),
                                   training=False)
        ests.append(dlp)
    est = jnp.mean(jnp.stack(ests), axis=0)
    np.testing.assert_allclose(est, dlp_exact, atol=5e-3)


@pytest.mark.slow
def test_cnf_training_step_reduces_nll():
    """One CNF block trains on 8gaussians: NLL decreases (adjoint grads)."""
    import optax

    D = 2
    model = build_model_tabular(
        dim=D, num_blocks=1, hidden_dims=(32, 32), step_size=0.05,
        time_length=0.5, solver="rk4",
    )
    x0 = jnp.asarray(inf_train_gen("8gaussians",
                                   np.random.default_rng(0), 256))
    params = model.init(jax.random.PRNGKey(0), x0)
    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    def nll(p, x, key):
        z, dlp, _ = model.apply(p, x, key=key, training=True)
        logpx = standard_normal_logprob(z)[:, None] - dlp
        return -jnp.mean(logpx)

    @jax.jit
    def step(p, s, x, key):
        loss, g = jax.value_and_grad(nll)(p, x, key)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    rng = np.random.default_rng(0)
    losses = []
    for i in range(30):
        x = jnp.asarray(inf_train_gen("8gaussians", rng, 256))
        params, opt_state, loss = step(params, opt_state, x,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2, losses[::10]
    # a correct NLL cannot (on average) beat the data's differential entropy
    # (~1.3 nats for 8gaussians) — guards against log-det sign errors that
    # reward collapse (NLL -> -inf)
    assert losses[-1] > 0.5, losses[-5:]


def test_regularization_states_accumulate():
    D = 2
    net = ODEnet(hidden_dims=(8,), input_dim=D)
    cnf = CNF(net, input_dim=D, T=0.5, step_size=0.05,
              regularization_fns=["l2int", "JFrobint"])
    x = jnp.asarray(np.random.default_rng(5).normal(size=(4, D)))
    params = cnf.init(jax.random.PRNGKey(5), x)
    (_, _, regs), _ = cnf.apply(params, x, key=jax.random.PRNGKey(6),
                                training=False)
    assert regs.shape == (4, 2)
    assert bool(jnp.all(regs >= 0))  # nonnegative densities integrate >= 0


@pytest.mark.parametrize("layer_type", sorted(DIFFEQ_LAYERS))
def test_diffeq_layers_forward_shapes(layer_type):
    net = ODEnet(hidden_dims=(12,), input_dim=3, layer_type=layer_type)
    x = jnp.ones((4, 3))
    p = net.init(jax.random.PRNGKey(0), 0.3, x)
    out = net.apply(p, 0.3, x)
    assert out.shape == (4, 3)
    # t must actually matter for time-dependent families
    out2 = net.apply(p, 0.9, x)
    if layer_type != "ignore":
        assert not np.allclose(out, out2)


@pytest.mark.parametrize("layer_type", ["ignore", "concat", "concat_v2",
                                        "concatcoord", "concatsquash",
                                        "squash", "blend", "hyper"])
def test_diffeq_conv_layers_forward_shapes_and_grads(layer_type):
    """Every reference --layer_type string resolves for the conv family
    (HyperConv2d basic.py:89, SquashConv2d :179, ConcatConv2d_v2 :244,
    BlendConv2d :435 included), keeps NHWC shape, depends on t, and has
    finite parameter gradients."""
    from pnode_tpu.ffjord.layers import DIFFEQ_CONV_LAYERS, build_diffeq_layer

    assert layer_type in DIFFEQ_CONV_LAYERS
    layer = build_diffeq_layer(layer_type, 3, conv=True)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 6, 6, 3)),
                    jnp.float32)
    p = layer.init(jax.random.PRNGKey(1), 0.3, x)
    out = layer.apply(p, 0.3, x)
    assert out.shape == (2, 6, 6, 3)
    out2 = layer.apply(p, 0.9, x)
    if layer_type != "ignore":
        assert not np.allclose(out, out2)

    g = jax.grad(lambda pp: jnp.sum(layer.apply(pp, 0.3, x) ** 2))(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_moving_batch_norm_invertible():
    bn = MovingBatchNorm(3)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(16, 3)) * 2 + 1)
    params = bn.init(jax.random.PRNGKey(0), x)
    state = bn.init_state(x)
    lp = jnp.zeros((16, 1))
    y, lpy, new_state = bn.apply(params, x, lp, state, training=True)
    x_back, lp_back, _ = bn.apply(params, y, lpy, new_state, training=False,
                                  reverse=True)
    # reverse uses running stats (decay-mixed), so tolerance is loose
    assert x_back.shape == x.shape
    # with running stats == batch stats it inverts exactly
    exact_state = {"running_mean": jnp.mean(x, 0), "running_var": jnp.var(x, 0)}
    y2, lpy2, _ = bn.apply(params, x, lp, exact_state, training=False)
    x2, lp2, _ = bn.apply(params, y2, lpy2, exact_state, training=False,
                          reverse=True)
    np.testing.assert_allclose(x2, x, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(lp2, lp, atol=1e-8)


def test_tabular_datasets_synthetic_fallback():
    d = load_tabular("miniboone")
    assert d.dim == 43
    assert d.synthetic  # no MAF files in this environment
    assert d.trn.shape[0] > d.val.shape[0]
