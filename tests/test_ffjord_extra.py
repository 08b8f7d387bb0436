"""Coupling/planar flows, spectral norm, ODENVP multiscale image CNF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.ffjord.flows import SequentialFlow
from pnode_tpu.ffjord.odenvp import ODENVP
from pnode_tpu.ffjord.other_flows import (
    CouplingLayer,
    PlanarFlow,
    SpectralDense,
    spectral_normalize,
)


def test_coupling_layer_invertible_with_logdet():
    layer = CouplingLayer(6, hidden=(16,))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6)))
    params = layer.init(jax.random.PRNGKey(0), x)
    # perturb net so scales are nontrivial
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 * np.random.default_rng(1).normal(size=a.shape),
        params,
    )
    d0 = jnp.zeros((8, 1))
    y, d1, _ = layer.apply(params, x, d0, {})
    x_back, d2, _ = layer.apply(params, y, d1, {}, reverse=True)
    np.testing.assert_allclose(x_back, x, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d2, 0.0, atol=1e-10)
    assert float(jnp.max(jnp.abs(d1))) > 1e-3  # nontrivial log-det

    # log-det matches autodiff jacobian determinant
    def fwd(xx):
        yy, _, _ = layer.apply(params, xx[None], jnp.zeros((1, 1)), {})
        return yy[0]

    J = jax.jacfwd(fwd)(x[0])
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    # delta = -logdet
    np.testing.assert_allclose(float(d1[0, 0]), -logdet, rtol=1e-8)


def test_planar_flow_logdet_matches_autodiff():
    flow = PlanarFlow(3)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 3)))
    params = flow.init(jax.random.PRNGKey(2), x)
    d0 = jnp.zeros((4, 1))
    y, d1, _ = flow.apply(params, x, d0, {})

    def fwd(xx):
        yy, _, _ = flow.apply(params, xx[None], jnp.zeros((1, 1)), {})
        return yy[0]

    J = jax.jacfwd(fwd)(x[1])
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(float(d1[1, 0]), -logdet, rtol=1e-6)


def test_spectral_normalize_unit_norm():
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.normal(size=(10, 7)) * 3.0)
    u = jnp.asarray(rng.normal(size=(7,)))
    Wn = W
    for _ in range(50):
        Wn, u = spectral_normalize(W, u)
    sigma = np.linalg.svd(np.asarray(Wn), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)


def test_spectral_dense_applies():
    layer = SpectralDense(5)
    x = jnp.ones((3, 4))
    vars_ = layer.init(jax.random.PRNGKey(0), x)
    y, mutated = layer.apply(vars_, x, mutable=["spectral"])
    assert y.shape == (3, 5)
    assert "spectral" in mutated


@pytest.mark.slow
def test_odenvp_log_prob_and_grads():
    model = ODENVP((8, 8, 1), n_scales=2, n_blocks=1, hidden_dims=(8,),
                   step_size=0.25)
    x = jnp.asarray(
        np.random.default_rng(4).random((2, 8, 8, 1)), jnp.float32
    ) * 0.9 + 0.05
    params = model.init(jax.random.PRNGKey(0), x)
    logp, zs = model.log_prob(params, x, key=jax.random.PRNGKey(1))
    assert logp.shape == (2, 1)
    # factored shapes: scale0 squeeze(8,8,1)->(4,4,4), half out -> (4,4,2)
    assert zs[0].shape == (2, 4, 4, 2)
    assert zs[1].shape == (2, 4, 4, 2)

    def nll(p):
        lp, _ = model.log_prob(p, x, key=jax.random.PRNGKey(1))
        return -jnp.mean(lp)

    g = jax.grad(nll)(params)
    norms = [float(jnp.linalg.norm(a)) for a in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)


@pytest.mark.slow
def test_multiscale_parallel_cnf():
    from pnode_tpu.ffjord.odenvp import MultiscaleParallelCNF

    m = MultiscaleParallelCNF((8, 8, 1), n_blocks=1, intermediate_dims=(8,),
                              step_size=0.5)
    assert m.n_scale == 2  # 8 -> 4 -> 2 (stops when < 4)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 1)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    logp, z = m.log_prob(params, x, key=jax.random.PRNGKey(1))
    assert logp.shape == (2, 1) and z.shape == x.shape

    def nll(p):
        lp, _ = m.log_prob(p, x, key=jax.random.PRNGKey(1))
        return -jnp.mean(lp)

    g = jax.grad(nll)(params)
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))
