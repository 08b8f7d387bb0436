"""Coupling/planar flows, spectral norm, ODENVP multiscale image CNF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import jax.flatten_util

from pnode_tpu.ffjord.flows import SequentialFlow
from pnode_tpu.ffjord.odenvp import ODENVP
from pnode_tpu.ffjord.other_flows import (
    CouplingLayer,
    MaskedCouplingLayer,
    PlanarFlow,
    SpectralDense,
    sample_mask,
    spectral_normalize,
)


@pytest.mark.parametrize("mask_type,swap", [
    ("alternate", False), ("alternate", True),
    ("channel", False), ("channel", True),
])
def test_masked_coupling_invertible_with_logdet(mask_type, swap):
    layer = MaskedCouplingLayer(6, hidden=(16,), mask_type=mask_type, swap=swap)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 6)))
    params = layer.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 * np.random.default_rng(1).normal(size=a.shape),
        params,
    )
    d0 = jnp.zeros((8, 1))
    y, d1, _ = layer.apply(params, x, d0, {})
    # masked positions pass through unchanged
    mask = np.asarray(sample_mask(6, mask_type, swap))
    np.testing.assert_allclose(
        np.asarray(y)[:, mask == 1.0], np.asarray(x)[:, mask == 1.0]
    )
    x_back, d2, _ = layer.apply(params, y, d1, {}, reverse=True)
    np.testing.assert_allclose(x_back, x, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d2, 0.0, atol=1e-10)
    assert float(jnp.max(jnp.abs(d1))) > 1e-3

    # log-det matches the autodiff jacobian determinant
    def fwd(xx):
        yy, _, _ = layer.apply(params, xx[None], jnp.zeros((1, 1)), {})
        return yy[0]

    J = jax.jacfwd(fwd)(x[0])
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(float(d1[0, 0]), -logdet, rtol=1e-8)


def test_sample_mask_unknown_type_raises():
    with pytest.raises(ValueError):
        sample_mask(4, "diagonal")


def test_autoencoder_divergence_matches_composed_jacobian():
    """The bottleneck estimator e^T (J_enc J_dec) e must equal the same
    quadratic form computed from explicit jacfwd Jacobians, and its
    probe-average must approach tr(J_dec J_enc) = div of decode(encode(y))."""
    from pnode_tpu.ffjord.odefunc import (
        AutoencoderDiffEqNet,
        autoencoder_divergence_fn,
    )

    net = AutoencoderDiffEqNet(hidden_dims=(8, 3, 8), input_dim=5,
                               layer_type="concat", nonlinearity="tanh")
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=(4, 5)))
    params = net.init(jax.random.PRNGKey(1), 0.1, y)
    assert net.bottleneck_dim == 3

    enc = lambda z: net.apply(params, 0.1, z, method="encode")
    dec = lambda h: net.apply(params, 0.1, h, method="decode")

    e = jnp.asarray(rng.normal(size=(4, 3)))
    dy, div = autoencoder_divergence_fn(enc, dec, y, e)

    # identity check per sample against explicit jacobians
    for i in range(4):
        J_enc = jax.jacfwd(lambda z: enc(z[None])[0])(y[i])   # (H, D)
        J_dec = jax.jacfwd(lambda h: dec(h[None])[0])(enc(y[i][None])[0])  # (D, H)
        quad = float(e[i] @ (J_enc @ J_dec) @ e[i])
        np.testing.assert_allclose(float(div[i]), quad, rtol=1e-10)
        # probe-free ground truth: exact trace identity
        tr = float(jnp.trace(J_enc @ J_dec))
        # Hutchinson over many rademacher probes converges to tr
        keys = jax.random.split(jax.random.PRNGKey(3), 512)
        es = jax.vmap(
            lambda k: jax.random.bernoulli(k, 0.5, (3,)).astype(y.dtype) * 2 - 1
        )(keys)
        _, divs = jax.vmap(
            lambda ee: autoencoder_divergence_fn(enc, dec, y[i][None], ee[None])
        )(es)
        assert abs(float(jnp.mean(divs)) - tr) < 0.35
        break  # one sample suffices for the MC part

    # dy is the decoder(encoder(y)) primal
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dec(enc(y))), rtol=1e-12)


def test_cnf_autoencode_runs_and_is_finite():
    from pnode_tpu.ffjord.cnf import CNF
    from pnode_tpu.ffjord.odefunc import AutoencoderDiffEqNet

    net = AutoencoderDiffEqNet(hidden_dims=(8, 4, 8), input_dim=6,
                               layer_type="concat", nonlinearity="softplus")
    cnf = CNF(net, input_dim=6, T=0.25, solver="rk4", step_size=0.25 / 4,
              autoencode=True)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(8, 6)))
    params = cnf.init(jax.random.PRNGKey(0), x)
    (z, dlp, regs), _ = cnf.apply(params, x, key=jax.random.PRNGKey(2),
                                  training=False)
    assert z.shape == (8, 6) and dlp.shape == (8, 1)
    assert np.isfinite(np.asarray(z)).all() and np.isfinite(np.asarray(dlp)).all()
    # gradient flows through the adjoint path
    def loss(p):
        (zz, dd, _), _ = cnf.apply(p, x, key=jax.random.PRNGKey(2), training=True)
        return jnp.sum(zz**2) + jnp.sum(dd)
    g = jax.grad(loss)(params)
    flat = jax.flatten_util.ravel_pytree(g)[0]
    assert np.isfinite(np.asarray(flat)).all() and float(jnp.abs(flat).max()) > 0


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
