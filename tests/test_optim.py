"""utils.flat_adam: optax-Adam parity at f32 storage, bf16-moment fidelity.

The transform exists because the Burgers-512 training step is
parameter-HBM-bound and the fp32 moment stream alone is ~12.6 MB/step
(tools/profile_sinode.py); bf16 storage halves it. These tests pin the
contract: f32 mode == optax.adam, bf16 mode tracks it within moment
rounding, and the transform composes with optax.flatten (the bench path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pnode_tpu.utils import flat_adam

jax.config.update("jax_platforms", "cpu")


def _params():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {
        "w1": jax.random.normal(ks[0], (32, 48), jnp.float32) * 0.2,
        "b1": jax.random.normal(ks[1], (48,), jnp.float32) * 0.1,
        "w2": jax.random.normal(ks[2], (48, 8), jnp.float32) * 0.2,
        "b2": jax.random.normal(ks[3], (8,), jnp.float32) * 0.1,
    }


def _loss(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    out = h @ p["w2"] + p["b2"]
    return jnp.mean(out ** 2)


def _train(opt, n=25):
    p = _params()
    x = jax.random.normal(jax.random.PRNGKey(7), (16, 32), jnp.float32)
    s = opt.init(p)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(_loss)(p, x)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for _ in range(n):
        p, s, loss = step(p, s)
        losses.append(float(loss))
    return p, losses


def test_f32_matches_optax_adam():
    p_ref, l_ref = _train(optax.adam(1e-2))
    p_new, l_new = _train(flat_adam(1e-2, moment_dtype="f32"))
    # op-ordering differences leave ~1-ulp (f32) residuals per step;
    # after 25 steps the trajectories agree to ~1e-7 absolute
    for k in p_ref:
        np.testing.assert_allclose(p_new[k], p_ref[k], rtol=1e-4, atol=5e-7)
    np.testing.assert_allclose(l_new, l_ref, rtol=1e-4)


def test_bf16_moments_track_f32():
    p_ref, l_ref = _train(flat_adam(1e-2, moment_dtype="f32"))
    p_bf, l_bf = _train(flat_adam(1e-2, moment_dtype="bf16"))
    # moments carry ~0.4% rounding; after 25 steps the params must stay
    # within ~1% relative of the fp32-moment trajectory and the loss
    # trajectory must still descend to the same level
    for k in p_ref:
        np.testing.assert_allclose(p_bf[k], p_ref[k], rtol=2e-2, atol=2e-3)
    assert l_bf[-1] < 0.5 * l_bf[0]
    np.testing.assert_allclose(l_bf[-1], l_ref[-1], rtol=5e-2)


def test_bf16_state_dtype_and_flatten_compose():
    p = _params()
    opt = optax.flatten(flat_adam(1e-2, moment_dtype="bf16"))
    s = opt.init(p)
    mu = jax.tree_util.tree_leaves(s[0].mu if hasattr(s[0], "mu") else s)
    # the flattened state must store bf16 moments (that IS the saving)
    dts = {a.dtype for a in jax.tree_util.tree_leaves(s)
           if hasattr(a, "dtype") and a.ndim >= 1}
    assert jnp.dtype(jnp.bfloat16) in dts, dts
    g = jax.grad(_loss)(p, jnp.ones((4, 32), jnp.float32))
    u, s2 = opt.update(g, s)
    leaves = jax.tree_util.tree_leaves(u)
    assert all(a.dtype == jnp.float32 for a in leaves)
    del mu


def test_schedule_callable():
    sched = optax.piecewise_constant_schedule(1e-2, {10: 0.1})
    p1, _ = _train(flat_adam(sched))
    p2, _ = _train(flat_adam(1e-2))
    # the schedule must actually change the trajectory after step 10
    diffs = [float(jnp.max(jnp.abs(p1[k] - p2[k]))) for k in p1]
    assert max(diffs) > 1e-5


def test_bad_moment_dtype():
    with pytest.raises(ValueError):
        flat_adam(1e-3, moment_dtype="f16")
