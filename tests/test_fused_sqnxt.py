"""Fused SqueezeNext dynamics kernel vs the flax ODEDynamics oracle.

The flax module (models/sqnxt.py, rebuilding the reference's BasicBlock2
— /root/reference/examples-pnode/models/sqnxt_PETSc.py:71-121) is the
ground truth; the kernel runs in interpret mode on CPU. Covers: forward
parity (f32 + lane-padded shapes), the single-pass statistics branch,
gradient parity wrt state and every parameter, and bf16 shape/dtype
behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.models.sqnxt import ODEDynamics, BatchStatsNorm, _conv
from pnode_tpu.ops import fused_sqnxt as fs


def _setup(dim=16, B=4, H=8, W=8, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, dim)).astype("float32"))
    mod = ODEDynamics(dim, dtype=None if dtype == jnp.float32 else dtype)
    params = mod.init(jax.random.PRNGKey(seed), 0.0, x.astype(dtype))
    meta = fs.make_meta(dim, B, H, W, dtype, interpret=True)
    return mod, params, x.astype(dtype), meta


@pytest.mark.parametrize("shape", [(4, 8, 8, 16), (2, 5, 5, 16),
                                   (3, 8, 4, 32)])
def test_fwd_matches_flax(shape):
    """Kernel forward == flax module forward on (B,H,W,C), including
    lane-padded N (2*5*5=50 -> 128) and rectangular H != W."""
    B, H, W, dim = shape
    mod, params, x, meta = _setup(dim, B, H, W)
    ref = mod.apply(params, 0.0, x)
    out = fs.from_cn(
        fs.fused_sqnxt_dyn(fs.to_cn(x, meta), params, meta), B, H, W
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_fwd_single_pass_branch():
    """single_pass=True variance (E[x^2]-E[x]^2, clamped) against a
    hand-built flax chain with the gate forced on."""
    import flax.linen as nn

    dim, B, H, W = 16, 4, 8, 8

    class ForcedDyn(nn.Module):
        dim: int

        @nn.compact
        def __call__(self, t, x):
            c1, c2 = self.dim // 2, self.dim // 4
            norm = lambda: BatchStatsNorm(single_pass_min_size=1)
            h = nn.relu(norm()(_conv(c1, 1)(x)))
            h = nn.relu(norm()(_conv(c2, 1)(h)))
            h = nn.relu(norm()(_conv(c1, (1, 3))(h)))
            h = nn.relu(norm()(_conv(c1, (3, 1))(h)))
            h = nn.relu(norm()(_conv(self.dim, 1)(h)))
            return h

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, H, W, dim)).astype("float32"))
    mod = ForcedDyn(dim)
    params = mod.init(jax.random.PRNGKey(1), 0.0, x)
    ref = mod.apply(params, 0.0, x)
    meta = fs.make_meta(dim, B, H, W, jnp.float32, interpret=True)
    meta = meta._replace(single_pass=(True,) * 5)
    out = fs.from_cn(
        fs.fused_sqnxt_dyn(fs.to_cn(x, meta), params, meta), B, H, W
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_grad_matches_flax():
    """d(loss)/d(x) and d(loss)/d(every param) through the fused custom
    VJP == autodiff through the flax module (f32)."""
    dim, B, H, W = 16, 4, 8, 8
    mod, params, x, meta = _setup(dim, B, H, W, seed=2)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, H, W, dim))
        .astype("float32"))

    def loss_ref(p, xx):
        return jnp.sum(mod.apply(p, 0.0, xx) * w)

    def loss_fused(p, xx):
        out = fs.from_cn(
            fs.fused_sqnxt_dyn(fs.to_cn(xx, meta), p, meta), B, H, W
        )
        return jnp.sum(out * w)

    l0, (gp0, gx0) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        params, x)
    l1, (gp1, gx1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(
        params, x)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=2e-4, atol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = jax.tree_util.tree_leaves_with_path(gp1)
    assert len(flat0) == len(flat1)
    for (k0, v0), (k1, v1) in zip(flat0, flat1):
        assert k0 == k1
        key = jax.tree_util.keystr(k0)
        if "Conv" in key and key.endswith("['bias']"):
            # a conv bias feeding a batch-stats norm is a no-op parameter:
            # the norm subtracts the mean, so its TRUE gradient is exactly
            # zero and both paths produce only f32 cancellation noise —
            # assert near-zero instead of noise==noise
            np.testing.assert_allclose(np.asarray(v0), 0, atol=5e-4)
            np.testing.assert_allclose(np.asarray(v1), 0, atol=5e-4)
            continue
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v0), rtol=2e-4, atol=2e-5,
            err_msg=key)


def test_grad_padded_lanes():
    """Gradients with a lane-padded N (no spurious contributions from
    pad lanes)."""
    dim, B, H, W = 16, 2, 5, 5
    mod, params, x, meta = _setup(dim, B, H, W, seed=4)
    w = jnp.asarray(
        np.random.default_rng(5).normal(size=(B, H, W, dim))
        .astype("float32"))

    g_ref = jax.grad(lambda xx: jnp.sum(mod.apply(params, 0.0, xx) * w))(x)
    g_fus = jax.grad(lambda xx: jnp.sum(fs.from_cn(
        fs.fused_sqnxt_dyn(fs.to_cn(xx, meta), params, meta), B, H, W
    ) * w))(x)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_bf16_path():
    """bf16 activation stream: dtypes ride bf16 end-to-end and the
    result tracks the flax bf16 module loosely (CPU conv bf16 and the
    kernel's f32-accumulated dots round differently)."""
    dim, B, H, W = 16, 4, 8, 8
    mod, params, x, meta = _setup(dim, B, H, W, dtype=jnp.bfloat16)
    out_cn = fs.fused_sqnxt_dyn(fs.to_cn(x, meta), params, meta)
    assert out_cn.dtype == jnp.bfloat16
    ref = mod.apply(params, 0.0, x)
    out = fs.from_cn(out_cn, B, H, W)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.05)
    # grads exist and are finite
    g = jax.grad(lambda p: jnp.sum(
        fs.fused_sqnxt_dyn(fs.to_cn(x, meta), p, meta)
        .astype(jnp.float32) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_model_integration_fused_vs_xla():
    """SqueezeNextODE(use_pallas='interpret') == use_pallas='off':
    logits and parameter gradients through the full model (ODE solves on
    the (C, N) layout with per-stage layout conversion)."""
    from pnode_tpu.models.sqnxt import SqueezeNextODE

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype("float32"))
    y = jnp.asarray(rng.integers(0, 10, size=(2,)))

    def build(mode):
        return SqueezeNextODE(num_classes=10, width_x=0.5, method="euler",
                              Nt=1, use_pallas=mode)

    m_off = build("off")
    m_fus = build("interpret")
    params = m_off.init(jax.random.PRNGKey(0), x)

    def loss(model, p):
        logits = model.apply(p, x, training=True)
        one = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(one * jax.nn.log_softmax(logits), -1))

    l0, g0 = jax.value_and_grad(lambda p: loss(m_off, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m_fus, p))(params)
    # per-eval kernel-vs-flax noise is ~3e-6 relative (the per-kernel
    # tests above); 17 sequential ODE blocks compound it to ~1e-4
    np.testing.assert_allclose(float(l1), float(l0), rtol=5e-4)
    # elementwise gradient comparison is MEANINGLESS here: this tiny
    # B=2 17-norm-chained configuration is chaotically conditioned —
    # a 1e-6 relative PARAMETER perturbation moves the XLA path's own
    # gradient by 14.5% relative L2 (measured; relu flips + batch-stat
    # feedback). The fused path lands at the same conditioning floor
    # (14.9%), so assert direction + magnitude instead; the tight
    # elementwise checks live in the per-eval/per-solve tests above.
    v0 = jnp.concatenate([jnp.ravel(t)
                          for t in jax.tree_util.tree_leaves(g0)])
    v1 = jnp.concatenate([jnp.ravel(t)
                          for t in jax.tree_util.tree_leaves(g1)])
    cos = float(jnp.vdot(v0, v1)
                / (jnp.linalg.norm(v0) * jnp.linalg.norm(v1)))
    ratio = float(jnp.linalg.norm(v1) / jnp.linalg.norm(v0))
    assert cos > 0.98, cos
    assert 0.9 < ratio < 1.1, ratio


def test_vmem_estimate_monotone():
    m1 = fs.make_meta(32, 128, 32, 32, jnp.bfloat16)
    m2 = fs.make_meta(128, 128, 8, 8, jnp.bfloat16)
    assert fs.vmem_estimate_bytes(m1) > fs.vmem_estimate_bytes(m2)


@pytest.mark.parametrize("shape", [(4, 8, 8, 16), (2, 5, 5, 16)])
def test_layered_fwd_matches_flax(shape):
    """Layered mode (one kernel per layer, full-N in-kernel batch stats)
    == flax module forward, including lane-padded N."""
    B, H, W, dim = shape
    mod, params, x, meta = _setup(dim, B, H, W)
    meta = meta._replace(layered=True)
    ref = mod.apply(params, 0.0, x)
    out = fs.from_cn(
        fs.fused_sqnxt_dyn(fs.to_cn(x, meta), params, meta), B, H, W
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_layered_grad_matches_flax():
    """Layered custom VJP == autodiff through the flax module (f32),
    state and every parameter."""
    dim, B, H, W = 16, 4, 8, 8
    mod, params, x, meta = _setup(dim, B, H, W, seed=2)
    meta = meta._replace(layered=True)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, H, W, dim))
        .astype("float32"))

    def loss_ref(p, xx):
        return jnp.sum(mod.apply(p, 0.0, xx) * w)

    def loss_fused(p, xx):
        out = fs.from_cn(
            fs.fused_sqnxt_dyn(fs.to_cn(xx, meta), p, meta), B, H, W
        )
        return jnp.sum(out * w)

    l0, (gp0, gx0) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        params, x)
    l1, (gp1, gx1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(
        params, x)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=2e-4, atol=2e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = jax.tree_util.tree_leaves_with_path(gp1)
    assert len(flat0) == len(flat1)
    for (k0, v0), (k1, v1) in zip(flat0, flat1):
        key = jax.tree_util.keystr(k0)
        if "Conv" in key and key.endswith("['bias']"):
            np.testing.assert_allclose(np.asarray(v1), 0, atol=5e-4)
            continue
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v0), rtol=2e-4, atol=2e-5,
            err_msg=key)


def test_layered_equals_chain_kernel():
    """Layered and chain modes are the same math: identical outputs and
    gradients (both interpret)."""
    dim, B, H, W = 16, 4, 8, 8
    mod, params, x, meta = _setup(dim, B, H, W, seed=5)
    w = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, H, W, dim))
        .astype("float32"))

    outs = {}
    for layered in (False, True):
        m = meta._replace(layered=layered)

        def loss(p, xx, m=m):
            out = fs.from_cn(
                fs.fused_sqnxt_dyn(fs.to_cn(xx, m), p, m), B, H, W)
            return jnp.sum(out * w)

        outs[layered] = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(outs[True][0]), float(outs[False][0]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][1]),
                    jax.tree_util.tree_leaves(outs[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_stage1_gate_picks_layered():
    """The auto ladder: CIFAR stage 1 (c=32@32x32, b128, bf16) exceeds
    the chain kernel's VMEM estimate but fits layered mode — the model
    gate must return a layered meta there, and a chain meta for the
    small stages."""
    from pnode_tpu.ops.vmem import vmem_limit_bytes

    m_chain = fs.make_meta(32, 128, 32, 32, jnp.bfloat16)
    assert fs.vmem_estimate_bytes(m_chain) > vmem_limit_bytes()
    m_lay = fs.make_meta(32, 128, 32, 32, jnp.bfloat16, layered=True)
    assert fs.vmem_estimate_layered_bytes(m_lay) <= vmem_limit_bytes()
    # stage 2 (c=64@16x16): chain fits, stays unlayered
    m2 = fs.make_meta(64, 128, 16, 16, jnp.bfloat16)
    assert fs.vmem_estimate_bytes(m2) <= vmem_limit_bytes()
