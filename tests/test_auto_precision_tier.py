"""The "auto" stiff-dot precision tier (-pnode_fused_ark_precision auto,
the default): resolve_stiff_precision measures the bf16x3 ("high") tier's
composed error on the problem's own frozen operators by emulating the
kernel arithmetic host-side against fp64, and only selects "high" when it
clears -pnode_fused_ark_auto_tol. See RESULTS.md round 3: the same tier
that fails the on-chip stiff-J gate pre reverse-collapse (6.2e-2) passes
post-collapse (3.7e-4) — whether bf16x3 is safe depends on the operators,
so the decision must be measured per problem, not hardcoded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu.options import Options, clear_options
from pnode_tpu.ops.fused_ark_adjoint import (
    _emulate_high_dot,
    resolve_stiff_precision,
)


def _ks_like_ops(d=64, dt=0.2, gamma=0.435866521508459, L=22.0):
    """KS-like frozen operators: 4th-order circulant stencil J (||J||
    ~ 1/dx^4) and the pre-inverted ESDIRK stage operator. L=22 is the
    reference config (hardware-validated safe for bf16x3); shrinking L
    raises the stiffness as 1/dx^4."""
    dx = L / d
    J = np.zeros((d, d))
    # -u_xx - u_xxxx central stencils (periodic), the KS linear part
    c2 = np.array([1.0, -2.0, 1.0]) / dx**2
    c4 = np.array([1.0, -4.0, 6.0, -4.0, 1.0]) / dx**4
    for i in range(d):
        for k, off in enumerate((-1, 0, 1)):
            J[i, (i + off) % d] -= c2[k]
        for k, off in enumerate((-2, -1, 0, 1, 2)):
            J[i, (i + off) % d] -= c4[k]
    inv = np.linalg.inv(np.eye(d) - dt * gamma * J)
    return jnp.asarray(J, jnp.float32), jnp.asarray(inv, jnp.float32)


def _too_stiff_ops():
    """A 16x stiffer stencil (L=11 -> 1/dx^4 scales 16x, ||J|| ~ 1.8e4):
    the emulated probe reads ~9e-2 — well past the gate bound — so auto
    must refuse the bf16x3 tier here."""
    return _ks_like_ops(L=11.0)


def test_emulation_matches_stiff_dot_high_tier():
    """The host emulation reproduces _stiff_dot's "high" arithmetic (same
    bf16 splits, fp32 products/accumulation) to fp32 roundoff."""
    from pnode_tpu.ops.fused_ark_adjoint import _stiff_dot

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32)).astype(np.float32)
    A = rng.standard_normal((32, 32)).astype(np.float32) * 7.3
    want = np.asarray(_stiff_dot(jnp.asarray(x), jnp.asarray(A), "high"))
    got = _emulate_high_dot(x, A)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_auto_picks_high_for_ks_like_operators():
    J, inv = _ks_like_ops()
    assert resolve_stiff_precision(J, inv, n_applies=4) == "high"


def test_auto_picks_highest_for_too_stiff_operators():
    J, inv = _too_stiff_ops()
    assert resolve_stiff_precision(J, inv, n_applies=4) == "highest"


def test_auto_tol_option_controls_decision():
    J, inv = _ks_like_ops()
    Options().set("pnode_fused_ark_auto_tol", "1e-12")
    assert resolve_stiff_precision(J, inv, n_applies=4) == "highest"


def test_auto_falls_back_to_highest_for_tracers():
    J, inv = _ks_like_ops()

    seen = []

    def probe(Jt, invt):
        seen.append(resolve_stiff_precision(Jt, invt, n_applies=4))
        return Jt

    jax.make_jaxpr(probe)(J, inv)
    assert seen == ["highest"]


def test_explicit_tiers_bypass_measurement():
    J, inv = _too_stiff_ops()
    for name in ("highest", "high", "default"):
        Options().set("pnode_fused_ark_precision", name)
        assert resolve_stiff_precision(J, inv) == name
        clear_options()


def test_unknown_tier_rejected():
    Options().set("pnode_fused_ark_precision", "fast")
    with pytest.raises(ValueError, match="auto|highest"):
        resolve_stiff_precision(None, None)


def _count_highest_stiff_dots(fn, *args, **kw):
    jaxpr = jax.make_jaxpr(lambda: fn(*args, **kw))()
    n = 0
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            inner = eqn.params["jaxpr"]
            for e2 in inner.eqns:
                if (e2.primitive.name == "dot_general"
                        and "HIGHEST" in str(e2.params.get("precision"))):
                    n += 1
    return n


def test_default_auto_selects_bf16x3_in_kernel_for_benign_operators():
    """Under the default (auto) tier with KS-like operators, the compiled
    forward kernel carries ZERO HIGHEST dots (the stiff applies run at the
    measured-safe bf16x3 tier); pinning "highest" restores them. Gradient
    agreement between the two tiers is asserted end-to-end."""
    from pnode_tpu.ops.fused_ark_forward import fused_ark_step_fwd
    from pnode_tpu.tableaus import get_ark_tableau

    tab = get_ark_tableau("3")
    aI = [[float(x) for x in row] for row in tab.a_im]
    aE = [[float(x) for x in row] for row in tab.a_ex]
    bI = [float(x) for x in tab.b_im]
    bE = [float(x) for x in tab.b_ex]
    tbl = (aI, aE, bI, bE)
    d, h, B = 64, 24, 8
    J, inv = _ks_like_ops(d=d)
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (B, d), jnp.float32)
    Ws = [jax.random.normal(key, s, jnp.float32) * 0.05
          for s in [(d, h), (h, d)]]
    bs = [jnp.zeros((s,), jnp.float32) for s in (h, d)]

    kw = dict(activation="relu", sign=-1.0, interpret=True)
    n_auto = _count_highest_stiff_dots(
        fused_ark_step_fwd, tbl, 0.2, y, J, inv, Ws, bs, **kw)
    assert n_auto == 0, n_auto

    Options().set("pnode_fused_ark_precision", "highest")
    n_highest = _count_highest_stiff_dots(
        fused_ark_step_fwd, tbl, 0.2, y, J, inv, Ws, bs, **kw)
    assert n_highest >= len(bI), n_highest
    clear_options()

    # the two tiers agree on the step output (bf16x3 error ~1e-6 per dot)
    y_auto, _ = fused_ark_step_fwd(tbl, 0.2, y, J, inv, Ws, bs, **kw)
    Options().set("pnode_fused_ark_precision", "highest")
    y_hi, _ = fused_ark_step_fwd(tbl, 0.2, y, J, inv, Ws, bs, **kw)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_hi),
                               rtol=3e-3, atol=1e-3)
