"""DP composition of the fused train loop (parallel/fused_dp.py).

The data-parallel path — per-device grads-only kernel + pmean + stacked
XLA Adam under shard_map — must train EXACTLY what the single-chip
K-iteration loop kernel trains on the full batch: same per-iteration
losses, same final parameters and Adam moments (up to f32 summation
reordering: the DP loss/grad sum is reduced per-device then across
devices, the single-chip kernel sums all batch rows in one dot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pnode_tpu
from pnode_tpu import FlaxFunc, ODESolver
from pnode_tpu.models import KSFuncEX, KSFuncIM
from pnode_tpu.ops.fused_train_loop import fused_train_loop
from pnode_tpu.parallel import dp_fused_train_loop, make_mesh

LR = 5e-3
GAMMA = 0.435866521508459


def _build(batch, nx, dt=0.2):
    pnode_tpu.clear_options()
    pnode_tpu.init(["p", "-snes_type", "ksponly", "-ts_arkimex_type", "3",
                    "-pnode_fused_ark_adjoint", "off",
                    "-pnode_fused_ark_precision", "highest"])
    im = KSFuncIM(nx=nx)
    ex = KSFuncEX(nx=nx, hidden=24, use_pallas=True)
    key = jax.random.PRNGKey(0)
    y_tmpl = jnp.zeros((batch, nx), jnp.float32)
    vim = im.init(key, 0.0, y_tmpl)
    vex = ex.init(key, 0.0, y_tmpl)
    ode = ODESolver()
    ode.setupTS(
        y_tmpl, FlaxFunc(im, vim), step_size=dt, method="imex",
        imex_form=True, implicit_form=True, func2=FlaxFunc(ex, vex),
        linear_solver="hpddm", fixed_jacobian=True, batch_size=batch,
    )
    stp = ode._stepper.prepare(0.0, y_tmpl, (vim, vex),
                               dt0=jnp.float32(dt))
    spec = stp.fused_ex_spec(vex)
    J = stp.setup.frozen_J_blocks[0]
    inv = stp.setup.solver_cache[GAMMA]._inv[0]
    tbl = (stp._aI, stp._aE, stp._bI, stp._bE)
    return tbl, dt, spec, J, inv


@pytest.mark.parametrize("n_dev", [8, 2, 1])
def test_dp_fused_matches_single_chip_loop(n_dev):
    # n_dev=1 exercises the general per-iteration path too
    # (force_general skips the fast-path delegation to the loop kernel)
    batch, nx, K = 64, 16, 4
    tbl, dt, spec, J, inv = _build(batch, nx)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y_stack = jax.random.normal(k1, (K, batch, nx), jnp.float32)
    tgt_stack = y_stack + 0.05 * jax.random.normal(
        k2, (K, batch, nx), jnp.float32)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]

    ref_W, ref_b, (ref_mW, ref_mb), (ref_vW, ref_vb), ref_losses = (
        fused_train_loop(
            tbl, dt, y_stack, tgt_stack, J, inv, Ws, bs, (zW, zb),
            (zW, zb), 0, activation=spec["activation"],
            sign=spec["sign"], lr=LR, interpret=True,
            stiff_prec="highest",
        ))

    mesh = make_mesh(n_dev)
    got_W, got_b, (mW, mb), (vW, vb), losses = dp_fused_train_loop(
        mesh, tbl, dt, y_stack, tgt_stack, J, inv, Ws, bs, (zW, zb),
        (zW, zb), 0, activation=spec["activation"], sign=spec["sign"],
        lr=LR, interpret=True, stiff_prec="highest",
        force_general=(n_dev == 1),
    )

    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=2e-5, atol=1e-8)
    for got, want in ((got_W, ref_W), (got_b, ref_b), (mW, ref_mW),
                      (mb, ref_mb), (vW, ref_vW), (vb, ref_vb)):
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7)


def test_dp_fused_per_device_work_scales():
    """The per-device kernel must see the LOCAL shard (B/n rows), not the
    global batch — checked through the traced jaxpr's pallas_call batch
    block shape."""
    batch, nx, K = 64, 16, 2
    tbl, dt, spec, J, inv = _build(batch, nx)
    y_stack = jnp.zeros((K, batch, nx), jnp.float32)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]

    mesh = make_mesh(8)
    jaxpr = jax.make_jaxpr(
        lambda y, t: dp_fused_train_loop(
            mesh, tbl, dt, y, t, J, inv, Ws, bs, (zW, zb), (zW, zb), 0,
            activation=spec["activation"], sign=spec["sign"], lr=LR,
            interpret=True, stiff_prec="highest",
        )[4]
    )(y_stack, y_stack)
    # local batch = 64/8 = 8 rows -> the padded (Bp, P) kernel operand is
    # (8, 128); the global-batch operand (64, 128) must NOT appear inside
    # the shard_map body
    text = str(jaxpr)
    assert "8,128" in text.replace(" ", "")
    assert "64,128" not in text.replace(" ", "")


def test_dp_fused_uneven_batch_rejected():
    batch, nx, K = 60, 16, 2
    tbl, dt, spec, J, inv = _build(batch, nx)
    y_stack = jnp.zeros((K, batch, nx), jnp.float32)
    Ws, bs = list(spec["Ws"]), list(spec["bs"])
    zW = [jnp.zeros_like(w) for w in Ws]
    zb = [jnp.zeros_like(b) for b in bs]
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="must divide"):
        dp_fused_train_loop(
            mesh, tbl, dt, y_stack, y_stack, J, inv, Ws, bs, (zW, zb),
            (zW, zb), 0, activation=spec["activation"],
            sign=spec["sign"], lr=LR, interpret=True,
            stiff_prec="highest",
        )
