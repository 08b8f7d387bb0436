"""Data-parallel training: sharded grads bit-match single-device (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnode_tpu import Func, ODESolver
from pnode_tpu.parallel import (
    dp_value_and_grad,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_matches_single_device():
    B, D = 16, 8
    P = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(D, D)) * 0.1)}

    def f(t, y, p):
        return jnp.tanh(y @ p["w"])

    ode = ODESolver()
    ode.setupTS(jnp.zeros((B // 8, D)), Func(f, P), step_size=0.1,
                method="rk4")
    t = jnp.asarray([0.0, 0.5])

    def loss_fn(p, batch):
        y0, tgt = batch
        pred, _ = ode.solve(y0, t, params=p)
        return jnp.mean((pred[-1] - tgt) ** 2)

    rng = np.random.default_rng(1)
    y0 = jnp.asarray(rng.normal(size=(B, D)))
    batch = (y0, 0.9 * y0)

    mesh = make_mesh(8)
    vg = dp_value_and_grad(loss_fn, mesh)
    loss_dp, g_dp = jax.jit(vg)(replicate(P, mesh), shard_batch(batch, mesh))
    loss_1, g_1 = jax.value_and_grad(loss_fn)(P, batch)
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-12)
    np.testing.assert_allclose(g_dp["w"], g_1["w"], rtol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_make_mesh_rejects_overallocation():
    with pytest.raises(ValueError, match="available"):
        make_mesh(10_000)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_multi_axis_mesh_matches_single_device():
    """Hierarchical DP over a 2x4 ("dcn", "dp") mesh (SURVEY.md section
    5.8: ICI within pod-slice, DCN across hosts) bit-matches the
    single-device gradient."""
    B, D = 16, 8
    P = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(D, D)) * 0.1)}

    def f(t, y, p):
        return jnp.tanh(y @ p["w"])

    ode = ODESolver()
    ode.setupTS(jnp.zeros((B // 8, D)), Func(f, P), step_size=0.1,
                method="rk4")
    t = jnp.asarray([0.0, 0.5])

    def loss_fn(p, batch):
        y0, tgt = batch
        pred, _ = ode.solve(y0, t, params=p)
        return jnp.mean((pred[-1] - tgt) ** 2)

    rng = np.random.default_rng(1)
    y0 = jnp.asarray(rng.normal(size=(B, D)))
    batch = (y0, 0.9 * y0)

    mesh = make_mesh(mesh_shape=(2, 4), axis_names=("dcn", "dp"))
    assert mesh.devices.shape == (2, 4)
    axis = ("dcn", "dp")
    vg = dp_value_and_grad(loss_fn, mesh, axis=axis)
    loss_dp, g_dp = jax.jit(vg)(
        replicate(P, mesh), shard_batch(batch, mesh, axis=axis)
    )
    loss_1, g_1 = jax.value_and_grad(loss_fn)(P, batch)
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-12)
    np.testing.assert_allclose(g_dp["w"], g_1["w"], rtol=1e-10)


def test_make_mesh_shape_validation():
    with pytest.raises(ValueError, match="match axis_names"):
        make_mesh(mesh_shape=(2, 4), axis_names=("dp",))
    with pytest.raises(ValueError, match="needs"):
        make_mesh(mesh_shape=(100, 100), axis_names=("a", "b"))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_matches_single_device_revolve_checkpointing():
    """DP sharding composes with revolve-checkpointed adjoints: the
    checkpoint schedule is step-index-based (data-independent), so a
    sharded solve replays exactly the same recomputation plan per device
    and the pmean'd gradient must bit-match the single-device one."""
    import pnode_tpu

    pnode_tpu.init(["p", "-ts_trajectory_max_cps_ram", "3",
                    "-ts_trajectory_schedule", "revolve"])
    B, D = 16, 8
    P = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(D, D)) * 0.1)}

    def f(t, y, p):
        return jnp.tanh(y @ p["w"])

    ode = ODESolver()
    ode.setupTS(jnp.zeros((B // 8, D)), Func(f, P), step_size=0.05,
                method="rk4")
    t = jnp.asarray([0.0, 0.25, 0.5])

    def loss_fn(p, batch):
        y0, tgt = batch
        pred = ode.odeint_adjoint(y0, t, params=p)
        return jnp.mean((pred[-1] - tgt) ** 2) + jnp.mean(pred[1] ** 2)

    rng = np.random.default_rng(1)
    y0 = jnp.asarray(rng.normal(size=(B, D)))
    batch = (y0, 0.9 * y0)

    mesh = make_mesh(8)
    vg = dp_value_and_grad(loss_fn, mesh)
    loss_dp, g_dp = jax.jit(vg)(replicate(P, mesh), shard_batch(batch, mesh))
    loss_1, g_1 = jax.value_and_grad(loss_fn)(P, batch)
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-12)
    np.testing.assert_allclose(g_dp["w"], g_1["w"], rtol=1e-10)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_matches_single_device_adaptive():
    """DP sharding composes with the adaptive engine (-ts_adapt_type basic).

    Adaptivity is rank-local by design (the reference's COMM_SELF solves:
    each rank controls its own step sizes from its own WRMS error). With a
    batch tiled identically across shards, every device sees the same WRMS
    norm, picks the same schedule, and the gradient bit-matches the
    single-device solve — isolating the DP plumbing from legitimate
    schedule divergence on heterogeneous shards."""
    import pnode_tpu

    pnode_tpu.init(["p", "-ts_adapt_type", "basic",
                    "-ts_rtol", "1e-8", "-ts_atol", "1e-8"])
    D = 8
    n_dev = 8
    per_dev = 2
    B = n_dev * per_dev
    P = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(D, D)) * 0.1)}

    def f(t, y, p):
        return jnp.tanh(y @ p["w"])

    ode = ODESolver()
    ode.setupTS(jnp.zeros((per_dev, D)), Func(f, P), step_size=0.1,
                method="dopri5")
    t = jnp.asarray([0.0, 0.5])

    def loss_fn(p, batch):
        y0, tgt = batch
        pred, _ = ode.solve(y0, t, params=p)
        return jnp.mean((pred[-1] - tgt) ** 2)

    rng = np.random.default_rng(1)
    shard = rng.normal(size=(per_dev, D))
    y0 = jnp.asarray(np.tile(shard, (n_dev, 1)))  # identical per device
    batch = (y0, 0.9 * y0)

    mesh = make_mesh(n_dev)
    vg = dp_value_and_grad(loss_fn, mesh)
    loss_dp, g_dp = jax.jit(vg)(replicate(P, mesh), shard_batch(batch, mesh))
    loss_1, g_1 = jax.value_and_grad(loss_fn)(P, batch)
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-12)
    np.testing.assert_allclose(g_dp["w"], g_1["w"], rtol=1e-10)
