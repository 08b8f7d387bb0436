"""Batch-axis data parallelism over a TPU device mesh.

The reference's distribution story is PETSc/MPI held deliberately rank-local:
the TS solver lives on COMM_SELF (/root/reference/pnode/petsc_adjoint.py:367),
i.e. each rank integrates its own batch independently and nothing is
communicated inside the solve. The TPU-native equivalent keeps exactly that
structure — the ODE system is block-diagonal over the batch (which is what
the reference's HPDDM block solve exploits, petsc_adjoint.py:690-705) — so:

- the batch axis is sharded over the mesh's "dp" axis (ICI within a slice,
  DCN across hosts when the mesh spans hosts);
- the entire forward solve + discrete adjoint runs *locally* per device
  under ``shard_map`` with zero collectives in the hot loop;
- a single ``lax.pmean`` reduces loss and parameter gradients at the end —
  the only ICI traffic per training step.

This is the speed-of-light communication pattern for batch-parallel neural
ODE training: compute scales linearly, comms are one gradient all-reduce.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    devices=None,
    mesh_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Device mesh over available devices; default all of them on one axis.

    Multi-axis meshes (SURVEY.md section 5.8: "ICI within pod-slice, DCN
    across hosts"): pass ``mesh_shape`` with matching ``axis_names``, e.g.
    ``make_mesh(mesh_shape=(2, 4), axis_names=("dcn", "dp"))`` — the device
    assignment comes from ``mesh_utils.create_device_mesh`` so the inner
    axis rides the faster interconnect on real hardware.
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is not None:
        mesh_shape = tuple(int(s) for s in mesh_shape)
        if len(mesh_shape) != len(axis_names):
            raise ValueError(
                f"mesh_shape {mesh_shape} must match axis_names {axis_names}"
            )
        need = int(np.prod(mesh_shape))
        if len(devices) < need:
            raise ValueError(
                f"mesh_shape {mesh_shape} needs {need} devices but only "
                f"{len(devices)} available"
            )
        from jax.experimental import mesh_utils

        try:
            arr = mesh_utils.create_device_mesh(
                mesh_shape, devices=devices[:need]
            )
        except Exception:
            # virtual/CPU device sets without topology info: plain reshape
            arr = np.array(devices[:need]).reshape(mesh_shape)
        return Mesh(arr, axis_names)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                "available (set --xla_force_host_platform_device_count for "
                "virtual CPU meshes)"
            )
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        raise ValueError(
            "multi-axis meshes need mesh_shape=(...) matching axis_names"
        )
    return Mesh(arr, axis_names)


def shard_batch(x, mesh: Mesh, axis="dp"):
    """Place array(s) with the leading (batch) dim sharded over ``axis``.

    ``axis`` may be a single mesh-axis name or a tuple of names (the batch
    is then sharded over their product — hierarchical DP: DCN-outer,
    ICI-inner)."""

    def _shard(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_shard, x)


def replicate(x, mesh: Mesh):
    """Replicate array(s) across the mesh (parameters, optimizer state)."""

    def _rep(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(_rep, x)


def dp_value_and_grad(
    loss_fn: Callable,
    mesh: Mesh,
    axis="dp",
):
    """Data-parallel value_and_grad: loss_fn(params, batch) -> scalar mean.

    Returns fn(params, sharded_batch) -> (loss, grads) where the loss/grad
    are global batch means. The solve runs per-device on the local shard
    (no collectives inside); one pmean pair at the end. ``axis`` may be a
    tuple of mesh-axis names for hierarchical DP over a multi-axis
    (DCN x ICI) mesh — the pmean then reduces over the product of axes.
    """

    local_vg = jax.value_and_grad(loss_fn)
    red_axes = axis if isinstance(axis, (tuple, list)) else (axis,)
    red_axes = tuple(red_axes)

    def _local(params, batch):
        loss, grads = local_vg(params, batch)
        loss = lax.pmean(loss, red_axes)
        grads = jax.tree_util.tree_map(
            lambda g: lax.pmean(g, red_axes), grads
        )
        return loss, grads

    batch_spec = P(tuple(axis) if isinstance(axis, (tuple, list)) else axis)

    def wrapped(params, batch):
        in_specs = (
            jax.tree_util.tree_map(lambda _: P(), params),
            jax.tree_util.tree_map(lambda _: batch_spec, batch),
        )
        out_specs = (P(), jax.tree_util.tree_map(lambda _: P(), params))
        return jax.shard_map(
            _local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(params, batch)

    return wrapped
