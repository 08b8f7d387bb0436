"""Small utilities: pytree<->flat-vector packing and dtype helpers.

TPU-native replacement for the reference's parameter flattening
(/root/reference/pnode/misc.py:4-14, ``_flatten`` /
``_flatten_convert_none_to_zeros``): in JAX parameters live in pytrees and
``jax.flatten_util.ravel_pytree`` provides the differentiable pack/unpack pair,
so the "flat parameter vector the adjoint writes into" is a first-class,
loss-free view rather than a `torch.cat` of `.view(-1)` aliases.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

Pytree = Any


def flatten_params(params: Pytree) -> Tuple[jnp.ndarray, Callable[[jnp.ndarray], Pytree]]:
    """Pack a parameter pytree into one flat vector; return (vec, unravel)."""
    flat, unravel = ravel_pytree(params)
    return flat, unravel


def tree_add(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_zeros_like(a: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_scale(a: Pytree, s) -> Pytree:
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_dot(a: Pytree, b: Pytree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x * y), a, b
    )
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def num_elements(tree: Pytree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def output_match_delta(dtype) -> float:
    """Float tolerance for matching requested output times.

    Mirrors the reference's dtype-dependent landing tolerance
    (/root/reference/pnode/petsc_adjoint.py:527-531: 1e-5 for double,
    1e-3 for single).
    """
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-5
    return 1e-3


def canonical_dtype(x) -> jnp.dtype:
    return jnp.asarray(x).dtype
