"""Shared example-driver utilities: checkpoints, flag-tail init, printing.

Every reference driver follows the same skeleton (SURVEY.md section 5.6):
argparse for ML hyperparameters, unknown args forwarded to the runtime
options database, per-iteration Iter|Time|Loss|NFE telemetry, best-val
checkpointing with --hotstart resume (e.g.
/root/reference/examples-pnode/ROBER.py:408-421,485-501). These helpers
rebuild that skeleton for the JAX examples.
"""

from __future__ import annotations

import os
import pickle
import sys
from typing import Any, Dict

import jax
import numpy as np


def init_flags(parser):
    """parse_known_args + forward the unknown tail to the options DB."""
    import pnode_tpu

    args, unknown = parser.parse_known_args()
    pnode_tpu.init([sys.argv[0]] + unknown)
    return args


def to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def to_jax_tree(tree, dtype=None):
    import jax.numpy as jnp

    def conv(a):
        x = jnp.asarray(a)
        return x.astype(dtype) if dtype is not None and jnp.issubdtype(
            x.dtype, jnp.floating
        ) else x

    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Pickle a dict of pytrees/metadata (params, opt state, epoch, ...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(to_numpy_tree(payload), f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
