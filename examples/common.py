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
    """Save a dict of pytrees/metadata; honors -pnode_checkpoint_format
    {pickle,orbax} (pnode_tpu.utils.checkpoint)."""
    from pnode_tpu.utils import save_checkpoint as _save

    _save(path, payload)


def load_checkpoint(path: str):
    from pnode_tpu.utils import load_checkpoint as _load

    return _load(path)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
