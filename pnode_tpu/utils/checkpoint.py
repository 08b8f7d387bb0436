"""Model/optimizer checkpointing: pickle (default) or orbax backends.

The reference checkpoints with ``torch.save`` dicts
(/root/reference/examples-pnode/ROBER.py:408-421 and every other driver);
the pickle backend mirrors that exactly. The orbax backend
(``format="orbax"`` or ``-pnode_checkpoint_format orbax``) writes an
orbax StandardCheckpointer directory instead — the production-grade JAX
checkpoint format (atomic writes, async-capable, cross-host ready), at the
cost of directory-shaped artifacts.

Both backends round-trip an arbitrary dict of pytrees + scalar metadata.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _resolve_format(fmt: str | None) -> str:
    if fmt is not None:
        return fmt
    from ..options import Options

    return Options().get_string("pnode_checkpoint_format", "pickle")


def save_checkpoint(path: str, payload: Dict[str, Any],
                    format: str | None = None) -> None:
    """Write ``payload`` (dict of pytrees + metadata) to ``path``.

    format: "pickle" (single file, torch.save-style) or "orbax"
    (directory); None reads ``-pnode_checkpoint_format`` (default pickle).
    """
    fmt = _resolve_format(format)
    if fmt == "orbax":
        import orbax.checkpoint as ocp

        target = os.path.abspath(path)
        parent = os.path.dirname(target) or "."
        os.makedirs(parent, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        # orbax refuses to overwrite; mirror pickle's overwrite semantics
        if os.path.exists(target):
            import shutil

            shutil.rmtree(target)
        ckptr.save(target, _to_numpy_tree(payload))
        ckptr.wait_until_finished()
        return
    if fmt != "pickle":
        raise ValueError(f"unknown checkpoint format {fmt!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy_tree(payload), f)


def load_checkpoint(path: str, format: str | None = None):
    """Read a checkpoint written by save_checkpoint (format auto-detected:
    a directory is orbax, a file is pickle)."""
    fmt = _resolve_format(format)
    if os.path.isdir(path) or fmt == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return pickle.load(f)
