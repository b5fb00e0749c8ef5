"""Checkpoint / resume via orbax.

The reference has no in-package checkpointing (SURVEY.md §5: cache state is
in-memory only; training checkpoints come from external frameworks). Here
both model parameters and decode-time cache state are plain pytrees, so
checkpointing is uniform: ``save``/``restore`` handle params, optimizer
state, and ``SinkKVCache`` lists alike (the functional cache makes decode
state trivially resumable mid-generation).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save", "restore", "save_params", "restore_params"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, tree: Any) -> None:
    """Save any pytree (params, opt state, caches) to ``path``."""
    _checkpointer().save(os.path.abspath(path), tree, force=True)


def restore(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; ``template`` (a matching pytree of arrays or
    ShapeDtypeStructs, possibly sharded) restores with correct
    dtypes/shardings."""
    import orbax.checkpoint as ocp
    ckpt = _checkpointer()
    if template is None:
        return ckpt.restore(os.path.abspath(path))
    return ckpt.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            restore_args=jax.tree_util.tree_map(
                lambda x: ocp.ArrayRestoreArgs(
                    sharding=getattr(x, "sharding", None),
                    dtype=getattr(x, "dtype", None)), template)))


# Convenience aliases
save_params = save
restore_params = restore
