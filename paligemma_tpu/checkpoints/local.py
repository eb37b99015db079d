"""Local checkpoint save/restore (orbax).

The reference has no local checkpointing at all — its only "save" is a
push-to-HF-hub callback at epoch end (ref: Paligemma_FT.ipynb cell 45) and
its only load is the one-shot safetensors read (ref: utils.py:9-37). Here:
any parameter/optimizer pytree round-trips through orbax, giving the
fine-tune path real resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()


def restore_pytree(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x) if hasattr(x, "dtype") else x,
            like,
        )
        return ckpt.restore(path, target)
    return ckpt.restore(path)
