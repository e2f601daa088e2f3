"""Model checkpoint persistence (orbax, with an npz fallback)."""

from __future__ import annotations

import os
from typing import Any, Optional


def save_checkpoint(path: str, params: Any) -> None:
    """Save a params pytree to *path* (directory)."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, params, force=True)
    except Exception:
        import jax
        import numpy as np

        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "params.npz"),
                 **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Load a params pytree saved by :func:`save_checkpoint`."""
    npz = os.path.join(path, "params.npz")
    if os.path.exists(npz):
        import jax
        import numpy as np

        data = np.load(npz)
        if like is None:
            return dict(data)
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        vals = [data[jax.tree_util.keystr(k)] for k, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, vals)
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(os.path.abspath(path), item=like)
