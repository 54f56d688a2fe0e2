"""Model parameter checkpointing — the framework's checkpoint/resume story
(the reference's analogous machinery is registry settings persistence and
per-display HDR state restore, SURVEY.md §5; the learned models here add
real weights worth persisting).

Plain ``.npz`` with a flattened pytree keyed by path — dependency-free and
readable anywhere; orbax remains available for sharded multi-host use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        arr = jnp.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            arr = arr.astype(jnp.float32)   # numpy has no bfloat16
        flat[key] = np.asarray(arr)
    return flat


def save_params(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str, like):
    """Load into the structure of ``like`` (dtypes/shapes validated)."""
    data = np.load(path)
    flat_like = _flatten(like)
    if set(data.files) != set(flat_like):
        missing = set(flat_like) - set(data.files)
        extra = set(data.files) - set(flat_like)
        raise ValueError(f"checkpoint mismatch: missing={missing} extra={extra}")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    keys = [
        "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(like)[0]
    ]
    new_leaves = []
    for key, leaf in zip(keys, leaves_like):
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {key}: "
                             f"{arr.shape} vs {leaf.shape}")
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
