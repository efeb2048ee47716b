"""Param-pytree utilities: counting, dtype casting, path-based selection."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def param_count(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(x.size for x in leaves if hasattr(x, "size"))


def cast_floats(tree: Any, dtype) -> Any:
    """Cast floating-point leaves to `dtype`, leave ints/bools alone."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def path_str(path) -> str:
    """Render a jax tree path as 'a/b/0/c'."""
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def map_with_path(fn: Callable[[str, Any], Any], tree: Any) -> Any:
    """tree_map where fn receives ('a/b/c', leaf)."""
    return jax.tree_util.tree_map_with_path(lambda p, x: fn(path_str(p), x), tree)


def label_with_path(pred: Callable[[str], str], tree: Any) -> Any:
    """Build a label pytree (for optax.multi_transform / masks) by path."""
    return jax.tree_util.tree_map_with_path(lambda p, x: pred(path_str(p)), tree)
