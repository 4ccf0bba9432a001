"""Parameter-pytree helpers.

Models in this framework are pure functions over nested-dict parameter
pytrees (``{"blocks_0": {"attn1": {"q": {"kernel": ...}}}}``). This module
provides the small amount of shared machinery: dtype casting with fp32
carve-outs, flat-key views (for checkpoint IO), and tree initializers.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping

import jax
import jax.numpy as jnp

Params = dict  # nested dict of arrays

SEP = "."


def flatten(params: Mapping[str, Any], prefix: str = "") -> dict[str, jax.Array]:
    """Flat "a.b.0.kernel"-keyed view. Recurses into BOTH dicts and
    lists/tuples — the VAE/VACE converters build list-of-dict subtrees
    (``up_blocks``, ``vace_blocks``); treating those as leaves would make
    cast/quantize/save helpers silently skip every parameter inside."""
    out: dict[str, jax.Array] = {}

    def rec(v, key):
        if isinstance(v, Mapping):
            for k, vv in v.items():
                rec(vv, f"{key}{SEP}{k}" if key else str(k))
        elif isinstance(v, (list, tuple)):
            for i, vv in enumerate(v):
                rec(vv, f"{key}{SEP}{i}" if key else str(i))
        else:
            out[key] = v

    rec(params, prefix)
    return out


def unflatten(flat: Mapping[str, Any]) -> Params:
    """Inverse of :func:`flatten`. All-integer-keyed dict levels are
    rebuilt as LISTS (they came from list subtrees), so a flatten →
    unflatten round trip preserves the converters' tree structure."""
    out: Params = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        node = {k: rebuild(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[k] for k in sorted(node, key=int)]
        return node

    return rebuild(out)


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
        else:
            parts.append(str(e))
    return SEP.join(parts)


def cast_params(
    params: Params,
    dtype: jnp.dtype,
    keep_fp32: Callable[[str], bool] | None = None,
) -> Params:
    """Cast floating-point leaves to ``dtype``; leaves whose flat path
    matches ``keep_fp32`` stay float32 (norms / modulation — the analogue of
    the reference's ``lock_layers_dtypes``,
    ``/root/reference/wan/modules/model.py:816-851``).

    Structure-preserving (``jax.tree`` traversal, not flatten/unflatten):
    empty-dict nodes and list subtrees survive exactly, so the result
    tree_maps against the input."""
    def cast(path, v):
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            if keep_fp32 is not None and keep_fp32(_path_str(path)):
                return v.astype(jnp.float32)
            return v.astype(dtype)
        return v

    return jax.tree_util.tree_map_with_path(cast, params)


def param_count(params: Params) -> int:
    return sum(int(v.size) for v in jax.tree.leaves(params))


def param_bytes(params: Params) -> int:
    return sum(int(v.size * v.dtype.itemsize) for v in jax.tree.leaves(params))


def tree_map_with_path(fn: Callable[[str, Any], Any], params: Params) -> Params:
    """Structure-preserving map with dotted-path strings."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: fn(_path_str(path), v), params
    )
