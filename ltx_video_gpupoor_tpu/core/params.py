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
    out: dict[str, jax.Array] = {}
    for k, v in params.items():
        key = f"{prefix}{SEP}{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat: Mapping[str, Any]) -> Params:
    out: Params = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def cast_params(
    params: Params,
    dtype: jnp.dtype,
    keep_fp32: Callable[[str], bool] | None = None,
) -> Params:
    """Cast floating-point leaves to ``dtype``; leaves whose flat path
    matches ``keep_fp32`` stay float32 (norms / modulation — the analogue of
    the reference's ``lock_layers_dtypes``,
    ``/root/reference/wan/modules/model.py:816-851``)."""
    flat = flatten(params)
    out = {}
    for k, v in flat.items():
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
            if keep_fp32 is not None and keep_fp32(k):
                out[k] = v.astype(jnp.float32)
            else:
                out[k] = v.astype(dtype)
        else:
            out[k] = v
    return unflatten(out)


def param_count(params: Params) -> int:
    return sum(int(v.size) for v in jax.tree.leaves(params))


def param_bytes(params: Params) -> int:
    return sum(int(v.size * v.dtype.itemsize) for v in jax.tree.leaves(params))


def tree_map_with_path(fn: Callable[[str, Any], Any], params: Params) -> Params:
    flat = flatten(params)
    return unflatten({k: fn(k, v) for k, v in flat.items()})
