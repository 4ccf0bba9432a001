"""Dtype policy for TPU execution.

The reference locks per-layer dtypes so that norms / modulation stay in
fp32 while the bulk matmuls run reduced precision
(``/root/reference/wan/modules/model.py:816-851`` ``lock_layers_dtypes``),
and falls back bf16->fp16 on pre-Ampere GPUs
(``/root/reference/inference.py:109-128``). On TPU the native reduced
precision is bfloat16 (MXU-native); fp16 is never preferred, so the policy
collapses to: params/activations bf16, norms + adaLN modulation + softmax
statistics fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """What dtype each class of tensor uses.

    Attributes:
      param_dtype: storage dtype for the big weight matrices.
      compute_dtype: dtype activations are cast to before matmuls.
      norm_dtype: dtype for normalization / modulation / timestep-embedding
        math (kept fp32 for numerical parity with the reference's locked
        layers).
      accum_dtype: accumulation dtype for MXU matmuls
        (``preferred_element_type``).
    """

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32


DEFAULT_POLICY = DtypePolicy()
FP32_POLICY = DtypePolicy(
    param_dtype=jnp.float32, compute_dtype=jnp.float32
)


def policy_for(name: str) -> DtypePolicy:
    """Resolve a policy by name (CLI surface parity with the reference's
    ``--transformer-dtype-policy`` flag, ``/root/reference/inference.py:604``)."""
    name = (name or "").lower()
    if name in ("", "default", "bf16", "bfloat16"):
        return DEFAULT_POLICY
    if name in ("fp32", "float32"):
        return FP32_POLICY
    if name in ("fp16", "float16"):
        # TPU has no fp16 advantage; map to bf16 and keep going.
        return DEFAULT_POLICY
    raise ValueError(f"unknown dtype policy: {name!r}")
