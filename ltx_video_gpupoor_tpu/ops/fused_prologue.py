"""Fused adaLN prologue + int8-dynamic linear (opt-in Pallas tier).

Every LTX block runs the same prologue twice per layer (self-attn and
FFN): ``h = rms_norm(x) * (1 + scale) + shift`` followed by int8
dynamic-activation linears consuming ``h`` (``transformer3d.py``
``_block_forward``; reference math at
``/root/reference/ltx_video/models/transformers/attention.py:347-458``).
In the unfused XLA graph ``h`` makes a full HBM round-trip per consumer
(write once, read once per projection) plus the act-quant absmax pass;
this kernel computes the prologue from ``x`` directly in VMEM inside the
matmul — the ``[M, K]`` activation is read ONCE per output-block column
and never materialized.

Tiling: grid ``(M/bm, N/bn)``, both axes parallel. The x block carries
the FULL contraction dim K (the row reduction needs whole rows — K up to
8 k fits VMEM comfortably at bm<=512). adaLN scale/shift arrive at GROUP
granularity ``[G_total, K]`` (per guidance stream x frame group, the
layout ``_broadcast_groups`` expands); each x block must sit inside one
group (``rows_per_group % bm == 0``), so the per-token broadcast never
materializes either.

Numerics match the unfused tier's cast chain exactly: fp32 rms -> bf16
round -> bf16 modulate -> fp32 -> per-row absmax/127 -> round -> int8
MXU dot -> fp32 rescale (x_scale * w_scale) -> bf16.

Opt-in via ``LTXV_TPU_FUSED_PROLOGUE=1`` (model wiring in
``transformer3d._block_forward``); the default stays the XLA chain until
the fused path wins a full-step marginal on hardware
(``tools/mb_marginal.py fused_prologue``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_M = 480   # divides S=5280; 16-multiple (bf16 sublane tile)
DEFAULT_BLOCK_N = 1024


def enabled_mode() -> str | None:
    """``LTXV_TPU_FUSED_PROLOGUE``: ``1`` = Pallas on TPU, ``interpret``
    = force interpreter (CPU parity tests), unset/off = XLA chain."""
    import os

    raw = os.environ.get("LTXV_TPU_FUSED_PROLOGUE", "").strip().lower()
    if raw in ("", "0", "off", "false", "none"):
        return None
    return "interpret" if raw == "interpret" else "tpu"


def supports(p_linears, s: int, g: int) -> bool:
    """Whether the fused tier can serve these linears at this shape:
    every linear int8-dynamic with a 2-D weight, tokens split evenly
    into groups, and a 16-multiple block fitting inside one group."""
    if s % g:
        return False
    rows = s // g
    if rows % 16:
        return False
    for p in p_linears:
        w = p.get("w_int8_dyn")
        if w is None or w.ndim != 2:
            return False
    has_bias = ["bias" in p for p in p_linears]
    return all(has_bias) or not any(has_bias)


def apply_fused(
    x: jax.Array,          # [B, S, K] bf16
    scale_g: jax.Array,    # [B, G, K] adaLN scale rows (pre-broadcast)
    shift_g: jax.Array,    # [B, G, K]
    p_linears,             # list of {"w_int8_dyn", "scale"[, "bias"]}
    *,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """Prologue + all the linears that consume it, one kernel launch:
    the weights concatenate on the output axis so the x block is read
    once for q, k, AND v. Returns ``[B, S, sum(N_i)]`` — callers split."""
    b, s, k = x.shape
    g = scale_g.shape[1]
    w = jnp.concatenate([p["w_int8_dyn"] for p in p_linears], axis=1)
    ws = jnp.concatenate([p["scale"] for p in p_linears], axis=0)
    bias = None
    if "bias" in p_linears[0]:
        bias = jnp.concatenate([p["bias"] for p in p_linears], axis=0)
    out = norm_mod_int8_matmul(
        x.reshape(b * s, k),
        scale_g.astype(x.dtype).reshape(b * g, k),
        shift_g.astype(x.dtype).reshape(b * g, k),
        w, ws, bias,
        rows_per_group=s // g,
        eps=eps,
        interpret=interpret,
    )
    return out.reshape(b, s, -1)


def _kernel(x_ref, sc_ref, sh_ref, w_ref, ws_ref, b_ref, o_ref, *,
            eps: float, has_bias: bool):
    xf = x_ref[0].astype(jnp.float32)                      # [bm, K]
    rr = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    h = (xf * rr).astype(o_ref.dtype)                      # bf16 round
    h = h * (1.0 + sc_ref[0]) + sh_ref[0]                  # bf16 modulate
    hf = h.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)  # [bm, 1]
    x_scale = jnp.maximum(absmax / 127.0, 1e-8)
    h8 = jnp.clip(jnp.round(hf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        h8, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # [bm, bn]
    y = acc.astype(jnp.float32) * x_scale * ws_ref[0]
    if has_bias:
        y = y + b_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_group", "eps", "block_m", "block_n",
                     "interpret"),
)
def norm_mod_int8_matmul(
    x: jax.Array,          # [M, K] bf16 tokens (B*S flattened)
    scale: jax.Array,      # [G_total, K] bf16 adaLN scale rows
    shift: jax.Array,      # [G_total, K] bf16 adaLN shift rows
    w_int8: jax.Array,     # [K, N] int8 weight
    w_scale: jax.Array,    # [N] fp32 per-channel weight scale
    bias: jax.Array | None = None,   # [N] fp32
    *,
    rows_per_group: int,
    eps: float = 1e-5,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
) -> jax.Array:
    """``(rms_norm(x) * (1 + scale) + shift) @ dequant(w)`` in one pass."""
    m, k = x.shape
    n = w_int8.shape[1]
    if m % rows_per_group:
        raise ValueError(f"M={m} not a multiple of rows_per_group="
                         f"{rows_per_group}")
    if scale.shape != (m // rows_per_group, k):
        raise ValueError(
            f"scale shape {scale.shape} != ({m // rows_per_group}, {k})"
        )

    def fit(cap, size, mult):
        cap = min(cap, size)
        best = mult
        b = mult
        while b <= cap:
            if size % b == 0:
                best = b
            b += mult
        return best

    bm = fit(block_m, rows_per_group, 16)   # block inside ONE group
    if rows_per_group % bm:
        # no 16-multiple divides the group: a block would straddle two
        # adaLN groups and the index_map would hand its tail rows the
        # WRONG group's scale/shift — refuse like the shape checks above
        # (the model path never hits this: supports() requires
        # rows_per_group % 16 == 0, which guarantees a valid divisor)
        raise ValueError(
            f"rows_per_group={rows_per_group} has no 16-multiple block "
            f"divisor; blocks would straddle adaLN groups"
        )
    # VMEM budget: x block (bf16) + w block (int8) + fp32 acc, double-
    # buffered by Mosaic — keep the working set ~12 MB so wide-K calls
    # (FFN dims) don't OOM the compiler
    budget = 12 << 20
    cap_bn = max(128, (budget - 2 * bm * k) // max(k + 4 * bm, 1))
    bn = fit(min(block_n, cap_bn), n, 128)
    grid = (m // bm, n // bn)
    gs = rows_per_group

    has_bias = bias is not None
    in_specs = [
        # leading singleton keeps the (sublane, lane) block tile-legal
        pl.BlockSpec((1, bm, k), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM),
        # scale/shift select ONE group row per block: the group axis must
        # be the LEADING (untiled) dim — Mosaic requires the last-two
        # block dims be (8,128)-multiples or equal to the array dims, so
        # [G, K] with a (1, K) block is illegal for G > 1 while
        # [G, 1, K] with a (1, 1, K) block is exact
        pl.BlockSpec((1, 1, k), lambda i, j: ((i * bm) // gs, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, k), lambda i, j: ((i * bm) // gs, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bn), lambda i, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x[None], scale[:, None, :], shift[:, None, :], w_int8,
            w_scale.astype(jnp.float32)[None, None, :]]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, bn), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32)[None, None, :])

    def kernel(*refs):
        if has_bias:
            x_r, sc_r, sh_r, w_r, ws_r, b_r, o_r = refs
        else:
            x_r, sc_r, sh_r, w_r, ws_r, o_r = refs
            b_r = None
        _kernel(x_r, sc_r, sh_r, w_r, ws_r, b_r, o_r,
                eps=eps, has_bias=has_bias)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bm, bn), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x.size * x.dtype.itemsize * (n // bn)
            + w_int8.size + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)[0]
