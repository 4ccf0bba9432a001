"""Pallas TPU fused dynamic-int8 matmul.

The XLA dynamic-int8 path (``ops/quant.py::int8_dynamic_matmul``) runs as
separate programs — activation absmax reduce, quantize, s8xs8 dot, fp32
dequant epilogue — and measures ~190 TF/s at LTX-2B shapes (barely above
the 197 TF/s bf16 peak, nowhere near the 394 TOP/s int8 MXU rate). This
kernel fuses the whole chain into one program per output tile:

    per (m, n) tile:
      xf    = x[m]            (bf16 -> f32, VMEM)
      s_x   = rowmax(|xf|)/127                       [per-row scale]
      x_q   = round(xf / s_x)  (int8)
      acc   = x_q @ w_int8[n]  (s8 x s8 -> s32 MXU, 2x bf16 rate)
      out   = acc * s_x * s_w[n] (+ bias[n])  (bf16)

The activation is quantized per M-tile row with the full K contraction
in VMEM, so no inter-program reduction is needed; the dequant epilogue
never materializes the int32 accumulator in HBM.

Counterpart of the reference's quanto int8 linears
(``/root/reference/inference.py:96-100``, executed by quanto CUDA
kernels); per-output-channel weight scales match
``ops/quant.py::quantize_weights``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# M x N output tile; K is contracted whole inside one program.
DEFAULT_BLOCK_M = 512
DEFAULT_BLOCK_N = 512


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, out_dtype):
    xf = x_ref[...].astype(jnp.float32)                      # [Bm, K]
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)       # [Bm, 1]
    s_x = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    x_q = jnp.round(xf / s_x).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                        # [Bm, Bn] s32
    out = acc.astype(jnp.float32) * s_x * s_ref[0][None, :]
    if b_ref is not None:
        out = out + b_ref[0][None, :].astype(jnp.float32)
    o_ref[...] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "interpret", "out_dtype"),
)
def int8_dynamic_matmul_fused(
    x: jax.Array,           # [..., K] bf16/f32
    w_int8: jax.Array,      # [K, N] int8
    w_scale: jax.Array,     # [N] f32 (per-output-channel)
    bias: jax.Array | None = None,   # [N]
    *,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    orig_shape = x.shape
    k, n = w_int8.shape
    assert x.shape[-1] == k, (x.shape, w_int8.shape)
    out_dtype = out_dtype or x.dtype
    m = 1
    for d in orig_shape[:-1]:
        m *= d
    x2 = x.reshape(m, k)

    # VMEM budget: the kernel holds the f32 [bm, K] activation tile (plus
    # an f32 working copy) — clamp bm as K grows or large-K linears
    # (13B/14B: K >= 5120) blow the ~16 MB VMEM and fail Mosaic compile
    vmem_budget = 6 * 1024 * 1024  # bytes for the x tile alone
    bm_cap = max(128, (vmem_budget // (k * 4)) // 128 * 128)
    bm = min(block_m, bm_cap, m)
    pad_m = (-m) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    bn = min(block_n, n)
    while bn > 128 and n % bn:
        bn -= 128
    assert n % bn == 0, (n, bn)
    grid = ((m + pad_m) // bm, n // bn)

    # scale/bias travel as [1, N] — 1-D f32 operands trip an XLA/Mosaic
    # tiling mismatch (T(1024) vs T(512)) at block widths < 1024
    args = [x2, w_int8, w_scale.astype(jnp.float32)[None, :]]
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, bn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32)[None, :])
        kern = functools.partial(_kernel, out_dtype=out_dtype)
    else:
        def kern(x_ref, w_ref, s_ref, o_ref):
            _kernel(x_ref, w_ref, s_ref, None, o_ref, out_dtype=out_dtype)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=x2.size * 2 + w_int8.size + (m * n) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if pad_m:
        out = out[:m]
    return out.reshape(*orig_shape[:-1], n)
