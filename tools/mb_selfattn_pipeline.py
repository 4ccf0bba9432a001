"""Experiment: software-pipelined flash-attention kernel at the LTX shape.

Hypothesis: the production kernel serializes per kv block — QK^T (MXU),
softmax (VPU), PV (MXU) — leaving the MXU idle during the exp pass and
the VPU idle during the matmuls. Splitting the kv block into sub-blocks
and unrolling gives Mosaic's scheduler independent MXU work (next
sub-block's QK^T) to interleave with the current sub-block's softmax.

Measures ms/layer-equivalent for the bench shape B=2 H=32 S=5376 d=64
at nsub in {1, 2, 4, 8}, bf16 and int8-QK variants.

    python tools/mb_selfattn_pipeline.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, S, D = 2, 32, 5376, 64
LOG2E = 1.4426950408889634
M_FLOOR = -1e20


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            scale, block_q, block_kv, num_kv_blocks, nsub, sum_col):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:, 0:1] = jnp.full((m_scr.shape[0], 1), M_FLOOR, m_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    c = scale * LOG2E
    qs = (q_ref[0, 0].astype(jnp.float32) * c).astype(q_ref.dtype)
    bsub = block_kv // nsub

    def qk(t):
        kt = k_ref[0, 0, t * bsub:(t + 1) * bsub, :]
        return jax.lax.dot_general(
            qs, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # software pipeline: issue next sub-block's QK before this one's softmax
    s_cur = qk(0)
    m_prev = m_scr[:, 0:1]
    acc = acc_scr[...]
    for t in range(nsub):
        s_next = qk(t + 1) if t + 1 < nsub else None
        m_new = jnp.maximum(m_prev, jnp.max(s_cur, axis=1, keepdims=True))
        p = jnp.exp2(s_cur - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        vt = v_ref[0, 0, t * bsub:(t + 1) * bsub, :]
        pv = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        m_prev = m_new
        s_cur = s_next
    acc_scr[...] = acc
    m_scr[:, 0:1] = m_prev

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _fin():
        l = acc_scr[:, sum_col:sum_col + 1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0, ...] = (
            acc_scr[:, :o_ref.shape[-1]] / l_safe
        ).astype(o_ref.dtype)


def pipelined_attention(q, k, v, *, block_q=768, block_kv=2688, nsub=1):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = d ** -0.5
    dv = -(-d // 128) * 128
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dv - d)))
    v = v.at[..., d].set(1.0)
    grid = (b, h, sq // block_q, skv // block_kv)
    kern = functools.partial(
        _kernel, scale=scale, block_q=block_q, block_kv=block_kv,
        num_kv_blocks=skv // block_kv, nsub=nsub, sum_col=d,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, dv), lambda b_, h_, i, j: (b_, h_, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v)


from _bench_util import timeit_loop  # noqa: E402  (script-dir import)


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)

    from ltx_video_gpupoor_tpu.ops.flash_attention import (
        flash_attention,
        reference_attention,
    )

    # correctness check at a small shape (interpret mode is too slow here;
    # compare compiled against the XLA oracle)
    qs, ks, vs = q[:1, :2, :1344], k[:1, :2, :1344], v[:1, :2, :1344]
    want = reference_attention(qs, ks, vs)
    got = pipelined_attention(qs, ks, vs, block_q=672, block_kv=672, nsub=4)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"max abs err vs oracle (nsub=4): {err:.2e}")

    t = timeit_loop(lambda q, k, v: flash_attention(q, k, v), q, k, v)
    print(f"production kernel      : {t*1e3:8.3f} ms/layer")
    for nsub in (1, 2, 4, 8):
        t = timeit_loop(
            functools.partial(pipelined_attention, nsub=nsub), q, k, v
        )
        print(f"pipelined nsub={nsub:2d}      : {t*1e3:8.3f} ms/layer")


if __name__ == "__main__":
    main()
