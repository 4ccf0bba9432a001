"""Microbench: head-layout handling around the d=64 exact self-attention.

VERDICT r3 #9: the LTX-2B step breakdown attributes ~57 ms/step to the
``[B,S,H*D] <-> [B,H,S,D]`` transposes around the classic kernel (the hp
packed kernel that avoids them measured slower at d=64 — mix/diff QK
doubles MXU row-pushes). Remaining lever: let XLA FUSE the relayout into
the projection matmuls instead of paying it as standalone copies —
``einsum('bse,ehd->bhsd')`` for q/k/v and ``einsum('bhsd,hde->bse')``
for the output projection give XLA a single fusion region per
projection+relayout pair.

Chains measured (all exact numerics, full self-attention sublayer:
4 projections + RoPE-less kernel):
  classic : int8dyn/bf16 proj -> reshape+transpose -> kernel -> back
  fused   : einsum-projected straight to [B,H,S,D] -> kernel -> einsum out

    python tools/mb_head_layout.py [--bf16]
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import timeit_loop  # noqa: E402
from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention

B, H, S, D = 2, 32, 5280, 64
E = H * D


def main():
    use_bf16 = "--bf16" in sys.argv
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, S, E), jnp.bfloat16)
    wq, wk, wv, wo = (
        jax.random.normal(ks[i + 1], (E, E), jnp.bfloat16) * 0.02
        for i in range(4)
    )

    if use_bf16:
        def proj(xx, w):
            return xx @ w
    else:
        from ltx_video_gpupoor_tpu.ops.quant import (
            QuantizedLinear,
            int8_dynamic_matmul_dispatch,
            quantize_weights,
        )

        qw = {n: quantize_weights(w) for n, w in
              (("q", wq), ("k", wk), ("v", wv), ("o", wo))}

        def proj(xx, name):
            return int8_dynamic_matmul_dispatch(xx, qw[name], None)

        wq, wk, wv, wo = "q", "k", "v", "o"

    sp = ((S + 127) // 128) * 128
    pad = sp - S

    def classic(xx):
        q = proj(xx, wq)
        k = proj(xx, wk)
        v = proj(xx, wv)

        def to_heads(t):
            t = t.reshape(B, S, H, D).transpose(0, 2, 1, 3)
            return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))

        o = flash_attention(to_heads(q), to_heads(k), to_heads(v),
                            kv_valid=S)
        o = o[:, :, :S].transpose(0, 2, 1, 3).reshape(B, S, E)
        return proj(o, wo)

    def fused(xx):
        # einsum straight to [B,H,S,D]: the relayout rides the matmul's
        # output fusion instead of a standalone copy. int8-dyn path: the
        # quantized matmul produces [B,S,E]; only the reshape/transpose
        # placement differs (inside the same fusion region as the matmul
        # consumer chain).
        if use_bf16:
            wq4 = wq.reshape(E, H, D)
            wk4 = wk.reshape(E, H, D)
            wv4 = wv.reshape(E, H, D)
            q = jnp.einsum("bse,ehd->bhsd", xx, wq4)
            k = jnp.einsum("bse,ehd->bhsd", xx, wk4)
            v = jnp.einsum("bse,ehd->bhsd", xx, wv4)
        else:
            def to_heads(t):
                return t.reshape(B, S, H, D).transpose(0, 2, 1, 3)

            q = to_heads(proj(xx, wq))
            k = to_heads(proj(xx, wk))
            v = to_heads(proj(xx, wv))
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        o = flash_attention(qp, kp, vp, kv_valid=S)[:, :, :S]
        if use_bf16:
            wo4 = wo.reshape(H, D, E)
            return jnp.einsum("bhsd,hde->bse", o, wo4)
        return proj(o.transpose(0, 2, 1, 3).reshape(B, S, E), wo)

    tag = "bf16" if use_bf16 else "int8dyn"
    for name, fn in (("classic", classic), ("fused", fused)):
        t = timeit_loop(fn, x, n=10)
        print(f"{tag} {name:8s}: {t * 1e3:8.3f} ms/sublayer "
              f"({t * 1e3 * 28:.1f} ms/step-equivalent)", flush=True)


if __name__ == "__main__":
    main()
