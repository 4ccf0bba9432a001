"""Microbench: cross-attention (small kv) block_q sweep on the real TPU.

Hypothesis (from the r2 step-time breakdown): at skv=256 the default
block_q=768 makes a (2,32,7,1)=448-invocation grid of tiny tiles whose
per-invocation overhead dominates — the measured 1.9 ms/layer sits ~4x
above the compute+HBM roofline. A larger q block amortizes it.

    python tools/mb_cross_attn.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention

B, H, S, SKV, D = 2, 32, 5376, 256, 64


from _bench_util import timeit_rep  # noqa: E402  (script-dir import)


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, SKV, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, SKV, D), jnp.bfloat16)

    # loop-inside-jit to avoid measuring relay dispatch
    def make(bq):
        @jax.jit
        def run(q, k, v):
            def body(i, acc):
                o = flash_attention(
                    q + acc[0, 0, 0, 0].astype(q.dtype) * 1e-6, k, v,
                    block_q=bq,
                )
                return o
            out = jax.lax.fori_loop(0, 10, body, jnp.zeros_like(q))
            return out[0, 0, 0, 0]
        return run

    for bq in (768, 1344, 2688, 5376):
        try:
            fn = make(bq)
            t = timeit_rep(fn, q, k, v, n=5) / 10
            print(f"block_q={bq:5d}: {t*1e3:8.3f} ms/call")
        except Exception as e:
            print(f"block_q={bq:5d}: FAILED {type(e).__name__}: {e}")

    # XLA oracle for comparison
    @jax.jit
    def xla_run(q, k, v):
        def body(i, acc):
            o = jax.nn.dot_product_attention(
                (q + acc[0, 0, 0, 0].astype(q.dtype) * 1e-6)
                .transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            ).transpose(0, 2, 1, 3)
            return o
        return jax.lax.fori_loop(0, 10, body, jnp.zeros_like(q))[0, 0, 0, 0]

    t = timeit_rep(xla_run, q, k, v, n=5) / 10
    print(f"jax.nn.dpa : {t*1e3:8.3f} ms/call")


if __name__ == "__main__":
    main()
