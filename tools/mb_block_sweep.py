"""Block-size sweep of the production flash kernel (post sub-block
pipelining) at the LTX-2B self-attention shape.

The pre-pipelining sweep picked bq=768 x bkv=2688; the 2-way sub-block
interleave changes the MXU/VPU mix per grid step, so re-sweep.

    python tools/mb_block_sweep.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention

B, H, S, D = 2, 32, 5376, 64


from _bench_util import timeit_loop  # noqa: E402  (script-dir import)


def main():
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)

    for bq, bkv in ((768, 2688), (768, 5376), (384, 2688), (1344, 2688),
                    (2688, 768), (768, 1792), (1792, 1792), (512, 2688),
                    (768, 896)):
        try:
            # pipe_relax mirrors the production default (dispatch layer
            # enables it since r3h) so the sweep ranks the shipped kernel
            t = timeit_loop(
                lambda a, b, c, bq=bq, bkv=bkv: flash_attention(
                    a, b, c, kv_valid=5280, block_q=bq, block_kv=bkv,
                    pipe_relax=True,
                ),
                q, k, v,
            )
            print(f"bq={bq:5d} bkv={bkv:5d}: {t*1e3:8.3f} ms/layer")
        except Exception as e:
            print(f"bq={bq:5d} bkv={bkv:5d}: FAILED {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
