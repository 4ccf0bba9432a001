"""Block-shape sweep of the fused int8-dynamic matmul at the LTX-2B
FFN / projection shapes (VERDICT r2 item 4c).

The fused Pallas act-quant + s8xs8 kernel (ops/int8_matmul.py) lost to
XLA's overlapped unfused chain at its default 512x512 blocks (~70 vs
~190 TF/s effective in-graph). This sweeps block_m x block_n at the
exact serving shapes — tokens M = B*S = 2*5280, FFN up [2048->8192],
FFN down [8192->2048], qkvo [2048->2048] — against the XLA dispatch
baseline, standalone. A winner still has to prove itself as a
full-step marginal (LTXV_TPU_FUSED_INT8=1 tools/mb_marginal.py base)
before flipping the default.

    python tools/mb_ffn_sweep.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ltx_video_gpupoor_tpu.ops.quant import (
    int8_dynamic_matmul,
    quantize_weights,
)
from ltx_video_gpupoor_tpu.ops.int8_matmul import int8_dynamic_matmul_fused

from _bench_util import require_backend, timeit_loop  # noqa: E402

M = 2 * 5280
SHAPES = (
    ("ffn_up", 2048, 8192),
    ("ffn_down", 8192, 2048),
    ("qkvo", 2048, 2048),
)
BLOCKS = (
    (512, 512), (1024, 512), (512, 1024), (1024, 1024),
    (256, 1024), (2048, 512), (512, 2048), (1320, 512), (2640, 512),
)


def main():
    require_backend()
    for name, k, n in SHAPES:
        kx, kw = jax.random.split(jax.random.key(hash(name) % 2**31), 2)
        x = jax.random.normal(kx, (M, k), jnp.bfloat16)
        w = jax.random.normal(kw, (k, n), jnp.bfloat16) * k**-0.5
        q = quantize_weights(w)
        flops = 2.0 * M * k * n

        t = timeit_loop(lambda a: int8_dynamic_matmul(a, q), x)
        print(f"{name:9s} xla-dispatch        : {t*1e3:8.3f} ms "
              f"({flops/t/1e12:6.1f} TF/s)")
        sys.stdout.flush()
        for bm, bn in BLOCKS:
            try:
                t = timeit_loop(
                    lambda a, bm=bm, bn=bn: int8_dynamic_matmul_fused(
                        a, q.w_int8, q.scale, block_m=bm, block_n=bn
                    ),
                    x,
                )
                print(f"{name:9s} fused bm={bm:5d} bn={bn:5d}: "
                      f"{t*1e3:8.3f} ms ({flops/t/1e12:6.1f} TF/s)")
            except Exception as e:
                print(f"{name:9s} fused bm={bm:5d} bn={bn:5d}: FAILED "
                      f"{type(e).__name__}: {e}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
