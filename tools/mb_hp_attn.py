"""Microbench: head-packed (hp) flash attention vs the classic kernel.

The hp kernel consumes [B, S, H*D] directly — no [B,H,S,D] transposes.
This measures (a) kernel-only time at the LTX-2B shape, (b) the
"transpose + pad + classic kernel" chain it replaces, (c) compiled
numerics vs the XLA oracle.

    python tools/mb_hp_attn.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.ops.attention import attention
from ltx_video_gpupoor_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_hp,
    reference_attention,
)

import sys as _sys

if "--wan" in _sys.argv:
    B, S, H, D = 2, 32760, 12, 128   # Wan-1.3B 832x480x81f shape
else:
    B, S, H, D = 2, 5280, 32, 64     # LTX-2B headline shape


from _bench_util import timeit_loop  # noqa: E402  (script-dir import)


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H * D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H * D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H * D), jnp.bfloat16)
    sp = -(-S // 128) * 128

    # compiled numerics check at a small shape
    qs, ks, vs = q[:1, :1280], k[:1, :1280], v[:1, :1280]
    got = flash_attention_hp(qs, ks, vs, heads=H, kv_valid=1200)

    def split(t):
        return t.reshape(*t.shape[:2], H, D).transpose(0, 2, 1, 3)

    seg = jnp.asarray(np.where(np.arange(1280) < 1200, 1, 0)[None], jnp.int32)
    ref = reference_attention(split(qs), split(ks), split(vs),
                              jnp.ones((1, 1280), jnp.int32), seg)
    ref = ref.transpose(0, 2, 1, 3).reshape(1, 1280, H * D)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"compiled hp vs oracle: max|d| = {err:.2e}")

    def classic_chain(q, k, v):
        # what the model does today: split heads + pad + kernel + unsplit
        o = attention(split(q), split(k), split(v), mode="pallas")
        return o.transpose(0, 2, 1, 3).reshape(*q.shape)

    def hp_chain(q, k, v):
        qp = jnp.pad(q, ((0, 0), (0, sp - S), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, sp - S), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, sp - S), (0, 0)))
        return flash_attention_hp(qp, kp, vp, heads=H, kv_valid=S)[:, :S]

    t = timeit_loop(classic_chain, q, k, v)
    print(f"classic  (transpose+pad+kernel): {t*1e3:8.3f} ms/layer")
    t = timeit_loop(hp_chain, q, k, v)
    print(f"hp       (pad+kernel)          : {t*1e3:8.3f} ms/layer")

    # kernel-only comparison on pre-padded inputs
    qp = jnp.pad(q, ((0, 0), (0, sp - S), (0, 0)))
    kp, vp = (jnp.pad(t_, ((0, 0), (0, sp - S), (0, 0))) for t_ in (k, v))
    t = timeit_loop(
        lambda a, b, c: flash_attention_hp(a, b, c, heads=H, kv_valid=S),
        qp, kp, vp,
    )
    print(f"hp kernel only                 : {t*1e3:8.3f} ms/layer")
    q4 = split(qp)
    k4, v4 = split(kp), split(vp)
    t = timeit_loop(
        lambda a, b, c: flash_attention(a, b, c, kv_valid=S), q4, k4, v4
    )
    print(f"classic kernel only            : {t*1e3:8.3f} ms/layer")


if __name__ == "__main__":
    main()
