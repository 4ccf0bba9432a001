import time, functools
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention

B, H, S, D = 2, 12, 32768, 128
KV_VALID = 32760
REPS = 8
key = jax.random.key(0)
q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)

def bench(name, **kw):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = flash_attention(q, k + c * 0, v, kv_valid=KV_VALID, **kw)
            return o[0, 0, 0, 0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return c
    t0 = time.time(); float(np.asarray(run(q, k, v))); comp = time.time() - t0
    t0 = time.time(); float(np.asarray(run(q, k, v))); el = time.time() - t0
    per = el / REPS
    fl = 4 * B * H * S * S * D
    print(f"{name:24s} {per*1e3:8.2f} ms/call  {fl/per/1e12:7.1f} TF/s  (compile {comp:.0f}s)")

bench("bf16")
bench("int8_qk", qk_int8=True)
bench("int8_qk_pv", qk_int8=True, pv_int8=True)
