"""A/B the Wan denoise step across linear/attention tiers in ONE process.

Isolates where bench_wan's step time goes: bf16 vs int8-dyn linears,
exact vs int8pv attention. Denoise only (no VAE decode). Real TPU.
"""
import os
import sys, time

sys.path.insert(0, ".")
from _bench_util import require_backend  # noqa: E402  (script-dir import)

require_backend()  # module-level device work below; gate the relay first
import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.models.wan.model import (
    WAN_T2V_1_3B, forward, init_params,
)
from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs

cfg = WAN_T2V_1_3B
HEIGHT, WIDTH, FRAMES = 480, 832, 81
f_lat = (FRAMES - 1) // 4 + 1
h_lat, w_lat = HEIGHT // 8, WIDTH // 8
n_tokens = f_lat * (h_lat // 2) * (w_lat // 2)
key = jax.random.key(0)
params_bf16 = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16), init_params(key, cfg)
)
from ltx_video_gpupoor_tpu.ops.quant import quantize_params
params_int8 = quantize_params(params_bf16, mode="dynamic")

x = jax.random.normal(key, (2, f_lat, h_lat, w_lat, cfg.in_dim), jnp.bfloat16)
ctx = jax.random.normal(key, (2, cfg.text_len, cfg.text_dim), jnp.bfloat16)
cmask = jnp.ones((2, cfg.text_len), jnp.int32)
freqs = wan_rope_freqs((f_lat, h_lat // 2, w_lat // 2),
                       head_dim=cfg.dim // cfg.num_heads)
REPS = 3


def bench(name, params, mode):
    from functools import partial

    @partial(jax.jit, static_argnames=("am",))
    def run(params, x, am):
        def body(c, i):
            v, _ = forward(params, cfg, c, jnp.full((2,), 500.0), ctx,
                           cmask, freqs, attn_mode=am)
            return (c + 0.01 * v).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, jnp.arange(REPS))
        return c[0, 0, 0, 0, 0].astype(jnp.float32)

    t0 = time.time(); float(np.asarray(run(params, x, mode)))
    comp = time.time() - t0
    t0 = time.time(); float(np.asarray(run(params, x, mode)))
    per = (time.time() - t0) / REPS
    print(f"{name:28s} {per*1e3:8.0f} ms/step  (compile {comp:.0f}s)",
          flush=True)


# rope-on-heads is the Wan DEFAULT since the r3 A/B below adopted it;
# pin it OFF for the non-ropeheads rows so the labels stay honest
os.environ["LTXV_TPU_ROPE_HEADS"] = "0"
bench("bf16 + exact", params_bf16, "pallas")
bench("bf16 + int8pv", params_bf16, "pallas_int8pv")
bench("int8dyn + exact", params_int8, "pallas")
bench("int8dyn + int8pv", params_int8, "pallas_int8pv")

# rope-on-heads layout (env read at trace time; each bench() builds a
# fresh jit, so flipping between rows is safe)
os.environ["LTXV_TPU_ROPE_HEADS"] = "1"
bench("bf16 + int8pv + ropeheads", params_bf16, "pallas_int8pv")
bench("int8dyn + int8pv + ropeheads", params_int8, "pallas_int8pv")
del os.environ["LTXV_TPU_ROPE_HEADS"]  # back to the family default
