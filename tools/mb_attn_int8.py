"""A/B the attention kernel tiers at the two serving shapes: bf16 exact
(default %256 pipe plan and the opt-in LTXV_TPU_PIPE_RELAX row split),
the int8 tiers, and their opt-in sub-block pipelined variants
(LTXV_TPU_INT8_PIPE). Each row prints the sub-block plan actually
compiled (nsub/bsub from flash_attention.sub_block_plan) — the r3d
session recorded a fake "wash" from two identical kernels because the
harness could not see that the gate kept nsub=1.

Real TPU: python tools/mb_attn_int8.py [wan|ltx]"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.ops.flash_attention import (
    fit_blocks,
    flash_attention,
    sub_block_plan,
)

shape = sys.argv[1] if len(sys.argv) > 1 else "wan"
if shape == "wan":
    B, H, S, D = 2, 12, 32768, 128
    KV_VALID = 32760
else:  # LTX-2B headline: 5280 tokens padded to 5376, d=64
    B, H, S, D = 2, 32, 5376, 64
    KV_VALID = 5280
REPS = 8
key = jax.random.key(0)
q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)


def window_sentinel():
    """Time a plain 4k bf16 matmul chain so the log records the chip
    window's quality — the shared relay under another tenant's load
    inflates identical programs 3-4x (r3h: 46.5 vs 12.7 s denoise for
    the same HLO 40 min apart), which silently voids A/B rows."""
    a = jax.random.normal(jax.random.key(3), (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def body(c, _):
            c = (c @ a).astype(jnp.bfloat16) * 0.001
            return c, None
        c, _ = jax.lax.scan(body, a, jnp.arange(16))
        return c[0, 0].astype(jnp.float32)
    float(np.asarray(mm(a)))
    t0 = time.time(); float(np.asarray(mm(a))); el = time.time() - t0
    tf = 16 * 2 * 4096**3 / el / 1e12
    # this chain's own ceiling is ~65 TF/s (the inter-matmul cast+scale
    # serializes the MXU), measured on a window whose kernel rows
    # matched known-good values; the r3h contended window ran 3.7x
    # slower, so 35 separates the regimes with margin either side
    print(f"window sentinel: {tf:6.1f} TF/s bf16 matmul chain "
          f"({'OK' if tf > 35 else 'CONTENDED — rows suspect'})",
          flush=True)


window_sentinel()


def bench(name, **kw):
    _, bkv = fit_blocks(S, S)
    nsub, bsub = sub_block_plan(
        bkv, use_segments=False,
        qk_int8=kw.get("qk_int8", False), pv_int8=kw.get("pv_int8", False),
        score_bound=kw.get("score_bound"),
        int8_pipe=kw.get("int8_pipe", False),
        pipe_relax=kw.get("pipe_relax", False),
        pipe_nsub=kw.get("pipe_nsub"),
    )

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            # cast the carry into k's dtype BEFORE the CSE-defeating add:
            # a f32 scalar would promote k to f32, which doubles the
            # kernel's VMEM blocks (scoped-vmem OOM at the Wan shape) and
            # silently benches an f32-K kernel
            o = flash_attention(q, k + c.astype(k.dtype) * 0, v,
                                kv_valid=KV_VALID, **kw)
            return o[0, 0, 0, 0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return c
    t0 = time.time(); float(np.asarray(run(q, k, v))); comp = time.time() - t0
    t0 = time.time(); float(np.asarray(run(q, k, v))); el = time.time() - t0
    per = el / REPS
    fl = 4 * B * H * S * S * D
    print(f"{name:24s} {per*1e3:8.2f} ms/call  {fl/per/1e12:7.1f} TF/s"
          f"  plan nsub={nsub} bsub={bsub}  (compile {comp:.0f}s)",
          flush=True)


bench("bf16")
bench("bf16 relax", pipe_relax=True)
# nsub sweep on the relax split (bsub must divide block_kv and keep
# bf16 sublane alignment %8; invalid overrides print plan nsub=1)
bench("bf16 relax n3", pipe_relax=True, pipe_nsub=3)
bench("bf16 relax n4", pipe_relax=True, pipe_nsub=4)
bench("int8_qk", qk_int8=True)
bench("int8_qk pipe", qk_int8=True, int8_pipe=True)
bench("int8_qk_pv", qk_int8=True, pv_int8=True)
bench("int8_qk_pv pipe", qk_int8=True, pv_int8=True, int8_pipe=True)
bench("int8_qk_pv pipe n4", qk_int8=True, pv_int8=True, int8_pipe=True,
      pipe_nsub=4)
# the bounded-score tier: its fold is order-independent too, so the
# same sub-block overlap may apply (default unsplit — A/B here)
bench("bound40", score_bound=40.0)
bench("bound40 n2", score_bound=40.0, pipe_relax=True, pipe_nsub=2)
bench("bound40 n3", score_bound=40.0, pipe_relax=True, pipe_nsub=3)
# repeat the headline A/B last: back-to-back rows bound run noise
bench("bf16 (rep)")
bench("bf16 relax (rep)", pipe_relax=True)
