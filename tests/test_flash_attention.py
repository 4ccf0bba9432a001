import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.ops.attention import attention
from ltx_video_gpupoor_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("sq,skv", [(128, 128), (256, 128), (256, 384)])
def test_flash_matches_reference(sq, skv):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    b, h, d = 2, 4, 64
    q = _rand(k1, (b, h, sq, d))
    k = _rand(k2, (b, h, skv, d))
    v = _rand(k3, (b, h, skv, d))
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_segment_ids_varlen():
    key = jax.random.key(1)
    k1, k2, k3 = jax.random.split(key, 3)
    b, h, s, d = 2, 2, 256, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    # sample 0: 200 real tokens, 56 pad; sample 1: two segments 100+80, pad 76
    seg = np.zeros((b, s), np.int32)
    seg[0, :200] = 1
    seg[1, :100] = 1
    seg[1, 100:180] = 2
    seg = jnp.asarray(seg)
    out = flash_attention(q, k, v, seg, seg, interpret=True)
    ref = reference_attention(q, k, v, seg, seg)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # padding rows must be exactly zero (masked everywhere)
    np.testing.assert_array_equal(np.asarray(out[0, :, 200:, :]), 0.0)


def test_flash_causal():
    k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
    b, h, s, d = 1, 2, 256, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_bf16_tolerance():
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    b, h, s, d = 1, 2, 128, 128
    q = _rand(k1, (b, h, s, d), jnp.bfloat16)
    k = _rand(k2, (b, h, s, d), jnp.bfloat16)
    v = _rand(k3, (b, h, s, d), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_attention_dispatch_pads_arbitrary_lengths():
    # 9-frame 16x16 latent = 2304 tokens + 77 text tokens: not 128-multiples
    k1, k2, k3 = jax.random.split(jax.random.key(4), 3)
    b, h, d = 1, 2, 64
    q = _rand(k1, (b, h, 300, d))
    k = _rand(k2, (b, h, 77, d))
    v = _rand(k3, (b, h, 77, d))
    out = attention(q, k, v, mode="xla")
    assert out.shape == (b, h, 300, d)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_kv_valid_tail_masking_matches_segments():
    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    b, h, d = 1, 2, 64
    sq, skv = 300, 300  # pads to 384
    q = _rand(k1, (b, h, sq, d))
    k = _rand(k2, (b, h, skv, d))
    v = _rand(k3, (b, h, skv, d))
    out = attention(q, k, v, mode="xla")  # oracle on unpadded
    from ltx_video_gpupoor_tpu.ops.padding import pad_axis

    qp, kp, vp = (pad_axis(t, 2, 128) for t in (q, k, v))
    fast = flash_attention(qp, kp, vp, kv_valid=skv, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fast[:, :, :sq]), np.asarray(out), atol=2e-5, rtol=2e-5
    )


def test_score_bound_fast_path_matches_reference():
    """Max-free streaming softmax (qk-normed callers): exact softmax as
    long as logits stay within the static bound."""
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    b, h, s, d = 2, 2, 384, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, score_bound=32.0, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # with tail masking
    out = flash_attention(q, k, v, kv_valid=300, score_bound=32.0,
                          interpret=True)
    ref = reference_attention(q[:, :, :], k[:, :, :300], v[:, :, :300])
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # with segment ids
    seg = jnp.asarray(
        np.repeat([[1] * 200 + [0] * 184, [1] * 100 + [2] * 284], 1, 0),
        jnp.int32,
    )
    out = flash_attention(q, k, v, seg, seg, score_bound=32.0,
                          interpret=True)
    ref = reference_attention(q, k, v, seg, seg)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_score_bound_clamp_keeps_finite():
    """Logits far beyond the bound: outputs stay finite (clamped scores
    tie at the bound instead of overflowing the exponent)."""
    k1, k2, k3 = jax.random.split(jax.random.key(8), 3)
    b, h, s, d = 1, 1, 128, 64
    q = _rand(k1, (b, h, s, d)) * 100.0  # logits ~ +-800
    k = _rand(k2, (b, h, s, d)) * 100.0
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, score_bound=32.0, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_int8_qk_tier_close_to_fp():
    """SageAttention-equivalent int8-QK tier: small accuracy cost only."""
    k1, k2, k3 = jax.random.split(jax.random.key(6), 3)
    b, h, s, d = 1, 2, 256, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, qk_int8=True, interpret=True)
    ref = reference_attention(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.02, err


def test_int8_pv_tier_close_to_fp():
    """int8-PV tier (TPU analogue of sage2's fp8-PV,
    /root/reference/wan/modules/sage2_core.py:71-145): p quantized at the
    fixed [0,1] scale, v per-channel — small accuracy cost only."""
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    b, h, s, d = 1, 2, 256, 128
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, qk_int8=True, pv_int8=True,
                          interpret=True)
    ref = reference_attention(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.03, err


def test_int8_pv_odd_head_dim_close_to_fp():
    """int8-PV at d=64 (sum-col padding): the ones column quantizes
    exactly (code 127 at scale 1/127), so the denominator — and hence
    the acc/l ratio — stays consistent with the x127 exponent fold."""
    k1, k2, k3 = jax.random.split(jax.random.key(17), 3)
    b, h, s, d = 1, 2, 256, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, qk_int8=True, pv_int8=True,
                          interpret=True)
    ref = reference_attention(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.03, err


def test_int8_qk_with_segments_matches_reference():
    """Pre-kernel quantization composes with varlen segment masking."""
    k1, k2, k3 = jax.random.split(jax.random.key(9), 3)
    b, h, s, d = 1, 2, 256, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    seg = jnp.asarray(
        np.where(np.arange(s) < 200, 1, 0)[None, :], jnp.int32
    )
    out = flash_attention(q, k, v, seg, seg, qk_int8=True, interpret=True)
    ref = reference_attention(q, k, v, seg, seg)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.02, err


def test_int8pv_with_kv_tail_close_to_fp():
    """The full int8 tier (int8 QK with per-block K scales + int8 PV with
    the x127 scale folded into the online-softmax exponent) stays close to
    the exact oracle, including a kv tail mask."""
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    b, h, s, d = 1, 2, 384, 128
    valid = 300
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(
        q, k, v, qk_int8=True, pv_int8=True,
        kv_valid=valid, interpret=True,
    )
    kv_seg = jnp.asarray(
        np.where(np.arange(s) < valid, 1, 0)[None, :], jnp.int32
    )
    q_seg = jnp.ones((b, s), jnp.int32)
    ref = reference_attention(q, k, v, q_seg, kv_seg)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.03, err


def test_int8_pipe_close_to_fp():
    """The opt-in sub-block pipelined int8 tiers (LTXV_TPU_INT8_PIPE)
    stay within the tier's quantization tolerance of the exact oracle —
    the interleave reorders the online-softmax sub-block updates, which
    must not change the math beyond int8 noise. s=512/block_kv=256 so
    the pipe gate actually engages (nsub=2): 256 is 256-aligned for the
    per-row-K-scale qk-only tier and 64-aligned for int8pv."""
    k1, k2, k3 = jax.random.split(jax.random.key(12), 3)
    b, h, s, d = 1, 2, 512, 64
    valid = 400
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    kv_seg = jnp.asarray(
        np.where(np.arange(s) < valid, 1, 0)[None, :], jnp.int32
    )
    q_seg = jnp.ones((b, s), jnp.int32)
    ref = reference_attention(q, k, v, q_seg, kv_seg)
    for pv in (False, True):
        out = flash_attention(
            q, k, v, qk_int8=True, pv_int8=pv, kv_valid=valid,
            block_kv=256, interpret=True, int8_pipe=True,
        )
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 0.03, (pv, err)


def test_pipe_sub_blocks_at_row_alignment():
    """The LTX serving shape resolves block_kv=2688 — NOT a 256
    multiple. The pipe gate only needs lane alignment for the
    lane-sliced vectors (segment ids, per-row K scales); the tail-masked
    serving paths split at k/v ROW granularity (bsub=1344: 8-aligned for
    bf16, 32-aligned for int8). Exercise exactly that: exact-bf16 nsub=2
    must stay bit-close to the oracle, int8pv within tier noise."""
    k1, k2, k3 = jax.random.split(jax.random.key(13), 3)
    b, h, s, d = 1, 1, 2688, 64
    valid = 2640  # LTX-style tail mask
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    kv_seg = jnp.asarray(
        np.where(np.arange(s) < valid, 1, 0)[None, :], jnp.int32
    )
    q_seg = jnp.ones((b, s), jnp.int32)
    ref = reference_attention(q, k, v, q_seg, kv_seg)
    exact = flash_attention(
        q, k, v, kv_valid=valid, block_q=128, block_kv=2688,
        interpret=True, pipe_relax=True,
    )
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
    exact_n3 = flash_attention(
        q, k, v, kv_valid=valid, block_q=128, block_kv=2688,
        interpret=True, pipe_relax=True, pipe_nsub=3,
    )
    np.testing.assert_allclose(
        np.asarray(exact_n3), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
    # bounded-score fold split across sub-blocks: pure reassociation
    bound_1 = flash_attention(
        q, k, v, kv_valid=valid, block_q=128, block_kv=2688,
        interpret=True, score_bound=40.0,
    )
    bound_n2 = flash_attention(
        q, k, v, kv_valid=valid, block_q=128, block_kv=2688,
        interpret=True, score_bound=40.0, pipe_relax=True, pipe_nsub=2,
    )
    np.testing.assert_allclose(
        np.asarray(bound_n2), np.asarray(bound_1), atol=1e-4, rtol=1e-4
    )
    piped = flash_attention(
        q, k, v, qk_int8=True, pv_int8=True, kv_valid=valid,
        block_q=128, block_kv=2688, interpret=True, int8_pipe=True,
    )
    err = np.abs(np.asarray(piped) - np.asarray(ref)).max()
    assert err < 0.03, err


def test_auto_with_score_bound_prefers_bounded_exact():
    """An implicit TPU `auto` must not silently discard a caller's
    score_bound by resolving to the int8pv tier (which nulls it) — the
    validated bounded-softmax path wins; an EXPLICIT int8pv pin still
    takes precedence (and documents the nulling)."""
    from ltx_video_gpupoor_tpu.ops import attention as am

    orig_backend, orig_forced = am._default_backend_is_tpu, am._FORCED_MODE
    try:
        am._default_backend_is_tpu = lambda: True
        am._FORCED_MODE = "auto"
        assert am.resolve_mode("auto", score_bound=40.0) == "pallas"
        assert am.resolve_mode("auto") == "pallas_int8pv"
        am._FORCED_MODE = "pallas_int8pv"   # explicit pin wins
        assert am.resolve_mode("auto", score_bound=40.0) == "pallas_int8pv"
    finally:
        am._default_backend_is_tpu = orig_backend
        am._FORCED_MODE = orig_forced


def test_sub_block_plan_gating():
    """sub_block_plan is the single source of truth for the kernel's kv
    sub-block split — pin its gating table so benches can trust the
    printed plan (the r3d A/B silently compared identical kernels)."""
    from ltx_video_gpupoor_tpu.ops.flash_attention import sub_block_plan

    base = dict(use_segments=False, qk_int8=False, pv_int8=False,
                score_bound=None)
    # exact default: %256 only
    assert sub_block_plan(4096, **base) == (2, 2048)
    assert sub_block_plan(2688, **base) == (1, 2688)
    # opt-in relax: row granularity
    assert sub_block_plan(2688, **base, pipe_relax=True) == (2, 1344)
    # segments force lane alignment even under relax
    seg = dict(base, use_segments=True)
    assert sub_block_plan(2688, **seg, pipe_relax=True) == (1, 2688)
    # bounded path never splits
    assert sub_block_plan(4096, **dict(base, score_bound=40.0)) == (1, 4096)
    # int8 tiers: opt-in only; int8pv aligns at 64, qk-only at 256
    pv = dict(base, qk_int8=True, pv_int8=True)
    assert sub_block_plan(4096, **pv) == (1, 4096)
    assert sub_block_plan(4096, **pv, int8_pipe=True) == (2, 2048)
    assert sub_block_plan(2688, **pv, int8_pipe=True) == (2, 1344)
    qk = dict(base, qk_int8=True)
    assert sub_block_plan(2688, **qk, int8_pipe=True) == (1, 2688)
    assert sub_block_plan(4096, **qk, int8_pipe=True) == (2, 2048)
    # the bounded path splits ONLY under an explicit pipe_nsub (its
    # fold is order-independent, but less VPU work to hide -> default
    # stays unsplit until the A/B says otherwise)
    bnd = dict(base, score_bound=40.0)
    assert sub_block_plan(2688, **bnd, pipe_relax=True) == (1, 2688)
    assert sub_block_plan(2688, **bnd, pipe_relax=True,
                          pipe_nsub=2) == (2, 1344)
    # pipe_nsub overrides the split count; invalid overrides (not a
    # divisor, or a sub-block below the branch's sublane alignment)
    # fall back to no split instead of compiling a misaligned kernel
    assert sub_block_plan(2688, **base, pipe_relax=True,
                          pipe_nsub=3) == (3, 896)
    assert sub_block_plan(2688, **base, pipe_relax=True,
                          pipe_nsub=4) == (4, 672)
    assert sub_block_plan(2688, **base, pipe_relax=True,
                          pipe_nsub=5) == (1, 2688)   # 2688 % 5 != 0
    # even WITHOUT relax, nsub=3 keeps 2688/3=896 lane-aligned — the
    # default branch accepts it (the r3g relax win came from splitting
    # at all, not from the row granularity itself)
    assert sub_block_plan(2688, **base, pipe_nsub=3) == (3, 896)
    assert sub_block_plan(4096, **pv, int8_pipe=True,
                          pipe_nsub=4) == (4, 1024)
    assert sub_block_plan(4096, **base, pipe_nsub=1) == (1, 4096)


def test_int8pv_rejects_score_bound():
    """A fixed exponent offset would zero whole p rows under int8 — the
    combination must be rejected, not silently wrong."""
    q = jnp.zeros((1, 1, 128, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="pv_int8"):
        flash_attention(q, q, q, score_bound=20.0, qk_int8=True,
                        pv_int8=True, interpret=True)


def test_parse_sp_modes():
    from ltx_video_gpupoor_tpu.ops.attention import parse_sp

    assert parse_sp("auto") == ("auto", None)
    assert parse_sp("pallas_int8") == ("pallas_int8", None)
    assert parse_sp("ulysses:sp") == ("auto", "sp")
    assert parse_sp("ulysses:sp:pallas_int8") == ("pallas_int8", "sp")


def test_hp_kernel_paired_matches_reference():
    """Head-packed kernel at d=64: mix/diff QK + lane-select PV +
    partial-l must equal the head-split oracle, including a kv tail."""
    from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention_hp

    k1, k2, k3 = jax.random.split(jax.random.key(23), 3)
    b, s, heads, d = 2, 384, 4, 64
    valid = 300
    q = _rand(k1, (b, s, heads * d))
    k = _rand(k2, (b, s, heads * d))
    v = _rand(k3, (b, s, heads * d))
    out = flash_attention_hp(q, k, v, heads=heads, kv_valid=valid,
                             block_q=128, block_kv=128, interpret=True)

    def split(t):
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    kv_seg = jnp.asarray(
        np.where(np.arange(s) < valid, 1, 0)[None, :], jnp.int32
    ).repeat(b, 0)
    q_seg = jnp.ones((b, s), jnp.int32)
    ref = reference_attention(split(q), split(k), split(v), q_seg, kv_seg)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.02, err.max()


def test_hp_kernel_single_head_block_matches_reference():
    """d=128: one head per 128-lane block, no pairing."""
    from ltx_video_gpupoor_tpu.ops.flash_attention import flash_attention_hp

    k1, k2, k3 = jax.random.split(jax.random.key(29), 3)
    b, s, heads, d = 1, 256, 3, 128
    q = _rand(k1, (b, s, heads * d))
    k = _rand(k2, (b, s, heads * d))
    v = _rand(k3, (b, s, heads * d))
    out = flash_attention_hp(q, k, v, heads=heads,
                             block_q=128, block_kv=128, interpret=True)

    def split(t):
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    ref = reference_attention(split(q), split(k), split(v))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.02, err.max()


def test_attention_packed_fallback_matches_split():
    """attention_packed (head-packed entry) must match the split-heads
    dispatch on the fallback path."""
    from ltx_video_gpupoor_tpu.ops.attention import attention_packed

    k1, k2, k3 = jax.random.split(jax.random.key(31), 3)
    b, s, heads, d = 2, 200, 4, 64
    q = _rand(k1, (b, s, heads * d))
    k = _rand(k2, (b, s, heads * d))
    v = _rand(k3, (b, s, heads * d))
    out = attention_packed(q, k, v, heads, mode="xla")

    def split(t):
        return t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    ref = reference_attention(split(q), split(k), split(v))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_subblock_pipelined_path_matches_reference():
    """block_kv % 256 == 0 engages the 2-way sub-block pipeline on the
    exact path — numerics must be unchanged (incl. tail mask + causal)."""
    k1, k2, k3 = jax.random.split(jax.random.key(37), 3)
    b, h, s, d = 1, 2, 512, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, block_q=256, block_kv=512,
                          kv_valid=470, interpret=True)
    seg = jnp.asarray(np.where(np.arange(s) < 470, 1, 0)[None], jnp.int32)
    ref = reference_attention(q, k, v, jnp.ones((b, s), jnp.int32), seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    out = flash_attention(q, k, v, block_q=256, block_kv=512, causal=True,
                          interpret=True)
    ref = reference_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kv_only_segments_rejected():
    """A kv-only mask must raise — silently ignoring it would leave pad
    kv columns contributing softmax mass (both kernel and oracle)."""
    import pytest

    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    q = _rand(k1, (1, 2, 128, 64))
    k = _rand(k2, (1, 2, 128, 64))
    v = _rand(k3, (1, 2, 128, 64))
    seg = jnp.ones((1, 128), jnp.int32)
    with pytest.raises(ValueError, match="kv_segment_ids"):
        flash_attention(q, k, v, None, seg, interpret=True)
    with pytest.raises(ValueError, match="kv_segment_ids"):
        reference_attention(q, k, v, None, seg)


def test_causal_with_kv_valid_tail():
    """causal + kv_valid: the straddling-block tail split must not change
    numerics."""
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    b, h, s, d = 1, 2, 384, 64
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    out = flash_attention(q, k, v, block_q=128, block_kv=128,
                          causal=True, kv_valid=300, interpret=True)
    seg = jnp.asarray(np.where(np.arange(s) < 300, 1, 0)[None], jnp.int32)
    ref = reference_attention(
        q, k, v, jnp.ones((b, s), jnp.int32), seg, causal=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_auto_mode_resolution_policy():
    """`auto` mirrors the reference's get_auto_attention policy
    (/root/reference/inference.py:87-93): the sage2-equivalent int8pv
    tier on TPU, the XLA reference path elsewhere; a forced mode (the
    CLI --attention flag / set_attention_mode) always wins."""
    from ltx_video_gpupoor_tpu.ops import attention as am

    orig_backend, orig_forced = am._default_backend_is_tpu, am._FORCED_MODE
    try:
        am._default_backend_is_tpu = lambda: True
        am._FORCED_MODE = "auto"
        assert am.resolve_mode("auto") == "pallas_int8pv"
        # head-dim aware (r3h): at d<=64 the row-split exact kernel
        # measured faster than int8pv, so auto picks the honest path
        assert am.resolve_mode("auto", head_dim=64) == "pallas"
        assert am.resolve_mode("auto", head_dim=128) == "pallas_int8pv"
        am._default_backend_is_tpu = lambda: False
        assert am.resolve_mode("auto") == "xla"
        assert am.resolve_mode("auto", head_dim=64) == "xla"
        am.set_attention_mode("pallas")
        assert am.resolve_mode("auto") == "pallas"
        # explicit modes pass through untouched
        assert am.resolve_mode("pallas_int8") == "pallas_int8"
    finally:
        am._default_backend_is_tpu = orig_backend
        am._FORCED_MODE = orig_forced


def test_attn_env_knob_initializes_forced_mode():
    """LTXV_TPU_ATTN pins the process-wide tier at import (deployment
    knob); an invalid value fails fast with the valid set."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, LTXV_TPU_ATTN="pallas",
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "from ltx_video_gpupoor_tpu.ops.attention import "
         "get_attention_mode; print(get_attention_mode())"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.strip() == "pallas"

    env["LTXV_TPU_ATTN"] = "sage3"
    out = subprocess.run(
        [sys.executable, "-c",
         "import ltx_video_gpupoor_tpu.ops.attention"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode != 0 and "LTXV_TPU_ATTN" in out.stderr


def test_dispatch_env_schedule_overrides(monkeypatch):
    """LTXV_TPU_BLOCK_Q/BLOCK_KV/PIPE_NSUB reach the plain kernel as
    schedule kwargs (sweep/adoption knobs; headpar path ignores them —
    its cached partitioning rule does not thread schedule overrides)."""
    from ltx_video_gpupoor_tpu.ops import attention as am

    seen = {}

    def fake_kernel(q, k, v, qseg=None, kseg=None, **kw):
        seen.update(kw)
        return q

    monkeypatch.setattr(am, "flash_attention", fake_kernel)
    monkeypatch.setenv("LTXV_TPU_BLOCK_Q", "1344")
    monkeypatch.setenv("LTXV_TPU_BLOCK_KV", "2688")
    monkeypatch.setenv("LTXV_TPU_PIPE_NSUB", "4")
    q = jnp.zeros((1, 2, 256, 64), jnp.bfloat16)
    out = am.attention(q, q, q, mode="pallas", headpar=False)
    assert out.shape == q.shape
    assert seen["block_q"] == 1344
    assert seen["block_kv"] == 2688
    assert seen["pipe_nsub"] == 4

    # unset knobs leave the kernel's own defaults in charge
    seen.clear()
    monkeypatch.delenv("LTXV_TPU_BLOCK_Q")
    monkeypatch.delenv("LTXV_TPU_BLOCK_KV")
    monkeypatch.delenv("LTXV_TPU_PIPE_NSUB")
    am.attention(q, q, q, mode="pallas", headpar=False)
    assert "block_q" not in seen and "pipe_nsub" not in seen


def test_exact_pipe_nsub4_d128_with_kv_tail():
    """The Wan-shape adoption candidate: exact softmax, row-split
    pipelining at nsub=4, d=128, padded kv tail (the serving path pads
    32760 -> 32768 and masks via kv_valid). Pure reassociation of the
    online-softmax fold — must match the reference mask oracle."""
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    b, h, s, d = 1, 2, 512, 128
    valid = 440
    q = _rand(k1, (b, h, s, d))
    k = _rand(k2, (b, h, s, d))
    v = _rand(k3, (b, h, s, d))
    kv_seg = jnp.asarray(
        np.where(np.arange(s) < valid, 1, 0)[None, :], jnp.int32
    )
    q_seg = jnp.ones((b, s), jnp.int32)
    ref = reference_attention(q, k, v, q_seg, kv_seg)
    out = flash_attention(
        q, k, v, kv_valid=valid, block_q=128, block_kv=512,
        interpret=True, pipe_relax=True, pipe_nsub=4,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
