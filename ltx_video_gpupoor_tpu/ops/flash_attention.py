"""Pallas TPU flash attention with segment-id masking.

This single kernel replaces the reference's attention zoo — SDPA /
SageAttention 1&2 / FlashAttention 2&3 / xformers, dispatched at
``/root/reference/wan/modules/attention.py:161-399`` (``pay_attention``) —
and makes the reference's special-case TPU offload path
(``/root/reference/ltx_video/models/transformers/attention.py:1080-1110``,
torch_xla Pallas flash attention with q/kv segment ids) the first-class
implementation.

Varlen batching (the reference's cu_seqlens packing,
``attention.py:244-266``) is expressed as segment ids: token *i* may attend
token *j* iff ``q_seg[i] == kv_seg[j]`` and ``kv_seg[j] > 0`` — id 0 marks
padding. Fully-masked (padding) query rows produce zeros, not NaNs.

Layout: ``q: [B, H, Sq, D]``, ``k/v: [B, H, Skv, D]``. Sequence lengths
must be multiples of the block size (128); for arbitrary lengths call
through :func:`ltx_video_gpupoor_tpu.ops.attention.attention`, which pads
and masks (segment ids or a static ``kv_valid``) automatically. fp32
online-softmax statistics, fp32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 768
DEFAULT_BLOCK_KV = 4096
# d<=64 exact-tier request (adopted from the r3j on-hardware e2e A/B;
# see the head-dim gate in ``flash_attention``): taller q block trades
# kv-block length under the same scores-tile VMEM budget.
DEFAULT_BLOCK_Q_D64 = 1344
DEFAULT_BLOCK_KV_D64 = 2688
# The binding VMEM constraint is the fp32 scores tile: bq*bkv*4B. Cap the
# product at 8 MB (v5e sweeps: larger tiles OOM the Mosaic compiler).
SCORES_TILE_ELEMS = 1 << 21
NEG_INF = -1e30
# Floor for the running max: any real score is far above this, while masked
# scores (NEG_INF) land ~1e10 below it, so exp underflows to exactly 0 and
# fully-masked rows need no special-casing in the inner loop.
M_FLOOR = -1e20
LOG2E = 1.4426950408889634
LOG2_127 = 6.9886846867721655  # log2(127) — the int8-PV exponent fold


def int8_pipe_enabled() -> bool:
    """Opt-in sub-block pipelining for the int8 tiers
    (``LTXV_TPU_INT8_PIPE=1``; read by the dispatch layer at trace time)."""
    import os

    return os.environ.get("LTXV_TPU_INT8_PIPE", "").strip().lower() in (
        "1", "true", "yes")


def pipe_relax_enabled() -> bool:
    """Relaxed pipe alignment (default ON; ``LTXV_TPU_PIPE_RELAX=0``
    disables): lets the exact-bf16 kernel split kv sub-blocks at row
    (sublane) granularity where the kv block is not a 256 multiple
    (e.g. the LTX serving shape's block_kv=2688 → bsub=1344).

    Adopted as the default after the r3g/r3h on-hardware A/Bs: the
    split overlaps the NEXT sub-block's QK^T (MXU) with the current
    softmax pass (VPU) — 10.50 vs 11.38 ms/call at the LTX d=64 shape
    (back-to-back rows, perf_logs/r3h), nsub=2 the optimum of the
    2/3/4 sweep, and e2e 13.06 s/video vs the int8pv tier's 13.12 in
    the same chip window. Exact numerics (pure reassociation of the
    online-softmax fold; parity pinned in test_flash_attention)."""
    import os

    return os.environ.get("LTXV_TPU_PIPE_RELAX", "").strip().lower() not in (
        "0", "false", "no", "off")


def sub_block_plan(
    block_kv: int,
    *,
    use_segments: bool,
    qk_int8: bool,
    pv_int8: bool,
    score_bound,
    int8_pipe: bool = False,
    pipe_relax: bool = False,
    pipe_nsub: int | None = None,
) -> tuple[int, int]:
    """The kernel's kv sub-block split: returns ``(nsub, bsub)``.

    One source of truth for kernel, dispatch, and benches (the r3d A/B
    recorded a fake "wash" because the harness could not see that the
    gate kept nsub=1 — tools/mb_attn_int8.py now prints this plan).

    Alignment: the k/v loads slice VMEM ROWS (sublane tiling 8 bf16 /
    32 int8 — cheap), but segment ids and per-row K scales ride the kv
    positions on the LANE dim, so slicing them needs 128-aligned
    sub-blocks. The bounded-score path defaults to no split (less VPU
    work to hide — no running max) but its fold (``acc += p@v``,
    ``l += sum(p)``) is order-independent too, so an explicit
    ``pipe_nsub`` can split it for A/Bs. The int8 tiers split only
    under the opt-in ``int8_pipe``
    (measured NOT a win at d=128: 84.24 piped vs 83.74 ms, r3e); the
    exact path splits at %256 always and at row granularity under
    ``pipe_relax`` (default ON via the dispatch layer since the r3h
    A/B — see ``pipe_relax_enabled``). ``pipe_nsub``
    overrides the split count (default 2) for sweeps; an override that
    violates divisibility or sub-block alignment falls back to no
    split, same as the default plan."""
    if score_bound is not None and pipe_nsub is None:
        return 1, block_kv
    if use_segments or (qk_int8 and not pv_int8):
        sub_align = 128      # lane-sliced vectors: bsub % 128
    elif qk_int8 or pv_int8:
        sub_align = 32       # int8 k/v sublane tiling (32, 128)
    else:
        sub_align = 8 if pipe_relax else 128
    if (qk_int8 or pv_int8) and not int8_pipe:
        return 1, block_kv
    nsub = 2 if pipe_nsub is None else int(pipe_nsub)
    if nsub < 2 or block_kv % nsub:
        return 1, block_kv
    bsub = block_kv // nsub
    if bsub % sub_align:
        return 1, block_kv
    return nsub, bsub


def fit_blocks(
    sq: int,
    skv: int,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
) -> tuple[int, int]:
    """Resolve requested block sizes to what the kernel will compile:
    the largest 128-multiple divisor of each seq len under the cap, with
    the kv cap further bound by the fp32 scores-tile VMEM budget.
    Sweeps on v5e favor bq 512-768 and then the largest kv block the
    budget allows (e.g. S=32768: bq 512 x bkv 4096 beats bkv 2048 by 4%;
    S=5376: bq 768 x bkv 2688, within 0.7% of the sweep optimum).
    Exported so benches report the plan actually compiled."""
    def fit(cap, s):
        cap = min(cap, s)
        best = 128
        b = 128
        while b <= cap:
            if s % b == 0:
                best = b
            b += 128
        return best
    block_q = fit(block_q, sq)
    # the VMEM budget binds even for explicit oversized block_q requests
    block_kv = fit(
        min(block_kv, max(128, SCORES_TILE_ELEMS // block_q)), skv
    )
    return block_q, block_kv


def _flash_kernel(
    q_ref,       # [1, 1, Bq, D]   bf16 — or int8 when qk_int8
    k_ref,       # [1, 1, Bkv, D]  bf16 — or int8 when qk_int8
    v_ref,       # [1, 1, Bkv, D(p)] bf16 — int8 when pv_int8; Dp when sum_col
    qseg_ref,    # [1, 1, Bq]  (int32) or None
    kseg_ref,    # [1, 1, Bkv] (int32) or None
    qs_ref,      # [1, 1, 1, Bq]  (fp32, per-row q scales x softmax scale)
    ks_ref,      # [1, 1, 1, Bkv] (fp32, per-row k scales) or None
    vs_ref,      # [1, 1, 1, D]   (fp32, per-channel v scales / 127) or None
    o_ref,       # [1, 1, Bq, D]
    m_scratch,   # [Bq, 128] fp32
    l_scratch,   # [Bq, 128] fp32 (unused when sum_col — l lives in acc)
    acc_scratch,  # [Bq, D] fp32 — or [Bq, Dp] when sum_col
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    use_segments: bool,
    kv_valid: int | None = None,
    qk_int8: bool = False,
    pv_int8: bool = False,
    sum_col: int | None = None,
    score_bound: float | None = None,
    int8_pipe: bool = False,
    pipe_relax: bool = False,
    pipe_nsub: int | None = None,
):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        if score_bound is None:
            m_scratch[:, 0:1] = jnp.full((m_scratch.shape[0], 1), M_FLOOR,
                                         m_scratch.dtype)
        if sum_col is None:
            l_scratch[:, 0:1] = jnp.zeros((l_scratch.shape[0], 1),
                                          l_scratch.dtype)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q_idx = pl.program_id(2)

    # Sub-block software pipelining: split the kv block in two and issue
    # the NEXT sub-block's QK^T (MXU) before the current sub-block's
    # softmax (VPU), giving Mosaic's scheduler independent matrix work to
    # interleave with the exp pass (measured −4.8% kernel time where the
    # default plan engages). Gating/alignment: see sub_block_plan.
    nsub, bsub = sub_block_plan(
        block_kv, use_segments=use_segments, qk_int8=qk_int8,
        pv_int8=pv_int8, score_bound=score_bound, int8_pipe=int8_pipe,
        pipe_relax=pipe_relax, pipe_nsub=pipe_nsub,
    )

    def _scores(qs, t, mask_kv_tail):
        """Scores for kv sub-block t: [Bq, bsub], masked."""
        lo = t * bsub
        kt = k_ref[0, 0, lo:lo + bsub, :]
        if qk_int8:
            # SageAttention2-style tier (sage2_core.py:71-145 equivalent):
            # Q/K arrive PRE-quantized to symmetric int8 (done once outside
            # the kernel, not per kv block), int8 MXU matmul (2x bf16 rate),
            # fp32 rescale. The softmax scale (x log2e) is folded into the q
            # row scales — per-row quantization is scale-invariant.
            s32 = jax.lax.dot_general(
                q_ref[0, 0], kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            if pv_int8:
                # fast tier: K carries ONE scale per kv block (sage2's
                # per-block granularity, sage2_core.py:148+) read off SMEM,
                # so the rescale is a single column-broadcast FMA instead
                # of two row x column passes over the score tile.
                s = s32.astype(jnp.float32) * (
                    qs_ref[0, 0, 0][:, None] * ks_ref[0, 0, 0, kv_idx]
                )
            else:
                s = (s32.astype(jnp.float32)
                     * qs_ref[0, 0, 0][:, None]) * ks_ref[0, 0, 0,
                                                          lo:lo + bsub][None]
        else:
            s = jax.lax.dot_general(
                qs, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [Bq, bsub]

        if use_segments:
            qseg = qseg_ref[0, 0]                               # [Bq]
            kseg = kseg_ref[0, 0, lo:lo + bsub]                 # [bsub]
            mask = (qseg[:, None] == kseg[None, :]) & (kseg[None, :] > 0)
            s = jnp.where(mask, s, NEG_INF)
        elif mask_kv_tail:
            # tail padding: a cheap iota compare replaces the segment-id
            # loads + equality masking. Only the one kv block straddling
            # kv_valid reaches here (pad < 128 <= block_kv, so it is the
            # last block) — interior blocks skip the 3 VPU ops/element.
            cols = kv_idx * block_kv + lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bsub), 1
            )
            s = jnp.where(cols < kv_valid, s, NEG_INF)
        if causal:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bsub), 0
            )
            cols = kv_idx * block_kv + lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bsub), 1
            )
            s = jnp.where(rows >= cols, s, NEG_INF)
        return s

    def _pv(p, t):
        lo = t * bsub
        vt = v_ref[0, 0, lo:lo + bsub, :]
        if pv_int8:
            # int8-PV tier (the TPU analogue of sage2's fp8-PV): p
            # arrives already in x127 units (the x127 was folded into
            # the exp2 exponent — zero extra VPU passes), so the int8
            # cast is a plain round. v is pre-quantized per-channel
            # outside the kernel; vs carries v_scale/127, and the x127
            # here restores plain v_scale so acc stays in the same x127
            # units as l (the ratio o = acc/l cancels it exactly).
            p8 = jnp.round(p).astype(jnp.int8)
            pv32 = jax.lax.dot_general(
                p8, vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return pv32.astype(jnp.float32) * (
                vs_ref[0, 0, 0][None, :] * 127.0
            )
        return jax.lax.dot_general(
            p.astype(v_ref.dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _update(s, t):
        """Fold sub-block scores into the online-softmax carry."""
        if score_bound is not None:
            # Bounded-score fast path (qk-normed attention): softmax with a
            # FIXED exponent offset instead of the online running max — the
            # per-element max reduce, the rescale alpha, and the m
            # bookkeeping all disappear; accumulation is `acc += p @ v`.
            # Sound because softmax is invariant to a constant offset; the
            # min() guard keeps exp2 finite even if a score exceeds the
            # bound (scores then tie at the bound — by which point softmax
            # is saturated anyway). Underflow needs a row max below
            # -score_bound, symmetric to the overflow argument.
            sb = score_bound * LOG2E
            p = jnp.exp2(jnp.minimum(s, sb) - sb)               # [Bq, bsub]
            if sum_col is None:
                l_scratch[:, 0:1] = (
                    l_scratch[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
                )
            acc_scratch[...] = acc_scratch[...] + _pv(p, t)     # [Bq, D(p)]
            return

        # Online softmax in scaled-score space (scale pre-folded into q):
        # p = exp2(s - m). The M_FLOOR clamp makes masked entries underflow
        # to exactly 0 with no extra selects.
        m_prev = m_scratch[:, 0:1]                              # [Bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)               # [Bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)                      # >= M_FLOOR
        if pv_int8:
            # x127 fold: p (and hence l and acc) live in x127 units, putting
            # block-local p on the full int8 grid for free — the shift rides
            # the [Bq, 1] exponent offset, not the [Bq, Bkv] tile.
            p = jnp.exp2(s - (m_new - LOG2_127))                # [Bq, bsub]
        else:
            p = jnp.exp2(s - m_new)                             # [Bq, bsub]
        alpha = jnp.exp2(m_prev - m_new)                        # [Bq, 1]
        if sum_col is not None:
            # v carries a ones column at index `sum_col` (head_dim not a
            # lane-tile multiple -> the wider PV matmul is free on the MXU):
            # column sum_col of acc accumulates exactly the softmax
            # denominator l, replacing the VPU cross-lane row-sum.
            acc_scratch[...] = acc_scratch[...] * alpha + _pv(p, t)
        else:
            l_new = (alpha * l_scratch[:, 0:1]
                     + jnp.sum(p, axis=1, keepdims=True))
            acc_scratch[...] = acc_scratch[...] * alpha + _pv(p, t)
            l_scratch[:, 0:1] = l_new
        m_scratch[:, 0:1] = m_new

    def _compute(mask_kv_tail: bool):
        # Matmul in the input dtype (bf16 on the fast path) with fp32
        # accumulation — casting inputs to fp32 here would force the MXU
        # onto its fp32 path (~8x slower). The softmax scale (×log2e, for
        # exp2) is folded into q at tile load — a [Bq, D] multiply instead
        # of touching the [Bq, Bkv] scores tile per element.
        if qk_int8:
            qs = None
        else:
            c = scale * LOG2E
            qs = (q_ref[0, 0].astype(jnp.float32) * c).astype(q_ref.dtype)
        s_cur = _scores(qs, 0, mask_kv_tail)
        for t in range(nsub):
            s_next = (
                _scores(qs, t + 1, mask_kv_tail) if t + 1 < nsub else None
            )
            _update(s_cur, t)
            s_cur = s_next

    needs_tail = (
        not use_segments and kv_valid is not None
        and kv_valid < num_kv_blocks * block_kv
    )
    if causal:
        # Skip fully-masked kv blocks above the diagonal; the kv_valid
        # tail compare runs only in the one straddling (last) block,
        # like the non-causal split below
        @pl.when(kv_idx * block_kv <= (q_idx + 1) * block_q - 1)
        def _():
            if needs_tail:
                @pl.when(kv_idx == num_kv_blocks - 1)
                def _tail():
                    _compute(True)

                @pl.when(kv_idx != num_kv_blocks - 1)
                def _interior():
                    _compute(False)
            else:
                _compute(False)
    elif needs_tail:
        # Static split: only the last kv block holds padded columns.
        @pl.when(kv_idx == num_kv_blocks - 1)
        def _():
            _compute(True)

        @pl.when(kv_idx != num_kv_blocks - 1)
        def _():
            _compute(False)
    else:
        _compute(False)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        d = o_ref.shape[-1]
        if sum_col is not None:
            l = acc_scratch[:, sum_col:sum_col + 1]
        else:
            l = l_scratch[:, 0:1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0, ...] = (acc_scratch[:, :d] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "block_q", "block_kv", "interpret", "kv_valid",
        "qk_int8", "pv_int8", "score_bound", "int8_pipe", "pipe_relax",
        "pipe_nsub",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int | None = None,
    block_kv: int | None = None,
    interpret: bool = False,
    kv_valid: int | None = None,
    qk_int8: bool = False,
    pv_int8: bool = False,
    score_bound: float | None = None,
    int8_pipe: bool = False,
    pipe_relax: bool = False,
    pipe_nsub: int | None = None,
) -> jax.Array:
    """Tiled online-softmax attention. See module docstring for layout."""
    b, h, sq, d = q.shape
    _, _, skv, _ = k.shape
    if sq % 128 or skv % 128:
        raise ValueError(
            f"seq lens ({sq}, {skv}) must be multiples of 128; "
            "pad + use segment ids"
        )
    if block_q is None or block_kv is None:
        # Per-tier defaults resolve only when the caller left the blocks
        # unset, so an EXPLICIT request — including the LTXV_TPU_BLOCK_Q/
        # KV env pins used for A/Bs — is always honored (ADVICE r3).
        # d<=64 exact tier: the post-split block re-sweep ranks a taller
        # q block / shorter kv block (fit-resolves to 896x1792 at the
        # LTX serving shape) ahead of the shipped 768x2688 — 8.079 vs
        # 8.329 ms/layer, and −2.0% e2e in the same chip window (12.794
        # vs 13.061 s/video, perf_logs/r3j). The int8 tiers keep the
        # global default (their per-kv-block K scales are calibrated on
        # the compiled block, and the sweep win did not replicate there),
        # and so does the bounded-score path (the sweep covered only the
        # exact online-softmax kernel; score_bound rebalances the VPU/
        # MXU mix, so it keeps the globally-swept plan until measured).
        # Varlen/segment shapes resolve through fit_blocks either way.
        if d <= 64 and not (qk_int8 or pv_int8) and score_bound is None:
            dq, dkv = DEFAULT_BLOCK_Q_D64, DEFAULT_BLOCK_KV_D64
        else:
            dq, dkv = DEFAULT_BLOCK_Q, DEFAULT_BLOCK_KV
        block_q = dq if block_q is None else block_q
        block_kv = dkv if block_kv is None else block_kv
    block_q, block_kv = fit_blocks(sq, skv, block_q, block_kv)
    if scale is None:
        scale = d ** -0.5
    use_segments = q_segment_ids is not None
    if use_segments and kv_segment_ids is None:
        raise ValueError("q_segment_ids given without kv_segment_ids")
    if kv_segment_ids is not None and not use_segments:
        # silently ignoring a kv-only mask would leave pad kv columns
        # contributing softmax mass to every row
        raise ValueError("kv_segment_ids given without q_segment_ids")

    # int8 tiers: quantize ONCE here (XLA fuses this O(S*D) pass into the
    # producing ops) rather than per kv-block inside the kernel — the
    # sage2 layout (quant wrappers around the kernel, sage2_core.py:148+).
    orig_dtype = q.dtype
    q_scale = k_scale = v_scale = None
    if pv_int8 and score_bound is not None:
        # A fixed exponent offset is incompatible with int8 P: every row
        # whose max score sits well below the bound (the normal case on
        # trained weights) would quantize its whole p row to zero. The
        # online running max keeps block-local p on the full int8 grid.
        raise ValueError("pv_int8 requires the online-softmax path; "
                         "drop score_bound")
    if qk_int8:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1), 1e-6) / 127.0
        q = jnp.round(qf / q_s[..., None]).astype(jnp.int8)
        q_scale = q_s * (scale * LOG2E)        # fold softmax scale (exp2)
        if pv_int8:
            # fast tier: per-kv-block k scales — the in-kernel rescale
            # collapses to a single column-broadcast FMA (sage2's per-block
            # granularity)
            nkv = skv // block_kv
            kb = kf.reshape(b, h, nkv, block_kv, d)
            k_s = jnp.maximum(
                jnp.max(jnp.abs(kb), axis=(3, 4)), 1e-6
            ) / 127.0                                          # [B,H,nkv]
            k = jnp.round(
                kb / k_s[:, :, :, None, None]
            ).astype(jnp.int8).reshape(b, h, skv, d)
        else:
            k_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-6) / 127.0
            k = jnp.round(kf / k_s[..., None]).astype(jnp.int8)
        k_scale = k_s
    num_q_blocks = sq // block_q
    num_kv_blocks = skv // block_kv
    grid = (b, h, num_q_blocks, num_kv_blocks)

    # When head_dim is not a multiple of the 128-lane tile, the PV matmul
    # half-fills the MXU output anyway — append a ones column to v at index
    # d so the same matmul also accumulates the softmax denominator, and
    # the kernel skips the VPU cross-lane row-sum (measured −15% at d=64,
    # S=5376 on v5e). For tile-multiple head dims the wider dot would cost
    # real MXU time, so keep the in-kernel row-sum there.
    sum_col = None
    dv = d
    if d % 128 != 0:
        sum_col = d
        dv = -(-d // 128) * 128
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dv - d)))
        v = v.at[..., d].set(1.0)
    if pv_int8:
        # Quantize AFTER the sum-col padding so odd head dims work too:
        # the ones column quantizes exactly (scale 1/127, code 127), so
        # the denominator stays exact and the o = acc[:, :d] / l ratio
        # cancels the x127 fold as in the tile-multiple case. PV is the
        # deep-contraction matmul (kv block), so the int8 MXU rate pays
        # off regardless of head dim.
        vf = v.astype(jnp.float32)
        v_s = jnp.maximum(jnp.max(jnp.abs(vf), axis=2), 1e-6) / 127.0
        v = jnp.round(vf / v_s[:, :, None, :]).astype(jnp.int8)
        v_scale = v_s / 127.0                  # also folds the p8 scale

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d), lambda b_, h_, i, j: (b_, h_, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_kv, dv), lambda b_, h_, i, j: (b_, h_, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [q, k, v]
    if use_segments:
        # [B, 1, S] layout keeps the minor dims tile-legal on TPU
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q), lambda b_, h_, i, j: (b_, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j),
                memory_space=pltpu.VMEM,
            )
        )
        args += [
            q_segment_ids.astype(jnp.int32)[:, None, :],
            kv_segment_ids.astype(jnp.int32)[:, None, :],
        ]
    # Per-head scale vectors ride as [B, H, 1, S] / [B, H, 1, D] — the
    # dummy second-minor axis keeps the block tile-legal on TPU.
    if qk_int8:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, block_q), lambda b_, h_, i, j: (b_, h_, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        if pv_int8:
            # per-block scales: the whole [nkv] vector rides in SMEM; the
            # kernel reads the kv_idx'th scalar on the scalar core
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, skv // block_kv),
                    lambda b_, h_, i, j: (b_, h_, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, block_kv), lambda b_, h_, i, j: (b_, h_, 0, j),
                    memory_space=pltpu.VMEM,
                )
            )
        args += [q_scale[:, :, None, :], k_scale[:, :, None, :]]
    if pv_int8:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, dv), lambda b_, h_, i, j: (b_, h_, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(v_scale[:, :, None, :])
    base = functools.partial(
        _flash_kernel,
        scale=float(scale),
        causal=causal,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        use_segments=use_segments,
        kv_valid=kv_valid,
        qk_int8=qk_int8,
        pv_int8=pv_int8,
        sum_col=sum_col,
        score_bound=score_bound,
        int8_pipe=int8_pipe,
        pipe_relax=pipe_relax,
        pipe_nsub=pipe_nsub,
    )

    def kernel(*refs):
        it = iter(refs)
        q_r, k_r, v_r = next(it), next(it), next(it)
        qseg = next(it) if use_segments else None
        kseg = next(it) if use_segments else None
        qs = next(it) if qk_int8 else None
        ks = next(it) if qk_int8 else None
        vs = next(it) if pv_int8 else None
        return base(q_r, k_r, v_r, qseg, kseg, qs, ks, vs, *it)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, orig_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # b/h/q grid dims are embarrassingly parallel -> Mosaic may split
            # them across the two TPU megacores; the kv dim is the online-
            # softmax reduction and must stay sequential.
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=b * h * sq * skv,
        ),
        interpret=interpret,
    )(*args)


def _hp_kernel(
    q_ref,       # [1, Bq, 128]  bf16 — one head (d=128) or a head PAIR (d=64)
    k_ref,       # [1, Bkv, 128] bf16
    v_ref,       # [1, Bkv, 128] bf16
    o_ref,       # [1, Bq, 128]
    m_scr,       # [Bq, 128] fp32 — cols 0 (head a) and 1 (head b)
    l_scr,       # [Bq, 256] fp32 — per-lane PARTIAL sums, a in [:128], b in [128:]
    acc_scr,     # [Bq, 128] fp32
    *,
    scale: float,
    paired: bool,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    kv_valid: int | None,
):
    """Head-packed flash attention body.

    Inputs stay in the model's natural ``[B, S, H*D]`` layout; the grid's
    head dimension indexes 128-lane blocks, so the ``[B,H,S,D]``
    transposes (and their relayout cost — measured ~57 ms/step on the
    LTX-2B config) never exist. For d=64 two heads share a lane block:
    full-rate QK^T via the mix/diff identity
    ``s_a = (q·k + q'·k) / 2,  s_b = (q·k − q'·k) / 2`` with
    ``q' = [q_a | −q_b]`` (both dots contract over all 128 lanes), and PV
    via two full dots + a lane select. Softmax denominators accumulate as
    per-lane partials (1 add/element) with the cross-lane reduce deferred
    to the finalize step.
    """
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[:, 0:2] = jnp.full((m_scr.shape[0], 2), M_FLOOR, m_scr.dtype)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    lane = jax.lax.broadcasted_iota(jnp.int32, (block_q, 128), 1)

    def _compute(mask_kv_tail: bool):
        kt = k_ref[0]
        if paired:
            # fold the mix/diff halving into the softmax scale
            c = scale * LOG2E * 0.5
            qs = (q_ref[0].astype(jnp.float32) * c).astype(q_ref.dtype)
            qd = jnp.where(lane < 64, qs, -qs)
            mix = jax.lax.dot_general(
                qs, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [Bq, Bkv]
            diff = jax.lax.dot_general(
                qd, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            halves = (mix + diff, mix - diff)
        else:
            c = scale * LOG2E
            qs = (q_ref[0].astype(jnp.float32) * c).astype(q_ref.dtype)
            halves = (
                jax.lax.dot_general(
                    qs, kt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
            )

        if mask_kv_tail:
            cols = kv_idx * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            colmask = cols < kv_valid
            halves = tuple(jnp.where(colmask, s, NEG_INF) for s in halves)

        ps = []
        alphas = []
        for hi, s in enumerate(halves):
            m_prev = m_scr[:, hi:hi + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            # per-lane partial row-sum: 1 add/element; the cross-lane
            # reduce happens once in finalize
            part = p.reshape(block_q, block_kv // 128, 128).sum(axis=1)
            l_scr[:, hi * 128:(hi + 1) * 128] = (
                l_scr[:, hi * 128:(hi + 1) * 128] * alpha + part
            )
            m_scr[:, hi:hi + 1] = m_new
            ps.append(p.astype(v_ref.dtype))
            alphas.append(alpha)

        vt = v_ref[0]
        if paired:
            o1 = jax.lax.dot_general(
                ps[0], vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                   # lanes 0:64 = p_a · v_a
            o2 = jax.lax.dot_general(
                ps[1], vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                   # lanes 64:128 = p_b · v_b
            pv = jnp.where(lane < 64, o1, o2)
            alpha_b = jnp.where(lane < 64, alphas[0], alphas[1])
        else:
            pv = jax.lax.dot_general(
                ps[0], vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            alpha_b = alphas[0]
        acc_scr[...] = acc_scr[...] * alpha_b + pv

    needs_tail = (
        kv_valid is not None and kv_valid < num_kv_blocks * block_kv
    )
    if needs_tail:
        @pl.when(kv_idx == num_kv_blocks - 1)
        def _():
            _compute(True)

        @pl.when(kv_idx != num_kv_blocks - 1)
        def _():
            _compute(False)
    else:
        _compute(False)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _finalize():
        l_a = jnp.sum(l_scr[:, :128], axis=1, keepdims=True)
        if paired:
            l_b = jnp.sum(l_scr[:, 128:], axis=1, keepdims=True)
            l = jnp.where(lane < 64, l_a, l_b)
        else:
            l = l_a
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "scale", "block_q", "block_kv", "interpret", "kv_valid",
    ),
)
def flash_attention_hp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    heads: int,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    interpret: bool = False,
    kv_valid: int | None = None,
) -> jax.Array:
    """Flash attention over head-PACKED ``[B, S, H*D]`` tensors.

    The TPU-native fast path for the DiT self-attention: consumes the
    projection outputs directly — no ``[B,H,S,D]`` transposes, no
    lane-padded d=64 layout. Supports d=64 (two heads per 128-lane block,
    mix/diff full-rate QK) and d=128 (one head per block). Sequence
    lengths must be 128-multiples; mask tail padding with ``kv_valid``.
    """
    b, s, hd_total = q.shape
    d = hd_total // heads
    if d not in (64, 128):
        raise ValueError(f"flash_attention_hp supports d in (64, 128), "
                         f"got {d}")
    if s % 128 or k.shape[1] % 128:
        raise ValueError("seq lens must be multiples of 128")
    skv = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    paired = d == 64
    nblk = heads // 2 if paired else heads
    if paired and heads % 2:
        raise ValueError("paired hp kernel needs an even head count")

    def fit(cap, sz):
        cap = min(cap, sz)
        best = 128
        bb = 128
        while bb <= cap:
            if sz % bb == 0:
                best = bb
            bb += 128
        return best

    block_q = fit(block_q, s)
    # scores live twice per block pair at d=64 (mix+diff) — halve the
    # per-half budget so peak VMEM matches the classic kernel
    budget = SCORES_TILE_ELEMS // (2 if paired else 1)
    block_kv = fit(min(block_kv, max(128, budget // block_q)), skv)
    num_kv_blocks = skv // block_kv
    grid = (b, nblk, s // block_q, num_kv_blocks)

    kern = functools.partial(
        _hp_kernel,
        scale=float(scale),
        paired=paired,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        kv_valid=kv_valid,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, 128), lambda b_, h_, i, j: (b_, i, h_),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, 128), lambda b_, h_, i, j: (b_, j, h_),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_kv, 128), lambda b_, h_, i, j: (b_, j, h_),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 128), lambda b_, h_, i, j: (b_, i, h_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 256), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary"
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s * skv * d * (2 if paired else 1),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * heads * s * skv,
        ),
        interpret=interpret,
    )(q, k, v)


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_segment_ids: jax.Array | None = None,
    kv_segment_ids: jax.Array | None = None,
    *,
    scale: float | None = None,
    causal: bool = False,
) -> jax.Array:
    """Unfused XLA attention — numerics oracle for the Pallas kernel and the
    fallback path on non-TPU backends."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if kv_segment_ids is not None and q_segment_ids is None:
        raise ValueError("kv_segment_ids given without q_segment_ids")
    if q_segment_ids is not None:
        mask = (
            q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        ) & (kv_segment_ids[:, None, None, :] > 0)
        s = jnp.where(mask, s, NEG_INF)
    if causal:
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(skv)[None, :]
        s = jnp.where(rows >= cols, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - jnp.maximum(m, NEG_INF / 2))
    p = jnp.where(m > NEG_INF / 2, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    o = o / jnp.where(l > 0, l, 1.0)
    return o.astype(q.dtype)
