"""Model-level unified sequence parallelism (USP) for the Wan DiT.

Parity target: ``usp_dit_forward`` at
``/root/reference/wan/distributed/xdit_context_parallel.py:66-146`` — the
reference chunks the token sequence across SP ranks after the patch
embed, runs every block with ``xFuserLongContextAttention`` (Ulysses
all-to-all + ring), and all-gathers before the head.

TPU-native redesign: ONE ``shard_map`` over the ``sp`` mesh axis wraps the
whole forward. The latent video enters sharded on the FRAME axis (frames
map to contiguous token ranges under row-major (f, h, w) patchify, and
the t2v/i2v patch size is 1 in time, so the conv patch embed needs no
halo). The RoPE table enters sharded on its token axis, so every shard
applies frequencies for its GLOBAL positions by construction — no
pad-then-slice (the reference's ``pad_freqs``, ``:12-22``, which is
subtly wrong for the pad region). Self-attention runs the Ulysses
head<->sequence ``all_to_all`` (``parallel/ulysses.py``); cross-attention
needs no collective (sequence-sharded q against replicated text context);
everything else in the block is per-token. The head output leaves sharded
on frames — there is no final all-gather unless the caller asks for a
replicated result.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ltx import transformer3d as ltx_model
from ..models.wan import model as wan_model


def _pack_optionals(pairs, compute):
    """Assemble the present optional inputs for a ``shard_map`` boundary
    (``None`` must never cross it): returns ``(names, values, specs,
    compute_is_traced)``, appending TeaCache's ``compute`` gate when it
    is a traced array rather than a static bool."""
    names, extras, specs = [], [], []
    for name, val, spec in pairs:
        if val is not None:
            names.append(name)
            extras.append(val)
            specs.append(spec)
    traced = not isinstance(compute, bool)
    if traced:
        names.append("compute")
        extras.append(compute)
        specs.append(P())
    return names, extras, specs, traced


def usp_wan_forward(
    mesh: Mesh,
    params: dict,
    cfg: wan_model.WanConfig,
    x: jax.Array,                 # [B, F, H, W, C] latent video (global)
    t: jax.Array,                 # [B] — or [B, F] (diffusion forcing)
    context: jax.Array,           # [B, Sc, text_dim]
    context_mask: jax.Array,      # [B, Sc]
    freqs: tuple,                 # (cos, sin) [L, head_dim] global RoPE
    axis_name: str = "sp",
    attn_mode: str = "auto",
    clip_features: Optional[jax.Array] = None,
    slg_keep: Optional[jax.Array] = None,       # [L, B] (replicated)
    previous_residual: Optional[jax.Array] = None,  # [B, N, D] token-sharded
    compute: bool | jax.Array = True,
    fps_idx: Optional[int] = None,     # static fps-embedding index (DF)
    vace_context: Optional[jax.Array] = None,   # [B, F, H, W, vace_in]
    vace_scale: float = 1.0,
    cam_emb: Optional[jax.Array] = None,        # [B, F', 12] camera pose
) -> tuple[jax.Array, jax.Array]:
    """Sequence-parallel denoiser evaluation; returns
    ``(velocity [B, F, H, W, C_out], residual [B, N, D])``, both sharded
    over ``axis_name`` (frames / token rows respectively).

    Requirements: frames divisible by the sp size; heads divisible by the
    sp size (the Ulysses exchange regroups heads). TeaCache residual
    reuse works per shard (the residual is per-token).

    VACE hints are frame-aligned with the video ([B, F, H, W, vace_in],
    same temporal patch 1 -> no halo) so they shard with the frames and
    the hint stream rides the same Ulysses exchange. ReCamMaster poses
    are expanded to one row per frame (``expand_cam_to_frames``) so each
    shard encodes its GLOBAL frames' poses — a per-shard tile-and-slice
    would hand every shard the first frames' poses.
    """
    sp = mesh.shape[axis_name]
    if cfg.patch_size[0] != 1:
        # the frame-sharded design relies on a temporal patch of 1 so the
        # conv patch embed needs no cross-shard halo; a larger temporal
        # patch would silently drop boundary patches per shard
        raise ValueError(
            f"usp_wan_forward requires patch_size[0] == 1, got "
            f"{cfg.patch_size}"
        )
    if x.shape[1] % sp:
        raise ValueError(
            f"frames ({x.shape[1]}) must divide over sp={sp}"
        )
    if cfg.num_heads % sp:
        raise ValueError(
            f"heads ({cfg.num_heads}) must divide over sp={sp}"
        )

    # every supported base mode rides the Ulysses exchange — a mode that
    # bypassed it would silently confine attention to the local shard
    inner_mode = f"ulysses:{axis_name}:{attn_mode}"
    frame_spec = P(None, axis_name)       # [B, F, H, W, C] on frames
    token_spec = P(None, axis_name)       # [B, N, D] residual rows
    tok_spec = P(axis_name)               # [L, head_dim] RoPE rows
    repl = P()

    if cam_emb is not None:
        cam_emb = wan_model.expand_cam_to_frames(cam_emb, x.shape[1])
    names, extras, extra_specs, compute_is_traced = _pack_optionals(
        (
            ("clip_features", clip_features, repl),
            ("slg_keep", slg_keep, repl),
            ("previous_residual", previous_residual, token_spec),
            ("vace_context", vace_context, frame_spec),
            ("cam_emb", cam_emb, frame_spec),
        ),
        compute,
    )

    def fwd(params, x, t, context, context_mask, cos, sin, *rest):
        kw = dict(zip(names, rest))
        if not compute_is_traced:
            kw["compute"] = compute
        if "vace_context" in kw:
            kw["vace_scale"] = vace_scale
        return wan_model.forward(
            params, cfg, x, t, context, context_mask, (cos, sin),
            attn_mode=inner_mode, fps_idx=fps_idx, **kw,
        )

    # per-frame timesteps (diffusion forcing, [B, F]) shard with the
    # frames; scalar-per-stream ([B]) and broadcastable [B, 1] replicate
    t_spec = frame_spec if (t.ndim == 2 and t.shape[1] > 1) else repl
    fn = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(repl, frame_spec, t_spec, repl, repl, tok_spec, tok_spec,
                  *extra_specs),
        out_specs=(frame_spec, token_spec),
        check_vma=False,
    )
    return fn(params, x, t, context, context_mask, freqs[0], freqs[1],
              *extras)


def usp_ltx_forward(
    mesh: Mesh,
    params: dict,
    cfg: ltx_model.LTXTransformerConfig,
    latents: jax.Array,            # [B, N, C] patchified tokens (global)
    indices_grid: jax.Array,       # [B, 3, N] fractional coords (global)
    timestep: jax.Array,           # [B] or [B, G] per-group timesteps
    caption: jax.Array,
    caption_mask: Optional[jax.Array] = None,
    skip_layer_mask: Optional[jax.Array] = None,
    skip_layer_strategy: Optional[str] = None,
    axis_name: str = "sp",
    attn_mode: str = "auto",
    previous_residual: Optional[jax.Array] = None,
    compute: bool | jax.Array = True,
    freqs: Optional[tuple] = None,  # precomputed (cos, sin) [B, N, d]
) -> tuple[jax.Array, jax.Array]:
    """Sequence-parallel LTX DiT forward; returns ``(velocity, residual)``
    token-sharded over ``axis_name``.

    Fractional-coordinate RoPE follows the tokens: pass step-invariant
    precomputed tables (``compute_freqs``) token-sharded via ``freqs`` —
    callers in a denoise scan MUST, or the multi-MB tables are rebuilt
    inside every step — or let each shard compute its rows from the
    sharded ``indices_grid``. Both ways every shard sees its GLOBAL
    positions — the design the reference's pad-then-slice approximates
    (``xdit_context_parallel.py:12-22, 52-57``). Per-group timesteps
    require the group count to divide over sp (token shards then align
    with whole frame groups).
    """
    sp = mesh.shape[axis_name]
    n = latents.shape[1]
    if n % sp:
        raise ValueError(f"tokens ({n}) must divide over sp={sp}")
    if cfg.num_attention_heads % sp:
        raise ValueError(
            f"heads ({cfg.num_attention_heads}) must divide over sp={sp}"
        )
    t = timestep
    t_grouped = hasattr(t, "ndim") and t.ndim == 2 and t.shape[1] > 1
    if t_grouped and t.shape[1] % sp:
        raise ValueError(
            f"timestep groups ({t.shape[1]}) must divide over sp={sp}"
        )

    token_spec = P(None, axis_name)
    coord_spec = P(None, None, axis_name)
    repl = P()
    t_spec = token_spec if t_grouped else repl

    # every supported base mode rides the Ulysses exchange — a mode that
    # bypassed it would silently confine attention to the local shard
    inner_mode = f"ulysses:{axis_name}:{attn_mode}"

    pairs = [
        ("caption_mask", caption_mask, repl),
        ("skip_layer_mask", skip_layer_mask, repl),
        ("previous_residual", previous_residual, token_spec),
    ]
    if freqs is not None:
        # tables ride their tokens: [B, N, d] sharded on the token axis
        pairs += [
            ("freqs_cos", freqs[0], token_spec),
            ("freqs_sin", freqs[1], token_spec),
        ]
    names, extras, extra_specs, compute_is_traced = _pack_optionals(
        pairs, compute
    )

    def fwd(params, latents, coords, t, caption, *rest):
        kw = dict(zip(names, rest))
        if not compute_is_traced:
            kw["compute"] = compute
        cos = kw.pop("freqs_cos", None)
        sin = kw.pop("freqs_sin", None)
        if cos is not None:
            kw["freqs"] = (cos, sin)
        return ltx_model.forward(
            params, cfg, latents, coords, t, caption,
            skip_layer_strategy=skip_layer_strategy,
            attn_mode=inner_mode, return_residual=True, **kw,
        )

    fn = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(repl, token_spec, coord_spec, t_spec, repl, *extra_specs),
        out_specs=(token_spec, token_spec),
        check_vma=False,
    )
    return fn(params, latents, indices_grid, t, caption, *extras)
