"""END-TO-END Wan pipeline oracles: the REFERENCE ``WanT2V.generate`` /
``WanI2V.generate`` loops (imported from ``/root/reference/wan`` and
executed — VERDICT r4 item 1) vs our ``WanPipeline.generate_t2v`` /
``generate_i2v`` — same tiny random WanModel (state-dict converted via
``core/checkpoint.convert_wan_model``), same injected noise, same text
context, CFG-Zero-star on.

The reference classes are instantiated via ``__new__`` (their __init__
loads checkpoints from disk); every attribute ``generate`` reads is set
explicitly. The reference VAE is replaced by an identity-decode stand-in
so the comparison is at the final-latent level (the Wan VAE has its own
golden tests); the text encoder is a deterministic fake shared by both
sides. Matches ``/root/reference/wan/text2video.py:281-596`` and
``image2video.py:124-426``.
"""

import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.ref_ltx_package import import_reference_wan

# head_dim must be the production 128: the reference's
# get_rotary_pos_embed hardcodes head_dim=128 / rope [44,42,42]
# (posemb_layers.py:457-458)
DIM, FFN, HEADS, LAYERS = 128, 256, 1, 2
TEXT_DIM, TEXT_LEN, ZDIM, FREQ = 16, 8, 4, 32
H = W = 32
FRAMES = 9
STEPS = 6
SHIFT = 5.0
GUIDE = 5.0
CFG_ZERO_STEP = 1


def _psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    peak = max(np.abs(a).max(), np.abs(b).max(), 1e-9) * 2
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(peak * peak / mse) if mse > 0 else np.inf


def _patch_rms(wm):
    """The reference WanRMSNorm mutates fp32 inputs in place via the
    ``x.float()`` alias (clean in bf16 production; corrupting in the
    fp32 oracle) — run the non-aliasing equivalent, preserving the
    callers' reliance on in-place mutation."""

    def _rms_forward(self, x):
        y = torch.rsqrt(
            x.detach().clone().float().pow(2).mean(dim=-1, keepdim=True)
            + self.eps
        )
        x.copy_((x.float() * y * self.weight.float()).to(x.dtype))
        return x

    wm.WanRMSNorm.forward = _rms_forward


def _fake_t5(prompts, device=None):
    out = []
    for p in prompts:
        import zlib

        g = torch.Generator().manual_seed(zlib.crc32(p.encode()) & 0xFFFF)
        n = 5 + (len(p) % 3)  # varlen < text_len
        out.append(torch.randn(n, TEXT_DIM, generator=g) * 0.3)
    return out


def _context_jax(prompt, n_prompt):
    """Zero-padded [2, text_len, text_dim] (pos, neg) + all-ones mask —
    the reference pads context with zeros to text_len and attends to
    every position (``model.py:997``), so the mask must not hide pads."""
    pos, neg = _fake_t5([prompt])[0], _fake_t5([n_prompt])[0]

    def pad(u):
        z = torch.zeros(TEXT_LEN, TEXT_DIM)
        z[: u.shape[0]] = u
        return z

    ctx = torch.stack([pad(pos), pad(neg)]).numpy()
    return jnp.asarray(ctx), jnp.ones((2, TEXT_LEN), jnp.int32)


def _build_models():
    t2v_mod = import_reference_wan("text2video")
    import wan.modules.model as wm

    _patch_rms(wm)
    torch.manual_seed(0)
    model = wm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=ZDIM, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=ZDIM, num_heads=HEADS,
        num_layers=LAYERS,
    ).eval().float()
    model.enable_teacache = False

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.wan.model import WanConfig

    jcfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=ZDIM, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=ZDIM, num_heads=HEADS,
        num_layers=LAYERS,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    jparams = ckpt.convert_wan_model(sd, jcfg, dtype=jnp.float32)
    return t2v_mod, model, jcfg, jparams


def _ref_t2v_pipe(t2v_mod, model):
    pipe = t2v_mod.WanT2V.__new__(t2v_mod.WanT2V)
    pipe.device = torch.device("cpu")
    pipe.config = types.SimpleNamespace(num_train_timesteps=1000)
    pipe.rank = 0
    pipe.dtype = torch.float32
    pipe.num_train_timesteps = 1000
    pipe.param_dtype = torch.float32
    pipe.text_encoder = _fake_t5
    pipe.vae_stride = (4, 8, 8)
    pipe.patch_size = (1, 2, 2)
    # identity decode: the oracle compares final latents
    pipe.vae = types.SimpleNamespace(
        model=types.SimpleNamespace(z_dim=ZDIM),
        decode=lambda x0, tile_size=0: x0,
    )
    pipe.model = model
    pipe.sample_neg_prompt = "static, blurry"
    pipe._interrupt = False
    return pipe


def _jax_pipe(jcfg, jparams):
    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline

    return WanPipeline(
        model_params=jparams, model_cfg=jcfg, vae_params={}, vae_cfg=None,
        vae_tile_size=0,
    )


@pytest.fixture(scope="module")
def wan_parts():
    return _build_models()


def test_wan_t2v_generate_matches_reference(wan_parts):
    """The reference WanT2V.generate loop (UniPC, CFG-Zero-star with
    alpha projection + zeroed early steps, rotary embeds, seq assembly)
    against generate_t2v, final latents."""
    t2v_mod, model, jcfg, jparams = wan_parts
    prompt, nprompt = "a red fox", "static, blurry"
    seed = 42

    ref_pipe = _ref_t2v_pipe(t2v_mod, model)
    with torch.no_grad():
        ref = ref_pipe.generate(
            prompt, width=W, height=H, frame_num=FRAMES, shift=SHIFT,
            sample_solver="unipc", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
            model_filename="t2v", offload_model=False,
        )
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)  # [c,f,h,w]->[f,h,w,c]

    # identical noise: the reference's only draw on its seeded generator
    g = torch.Generator(device="cpu").manual_seed(seed)
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8
    noise_t = torch.randn(ZDIM, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(
        np.moveaxis(noise_t.numpy(), 0, -1)[None]
    )  # [1, f, h, w, c]

    ctx, mask = _context_jax(prompt, nprompt)
    pipe = _jax_pipe(jcfg, jparams)
    ours = np.asarray(pipe.generate_t2v(
        ctx, mask, width=W, height=H, frame_num=FRAMES,
        sampling_steps=STEPS, shift=SHIFT, solver="unipc",
        guide_scale=GUIDE, noise=noise_j, output_type="latent",
        cfg_zero_step=CFG_ZERO_STEP, attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan t2v final-latent PSNR {db:.1f} dB"


def test_wan_i2v_generate_matches_reference(wan_parts):
    """The reference WanI2V.generate loop — CLIP context injection,
    4x-repeat frame mask + VAE conditioning channels, UniPC — against
    generate_i2v, final latents (``image2video.py:124-426``)."""
    t2v_mod, _, _, _ = wan_parts
    i2v_mod = import_reference_wan("image2video")
    import wan.modules.model as wm

    torch.manual_seed(7)
    # the reference i2v loop hardcodes the production 16-channel latent
    # (``image2video.py:234``: torch.randn(16, ...)) and a 1280-dim CLIP
    # projection (``model.py:769``) — the tiny model must match both
    Z16 = 16
    CLIP_DIM = 1280
    model = wm.WanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16 + 4 + Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS,
    ).eval().float()
    model.enable_teacache = False

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.wan.model import WanConfig

    jcfg = WanConfig(
        model_type="i2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16 + 4 + Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    jparams = ckpt.convert_wan_model(sd, jcfg, dtype=jnp.float32)

    prompt, nprompt = "a ship at sea", "static, blurry"
    seed = 13
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8

    # shared deterministic conditioning: the reference encodes the first
    # frame through its VAE; both VAEs are golden-tested elsewhere, so
    # the oracle injects the SAME conditioning latents on both sides.
    # The mask assembly replicates image2video.py:237-245 exactly.
    gy = torch.Generator().manual_seed(99)
    lat_cond = torch.randn(Z16, f_lat, h_lat, w_lat, generator=gy) * 0.5
    msk = torch.ones(1, FRAMES, h_lat, w_lat)
    msk[:, 1:] = 0
    msk = torch.concat(
        [torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1),
         msk[:, 1:]], dim=1)
    msk = msk.view(1, msk.shape[1] // 4, 4, h_lat, w_lat)
    msk = msk.transpose(1, 2)[0]          # [4, f_lat, h, w]
    y_t = torch.cat([msk, lat_cond])      # [4+16, f, h, w]
    clip_feat = torch.randn(257, CLIP_DIM, generator=gy) * 0.2

    ref_pipe = i2v_mod.WanI2V.__new__(i2v_mod.WanI2V)
    ref_pipe.device = torch.device("cpu")
    ref_pipe.config = types.SimpleNamespace(num_train_timesteps=1000)
    ref_pipe.rank = 0
    ref_pipe.dtype = torch.float32
    ref_pipe.num_train_timesteps = 1000
    ref_pipe.param_dtype = torch.float32
    ref_pipe.text_encoder = _fake_t5
    ref_pipe.vae_stride = (4, 8, 8)
    ref_pipe.patch_size = (1, 2, 2)
    ref_pipe.VAE_dtype = torch.float32
    ref_pipe.vae = types.SimpleNamespace(
        model=types.SimpleNamespace(z_dim=Z16),
        decode=lambda x0, tile_size=0, **kw: x0,
        encode=lambda frames, tile_size=0, **kw: [lat_cond.clone()],
    )
    ref_pipe.clip = types.SimpleNamespace(
        visual=lambda imgs: clip_feat.clone()[None],   # [1, 257, 1280]
        model=types.SimpleNamespace(image_size=H,
                                    to=lambda *a, **k: None),
    )
    ref_pipe.model = model
    ref_pipe.sample_neg_prompt = nprompt
    ref_pipe._interrupt = False

    from PIL import Image

    img = Image.fromarray(
        (np.linspace(0, 255, H * W * 3).reshape(H, W, 3) % 256
         ).astype(np.uint8))
    with torch.no_grad():
        ref = ref_pipe.generate(
            prompt, img, width=W, height=H, frame_num=FRAMES,
            shift=SHIFT, sample_solver="unipc", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
            model_filename="i2v_tiny",
        )
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)

    g = torch.Generator(device="cpu").manual_seed(seed)
    noise_t = torch.randn(Z16, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])
    y_j = jnp.asarray(np.moveaxis(y_t.numpy(), 0, -1)[None])
    clip_j = jnp.asarray(clip_feat.numpy()[None])

    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline

    pipe = WanPipeline(
        model_params=jparams, model_cfg=jcfg, vae_params={}, vae_cfg=None,
        vae_tile_size=0,
    )
    ctx, mask = _context_jax(prompt, nprompt)
    ours = np.asarray(pipe.denoise(
        noise_j, ctx, mask, pipe._solve_schedule("unipc", STEPS, SHIFT),
        guide_scale=GUIDE, solver="unipc", cfg_zero_step=CFG_ZERO_STEP,
        clip_features=clip_j, y=y_j, attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan i2v final-latent PSNR {db:.1f} dB"


def test_wan_df_generate_matches_reference(wan_parts):
    """The reference DTT2V.generate (diffusion-forcing: staggered
    per-frame timestep matrix, per-frame UniPC schedulers, update-mask
    stepping — ``diffusion_forcing.py:192-424``) against our
    WanDFPipeline.generate, final latents."""
    _ = wan_parts  # ensures fakes installed
    df_mod = import_reference_wan("diffusion_forcing")
    import wan.modules.model as wm

    torch.manual_seed(21)
    Z16 = 16  # the reference hardcodes the 16-ch latent (":294")
    model = wm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS,
    ).eval().float()
    model.enable_teacache = False

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.wan.model import WanConfig

    jcfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    jparams = ckpt.convert_wan_model(sd, jcfg, dtype=jnp.float32)

    prompt, nprompt = "waves rolling in", "static, blurry"
    seed = 3
    FR, AR_STEP, CBS = 17, 1, 1
    f_lat, h_lat, w_lat = (FR - 1) // 4 + 1, H // 8, W // 8

    captured = []

    pipe = df_mod.DTT2V.__new__(df_mod.DTT2V)
    pipe.device = torch.device("cpu")
    pipe.config = types.SimpleNamespace(num_train_timesteps=1000)
    pipe.rank = 0
    pipe.dtype = torch.float32
    pipe.num_train_timesteps = 1000
    pipe.param_dtype = torch.float32
    pipe.text_encoder = _fake_t5
    pipe.vae_stride = (4, 8, 8)
    pipe.patch_size = (1, 2, 2)
    # identity decode, capturing PRE-clamp latents (generate clamps the
    # decode output to [-1, 1], which would corrupt a latent comparison)
    pipe.vae = types.SimpleNamespace(
        model=types.SimpleNamespace(z_dim=Z16),
        decode=lambda x0, tile_size=0, **kw: (captured.append(
            x0.clone()), x0)[1],
    )
    pipe.model = model
    pipe.scheduler = df_mod.FlowUniPCMultistepScheduler()
    pipe._interrupt = False

    with torch.no_grad():
        pipe.generate(
            prompt, n_prompt=nprompt, height=H, width=W, frame_num=FR,
            sampling_steps=STEPS, shift=SHIFT, guide_scale=GUIDE,
            seed=seed, ar_step=AR_STEP, causal_block_size=CBS,
            causal_attention=True, fps=24,
        )
    ref = captured[0][0].detach().numpy()          # [16, f, h, w]
    ref = np.moveaxis(ref, 0, -1)                  # [f, h, w, 16]

    g = torch.Generator(device="cpu").manual_seed(seed)
    noise_t = torch.randn((Z16, f_lat, h_lat, w_lat), generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])

    from ltx_video_gpupoor_tpu.pipelines.wan_df import WanDFPipeline

    ctx, mask = _context_jax(prompt, nprompt)
    jpipe = WanDFPipeline(
        model_params=jparams, model_cfg=jcfg, vae_params={},
        vae_cfg=types.SimpleNamespace(z_dim=Z16), vae_tile_size=None,
    )
    ours = np.asarray(jpipe.generate(
        ctx, mask, height=H, width=W, frame_num=FR,
        sampling_steps=STEPS, shift=SHIFT, guide_scale=GUIDE,
        ar_step=AR_STEP, causal_block_size=CBS, fps=24,
        noise=noise_j, output_type="latent", attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan DF final-latent PSNR {db:.1f} dB"


def test_wan_t2v_slg_matches_reference(wan_parts):
    """Skip-layer guidance: slg_layers applied to the uncond pass inside
    the window (``text2video.py:494, 536-541``) — the negative stream
    skips the listed blocks while the cond stream runs them all."""
    t2v_mod, model, jcfg, jparams = wan_parts
    prompt, nprompt = "a glass city", "static, blurry"
    seed = 77

    ref_pipe = _ref_t2v_pipe(t2v_mod, model)
    with torch.no_grad():
        ref = ref_pipe.generate(
            prompt, width=W, height=H, frame_num=FRAMES, shift=SHIFT,
            sample_solver="unipc", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=False, slg_layers=[1],
            slg_start=0.0, slg_end=1.0,
            model_filename="t2v", offload_model=False,
        )
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)

    g = torch.Generator(device="cpu").manual_seed(seed)
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8
    noise_t = torch.randn(ZDIM, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])

    ctx, mask = _context_jax(prompt, nprompt)
    pipe = _jax_pipe(jcfg, jparams)
    ours = np.asarray(pipe.generate_t2v(
        ctx, mask, width=W, height=H, frame_num=FRAMES,
        sampling_steps=STEPS, shift=SHIFT, solver="unipc",
        guide_scale=GUIDE, noise=noise_j, output_type="latent",
        cfg_star_switch=False, slg_layers=[1], slg_start=0.0,
        slg_end=1.0, attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan t2v SLG final-latent PSNR {db:.1f} dB"


def test_wan_t2v_dpm_solver_matches_reference(wan_parts):
    """dpm++ solver path: the reference's FlowDPMSolverMultistepScheduler
    with get_sampling_sigmas/retrieve_timesteps (``text2video.py:425-434``)
    vs our dpm schedule + carried-state stepper."""
    t2v_mod, model, jcfg, jparams = wan_parts
    prompt, nprompt = "lanterns on a river", "static, blurry"
    seed = 55

    ref_pipe = _ref_t2v_pipe(t2v_mod, model)
    with torch.no_grad():
        ref = ref_pipe.generate(
            prompt, width=W, height=H, frame_num=FRAMES, shift=SHIFT,
            sample_solver="dpm++", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
            model_filename="t2v", offload_model=False,
        )
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)

    g = torch.Generator(device="cpu").manual_seed(seed)
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8
    noise_t = torch.randn(ZDIM, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])

    ctx, mask = _context_jax(prompt, nprompt)
    pipe = _jax_pipe(jcfg, jparams)
    ours = np.asarray(pipe.generate_t2v(
        ctx, mask, width=W, height=H, frame_num=FRAMES,
        sampling_steps=STEPS, shift=SHIFT, solver="dpm++",
        guide_scale=GUIDE, noise=noise_j, output_type="latent",
        cfg_zero_step=CFG_ZERO_STEP, attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan t2v dpm++ final-latent PSNR {db:.1f} dB"


def test_wan_t2v_vace_matches_reference(wan_parts):
    """VACE: the reference generate's vace branch — frame/mask encode,
    64-channel mask reshape, vace_latent concat, context-scale-weighted
    hint injection at the vace layers (``text2video.py:60-120, 381-397``,
    ``model.py:789-798``) — against our denoise with the same converted
    vace weights and the identical injected vace context."""
    t2v_mod, _, _, _ = wan_parts
    import torch.nn.functional as Fn

    import wan.modules.model as wm

    Z16 = 16
    torch.manual_seed(31)
    model = wm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS, vace_layers=[0], vace_in_dim=96,
    ).eval().float()
    model.enable_teacache = False
    # capture the state dict BEFORE adapt_vace_model renames the vace
    # modules into the blocks
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.wan.model import WanConfig

    jcfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS, vace_layers=(0,), vace_in_dim=96,
    )
    jparams = ckpt.convert_wan_model(sd, jcfg, dtype=jnp.float32)

    prompt, nprompt = "repaint the sky", "static, blurry"
    seed = 91
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8

    def fake_encode(frames, tile_size=0, **kw):
        # deterministic content-dependent stand-in for the Wan VAE
        # (both frameworks' VAEs are golden-tested separately)
        out = []
        for f in frames:  # [3, F, H, W]
            z = Fn.interpolate(
                f[None], size=(f_lat, h_lat, w_lat), mode="trilinear",
                align_corners=False,
            )[0]
            z = torch.cat([z * (0.2 + 0.1 * i) for i in range(6)])[:Z16]
            out.append(z)
        return out

    pipe = _ref_t2v_pipe(t2v_mod, model)
    pipe.vae.encode = fake_encode
    model.adapt_vace_model = None  # attr exists on the class; not used
    pipe.adapt_vace_model = t2v_mod.WanT2V.adapt_vace_model.__get__(pipe)
    pipe.adapt_vace_model()

    gi = torch.Generator().manual_seed(5)
    in_frames = [torch.rand(3, FRAMES, H, W, generator=gi) * 2 - 1]
    in_masks = [
        (torch.rand(1, FRAMES, H, W, generator=gi) > 0.5).float()
    ]
    in_refs = [None]

    # the identical context our side consumes, via the reference's own
    # vace encode chain
    z0 = pipe.vace_encode_frames(in_frames, in_refs, masks=in_masks)
    m0 = pipe.vace_encode_masks(in_masks, in_refs)
    z = pipe.vace_latent(z0, m0)[0]  # [96, F', H', W']

    with torch.no_grad():
        ref = pipe.generate(
            prompt, input_frames=in_frames, input_masks=in_masks,
            input_ref_images=in_refs, context_scale=0.8,
            width=W, height=H, frame_num=FRAMES, shift=SHIFT,
            sample_solver="unipc", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
            model_filename="Vace_tiny", offload_model=False,
        )
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)

    g = torch.Generator(device="cpu").manual_seed(seed)
    noise_t = torch.randn(Z16, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])
    vace_j = jnp.asarray(np.moveaxis(z.numpy(), 0, -1)[None])

    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline

    ctx, mask = _context_jax(prompt, nprompt)
    jpipe = WanPipeline(
        model_params=jparams, model_cfg=jcfg, vae_params={}, vae_cfg=None,
        vae_tile_size=0,
    )
    ours = np.asarray(jpipe.denoise(
        noise_j, ctx, mask, jpipe._solve_schedule("unipc", STEPS, SHIFT),
        guide_scale=GUIDE, cfg_zero_step=CFG_ZERO_STEP,
        vace_context=vace_j, vace_scale=0.8, attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan VACE final-latent PSNR {db:.1f} dB"


def test_wan_t2v_phantom_matches_reference(wan_parts):
    """Phantom: reference ref-image latents appended to the sequence with
    the 3-call guidance combine (neg + 5.0*(pos_i - neg) +
    guide*(pos_it - pos_i), ``text2video.py:503-551``) against our
    denoise's ref_latents path, final latents (ref rows stripped)."""
    t2v_mod, model, jcfg, jparams = wan_parts
    import torch.nn.functional as Fn

    prompt, nprompt = "a subject in a new scene", "static, blurry"
    seed = 67
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8

    def fake_encode(frames, tile_size=0, **kw):
        out = []
        for f in frames:  # [3, F, H, W]
            z = Fn.interpolate(
                f[None], size=(f.shape[1], h_lat, w_lat),
                mode="trilinear", align_corners=False,
            )[0]
            z = torch.cat([z * (0.2 + 0.1 * i) for i in range(6)])[:ZDIM]
            out.append(z)
        return out

    pipe = _ref_t2v_pipe(t2v_mod, model)
    pipe.vae.encode = fake_encode

    from PIL import Image

    ref_img = Image.fromarray(
        (np.linspace(0, 255, H * W * 3).reshape(H, W, 3) % 256
         ).astype(np.uint8))

    with torch.no_grad():
        ref = pipe.generate(
            prompt, input_ref_images=[ref_img],
            width=W, height=H, frame_num=FRAMES, shift=SHIFT,
            sample_solver="unipc", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
            model_filename="t2v", offload_model=False,
        )
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)  # [f, h, w, c]

    # identical ref latents via the reference's own get_vae_latents
    ref_lat = pipe.get_vae_latents([ref_img], pipe.device)  # [z, 1, h, w]
    R = ref_lat.shape[1]
    # the reference draws ONE noise tensor over f_lat+R rows; our API
    # keeps ref rows separate, so slice the shared draw
    g = torch.Generator(device="cpu").manual_seed(seed)
    noise_full = torch.randn(ZDIM, f_lat + R, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(
        np.moveaxis(noise_full[:, :f_lat].numpy(), 0, -1)[None])
    ref_j = jnp.asarray(np.moveaxis(ref_lat.numpy(), 0, -1)[None])

    ctx, mask = _context_jax(prompt, nprompt)
    jpipe = _jax_pipe(jcfg, jparams)
    ours = np.asarray(jpipe.denoise(
        noise_j, ctx, mask, jpipe._solve_schedule("unipc", STEPS, SHIFT),
        guide_scale=GUIDE, cfg_zero_step=CFG_ZERO_STEP,
        ref_latents=ref_j, ref_latents_neg=jnp.zeros_like(ref_j),
        attn_mode="xla",
    ))[0]

    # reference output keeps only the non-ref rows (":-R" strip)
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan Phantom final-latent PSNR {db:.1f} dB"


def test_wan_t2v_recammaster_matches_reference(wan_parts, monkeypatch):
    """ReCamMaster: the reference target_camera branch — source-video
    latents concatenated on the frame axis, camera pose embedding added
    through cam_encoder with the identity projector
    (``text2video.py:368-378, 489-494``, ``model.py:800-808``) — against
    our denoise's source_latents/cam_emb path. 81 frames: the reference
    camera loader is hardcoded to the 81-frame trajectory."""
    t2v_mod, _, _, _ = wan_parts
    import torch.nn.functional as Fn

    import wan.modules.model as wm

    Z16 = 16
    FR = 81
    torch.manual_seed(47)
    model = wm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS, recammaster=True,
    ).eval().float()
    model.enable_teacache = False
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.wan.model import WanConfig

    jcfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS, recammaster=True,
    )
    jparams = ckpt.convert_wan_model(sd, jcfg, dtype=jnp.float32)

    prompt, nprompt = "orbit the subject", "static, blurry"
    seed = 29
    f_lat, h_lat, w_lat = (FR - 1) // 4 + 1, H // 8, W // 8

    def fake_encode(frames, tile_size=0, **kw):
        out = []
        for f in frames:  # [3, F, H, W]
            z = Fn.interpolate(
                f[None], size=(f_lat, h_lat, w_lat), mode="trilinear",
                align_corners=False,
            )[0]
            z = torch.cat([z * (0.2 + 0.1 * i) for i in range(6)])[:Z16]
            out.append(z)
        return out

    pipe = _ref_t2v_pipe(t2v_mod, model)
    pipe.vae.encode = fake_encode
    pipe.vae.model.z_dim = Z16  # this branch runs the 16-ch latent

    gi = torch.Generator().manual_seed(8)
    src_video = (torch.rand(FR, H, W, 3, generator=gi) * 255)

    # the camera loader reads "wan/camera_extrinsics.json" relative to CWD
    monkeypatch.chdir("/root/reference")
    with torch.no_grad():
        ref = pipe.generate(
            prompt, input_video=src_video.clone(), target_camera="3",
            width=W, height=H, frame_num=FR, shift=SHIFT,
            sample_solver="unipc", sampling_steps=STEPS,
            guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
            cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
            model_filename="t2v", offload_model=False,
        )
    monkeypatch.chdir("/root/repo")
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)

    # our side: identical source latents (the same deterministic fake
    # encode applied to the same normalized video) + our packaged camera
    # preset (golden-equal to the reference trajectory)
    src_norm = src_video.permute(3, 0, 1, 2).float().div(127.5).sub(1.0)
    src_lat = fake_encode([src_norm])[0]
    src_j = jnp.asarray(np.moveaxis(src_lat.numpy(), 0, -1)[None])

    from ltx_video_gpupoor_tpu.utils.camera import get_camera_embedding

    cam_j = jnp.asarray(
        np.asarray(get_camera_embedding(3), np.float32)[None])

    g = torch.Generator(device="cpu").manual_seed(seed)
    noise_t = torch.randn(Z16, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])

    from ltx_video_gpupoor_tpu.pipelines.wan import WanPipeline

    ctx, mask = _context_jax(prompt, nprompt)
    jpipe = WanPipeline(
        model_params=jparams, model_cfg=jcfg, vae_params={}, vae_cfg=None,
        vae_tile_size=0,
    )
    ours = np.asarray(jpipe.denoise(
        noise_j, ctx, mask, jpipe._solve_schedule("unipc", STEPS, SHIFT),
        guide_scale=GUIDE, cfg_zero_step=CFG_ZERO_STEP,
        source_latents=src_j, cam_emb=cam_j, attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan ReCamMaster final-latent PSNR {db:.1f} dB"


def test_wan_df_prefix_matches_reference(wan_parts):
    """Diffusion-forcing continuation from a start image: the reference
    encodes the prefix, pins its latent rows, and pre-completes them in
    the timestep matrix (``diffusion_forcing.py:268-297``); ours consumes
    the identical injected prefix latents."""
    _ = wan_parts
    df_mod = import_reference_wan("diffusion_forcing")
    import torch.nn.functional as Fn

    import wan.modules.model as wm

    torch.manual_seed(61)
    Z16 = 16
    model = wm.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS,
    ).eval().float()
    model.enable_teacache = False

    from ltx_video_gpupoor_tpu.core import checkpoint as ckpt
    from ltx_video_gpupoor_tpu.models.wan.model import WanConfig

    jcfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=TEXT_LEN,
        in_dim=Z16, dim=DIM, ffn_dim=FFN, freq_dim=FREQ,
        text_dim=TEXT_DIM, out_dim=Z16, num_heads=HEADS,
        num_layers=LAYERS,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    jparams = ckpt.convert_wan_model(sd, jcfg, dtype=jnp.float32)

    prompt, nprompt = "the scene continues", "static, blurry"
    seed = 9
    FR = 17
    f_lat, h_lat, w_lat = (FR - 1) // 4 + 1, H // 8, W // 8

    def fake_encode(frames, tile_size=0, **kw):
        if isinstance(frames, torch.Tensor):  # DF passes a batched tensor
            frames = [frames[0]]
        out = []
        for f in frames:  # [3, F, H, W]
            fl = (f.shape[1] - 1) // 4 + 1
            z = Fn.interpolate(
                f[None].float(), size=(fl, h_lat, w_lat),
                mode="trilinear", align_corners=False,
            )[0]
            z = torch.cat([z * (0.2 + 0.1 * i) for i in range(6)])[:Z16]
            out.append(z)
        return out

    captured = []
    pipe = df_mod.DTT2V.__new__(df_mod.DTT2V)
    pipe.device = torch.device("cpu")
    pipe.config = __import__("types").SimpleNamespace(
        num_train_timesteps=1000)
    pipe.rank = 0
    pipe.dtype = torch.float32
    pipe.num_train_timesteps = 1000
    pipe.param_dtype = torch.float32
    pipe.text_encoder = _fake_t5
    pipe.vae_stride = (4, 8, 8)
    pipe.patch_size = (1, 2, 2)
    pipe.vae = __import__("types").SimpleNamespace(
        model=__import__("types").SimpleNamespace(z_dim=Z16),
        encode=fake_encode,
        decode=lambda x0, tile_size=0, **kw: (captured.append(
            x0.clone()), x0)[1],
    )
    pipe.model = model
    pipe.scheduler = df_mod.FlowUniPCMultistepScheduler()
    pipe._interrupt = False

    from PIL import Image

    img = Image.fromarray(
        (np.linspace(0, 255, H * W * 3).reshape(H, W, 3) % 256
         ).astype(np.uint8))
    with torch.no_grad():
        pipe.generate(
            prompt, n_prompt=nprompt, image_start=[img],
            height=H, width=W, frame_num=FR,
            sampling_steps=STEPS, shift=SHIFT, guide_scale=GUIDE,
            seed=seed, ar_step=0, causal_block_size=1,
            causal_attention=False, fps=24,
        )
    ref = np.moveaxis(captured[0][0].detach().numpy(), 0, -1)

    # identical prefix latents: the reference's own preprocessing chain
    arr = np.array(img.resize((W, H))).transpose(2, 0, 1)
    pv = torch.tensor(arr).unsqueeze(1).float() / (255.0 / 2.0) - 1.0
    prefix_lat = fake_encode(pv.unsqueeze(0))[0]  # [z, 1, h, w]
    prefix_j = jnp.asarray(np.moveaxis(prefix_lat.numpy(), 0, -1)[None])

    g = torch.Generator(device="cpu").manual_seed(seed)
    noise_t = torch.randn((Z16, f_lat, h_lat, w_lat), generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])

    from ltx_video_gpupoor_tpu.pipelines.wan_df import WanDFPipeline

    ctx, mask = _context_jax(prompt, nprompt)
    jpipe = WanDFPipeline(
        model_params=jparams, model_cfg=jcfg, vae_params={},
        vae_cfg=__import__("types").SimpleNamespace(z_dim=Z16),
        vae_tile_size=None,
    )
    ours = np.asarray(jpipe.generate(
        ctx, mask, height=H, width=W, frame_num=FR,
        sampling_steps=STEPS, shift=SHIFT, guide_scale=GUIDE,
        ar_step=0, causal_block_size=1, fps=24,
        prefix_latents=prefix_j, noise=noise_j,
        output_type="latent", attn_mode="xla",
    ))[0]

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, f"Wan DF-prefix final-latent PSNR {db:.1f} dB"


def test_wan_t2v_teacache_matches_reference(wan_parts):
    """TeaCache: the reference's runtime skip state machine
    (``model.py:1028-1092``: e-distance accumulation against the
    auto-calibrated threshold from ``compute_teacache_threshold``,
    residual reuse on skipped steps) executed inside WanT2V.generate,
    against our precomputed-mask + residual-reuse path
    (``teacache_skip_schedule`` + masked forward). The runtime decisions
    depend only on the timesteps, so the two formulations must agree —
    this is the executed-reference certificate behind the TeaCache
    serving rows."""
    t2v_mod, model, jcfg, jparams = wan_parts
    from ltx_video_gpupoor_tpu.pipelines.wan import TEACACHE_COEFFICIENTS

    prompt, nprompt = "drifting snow", "static, blurry"
    seed = 19
    MULT = 1.75
    STEPS_TC = 12  # enough steps for real skip decisions
    # identity rescale: the production 14B polynomial maps the TINY
    # random model's e-distances outside the 0.01-0.6 threshold search
    # band (zero skips); the oracle pins the state machine, not the 14B
    # calibration constants, so both sides run the same identity poly
    COEFFS = [0.0, 0.0, 0.0, 0.05, 0.0]

    ref_pipe = _ref_t2v_pipe(t2v_mod, model)
    model.enable_teacache = True
    model.coefficients = COEFFS
    model.teacache_start_step = 0
    model.teacache_multiplier = MULT
    model.num_steps = STEPS_TC
    model.teacache_skipped_steps = 0
    try:
        with torch.no_grad():
            ref = ref_pipe.generate(
                prompt, width=W, height=H, frame_num=FRAMES, shift=SHIFT,
                sample_solver="unipc", sampling_steps=STEPS_TC,
                guide_scale=GUIDE, n_prompt=nprompt, seed=seed,
                cfg_star_switch=True, cfg_zero_step=CFG_ZERO_STEP,
                model_filename="t2v", offload_model=False,
            )
        skipped = model.teacache_skipped_steps
    finally:
        model.enable_teacache = False
    assert skipped > 0, "oracle must exercise real skips"
    ref = np.moveaxis(ref.detach().numpy(), 0, -1)

    g = torch.Generator(device="cpu").manual_seed(seed)
    f_lat, h_lat, w_lat = FRAMES // 4 + 1, H // 8, W // 8
    noise_t = torch.randn(ZDIM, f_lat, h_lat, w_lat, generator=g)
    noise_j = jnp.asarray(np.moveaxis(noise_t.numpy(), 0, -1)[None])

    ctx, mask = _context_jax(prompt, nprompt)
    pipe = _jax_pipe(jcfg, jparams)
    TEACACHE_COEFFICIENTS["oracle"] = COEFFS
    try:
        ours = np.asarray(pipe.generate_t2v(
            ctx, mask, width=W, height=H, frame_num=FRAMES,
            sampling_steps=STEPS_TC, shift=SHIFT, solver="unipc",
            guide_scale=GUIDE, noise=noise_j, output_type="latent",
            cfg_zero_step=CFG_ZERO_STEP, attn_mode="xla",
            teacache_multiplier=MULT, teacache_model="oracle",
        ))[0]
    finally:
        TEACACHE_COEFFICIENTS.pop("oracle", None)

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    db = _psnr(ref, ours)
    assert db > 40.0, (
        f"Wan TeaCache final-latent PSNR {db:.1f} dB "
        f"(reference skipped {skipped} steps)"
    )
