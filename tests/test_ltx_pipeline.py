import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.models.ltx import latent_upsampler as lup
from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    init_params as tf_init,
)
from ltx_video_gpupoor_tpu.pipelines.ltx_pipeline import (
    ConditioningItem,
    LTXPipeline,
    build_guidance_schedule,
    latent_to_pixel_coords,
)
from ltx_video_gpupoor_tpu.pipelines.multiscale import (
    MultiScalePipeline,
    adain_filter_latent,
)

TF_CFG = LTXTransformerConfig(
    num_attention_heads=2, attention_head_dim=16, in_channels=8,
    out_channels=8, num_layers=2, cross_attention_dim=32, caption_channels=24,
)

VAE_CFG = ltx_vae.VAEConfig.from_dict({
    "_class_name": "CausalVideoAutoencoder",
    "dims": 3,
    "latent_channels": 8,
    "blocks": [["res_x", 1], ["compress_all", 1], ["res_x", 1]],
    "base_channels": 8,
    "norm_num_groups": 4,
    "patch_size": 2,
    "norm_layer": "pixel_norm",
    "latent_log_var": "uniform",
    "use_quant_conv": False,
    "causal_decoder": False,
})


@pytest.fixture(scope="module")
def pipe():
    return LTXPipeline(
        transformer_params=tf_init(jax.random.key(0), TF_CFG),
        transformer_cfg=TF_CFG,
        vae_params=ltx_vae.init_params(jax.random.key(1), VAE_CFG),
        vae_cfg=VAE_CFG,
    )


def _prompts(sc=8):
    emb = jax.random.normal(jax.random.key(2), (2, sc, TF_CFG.caption_channels))
    mask = jnp.ones((2, sc), jnp.int32)
    return emb, mask


def test_t2v_latent_generation(pipe):
    emb, mask = _prompts()
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=4, guidance_scale=3.0,
        key=jax.random.key(0), output_type="latent",
    )
    f, h, w = pipe.latent_shape(32, 32, 9)
    assert out.shape == (1, f, h, w, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_t2v_with_stg(pipe):
    emb, mask = _prompts()
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=3, guidance_scale=3.0, stg_scale=1.0,
        rescaling_scale=0.7, skip_block_list=[1],
        key=jax.random.key(0), output_type="latent",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_stg_with_zero_guidance(pipe):
    """guidance_scale=0 + STG: 2 streams (cond + perturbed), no uncond.
    Previously GuidanceSchedule.do_cfg counted g=0 as CFG and assembled
    3 context rows against 2 latent streams — batch mismatch."""
    emb, mask = _prompts()
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=3, guidance_scale=0.0, stg_scale=1.0,
        skip_block_list=[1],
        key=jax.random.key(0), output_type="latent",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_t2v_pixels(pipe):
    emb, mask = _prompts()
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=2, guidance_scale=1.0,
        key=jax.random.key(0), output_type="pixels",
    )
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert out.shape[3] == 32


def test_i2v_conditioning_pins_first_frame(pipe):
    emb, mask = _prompts()
    image = jax.random.uniform(jax.random.key(5), (1, 32, 32, 3)) * 2 - 1
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=3, guidance_scale=2.0,
        conditioning_items=[ConditioningItem(image, 0, 1.0)],
        key=jax.random.key(0), output_type="latent",
    )
    # first latent frame should equal the clean conditioning latents
    enc = ltx_vae.encode(pipe.vae_params, pipe.vae_cfg, image[None])
    z = ltx_vae.sample_posterior(enc)
    z = ltx_vae.normalize_latents(z, pipe.vae_params["per_channel_statistics"])
    np.testing.assert_allclose(
        np.asarray(out[:, :1]), np.asarray(z), atol=1e-3
    )


def test_deterministic_given_key(pipe):
    emb, mask = _prompts()
    kw = dict(height=32, width=32, num_frames=9, num_inference_steps=2,
              guidance_scale=1.0, output_type="latent")
    o1 = pipe.generate(emb, mask, key=jax.random.key(7), **kw)
    o2 = pipe.generate(emb, mask, key=jax.random.key(7), **kw)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = pipe.generate(emb, mask, key=jax.random.key(8), **kw)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_explicit_timesteps_distilled_mode(pipe):
    emb, mask = _prompts()
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        timesteps=[1.0, 0.9, 0.7, 0.5], guidance_scale=1.0,
        key=jax.random.key(0), output_type="latent",
    )
    assert np.isfinite(np.asarray(out)).all()


def test_guidance_schedule_builder():
    ts = np.array([1.0, 0.8, 0.6, 0.4])
    s = build_guidance_schedule(
        ts, num_layers=4,
        guidance_scale=[1, 4, 4, 2], stg_scale=[0, 1, 1, 1],
        rescaling_scale=[1, 0.5, 0.5, 1],
        skip_block_list=[[1], [2], [2], [3]],
        guidance_timesteps=[1.0, 0.8, 0.6, 0.4],
    )
    assert s.num_conds == 3
    assert s.skip_layer_mask.shape == (4, 4, 3)
    # step 0 (t=1.0 matches idx 0): block 1 skipped for perturbed stream
    assert s.skip_layer_mask[0, 1, 2] == 0.0
    assert s.skip_layer_mask[0, 1, 1] == 1.0
    # guidance <= 1 zeroes ("x if x > 1.0 else 0.0",
    # pipeline_ltx_video.py:982)
    np.testing.assert_allclose(s.guidance_scale, [0, 4, 4, 2])


def test_guidance_bucket_mapping_between_timesteps():
    """A sampled t strictly between two guidance timesteps picks the
    FIRST bucket with guidance_t <= t (pipeline_ltx_video.py:959-967) —
    the previous last-match loop was off by one on every such step."""
    gts = [1.0, 0.9933, 0.985, 0.9767, 0.9008, 0.618]
    vals = [1, 1, 6, 8, 6, 1]
    s = build_guidance_schedule(
        np.array([0.95]), num_layers=2,
        guidance_scale=vals, guidance_timesteps=gts,
    )
    np.testing.assert_allclose(s.guidance_scale, [6.0])
    # below every entry -> last bucket
    s2 = build_guidance_schedule(
        np.array([0.5]), num_layers=2,
        guidance_scale=vals, guidance_timesteps=gts,
    )
    np.testing.assert_allclose(s2.guidance_scale, [0.0])  # 1 -> zeroed


def test_latent_to_pixel_coords_causal_fix():
    coords = jnp.asarray(np.array([[[0, 1, 2], [0, 0, 0], [0, 0, 0]]]))
    pix = latent_to_pixel_coords(coords, (8, 32, 32), causal_fix=True)
    # frame 0 -> 0; frame 1 -> 1*8 +1-8 = 1; frame 2 -> 2*8+1-8 = 9
    np.testing.assert_array_equal(np.asarray(pix[0, 0]), [0, 1, 9])


def test_adain_filter_latent():
    a = jax.random.normal(jax.random.key(0), (1, 2, 4, 4, 3)) * 2 + 5
    ref = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, 3))
    out = adain_filter_latent(a, ref, factor=1.0)
    np.testing.assert_allclose(
        np.asarray(out).mean(axis=(1, 2, 3)),
        np.asarray(ref).mean(axis=(1, 2, 3)),
        atol=1e-4,
    )
    # factor 0 -> unchanged
    np.testing.assert_allclose(
        np.asarray(adain_filter_latent(a, ref, 0.0)), np.asarray(a)
    )


def test_multiscale_pipeline(pipe):
    up_cfg = lup.LatentUpsamplerConfig(
        in_channels=8, mid_channels=32, num_blocks_per_stage=1
    )
    ms = MultiScalePipeline(
        pipeline=pipe,
        upsampler_params=lup.init_params(jax.random.key(3), up_cfg),
        upsampler_cfg=up_cfg,
        downscale_factor=0.5,
    )
    emb, mask = _prompts()
    out = ms.generate(
        emb, mask, height=32, width=32, num_frames=9,
        first_pass=dict(num_inference_steps=2, guidance_scale=1.0),
        second_pass=dict(timesteps=[0.9, 0.7], guidance_scale=1.0),
        key=jax.random.key(0), output_type="latent",
    )
    # pass 2 runs at 2x the downscaled res == original res
    f, h, w = pipe.latent_shape(32, 32, 9)
    assert out.shape == (1, f, h, w, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_generation_deterministic_by_seed():
    """Same seed -> bit-identical video; different seed -> different
    (the reference's seed_everething contract, ``ltxv.py:136-143``)."""
    from ltx_video_gpupoor_tpu.serving.model_zoo import build_demo_model

    model = build_demo_model()
    gen = model.generator
    d = gen.pipeline.transformer_cfg.caption_channels
    emb = jax.random.normal(jax.random.key(9), (2, 8, d))
    mask = jnp.ones((2, 8), jnp.int32)
    kw = dict(height=64, width=64, frame_num=9, sampling_steps=2)
    a = np.asarray(gen.generate(emb, mask, seed=7, **kw))
    b = np.asarray(gen.generate(emb, mask, seed=7, **kw))
    c = np.asarray(gen.generate(emb, mask, seed=8, **kw))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a.astype(np.float32) - c.astype(np.float32)).max() > 0


def test_mid_video_single_frame_conditioning_extra_tokens(pipe):
    """Out-of-grid conditioning: a non-first single frame rides as extra
    tokens (reference pipeline_ltx_video.py:1466-1517) and is dropped
    from the output."""
    emb, mask = _prompts()
    image = jax.random.uniform(jax.random.key(6), (1, 32, 32, 3)) * 2 - 1
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=3, guidance_scale=2.0,
        conditioning_items=[ConditioningItem(image, 4, 0.9)],
        key=jax.random.key(0), output_type="latent",
    )
    f, h, w = pipe.latent_shape(32, 32, 9)
    assert out.shape == (1, f, h, w, 8)
    assert np.isfinite(np.asarray(out)).all()
    # and the result differs from unconditioned generation
    base = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=3, guidance_scale=2.0,
        key=jax.random.key(0), output_type="latent",
    )
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4


def test_mid_video_sequence_conditioning_grid_tail(pipe):
    """A non-first sequence's tail (beyond the 2-latent prefix) pins the
    latent grid; the prefix becomes extra tokens."""
    emb, mask = _prompts()
    video = jax.random.uniform(jax.random.key(7), (5, 32, 32, 3)) * 2 - 1
    out = pipe.generate(
        emb, mask, height=32, width=32, num_frames=9,
        num_inference_steps=3, guidance_scale=2.0,
        conditioning_items=[ConditioningItem(video, 4, 1.0)],
        key=jax.random.key(0), output_type="latent",
    )
    enc = ltx_vae.encode(pipe.vae_params, pipe.vae_cfg, video[None])
    z = ltx_vae.sample_posterior(enc)
    z = ltx_vae.normalize_latents(z, pipe.vae_params["per_channel_statistics"])
    # z has 3 latent frames; tail frame (index 2) lands at grid index
    # 4 // 2 + 2 = 4 with strength 1.0
    np.testing.assert_allclose(
        np.asarray(out[:, 4:5]), np.asarray(z[:, 2:3]), atol=1e-3
    )


def test_teacache_residual_reuse_exact(pipe):
    """compute=False with the previous residual reproduces the full
    forward exactly (same input => identical block-stack delta)."""
    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import forward

    b, s = 2, 16
    x = jax.random.normal(jax.random.key(3), (b, s, TF_CFG.in_channels))
    coords = jnp.tile(jnp.arange(s, dtype=jnp.float32)[None, None], (b, 3, 1))
    t = jnp.full((b,), 0.5)
    ctx = jax.random.normal(jax.random.key(4), (b, 8, TF_CFG.caption_channels))
    cmask = jnp.ones((b, 8), jnp.int32)

    out_full, res = forward(
        pipe.transformer_params, TF_CFG, x, coords, t, ctx, cmask,
        return_residual=True,
    )
    out_skip, res2 = forward(
        pipe.transformer_params, TF_CFG, x, coords, t, ctx, cmask,
        previous_residual=res, compute=jnp.asarray(False),
        return_residual=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_skip), np.asarray(out_full), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res2), np.asarray(res), atol=1e-5, rtol=1e-5
    )


def test_ltx_teacache_schedule(pipe):
    from ltx_video_gpupoor_tpu.pipelines.ltx_pipeline import (
        ltx_teacache_schedule,
    )

    ts = np.linspace(1.0, 0.05, 30, dtype=np.float32)
    mask = ltx_teacache_schedule(
        pipe.transformer_params, TF_CFG, ts, multiplier=2.0
    )
    assert mask.shape == (30,)
    assert mask[0] and mask[-1]
    executed = int(mask.sum())
    assert abs(executed - 15) <= 3  # ~steps/multiplier
    assert executed < 30  # actually skips something


def test_teacache_alltrue_matches_baseline(pipe):
    """An all-compute mask goes through the residual-carry code path but
    must reproduce the maskless scan bit-for-bit."""
    from ltx_video_gpupoor_tpu.pipelines import ltx_pipeline as lp

    emb, mask = _prompts()
    kwargs = dict(
        height=32, width=32, num_frames=9, num_inference_steps=4,
        guidance_scale=3.0, key=jax.random.key(5), output_type="latent",
    )
    base = np.asarray(pipe.generate(emb, mask, **kwargs))

    import unittest.mock as um

    with um.patch.object(
        lp, "ltx_teacache_schedule",
        lambda *a, **k: np.ones(4, bool),
    ):
        tc = np.asarray(
            pipe.generate(emb, mask, teacache_multiplier=2.0, **kwargs)
        )
    np.testing.assert_array_equal(tc, base)


def test_teacache_skipping_runs_and_differs(pipe):
    from ltx_video_gpupoor_tpu.pipelines import ltx_pipeline as lp

    emb, mask = _prompts()
    kwargs = dict(
        height=32, width=32, num_frames=9, num_inference_steps=6,
        guidance_scale=3.0, key=jax.random.key(6), output_type="latent",
    )
    base = np.asarray(pipe.generate(emb, mask, **kwargs))
    import unittest.mock as um

    skip_mask = np.array([1, 1, 0, 1, 0, 1], bool)
    with um.patch.object(
        lp, "ltx_teacache_schedule", lambda *a, **k: skip_mask
    ):
        tc = np.asarray(
            pipe.generate(emb, mask, teacache_multiplier=2.0, **kwargs)
        )
    assert np.isfinite(tc).all()
    assert not np.array_equal(tc, base)
    # approximate: the cached steps keep the trajectory in the same range
    assert np.abs(tc - base).mean() < 5 * np.abs(base).std()
