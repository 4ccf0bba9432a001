import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae


def tiny_cfg(**over):
    cfg = {
        "_class_name": "CausalVideoAutoencoder",
        "dims": 3,
        "in_channels": 3,
        "out_channels": 3,
        "latent_channels": 8,
        "blocks": [
            ["res_x", 1],
            ["compress_all", 1],
            ["res_x_y", 1],
            ["res_x", 1],
        ],
        "base_channels": 8,
        "norm_num_groups": 4,
        "patch_size": 2,
        "norm_layer": "pixel_norm",
        "latent_log_var": "uniform",
        "use_quant_conv": False,
        "causal_decoder": False,
    }
    cfg.update(over)
    return ltx_vae.VAEConfig.from_dict(cfg)


def test_scale_factors():
    cfg = tiny_cfg()
    assert cfg.spatial_downscale_factor == 2 * 2  # one compress_all * patch 2
    assert cfg.temporal_downscale_factor == 2


def test_encode_decode_shapes():
    cfg = tiny_cfg()
    params = ltx_vae.init_params(jax.random.key(0), cfg)
    # F = 1 + 8k frames analog: with one temporal compression, F'=ceil(F/2)
    media = jax.random.normal(jax.random.key(1), (1, 5, 16, 16, 3))
    enc = ltx_vae.encode(params, cfg, media)
    # causal time downsample: 5 -> 3 (first frame stays)
    assert enc.shape == (1, 3, 4, 4, 16)  # 2*latent channels
    z = ltx_vae.sample_posterior(enc)
    assert z.shape == (1, 3, 4, 4, 8)
    rec = ltx_vae.decode(params, cfg, z)
    # causal temporal upsample crops the first duplicated frame: 2*3-1 = 5
    assert rec.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(rec)).all()


def test_encoder_is_causal():
    """Changing later frames must not affect earlier encoded frames."""
    cfg = tiny_cfg()
    params = ltx_vae.init_params(jax.random.key(0), cfg)
    m1 = jax.random.normal(jax.random.key(1), (1, 5, 8, 8, 3))
    m2 = m1.at[:, -1].add(10.0)
    e1 = ltx_vae.encode(params, cfg, m1)
    e2 = ltx_vae.encode(params, cfg, m2)
    np.testing.assert_allclose(
        np.asarray(e1[:, 0]), np.asarray(e2[:, 0]), atol=1e-5
    )
    assert np.abs(np.asarray(e1[:, -1]) - np.asarray(e2[:, -1])).max() > 1e-4


def test_latent_uniform_logvar_channels_equal():
    cfg = tiny_cfg()
    params = ltx_vae.init_params(jax.random.key(0), cfg)
    media = jax.random.normal(jax.random.key(1), (1, 1, 8, 8, 3))
    enc = ltx_vae.encode(params, cfg, media)
    logvar = np.asarray(enc[..., cfg.latent_channels:])
    # uniform: all logvar channels identical
    assert np.allclose(logvar, logvar[..., :1], atol=1e-6)


def test_posterior_sampling_statistics():
    cfg = tiny_cfg()
    params = ltx_vae.init_params(jax.random.key(0), cfg)
    media = jnp.zeros((1, 1, 8, 8, 3))
    enc = ltx_vae.encode(params, cfg, media)
    mode = ltx_vae.sample_posterior(enc)
    s1 = ltx_vae.sample_posterior(enc, jax.random.key(1))
    s2 = ltx_vae.sample_posterior(enc, jax.random.key(2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(
        np.asarray(mode), np.asarray(enc[..., : cfg.latent_channels])
    )


def test_normalize_roundtrip():
    stats = {
        "std_of_means": jnp.asarray(np.random.rand(8).astype(np.float32) + 0.5),
        "mean_of_means": jnp.asarray(np.random.randn(8).astype(np.float32)),
    }
    z = jax.random.normal(jax.random.key(0), (1, 2, 3, 3, 8))
    zn = ltx_vae.normalize_latents(z, stats)
    rt = ltx_vae.un_normalize_latents(zn, stats)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(z), atol=1e-5)


def test_decoder_timestep_conditioning_and_noise():
    cfg = tiny_cfg(
        timestep_conditioning=True,
        blocks=[
            ["res_x", {"num_layers": 1, "inject_noise": True}],
            ["compress_all", {"residual": True, "multiplier": 1}],
            ["res_x", 1],
        ],
    )
    params = ltx_vae.init_params(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, 8))
    r1 = ltx_vae.decode(params, cfg, z, timestep=jnp.asarray(0.05),
                        noise_key=jax.random.key(2))
    r2 = ltx_vae.decode(params, cfg, z, timestep=jnp.asarray(0.5),
                        noise_key=jax.random.key(2))
    assert r1.shape == r2.shape
    # different decode timesteps give different outputs
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-5


def test_residual_upsample_and_s2d_downsample():
    cfg = tiny_cfg(
        blocks=[
            ["res_x", 1],
            ["compress_all_res", {"multiplier": 2}],
            ["res_x", 1],
        ],
        # decoder mirror uses compress_all with residual for upsampling
        decoder_blocks=[
            ["res_x", 1],
            ["compress_all", {"residual": True, "multiplier": 2}],
            ["res_x", 1],
        ],
        encoder_blocks=[
            ["res_x", 1],
            ["compress_all_res", {"multiplier": 2}],
            ["res_x", 1],
        ],
    )
    params = ltx_vae.init_params(jax.random.key(0), cfg)
    media = jax.random.normal(jax.random.key(1), (1, 3, 8, 8, 3))
    enc = ltx_vae.encode(params, cfg, media)
    z = ltx_vae.sample_posterior(enc)
    rec = ltx_vae.decode(params, cfg, z)
    assert rec.shape[3] == 8 and rec.shape[4] == 3
    assert np.isfinite(np.asarray(rec)).all()
