import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ltx_video_gpupoor_tpu.models.ltx import video_autoencoder as lvae


def test_dual_conv_matches_torch_factorization():
    """DualConv3d == spatial conv then temporal conv (dual_conv3d.py)."""
    rng = np.random.RandomState(0)
    cin, cout, k = 3, 5, 3
    w1 = rng.randn(cout, cin, 1, k, k).astype(np.float32)
    b1 = rng.randn(cout).astype(np.float32)
    w2 = rng.randn(cout, cout, k, 1, 1).astype(np.float32)
    b2 = rng.randn(cout).astype(np.float32)
    x = rng.randn(1, cin, 4, 8, 8).astype(np.float32)

    ref = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w1), torch.from_numpy(b1),
        stride=1, padding=(0, 1, 1),
    )
    ref = torch.nn.functional.conv3d(
        ref, torch.from_numpy(w2), torch.from_numpy(b2),
        stride=1, padding=(1, 0, 0),
    ).numpy()

    p = {
        "kernel1": jnp.asarray(np.transpose(w1, (2, 3, 4, 1, 0))),
        "bias1": jnp.asarray(b1),
        "kernel2": jnp.asarray(np.transpose(w2, (2, 3, 4, 1, 0))),
        "bias2": jnp.asarray(b2),
    }
    mine = lvae.conv_nd(
        (2, 1), p, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(mine), (0, 4, 1, 2, 3)), ref,
        atol=1e-4, rtol=1e-4,
    )


@pytest.mark.parametrize("dims", [3, (2, 1)])
def test_legacy_vae_roundtrip_shapes(dims):
    cfg = lvae.LegacyVAEConfig(
        dims=dims, latent_channels=4, block_out_channels=(8, 8),
        layers_per_block=1, norm_num_groups=4, patch_size=1,
        latent_log_var="per_channel", use_quant_conv=True,
    )
    params = lvae.init_params(jax.random.key(0), cfg)
    media = jax.random.normal(jax.random.key(1), (1, 4, 16, 16, 3))
    enc = lvae.encode(params, cfg, media)
    # one downsample stage: 4 frames -> 2, 16px -> 8; mean+logvar channels
    assert enc.shape == (1, 2, 8, 8, 8)
    z = enc[..., :4]
    rec = lvae.decode(params, cfg, z, target_frames=4)
    assert rec.shape == (1, 4, 16, 16, 3)
    assert np.isfinite(np.asarray(rec)).all()


def test_legacy_vae_image_mode_no_time_downsample():
    cfg = lvae.LegacyVAEConfig(
        dims=(2, 1), latent_channels=4, block_out_channels=(8, 8),
        layers_per_block=1, norm_num_groups=4,
        latent_log_var="per_channel",
    )
    params = lvae.init_params(jax.random.key(0), cfg)
    image = jax.random.normal(jax.random.key(1), (1, 1, 16, 16, 3))
    enc = lvae.encode(params, cfg, image)
    assert enc.shape == (1, 1, 8, 8, 8)  # time untouched for single frame
    rec = lvae.decode(params, cfg, enc[..., :4], target_frames=1)
    assert rec.shape == (1, 1, 16, 16, 3)


def test_patchify_channel_padding():
    x = jnp.ones((1, 4, 8, 8, 3))
    # p_t == 1: no channel padding unless requested
    y = lvae.pixel_patchify(x, q=4, p_t=1, add_channel_padding=False)
    assert y.shape == (1, 4, 2, 2, 3 * 16)
    # p_t > 1 with q > p_t pads regardless (video_autoencoder.py:886-901),
    # and the zeros are PREPENDED (torch.cat([zeros, x], dim=1)) — the
    # conv_in weights expect [zeros..., real] channel order
    y2 = lvae.pixel_patchify(x, q=4, p_t=2, add_channel_padding=False)
    real = 3 * 2 * 16
    assert y2.shape[-1] == real * 2
    assert np.all(np.asarray(y2[..., : y2.shape[-1] - real]) == 0)
    assert np.all(np.asarray(y2[..., y2.shape[-1] - real:]) != 0)
    # unpatchify keeps the FIRST channels like the reference (:915-916);
    # the pair is intentionally asymmetric (they sit on opposite ends of
    # the model), so there is no round-trip identity through the pad path
    back = lvae.pixel_unpatchify(y2, q=4, p_t=2, out_channels=3)
    assert back.shape == x.shape
