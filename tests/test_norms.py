import numpy as np
import jax.numpy as jnp
import torch

from ltx_video_gpupoor_tpu.ops.norms import (
    group_norm,
    layer_norm,
    pixel_norm,
    rms_norm,
)


def test_rms_norm_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    w = np.random.RandomState(1).rand(16).astype(np.float32)
    mine = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5)
    tx = torch.from_numpy(x)
    ref = tx * torch.rsqrt(tx.pow(2).mean(-1, keepdim=True) + 1e-5) * torch.from_numpy(w)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-5)


def test_layer_norm_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    w = np.random.RandomState(1).rand(16).astype(np.float32)
    b = np.random.RandomState(2).rand(16).astype(np.float32)
    mine = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
    )
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-5)


def test_group_norm_matches_torch_nchw():
    x = np.random.RandomState(0).randn(2, 8, 4, 6).astype(np.float32)
    w = np.random.RandomState(1).rand(8).astype(np.float32)
    b = np.random.RandomState(2).rand(8).astype(np.float32)
    mine = group_norm(
        jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b), eps=1e-6, channel_axis=1
    )
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x), 4, torch.from_numpy(w), torch.from_numpy(b), 1e-6
    )
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-5)


def test_group_norm_channels_last_equivalent():
    x = np.random.RandomState(0).randn(2, 8, 4, 6).astype(np.float32)
    a = group_norm(jnp.asarray(x), 4, channel_axis=1)
    b = jnp.moveaxis(
        group_norm(jnp.asarray(np.moveaxis(x, 1, -1)), 4, channel_axis=-1), -1, 1
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pixel_norm_unit_rms():
    x = np.random.RandomState(0).randn(2, 8, 4, 6).astype(np.float32)
    y = np.asarray(pixel_norm(jnp.asarray(x), axis=1))
    np.testing.assert_allclose((y * y).mean(axis=1), 1.0, atol=1e-4)
