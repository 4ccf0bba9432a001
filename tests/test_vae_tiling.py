"""Tiling equivalence tests (SURVEY §4 plan item d): tiled encode/decode
within blend tolerance of untiled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.models.ltx import vae as ltx_vae
from ltx_video_gpupoor_tpu.models.ltx import vae_tiling


CFG = ltx_vae.VAEConfig.from_dict({
    "_class_name": "CausalVideoAutoencoder",
    "dims": 3,
    "latent_channels": 4,
    "blocks": [["res_x", 1], ["compress_all", 1]],
    "base_channels": 8,
    "norm_num_groups": 4,
    "patch_size": 2,
    "norm_layer": "pixel_norm",
    "latent_log_var": "uniform",
    "use_quant_conv": False,
    "causal_decoder": False,
})


@pytest.fixture(scope="module")
def params():
    return ltx_vae.init_params(jax.random.key(0), CFG)


def test_get_vae_tile_size():
    assert vae_tiling.get_vae_tile_size(0, 24000) == (4, 0)
    assert vae_tiling.get_vae_tile_size(0, 9000) == (4, 512)
    assert vae_tiling.get_vae_tile_size(0, 4000) == (4, 256)


def test_blend_crossfade():
    a = jnp.ones((1, 4, 2, 2, 1))
    b = jnp.zeros((1, 4, 2, 2, 1))
    out = vae_tiling.blend(a, b, 2, axis=1)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0, 0]),
                               [1.0, 0.5, 0.0, 0.0])


def test_hw_tiled_decode_close_to_untiled(params):
    z = jax.random.normal(jax.random.key(1), (1, 2, 16, 16, 4)) * 0.5
    full = ltx_vae.decode(params, CFG, z)
    tiled = vae_tiling.tiled_decode(
        params, CFG, z, z_tile=0, hw_tile=32,  # latent tile 8 over 16
    )
    assert tiled.shape == full.shape
    # interior agreement (seams are blended, borders differ slightly)
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(diff) < 0.1
    assert np.isfinite(np.asarray(tiled)).all()


def test_z_tiled_encode_shapes(params):
    media = jax.random.normal(jax.random.key(2), (1, 17, 16, 16, 3))
    full = ltx_vae.encode(params, CFG, media)
    tiled = vae_tiling.tiled_encode(params, CFG, media, z_tile=4)
    assert tiled.shape == full.shape
    # first frames identical (causal; first tile has no blending)
    np.testing.assert_allclose(
        np.asarray(tiled[:, :2]), np.asarray(full[:, :2]), atol=1e-4
    )


def test_z_tiled_decode_shapes(params):
    z = jax.random.normal(jax.random.key(3), (1, 9, 4, 4, 4)) * 0.5
    full = ltx_vae.decode(params, CFG, z)
    tiled = vae_tiling.tiled_decode(params, CFG, z, z_tile=4)
    assert tiled.shape == full.shape
    # the production decoder is non-causal (causal_decoder=False), so a
    # temporal tile can't see future context and tiling is approximate —
    # exactly like the reference's blended tiled decode (vae.py:357-413)
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    # random weights exaggerate seam error; real checkpoints are far closer
    assert np.median(diff) < 0.25, np.median(diff)
    assert np.isfinite(np.asarray(tiled)).all()


def test_parallel_tiled_decode_matches_sequential(params):
    """parallel_tiled_decode (tile grid fanned over the 8-device mesh)
    agrees with the sequential tiled decode everywhere except the
    edge-replicate-padded tail tiles, and with the untiled decode to the
    usual seam tolerance."""
    from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
    z = jax.random.normal(jax.random.key(1), (1, 2, 16, 16, 4)) * 0.5
    seq = vae_tiling.tiled_decode(params, CFG, z, z_tile=0, hw_tile=32)
    par = vae_tiling.parallel_tiled_decode(
        mesh, params, CFG, z, z_tile=0, hw_tile=32
    )
    assert par.shape == seq.shape
    # the full-tile region INCLUDING the tile0/tile1 blends must match
    # (starts 0/6/12 over 16: tiles 0 and 1 are unpadded, so rows/cols
    # < 2*limit=48 involve no padded tail); a blend-order or grid-index
    # regression would corrupt this region
    np.testing.assert_allclose(
        np.asarray(par[:, :, :48, :48]), np.asarray(seq[:, :, :48, :48]),
        atol=1e-4, rtol=1e-4,
    )
    full = ltx_vae.decode(params, CFG, z)
    diff = np.abs(np.asarray(par) - np.asarray(full))
    # slightly looser than the sequential bar (0.1): the padded tails
    # see replicate context instead of ragged truncation, and random
    # weights exaggerate the seams
    assert np.median(diff) < 0.15, np.median(diff)
    assert np.isfinite(np.asarray(par)).all()


def test_parallel_tiled_decode_z_and_spatial(params):
    """Temporal tiles sequential, each slab's spatial grid parallel."""
    from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=1, sp=8, tp=1))
    z = jax.random.normal(jax.random.key(5), (1, 9, 16, 16, 4)) * 0.5
    seq = vae_tiling.tiled_decode(params, CFG, z, z_tile=4, hw_tile=32)
    par = vae_tiling.parallel_tiled_decode(
        mesh, params, CFG, z, z_tile=4, hw_tile=32
    )
    assert par.shape == seq.shape
    np.testing.assert_allclose(
        np.asarray(par[:, :, :48, :48]), np.asarray(seq[:, :, :48, :48]),
        atol=1e-4, rtol=1e-4,
    )


def test_parallel_tiled_decode_edge_grids(params):
    """Fewer tiles than devices (tile-axis padding) and a single-axis
    grid (W fits in one tile) both produce the sequential result."""
    from ltx_video_gpupoor_tpu.core import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(dp=1, sp=8, tp=1))
    # narrow W: 16x8 latent -> 3x2 = 6 tiles < 8 devices (tile-axis pad)
    z = jax.random.normal(jax.random.key(7), (1, 2, 16, 8, 4)) * 0.5
    seq = vae_tiling.tiled_decode(params, CFG, z, z_tile=0, hw_tile=32)
    par = vae_tiling.parallel_tiled_decode(
        mesh, params, CFG, z, z_tile=0, hw_tile=32
    )
    assert par.shape == seq.shape
    # H tiles 0/1 are unpadded (blend included); the narrow W axis has
    # its second tile padded, so only W < limit is comparable
    np.testing.assert_allclose(
        np.asarray(par[:, :, :48, :24]), np.asarray(seq[:, :, :48, :24]),
        atol=1e-4, rtol=1e-4,
    )
    assert np.isfinite(np.asarray(par)).all()


def test_parallel_tiled_decode_falls_back(params):
    """No mesh / tiling not engaged -> identical to tiled_decode."""
    z = jax.random.normal(jax.random.key(6), (1, 2, 8, 8, 4))
    seq = vae_tiling.tiled_decode(params, CFG, z, z_tile=0, hw_tile=64)
    par = vae_tiling.parallel_tiled_decode(
        None, params, CFG, z, z_tile=0, hw_tile=64
    )
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq))


def test_wide_frame_triggers_spatial_tiling(params):
    """A frame wide in W but short in H must still tile (the trigger
    previously checked only the H axis) and match the untiled decode."""
    z = jax.random.normal(jax.random.key(3), (1, 2, 4, 16, 4))
    full = vae_tiling._tile_decode(params, CFG, z, None, None)
    tiled = vae_tiling.tiled_decode(
        params, CFG, z, z_tile=0, hw_tile=8 * CFG.spatial_downscale_factor
    )
    assert tiled.shape == full.shape
    # interior (non-blend) region matches exactly
    np.testing.assert_allclose(
        np.asarray(tiled[:, :, :, :8]), np.asarray(full[:, :, :, :8]),
        atol=1e-4, rtol=1e-4,
    )
