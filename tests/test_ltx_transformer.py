import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.models.ltx import patchifier
from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
    LTXTransformerConfig,
    SkipLayerStrategy,
    forward,
    init_params,
)

TINY = LTXTransformerConfig(
    num_attention_heads=2,
    attention_head_dim=32,
    in_channels=16,
    out_channels=16,
    num_layers=2,
    cross_attention_dim=64,
    caption_channels=48,
)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_params(jax.random.key(0), TINY)
    return params


def _inputs(b=2, f=2, h=4, w=4, sc=7):
    lat = jax.random.normal(jax.random.key(1), (b, f, h, w, TINY.in_channels))
    tokens, coords = patchifier.patchify(lat)
    caption = jax.random.normal(jax.random.key(2), (b, sc, TINY.caption_channels))
    mask = jnp.ones((b, sc), jnp.int32).at[:, -2:].set(0)
    t = jnp.full((b,), 0.7)
    return tokens, coords, t, caption, mask


def test_forward_shapes(tiny_model):
    tokens, coords, t, cap, mask = _inputs()
    out = forward(tiny_model, TINY, tokens, coords, t, cap, mask)
    assert out.shape == (tokens.shape[0], tokens.shape[1], TINY.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_jittable(tiny_model):
    tokens, coords, t, cap, mask = _inputs()
    f = jax.jit(lambda p, x, c, tt, cc, m: forward(p, TINY, x, c, tt, cc, m))
    out = f(tiny_model, tokens, coords, t, cap, mask)
    ref = forward(tiny_model, TINY, tokens, coords, t, cap, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_caption_mask_matters(tiny_model):
    tokens, coords, t, cap, mask = _inputs()
    out1 = forward(tiny_model, TINY, tokens, coords, t, cap, mask)
    # perturb a masked caption token -> output unchanged
    cap2 = cap.at[:, -1, :].add(100.0)
    out2 = forward(tiny_model, TINY, tokens, coords, t, cap2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # perturb an unmasked token -> output changes
    cap3 = cap.at[:, 0, :].add(100.0)
    out3 = forward(tiny_model, TINY, tokens, coords, t, cap3, mask)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-3


def test_skip_layer_transformer_block(tiny_model):
    tokens, coords, t, cap, mask = _inputs()
    base = forward(tiny_model, TINY, tokens, coords, t, cap, mask)
    # skipping ALL blocks for all rows != base
    skip_all = jnp.zeros((TINY.num_layers, tokens.shape[0]))
    out = forward(
        tiny_model, TINY, tokens, coords, t, cap, mask,
        skip_layer_mask=skip_all,
        skip_layer_strategy=SkipLayerStrategy.TransformerBlock,
    )
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3
    # keep-all mask == no mask
    keep = jnp.ones((TINY.num_layers, tokens.shape[0]))
    out2 = forward(
        tiny_model, TINY, tokens, coords, t, cap, mask,
        skip_layer_mask=keep,
        skip_layer_strategy=SkipLayerStrategy.TransformerBlock,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(base), atol=1e-5)


def test_skip_layer_attention_strategies(tiny_model):
    tokens, coords, t, cap, mask = _inputs()
    base = forward(tiny_model, TINY, tokens, coords, t, cap, mask)
    for strat in (SkipLayerStrategy.AttentionSkip, SkipLayerStrategy.AttentionValues):
        m = jnp.ones((TINY.num_layers, tokens.shape[0])).at[1, -1].set(0.0)
        out = forward(
            tiny_model, TINY, tokens, coords, t, cap, mask,
            skip_layer_mask=m, skip_layer_strategy=strat,
        )
        # only the perturbed row changes
        np.testing.assert_allclose(
            np.asarray(out[:-1]), np.asarray(base[:-1]), atol=1e-5
        )
        assert np.abs(np.asarray(out[-1]) - np.asarray(base[-1])).max() > 1e-4


def test_per_group_timesteps(tiny_model):
    tokens, coords, t, cap, mask = _inputs(f=2)
    b = tokens.shape[0]
    tg = jnp.stack([jnp.full((b,), 0.7), jnp.full((b,), 0.2)], axis=1)  # [B, 2]
    out = forward(tiny_model, TINY, tokens, coords, tg, cap, mask)
    assert out.shape == (b, tokens.shape[1], TINY.out_channels)
    # uniform per-group t == scalar t
    tg_same = jnp.full((b, 2), 0.7)
    out_grouped = forward(tiny_model, TINY, tokens, coords, tg_same, cap, mask)
    out_scalar = forward(
        tiny_model, TINY, tokens, coords, jnp.full((b,), 0.7), cap, mask
    )
    np.testing.assert_allclose(
        np.asarray(out_grouped), np.asarray(out_scalar), atol=1e-5
    )


def test_patchify_roundtrip():
    lat = jax.random.normal(jax.random.key(3), (2, 3, 4, 6, 5))
    tokens, coords = patchifier.patchify(lat)
    assert tokens.shape == (2, 3 * 4 * 6, 5)
    assert coords.shape == (2, 3, 3 * 4 * 6)
    rec = patchifier.unpatchify(tokens, 4, 6, 5)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(lat))
    # coords raster order: first token (0,0,0), second (0,0,1)
    np.testing.assert_array_equal(np.asarray(coords[0, :, 0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(coords[0, :, 1]), [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(coords[0, :, 6]), [0, 1, 0])


def test_ffn_chunking_equals_unchunked():
    import dataclasses as _dc

    from ltx_video_gpupoor_tpu.models.ltx.transformer3d import (
        LTXTransformerConfig,
        forward,
        init_params,
    )

    cfg = LTXTransformerConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=8,
        out_channels=8, num_layers=2, cross_attention_dim=16,
        caption_channels=16,
    )
    cfg4 = _dc.replace(cfg, ffn_chunks=4)
    params = init_params(jax.random.key(0), cfg)
    tokens = jax.random.normal(jax.random.key(1), (1, 18, 8))  # 18 % 4 != 0
    coords = jnp.zeros((1, 3, 18))
    cap = jax.random.normal(jax.random.key(2), (1, 6, 16))
    mask = jnp.ones((1, 6), jnp.int32)
    t = jnp.full((1,), 0.4)
    a = forward(params, cfg, tokens, coords, t, cap, mask, attn_mode="xla")
    b = forward(params, cfg4, tokens, coords, t, cap, mask, attn_mode="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_patchifier_golden_vs_reference():
    """Token ordering and coordinate grid match the reference
    SymmetricPatchifier (patch_size=1, the production setting)."""
    import torch
    from einops import rearrange as _re

    src = open(
        "/root/reference/ltx_video/models/transformers/symmetric_patchifier.py"
    ).read()
    src = src.replace(
        "from diffusers.configuration_utils import ConfigMixin", ""
    )
    class _CM:
        pass

    ns = {"ConfigMixin": _CM}
    exec(compile(src, "ref_patchifier.py", "exec"), ns)
    ref = ns["SymmetricPatchifier"](patch_size=1)

    from ltx_video_gpupoor_tpu.models.ltx import patchifier as jpat

    rng = np.random.RandomState(0)
    lat = rng.randn(2, 8, 3, 4, 5).astype(np.float32)  # [B,C,F,H,W]
    ref_tokens, ref_coords = ref.patchify(torch.from_numpy(lat.copy()))
    tokens, coords = jpat.patchify(
        jnp.asarray(np.transpose(lat, (0, 2, 3, 4, 1)))
    )
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens.numpy(),
                               atol=0)
    np.testing.assert_allclose(np.asarray(coords).astype(np.int64),
                               ref_coords.numpy(), atol=0)

    ref_grid = ref.unpatchify(ref_tokens, 4, 5, 8).numpy()
    grid = jpat.unpatchify(tokens, 4, 5, 8)
    np.testing.assert_allclose(
        np.transpose(np.asarray(grid), (0, 4, 1, 2, 3)), ref_grid, atol=0
    )
