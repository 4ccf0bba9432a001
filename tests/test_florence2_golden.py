"""Golden tests for the Florence-2 implementation (models/florence2.py)
against torch ``transformers``' Florence2 classes instantiated from tiny
RANDOM configs — the captioner behind the reference's LTX prompt
enhancer (prompt_enhance_utils.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ltx_video_gpupoor_tpu.models import florence2 as flo  # noqa: E402

pytestmark = pytest.mark.golden


VIS = dict(
    in_channels=3, depths=(1, 2), patch_size=(3, 3), patch_stride=(2, 2),
    patch_padding=(1, 1), patch_prenorm=(False, True),
    embed_dim=(16, 32), num_heads=(2, 4), num_groups=(2, 4),
    window_size=4, drop_path_rate=0.0, mlp_ratio=2.0, qkv_bias=True,
    projection_dim=24, max_temporal_embeddings=10,
    max_position_embeddings=16,
)
TXT = dict(
    vocab_size=120, d_model=24, encoder_layers=2, decoder_layers=2,
    encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=40, decoder_ffn_dim=40, activation_function="gelu",
    max_position_embeddings=64, scale_embedding=False, dropout=0.0,
    attention_dropout=0.0, activation_dropout=0.0,
    pad_token_id=1, bos_token_id=0, eos_token_id=2,
    decoder_start_token_id=2, forced_bos_token_id=0,
    forced_eos_token_id=None, is_encoder_decoder=True,
)
IMG_TOKEN = 119


def _hf_config():
    from transformers import Florence2Config

    return Florence2Config(
        vision_config=dict(VIS), text_config=dict(TXT),
        image_token_id=IMG_TOKEN,
    )


def _our_config():
    return flo.config_from_hf({
        "vision_config": dict(VIS), "text_config": dict(TXT),
        "image_token_id": IMG_TOKEN,
    })


@pytest.fixture(scope="module")
def models():
    from transformers import Florence2ForConditionalGeneration

    torch.manual_seed(0)
    model = Florence2ForConditionalGeneration(_hf_config())
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
    model.eval().float()
    cfg = _our_config()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        flo.convert_hf_state_dict(sd, cfg),
    )
    return model, cfg, params


def _pixels(h=14, w=18, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, 3, h, w)).astype(np.float32)


def test_vision_tower_matches_transformers(models):
    """Odd spatial dims exercise the window-attention padding path."""
    model, cfg, params = models
    px = _pixels()
    with torch.no_grad():
        ref = model.model.vision_tower(torch.tensor(px)).numpy()
    ours = np.asarray(flo.vision_forward(
        params["vision"], cfg.vision,
        jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        ours, ref.transpose(0, 2, 3, 1), rtol=3e-4, atol=3e-4)


def test_image_features_match_transformers(models):
    model, cfg, params = models
    px = _pixels(seed=1)
    with torch.no_grad():
        ref = model.model.get_image_features(torch.tensor(px)).numpy()
    tower = flo.vision_forward(
        params["vision"], cfg.vision, jnp.asarray(px.transpose(0, 2, 3, 1)))
    ours = np.asarray(flo.project_image_features(
        params["projector"], cfg, tower))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def _mm_ids(cfg, n_img, text_len=5, seed=2):
    rng = np.random.default_rng(seed)
    return np.concatenate([
        [IMG_TOKEN] * n_img, rng.integers(3, 110, text_len),
    ]).astype(np.int64)[None]


def test_multimodal_forward_matches_transformers(models):
    model, cfg, params = models
    px = _pixels(seed=3)
    with torch.no_grad():
        n_img = model.model.get_image_features(
            torch.tensor(px)).shape[1]
    ids = _mm_ids(cfg, n_img)
    dec_ids = np.array([[2, 0, 5, 7]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(px),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    ours = np.asarray(flo.forward(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(px.transpose(0, 2, 3, 1)),
        jnp.asarray(dec_ids.astype(np.int32))))
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)


def test_text_only_forward_matches_transformers(models):
    model, cfg, params = models
    rng = np.random.default_rng(4)
    ids = rng.integers(3, 110, (2, 7)).astype(np.int64)
    dec_ids = np.array([[2, 0, 5], [2, 0, 9]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    ours = np.asarray(flo.forward(
        params, cfg, jnp.asarray(ids.astype(np.int32)), None,
        jnp.asarray(dec_ids.astype(np.int32))))
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)


def test_greedy_generate_matches_transformers(models):
    model, cfg, params = models
    px = _pixels(seed=5)
    with torch.no_grad():
        n_img = model.model.get_image_features(
            torch.tensor(px)).shape[1]
    ids = _mm_ids(cfg, n_img, seed=6)
    n_new = 7
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(px),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
            use_cache=True, eos_token_id=None,
        ).numpy()
    # HF returns [decoder_start, forced_bos, ...]; ours starts at the
    # first generated token (the forced BOS)
    ours = np.asarray(flo.generate(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(px.transpose(0, 2, 3, 1)), n_new))
    np.testing.assert_array_equal(ours[0], ref[0, 1:1 + n_new])
