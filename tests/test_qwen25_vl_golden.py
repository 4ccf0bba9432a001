"""Golden tests for the Qwen2.5-VL implementation (models/qwen25_vl.py)
against torch ``transformers``' Qwen2_5_VL classes instantiated from tiny
RANDOM configs — the model behind the reference's image-aware Wan prompt
extender (prompt_extend.py:398-455)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ltx_video_gpupoor_tpu.models import llm, qwen25_vl as qvl  # noqa: E402

pytestmark = pytest.mark.golden


VIS = dict(
    depth=4, hidden_size=32, intermediate_size=48, num_heads=4,
    in_channels=3, patch_size=2, spatial_merge_size=2,
    temporal_patch_size=2, window_size=8, out_hidden_size=24,
    fullatt_block_indexes=[1, 3],
)
TXT = dict(
    vocab_size=160, hidden_size=24, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=40,
    rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
    rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 1]},
)
# token ids (kept below vocab_size for the tiny config)
IMG, VID, VSTART = 151, 152, 150


def _hf_config():
    from transformers import Qwen2_5_VLConfig

    return Qwen2_5_VLConfig(
        vision_config=dict(VIS), text_config=dict(TXT, vocab_size=160),
        image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VSTART,
    )


def _our_config():
    hf = {
        "vision_config": dict(VIS),
        "text_config": dict(TXT),
        "image_token_id": IMG, "video_token_id": VID,
        "vision_start_token_id": VSTART,
    }
    return qvl.config_from_hf(hf)


@pytest.fixture(scope="module")
def models():
    from transformers import Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(_hf_config())
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
    model.eval().float()
    cfg = _our_config()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        qvl.convert_hf_state_dict(sd, cfg),
    )
    return model, cfg, params


def test_vision_tower_matches_transformers(models):
    """Tower output on a 2-frame 8x8-patch grid (exercises BOTH window
    partition padding and the full-attention blocks)."""
    model, cfg, params = models
    grid = np.array([[2, 8, 6]])  # t, h, w patches
    s = int(grid.prod())
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((s, cfg.vision.patch_dim)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model.model.visual(
            torch.tensor(patches), torch.tensor(grid)).numpy()
    ours = np.asarray(qvl.vision_forward(
        params["vision"], cfg.vision, jnp.asarray(patches), grid))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_vision_tower_multi_image(models):
    model, cfg, params = models
    grid = np.array([[1, 4, 4], [1, 6, 8]])
    s = int((grid.prod(axis=1)).sum())
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((s, cfg.vision.patch_dim)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model.model.visual(
            torch.tensor(patches), torch.tensor(grid)).numpy()
    ours = np.asarray(qvl.vision_forward(
        params["vision"], cfg.vision, jnp.asarray(patches), grid))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def _mm_inputs(cfg, grid, text_len=5, seed=2):
    """input_ids with a vision block followed by text."""
    merge = cfg.vision.spatial_merge_size
    n_img = int(grid.prod() // (merge * merge))
    rng = np.random.default_rng(seed)
    ids = np.concatenate([
        [VSTART], [IMG] * n_img,
        rng.integers(1, 140, text_len),
    ]).astype(np.int64)[None]
    patches = rng.standard_normal(
        (int(grid.prod()), cfg.vision.patch_dim)).astype(np.float32)
    return ids, patches


def test_get_rope_index_matches_transformers(models):
    model, cfg, _ = models
    grid = np.array([[1, 4, 6]])
    ids, _ = _mm_inputs(cfg, grid)
    mask = np.ones_like(ids)
    ref_pos, ref_delta = model.model.get_rope_index(
        torch.tensor(ids), image_grid_thw=torch.tensor(grid),
        attention_mask=torch.tensor(mask))
    pos, delta = qvl.get_rope_index(cfg, ids, image_grid_thw=grid,
                                    attention_mask=mask)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy().reshape(-1))


def test_multimodal_forward_matches_transformers(models):
    model, cfg, params = models
    grid = np.array([[1, 4, 6]])
    ids, patches = _mm_inputs(cfg, grid)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()
    ours = np.asarray(qvl.forward(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(patches), grid))
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)


def test_multimodal_greedy_generate_matches_transformers(models):
    model, cfg, params = models
    grid = np.array([[1, 4, 4]])
    ids, patches = _mm_inputs(cfg, grid, text_len=4, seed=3)
    mask = np.ones_like(ids)
    n_new = 6
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grid),
            attention_mask=torch.tensor(mask),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None, use_cache=True,
        ).numpy()[:, ids.shape[1]:]
    ours = np.asarray(qvl.generate(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(patches), grid, jnp.asarray(mask.astype(np.int32)),
        n_new))
    np.testing.assert_array_equal(ours, ref)


def test_text_only_generate_matches_plain_llm(models):
    """Without images the VL generate degrades to the plain LLM path."""
    _, cfg, params = models
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 140, (1, 6)).astype(np.int32)
    mask = np.ones_like(ids)
    a = np.asarray(qvl.generate(params, cfg, jnp.asarray(ids), None, None,
                                jnp.asarray(mask), 4))
    b = np.asarray(llm.generate(params["text"], cfg.text, jnp.asarray(ids),
                                jnp.asarray(mask), 4))
    np.testing.assert_array_equal(a, b)
