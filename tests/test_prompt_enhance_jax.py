"""End-to-end tests for the TPU-native prompt enhancer / extender LLM
path: a tiny Qwen2-layout HF checkpoint dir (config.json + safetensors +
tokenizer files, all built offline) flows through JaxChatLM.from_dir into
the enhancer's rewrite and the Wan extender — no torch on the model path,
mirroring how a user points LTXV_TPU_ENHANCER_LLM_DIR at a downloaded
unsloth/Llama-3.2-3B-Instruct or Qwen2.5-3B-Instruct directory."""

import json

import numpy as np
import pytest
import jax

from ltx_video_gpupoor_tpu.models import llm
from ltx_video_gpupoor_tpu.utils import prompt_enhance as pe

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Tiny Qwen2-architecture checkpoint in the published HF layout."""
    d = tmp_path_factory.mktemp("qwen_tiny")
    cfg = llm.LLMConfig(
        vocab_size=96, dim=32, num_layers=2, num_heads=4, num_kv_heads=2,
        ffn_dim=64, rope_theta=10000.0, rms_eps=1e-6, qkv_bias=True,
        tie_embeddings=True,
    )
    params = llm.init_params(jax.random.key(0), cfg)
    # write in the HF safetensors naming so load_hf_dir's converter runs
    import torch
    from safetensors.torch import save_file

    sd = {}
    flat = {}
    bl = params["blocks"]
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "o_proj")):
            flat[f"{pre}self_attn.{theirs}.weight"] = np.asarray(
                bl["attn"][ours]["kernel"][i]).T
            if "bias" in bl["attn"][ours]:
                flat[f"{pre}self_attn.{theirs}.bias"] = np.asarray(
                    bl["attn"][ours]["bias"][i])
        flat[f"{pre}input_layernorm.weight"] = np.asarray(
            bl["input_norm"]["weight"][i])
        flat[f"{pre}post_attention_layernorm.weight"] = np.asarray(
            bl["post_norm"]["weight"][i])
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            flat[f"{pre}mlp.{theirs}.weight"] = np.asarray(
                bl["mlp"][ours]["kernel"][i]).T
    flat["model.embed_tokens.weight"] = np.asarray(params["token_embedding"])
    flat["model.norm.weight"] = np.asarray(params["norm"]["weight"])
    for k, v in flat.items():
        sd[k] = torch.tensor(np.ascontiguousarray(v))
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["Qwen2ForCausalLM"], "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim, "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "intermediate_size": cfg.ffn_dim, "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps, "tie_word_embeddings": True,
    }))
    # minimal real tokenizer (WordLevel + chat template), loadable by
    # AutoTokenizer fully offline
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers

    vocab = {f"tok{i}": i for i in range(94)}
    vocab.update({"<|eos|>": 94, "<|unk|>": 95})
    tok = Tokenizer(tmodels.WordLevel(vocab, unk_token="<|unk|>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "<|eos|>", "unk_token": "<|unk|>",
        "chat_template": ("{% for m in messages %}{{ m['content'] }} "
                          "{% endfor %}{% if add_generation_prompt %}"
                          "tok7{% endif %}"),
    }))
    return str(d)


def test_jax_chat_lm_from_dir(model_dir):
    lm = pe.JaxChatLM.from_dir(model_dir, max_new_tokens=6)
    out = lm.chat("tok1 tok2", "tok3 tok4", temperature=0.0)
    assert isinstance(out, str)
    # greedy output is deterministic; a second call reuses the compiled
    # program and must agree
    assert lm.chat("tok1 tok2", "tok3 tok4", temperature=0.0) == out


def test_enhancer_uses_jax_path(model_dir):
    enh = pe.PromptEnhancer(llm_dir=model_dir, max_new_tokens=5)
    out = enh.enhance("tok3 tok4")
    # model-backed rewrite returned (possibly empty -> falls back); either
    # way the torch loader must never have been touched
    assert enh._llm is None
    assert isinstance(out, str) and out


def test_qwen_expander_uses_jax_path(model_dir):
    exp = pe.QwenPromptExpander(model_dir=model_dir)
    out = exp.extend("tok5 tok6", seed=3)
    assert exp._model is None  # torch path untouched
    assert isinstance(out, str) and out


def test_enhancer_env_dir(model_dir, monkeypatch):
    monkeypatch.setenv("LTXV_TPU_ENHANCER_LLM_DIR", model_dir)
    enh = pe.PromptEnhancer(max_new_tokens=4)
    assert enh._load_jax_lm()
    assert enh._jax_lm is not None


def test_missing_dir_falls_back_gracefully(monkeypatch):
    monkeypatch.setenv("LTXV_TPU_ENHANCER_LLM_DIR", "/nonexistent/path")
    enh = pe.PromptEnhancer(max_new_tokens=4)
    assert not enh._load_jax_lm()
    # offline: torch loader also fails -> enhance returns prompt unchanged
    assert enh.enhance("tok1") == "tok1"


@pytest.fixture(scope="module")
def vl_model_dir(tmp_path_factory):
    """Tiny Qwen2.5-VL checkpoint dir in the published HF layout
    (model.visual.* + model.language_model.* naming)."""
    import torch
    from safetensors.torch import save_file

    from ltx_video_gpupoor_tpu.models import qwen25_vl as qvl

    d = tmp_path_factory.mktemp("qwen_vl_tiny")
    hf_cfg = {
        "architectures": ["Qwen2_5_VLForConditionalGeneration"],
        "vision_config": {
            "depth": 2, "hidden_size": 16, "intermediate_size": 24,
            "num_heads": 2, "in_channels": 3, "patch_size": 14,
            "spatial_merge_size": 2, "temporal_patch_size": 2,
            "window_size": 112, "out_hidden_size": 24,
            "fullatt_block_indexes": [1],
        },
        "text_config": {
            "vocab_size": 160, "hidden_size": 24, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 40, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
            "rope_scaling": {"rope_type": "default",
                             "mrope_section": [1, 1, 1]},
        },
        "image_token_id": 151, "video_token_id": 152,
        "vision_start_token_id": 150,
    }
    (d / "config.json").write_text(json.dumps(hf_cfg))
    cfg = qvl.config_from_hf(hf_cfg)
    key = jax.random.key(0)
    vparams = qvl.vision_init_params(key, cfg.vision)
    tparams = llm.init_params(jax.random.key(1), cfg.text)

    sd = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        sd[name] = torch.tensor(np.ascontiguousarray(a.T if transpose
                                                     else a))

    put("model.visual.patch_embed.proj.weight",
        np.asarray(vparams["patch_embed"]["kernel"]).T
        .reshape(cfg.vision.hidden_size, cfg.vision.in_channels,
                 cfg.vision.temporal_patch_size, cfg.vision.patch_size,
                 cfg.vision.patch_size))
    for i in range(cfg.vision.depth):
        pre = f"model.visual.blocks.{i}."
        bl = vparams["blocks"]
        put(pre + "norm1.weight", bl["norm1"]["weight"][i])
        put(pre + "norm2.weight", bl["norm2"]["weight"][i])
        put(pre + "attn.qkv.weight", bl["attn"]["qkv"]["kernel"][i], True)
        put(pre + "attn.qkv.bias", bl["attn"]["qkv"]["bias"][i])
        put(pre + "attn.proj.weight", bl["attn"]["proj"]["kernel"][i], True)
        put(pre + "attn.proj.bias", bl["attn"]["proj"]["bias"][i])
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            put(pre + f"mlp.{theirs}.weight",
                bl["mlp"][ours]["kernel"][i], True)
            put(pre + f"mlp.{theirs}.bias", bl["mlp"][ours]["bias"][i])
    put("model.visual.merger.ln_q.weight",
        vparams["merger"]["ln_q"]["weight"])
    put("model.visual.merger.mlp.0.weight",
        vparams["merger"]["fc1"]["kernel"], True)
    put("model.visual.merger.mlp.0.bias", vparams["merger"]["fc1"]["bias"])
    put("model.visual.merger.mlp.2.weight",
        vparams["merger"]["fc2"]["kernel"], True)
    put("model.visual.merger.mlp.2.bias", vparams["merger"]["fc2"]["bias"])

    for i in range(cfg.text.num_layers):
        pre = f"model.language_model.layers.{i}."
        bl = tparams["blocks"]
        put(pre + "input_layernorm.weight", bl["input_norm"]["weight"][i])
        put(pre + "post_attention_layernorm.weight",
            bl["post_norm"]["weight"][i])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "o_proj")):
            put(pre + f"self_attn.{theirs}.weight",
                bl["attn"][ours]["kernel"][i], True)
            if "bias" in bl["attn"][ours]:
                put(pre + f"self_attn.{theirs}.bias",
                    bl["attn"][ours]["bias"][i])
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            put(pre + f"mlp.{theirs}.weight",
                bl["mlp"][ours]["kernel"][i], True)
    put("model.language_model.embed_tokens.weight",
        tparams["token_embedding"])
    put("model.language_model.norm.weight", tparams["norm"]["weight"])
    save_file(sd, str(d / "model.safetensors"))

    # tokenizer whose vocab includes the vision special tokens
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers

    vocab = {f"tok{i}": i for i in range(149)}
    vocab.update({"<|vision_start|>": 150, "<|image_pad|>": 151,
                  "<|vision_end|>": 153, "<|im_start|>": 154,
                  "<|im_end|>": 155, "<|eos|>": 156, "<|unk|>": 157})
    tok = Tokenizer(tmodels.WordLevel(vocab, unk_token="<|unk|>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "<|eos|>", "unk_token": "<|unk|>",
    }))
    return str(d)


def test_vl_expander_uses_jax_path(vl_model_dir):
    """extend_with_img flows image -> native preprocess -> vision tower ->
    M-RoPE generate, never touching torch."""
    from PIL import Image

    from ltx_video_gpupoor_tpu.utils.prompt_enhance import (
        QwenVLPromptExpander,
    )

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (60, 90, 3)).astype(np.uint8))
    exp = QwenVLPromptExpander(model_dir=vl_model_dir)
    out = exp.extend_with_img("tok3 tok4", img, seed=1)
    assert exp._model is None  # torch path untouched
    assert isinstance(out, str) and out


@pytest.fixture(scope="module")
def florence_dir(tmp_path_factory):
    """Tiny Florence-2 checkpoint dir in the published HF layout."""
    import torch
    from safetensors.torch import save_file
    from transformers import Florence2ForConditionalGeneration
    from transformers import Florence2Config

    d = tmp_path_factory.mktemp("florence_tiny")
    hf_cfg = {
        "architectures": ["Florence2ForConditionalGeneration"],
        "vision_config": {
            "in_channels": 3, "depths": [1, 1], "patch_size": [3, 3],
            "patch_stride": [2, 2], "patch_padding": [1, 1],
            "patch_prenorm": [False, True], "embed_dim": [16, 32],
            "num_heads": [2, 4], "num_groups": [2, 4], "window_size": 4,
            "drop_path_rate": 0.0, "mlp_ratio": 2.0, "qkv_bias": True,
            "projection_dim": 24, "max_temporal_embeddings": 10,
            "max_position_embeddings": 64,
        },
        "text_config": {
            "vocab_size": 120, "d_model": 24, "encoder_layers": 1,
            "decoder_layers": 1, "encoder_attention_heads": 4,
            "decoder_attention_heads": 4, "encoder_ffn_dim": 40,
            "decoder_ffn_dim": 40, "activation_function": "gelu",
            "max_position_embeddings": 1024, "scale_embedding": False,
            "dropout": 0.0, "pad_token_id": 1, "bos_token_id": 0,
            "eos_token_id": 2, "decoder_start_token_id": 2,
            "forced_bos_token_id": 0, "is_encoder_decoder": True,
        },
        "image_token_id": 119,
    }
    (d / "config.json").write_text(json.dumps(hf_cfg))
    torch.manual_seed(0)
    model = Florence2ForConditionalGeneration(Florence2Config(
        vision_config=hf_cfg["vision_config"],
        text_config=hf_cfg["text_config"], image_token_id=119))
    # published checkpoints store the shared embedding once (encoder/
    # decoder embed_tokens and lm_head are tied aliases)
    drop = ("lm_head.weight",
            "model.language_model.encoder.embed_tokens.weight",
            "model.language_model.decoder.embed_tokens.weight")
    sd = {k: v.contiguous() for k, v in model.state_dict().items()
          if k not in drop}
    save_file(sd, str(d / "model.safetensors"))

    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers

    vocab = {f"tok{i}": i for i in range(3, 117)}
    vocab.update({"<s>": 0, "<pad>": 1, "</s>": 2, "<|unk|>": 117,
                  "<image>": 119})
    tok = Tokenizer(tmodels.WordLevel(vocab, unk_token="<|unk|>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "pad_token": "<pad>",
        "unk_token": "<|unk|>",
    }))
    return str(d)


def test_florence_captioner_jax_path(florence_dir):
    from PIL import Image

    from ltx_video_gpupoor_tpu.utils.prompt_enhance import (
        JaxFlorenceCaptioner,
    )

    cap = JaxFlorenceCaptioner.from_dir(florence_dir)
    cap.image_size = 16  # tiny tower for the smoke tier
    cap.max_new_tokens = 5
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (20, 30, 3))
                          .astype(np.uint8))
    out = cap.caption(img)
    assert isinstance(out, str)
    # deterministic greedy
    assert cap.caption(img) == out


def test_enhancer_i2v_uses_jax_captioner(florence_dir, model_dir):
    enh = pe.PromptEnhancer(llm_dir=model_dir,
                            captioner_dir=florence_dir, max_new_tokens=4)
    enh._load_jax_captioner()
    enh._jax_captioner.image_size = 16
    enh._jax_captioner.max_new_tokens = 4
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
    out = enh.enhance("tok3 tok4", first_frames=[frame])
    assert enh._llm is None and enh._caption_model is None
    assert isinstance(out, str) and out


def test_chat_lm_bucket_cache(model_dir):
    """Prompt lengths bucket to 64 tokens with one cached compiled
    program per bucket: a short and a long prompt produce exactly two
    cache entries, and repeating a length reuses its program."""
    lm = pe.JaxChatLM.from_dir(model_dir, max_new_tokens=3)
    lm.chat("tok1", "tok2 tok3", temperature=0.0)
    assert len(lm._gen_cache) == 1
    long_user = " ".join(f"tok{i % 80}" for i in range(70))
    lm.chat("tok1", long_user, temperature=0.0)
    assert len(lm._gen_cache) == 2  # second bucket (128)
    lm.chat("tok4", "tok5 tok6 tok7", temperature=0.0)
    assert len(lm._gen_cache) == 2  # reused the 64 bucket
