"""Golden tests for the decoder-only LLM family (models/llm.py) against
torch ``transformers``' Llama / Qwen2 implementations instantiated from
tiny RANDOM configs (no downloads — config-only construction), the same
classes the reference drives via AutoModelForCausalLM
(prompt_enhance_utils.py, prompt_extend.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ltx_video_gpupoor_tpu.models import llm  # noqa: E402

pytestmark = pytest.mark.golden


def _tiny_cfg(qwen=False, rope_scaling=None, tie=True):
    return llm.LLMConfig(
        vocab_size=96, dim=32, num_layers=2, num_heads=4, num_kv_heads=2,
        ffn_dim=64, rope_theta=10000.0, rms_eps=1e-6, qkv_bias=qwen,
        tie_embeddings=tie, rope_scaling=rope_scaling,
        rope_original_max_pos=16,
    )


def _torch_model(cfg, qwen=False):
    if qwen:
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf_cfg = Qwen2Config(
            vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            intermediate_size=cfg.ffn_dim, rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_eps, tie_word_embeddings=cfg.tie_embeddings,
            attention_dropout=0.0,
        )
        model = Qwen2ForCausalLM(hf_cfg)
    else:
        from transformers import LlamaConfig, LlamaForCausalLM

        kw = {}
        if cfg.rope_scaling == "llama3":
            kw["rope_scaling"] = {
                "rope_type": "llama3", "factor": cfg.rope_factor,
                "low_freq_factor": cfg.rope_low_freq_factor,
                "high_freq_factor": cfg.rope_high_freq_factor,
                "original_max_position_embeddings":
                    cfg.rope_original_max_pos,
            }
        hf_cfg = LlamaConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            intermediate_size=cfg.ffn_dim, rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_eps, tie_word_embeddings=cfg.tie_embeddings,
            attention_dropout=0.0, attention_bias=False, mlp_bias=False,
            **kw,
        )
        model = LlamaForCausalLM(hf_cfg)
    torch.manual_seed(0)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
    model.eval().float()
    return model


def _params_from_torch(model, cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        llm.convert_hf_state_dict(sd, cfg),
    )


@pytest.mark.parametrize("qwen", [False, True], ids=["llama", "qwen2"])
def test_forward_matches_transformers(qwen):
    cfg = _tiny_cfg(qwen=qwen, rope_scaling=None if qwen else "llama3")
    model = _torch_model(cfg, qwen=qwen)
    params = _params_from_torch(model, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 11)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ours = np.asarray(llm.forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_forward_left_padded_matches_transformers():
    """Left-padded batch rows (the generate() input convention) match the
    HF attention-mask + position-id semantics on the real rows."""
    cfg = _tiny_cfg()
    model = _torch_model(cfg)
    params = _params_from_torch(model, cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, cfg.vocab_size, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    ids[1, :3] = 0
    mask[1, :3] = 0
    with torch.no_grad():
        ref = model(
            torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(llm.forward(params, cfg, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    # padded positions are garbage by contract; compare real rows only
    np.testing.assert_allclose(ours[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[1, 3:], ref[1, 3:], rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("qwen", [False, True], ids=["llama", "qwen2"])
def test_greedy_generate_matches_transformers(qwen):
    cfg = _tiny_cfg(qwen=qwen)
    model = _torch_model(cfg, qwen=qwen)
    params = _params_from_torch(model, cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, cfg.vocab_size, (2, 7)).astype(np.int32)
    mask = np.ones_like(ids)
    ids[0, :2] = 0
    mask[0, :2] = 0
    n_new = 8
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            max_new_tokens=n_new, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None, use_cache=True,
        ).numpy()[:, ids.shape[1]:]
    ours = np.asarray(llm.generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), n_new))
    np.testing.assert_array_equal(ours, ref)


def test_generate_eos_fills_and_jits():
    """EOS handling: after a row hits EOS it keeps emitting EOS; the whole
    generate call compiles as one program."""
    cfg = _tiny_cfg()
    key = jax.random.key(0)
    params = llm.init_params(key, cfg)
    ids = jnp.ones((1, 4), jnp.int32)
    mask = jnp.ones_like(ids)
    gen = jax.jit(
        lambda p, i, m: llm.generate(p, cfg, i, m, 6, eos_ids=(3,))
    )
    toks = np.asarray(gen(params, ids, mask))
    assert toks.shape == (1, 6)
    hits = np.where(toks[0] == 3)[0]
    if hits.size and hits[0] < 5:
        assert (toks[0, hits[0]:] == 3).all()


def test_config_from_hf_llama32():
    """The published Llama-3.2-3B-Instruct config.json fields map onto
    the shipped LLAMA_3_2_3B constant."""
    hf = {
        "architectures": ["LlamaForCausalLM"], "vocab_size": 128256,
        "hidden_size": 3072, "num_hidden_layers": 28,
        "num_attention_heads": 24, "num_key_value_heads": 8,
        "intermediate_size": 8192, "rope_theta": 500000.0,
        "rms_norm_eps": 1e-5, "tie_word_embeddings": True,
        "rope_scaling": {
            "rope_type": "llama3", "factor": 32.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    }
    assert llm.config_from_hf(hf) == llm.LLAMA_3_2_3B


def test_load_hf_dir_roundtrip(tmp_path):
    """A HF-layout directory (config.json + safetensors in the published
    naming) loads through the native safetensors loader into a forward
    that matches transformers."""
    import json

    from safetensors.torch import save_file

    cfg = _tiny_cfg(qwen=True)
    model = _torch_model(cfg, qwen=True)
    # published tied-embedding checkpoints omit lm_head.weight
    sd = {k: v.contiguous() for k, v in model.state_dict().items()
          if k != "lm_head.weight"}
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["Qwen2ForCausalLM"], "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim, "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "intermediate_size": cfg.ffn_dim, "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps, "tie_word_embeddings": True,
    }))
    lcfg, params = llm.load_hf_dir(str(tmp_path))
    assert lcfg.qkv_bias and lcfg.num_layers == cfg.num_layers
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    ours = np.asarray(llm.forward(params, lcfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.smoke
def test_full_size_configs_param_counts():
    """The shipped full-size constants describe the published models:
    parameter counts come out at ~3.2B (Llama-3.2-3B) and ~3.1B
    (Qwen2.5-3B) via eval_shape — no memory allocated."""
    import jax

    def count(cfg):
        tree = jax.eval_shape(lambda k: llm.init_params(k, cfg),
                              jax.ShapeDtypeStruct((2,), np.uint32))
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    n_llama = count(llm.LLAMA_3_2_3B)
    n_qwen = count(llm.QWEN_2_5_3B)
    assert 3.1e9 < n_llama < 3.4e9, n_llama
    assert 3.0e9 < n_qwen < 3.2e9, n_qwen
