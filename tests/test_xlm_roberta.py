"""XLM-Roberta text tower golden test vs the reference (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ltx_video_gpupoor_tpu.models.wan import xlm_roberta as jxlm


def _load_ref():
    src = open("/root/reference/wan/modules/xlm_roberta.py").read()
    ns = {}
    exec(compile(src, "ref_xlm.py", "exec"), ns)
    return ns


CFG = jxlm.XLMRobertaConfig(
    vocab_size=50, max_seq_len=32, type_size=1, pad_id=1,
    dim=32, num_heads=2, num_layers=2, post_norm=True,
)


def test_xlm_roberta_matches_reference():
    ns = _load_ref()
    torch.manual_seed(0)
    ref = ns["XLMRoberta"](
        vocab_size=CFG.vocab_size, max_seq_len=CFG.max_seq_len,
        type_size=1, pad_id=1, dim=CFG.dim, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, post_norm=True, dropout=0.0,
    ).eval().float()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    def lin(prefix):
        return {
            "kernel": jnp.asarray(sd[prefix + ".weight"].T),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    def norm(prefix):
        return {
            "weight": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    blocks = []
    for i in range(CFG.num_layers):
        pre = f"blocks.{i}"
        blocks.append({
            "attn": {l: lin(f"{pre}.attn.{l}") for l in "qkvo"},
            "norm1": norm(pre + ".norm1"),
            "ffn": {"fc1": lin(pre + ".ffn.0"), "fc2": lin(pre + ".ffn.2")},
            "norm2": norm(pre + ".norm2"),
        })
    params = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "type_embedding": jnp.asarray(sd["type_embedding.weight"]),
        "pos_embedding": jnp.asarray(sd["pos_embedding.weight"]),
        "norm": norm("norm"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 50, (2, 10))
    ids[0, 7:] = 1  # padding
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).numpy()
    out = np.asarray(jxlm.encode(params, CFG, jnp.asarray(ids)))
    # compare non-pad positions
    np.testing.assert_allclose(out[1], ref_out[1], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(out[0, :7], ref_out[0, :7], atol=2e-4,
                               rtol=2e-4)


def test_head_variant_shapes():
    cfg = jxlm.XLMRobertaConfig(
        vocab_size=50, max_seq_len=32, dim=32, num_heads=2, num_layers=1,
        head_out_dim=16,
    )
    params = jxlm.init_params(jax.random.key(0), cfg)
    ids = jnp.asarray([[5, 6, 7, 1, 1]])
    out = jxlm.encode_with_head(params, cfg, ids)
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()
