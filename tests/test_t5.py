"""T5 encoder golden test vs the reference implementation
(/root/reference/wan/modules/t5.py) executed with torch on CPU."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest
import torch

from ltx_video_gpupoor_tpu.models import t5 as jt5


def _load_ref_t5():
    src = open("/root/reference/wan/modules/t5.py").read()
    src = src.replace("from .tokenizers import HuggingfaceTokenizer", "")
    # default arg evaluated at exec time on a CUDA-less box
    src = src.replace("torch.cuda.current_device()", "'cpu'")
    ns = {}
    exec(compile(src, "ref_t5.py", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref():
    return _load_ref_t5()


def _tiny(shared_pos):
    return jt5.T5Config(
        vocab_size=50, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
        num_layers=2, num_buckets=8, shared_pos=shared_pos,
    )


def _torch_encoder(ref, cfg):
    torch.manual_seed(0)
    enc = ref["T5Encoder"](
        vocab=cfg.vocab_size, dim=cfg.dim, dim_attn=cfg.dim_attn,
        dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
        shared_pos=cfg.shared_pos, dropout=0.0,
    ).eval().float()
    return enc


def _port_params(enc, cfg):
    """torch state dict -> our param tree."""
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    blocks = []
    for i in range(cfg.num_layers):
        p = {
            "norm1": {"weight": sd[f"blocks.{i}.norm1.weight"]},
            "attn": {
                "q": {"kernel": sd[f"blocks.{i}.attn.q.weight"].T},
                "k": {"kernel": sd[f"blocks.{i}.attn.k.weight"].T},
                "v": {"kernel": sd[f"blocks.{i}.attn.v.weight"].T},
                "o": {"kernel": sd[f"blocks.{i}.attn.o.weight"].T},
            },
            "norm2": {"weight": sd[f"blocks.{i}.norm2.weight"]},
            "ffn": {
                "gate": {"kernel": sd[f"blocks.{i}.ffn.gate.0.weight"].T},
                "fc1": {"kernel": sd[f"blocks.{i}.ffn.fc1.weight"].T},
                "fc2": {"kernel": sd[f"blocks.{i}.ffn.fc2.weight"].T},
            },
        }
        if not cfg.shared_pos:
            p["pos_embedding"] = sd[f"blocks.{i}.pos_embedding.embedding.weight"]
        blocks.append(p)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "blocks": stacked,
        "norm": {"weight": jnp.asarray(sd["norm.weight"])},
    }
    if cfg.shared_pos:
        params["pos_embedding"] = jnp.asarray(
            sd["pos_embedding.embedding.weight"]
        )
    return params


@pytest.mark.parametrize("shared_pos", [False, True])
def test_t5_encoder_matches_reference(ref, shared_pos):
    cfg = _tiny(shared_pos)
    enc = _torch_encoder(ref, cfg)
    params = _port_params(enc, cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0
    mask[1, 5:] = 0

    with torch.no_grad():
        ref_out = enc(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
    out = np.asarray(
        jt5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    # compare only unmasked positions
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(
            out[b, :n], ref_out[b, :n], atol=2e-4, rtol=2e-4
        )


def test_bucket_function_matches_reference(ref):
    emb = ref["T5RelativeEmbedding"](8, 4, bidirectional=True)
    rel = torch.arange(16)[None, :] - torch.arange(16)[:, None]
    ref_buckets = emb._relative_position_bucket(rel).numpy()
    mine = np.asarray(
        jt5.relative_position_bucket(
            jnp.asarray(rel.numpy()), num_buckets=8, max_dist=128
        )
    )
    np.testing.assert_array_equal(mine, ref_buckets)
