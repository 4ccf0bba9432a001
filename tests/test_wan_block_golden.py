"""Golden test: our Wan block vs the reference ``WanAttentionBlock``
(``wan/modules/model.py``) executed with torch on CPU (externals stubbed;
the block logic under test is the reference's own)."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ltx_video_gpupoor_tpu.models.wan.model import WanConfig, block_forward
from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs


def _load_reference_model():
    src = open("/root/reference/wan/modules/model.py").read()
    for line in [
        "import torch.cuda.amp as amp",
        "from diffusers.configuration_utils import ConfigMixin, register_to_config",
        "from diffusers.models.modeling_utils import ModelMixin",
        "from mmgp import offload",
        "from .attention import pay_attention",
        "from torch.backends.cuda import sdp_kernel",
        "from wan.modules.posemb_layers import apply_rotary_emb",
    ]:
        src = src.replace(line, "")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_posemb_g", "/root/reference/wan/modules/posemb_layers.py"
    )
    posemb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(posemb)

    def pay_attention(qkv_list, **kw):
        q, k, v = qkv_list  # [b, s, h, d]
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        )
        return out.transpose(1, 2)

    ns = {
        "ConfigMixin": object,
        "register_to_config": lambda f: f,
        "ModelMixin": torch.nn.Module,
        "offload": types.SimpleNamespace(shared_state={}),
        "pay_attention": pay_attention,
        "sdp_kernel": None,
        "apply_rotary_emb": posemb.apply_rotary_emb,
    }
    exec(compile(src, "ref_wan_model.py", "exec"), ns)

    # The reference WanRMSNorm computes ``y = x.float(); y.pow_(2)`` — when
    # x is ALREADY fp32, ``x.float()`` aliases x and the in-place pow
    # corrupts it (x ends up as x^2 * rsqrt(...)). In production the model
    # runs bf16 where ``.float()`` copies and the class is a clean RMS
    # norm. Run the oracle with the non-aliasing equivalent.
    def _rms_forward(self, x):
        # callers rely on the in-place mutation (``self.norm_q(q)`` with no
        # assignment, model.py:190-194) — copy the result back into x
        y = torch.rsqrt(
            x.detach().clone().float().pow(2).mean(dim=-1, keepdim=True)
            + self.eps
        )
        x.copy_((x.float() * y * self.weight.float()).to(x.dtype))
        return x

    ns["WanRMSNorm"].forward = _rms_forward
    return ns


def test_wan_block_matches_reference():
    ns = _load_reference_model()
    cfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=6, in_dim=4,
        dim=32, ffn_dim=64, freq_dim=16, text_dim=16, out_dim=4,
        num_heads=2, num_layers=1,
    )
    d = cfg.dim
    torch.manual_seed(0)
    ref = ns["WanAttentionBlock"](
        "t2v_cross_attn", d, cfg.ffn_dim, cfg.num_heads,
        qk_norm=True, cross_attn_norm=True, eps=1e-6,
    ).eval().float()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(prefix):
        return {
            "kernel": jnp.asarray(sd[prefix + ".weight"].T),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    p = {
        "modulation": jnp.asarray(sd["modulation"]),
        "self_attn": {
            "q": lin("self_attn.q"), "k": lin("self_attn.k"),
            "v": lin("self_attn.v"), "o": lin("self_attn.o"),
            "norm_q": {"weight": jnp.asarray(sd["self_attn.norm_q.weight"])},
            "norm_k": {"weight": jnp.asarray(sd["self_attn.norm_k.weight"])},
        },
        "cross_attn": {
            "q": lin("cross_attn.q"), "k": lin("cross_attn.k"),
            "v": lin("cross_attn.v"), "o": lin("cross_attn.o"),
            "norm_q": {"weight": jnp.asarray(sd["cross_attn.norm_q.weight"])},
            "norm_k": {"weight": jnp.asarray(sd["cross_attn.norm_k.weight"])},
        },
        "norm3": {
            "weight": jnp.asarray(sd["norm3.weight"]),
            "bias": jnp.asarray(sd["norm3.bias"]),
        },
        "ffn": {"fc1": lin("ffn.0"), "fc2": lin("ffn.2")},
    }

    rng = np.random.RandomState(0)
    b = 1
    f, h, w = 2, 2, 2
    s = f * h * w
    x = rng.randn(b, s, d).astype(np.float32)
    ctx = rng.randn(b, cfg.text_len, d).astype(np.float32)
    e = rng.randn(1, 6, d).astype(np.float32) * 0.1

    head_dim = d // cfg.num_heads
    cos, sin = wan_rope_freqs((f, h, w), head_dim=head_dim)

    # reference freqs: complex [S, head_dim//2]
    ref_freqs = ns["__builtins__"] and None
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_posemb_g2", "/root/reference/wan/modules/posemb_layers.py"
    )
    posemb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(posemb)
    tcos, tsin = posemb.get_nd_rotary_pos_embed(
        list(posemb.__dict__ and __import__(
            "ltx_video_gpupoor_tpu.ops.rope", fromlist=["default_rope_dims"]
        ).default_rope_dims(head_dim)),
        (f, h, w), theta=10000, use_real=True, enable_riflex=False,
    )

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.copy()),
            e=torch.from_numpy(e.copy()),
            grid_sizes=(f, h, w),
            freqs=(tcos, tsin),
            context=torch.from_numpy(ctx.copy()),
        ).numpy()

    e0 = jnp.asarray(e)[None, :, :, :].reshape(b, 1, 6, d)
    out = block_forward(
        p, cfg, jnp.asarray(x), e0, (cos, sin), jnp.asarray(ctx),
        jnp.ones((b, cfg.text_len), jnp.int32), attn_mode="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out, atol=3e-4, rtol=3e-4
    )


def test_wan_model_full_forward_matches_reference():
    """Whole-model golden: patch embed, time/text embeddings, blocks, head,
    unpatchify — against the reference WanModel."""
    ns = _load_reference_model()
    cfg = WanConfig(
        model_type="t2v", patch_size=(1, 2, 2), text_len=6, in_dim=4,
        dim=32, ffn_dim=64, freq_dim=16, text_dim=16, out_dim=4,
        num_heads=2, num_layers=2,
    )
    torch.manual_seed(1)
    ref = ns["WanModel"](
        model_type="t2v", patch_size=(1, 2, 2), text_len=cfg.text_len,
        in_dim=cfg.in_dim, dim=cfg.dim, ffn_dim=cfg.ffn_dim,
        freq_dim=cfg.freq_dim, text_dim=cfg.text_dim, out_dim=cfg.out_dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        window_size=(-1, -1), qk_norm=True, cross_attn_norm=True, eps=1e-6,
    ).eval().float()
    ref.enable_teacache = False
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from ltx_video_gpupoor_tpu.core.checkpoint import convert_wan_model
    from ltx_video_gpupoor_tpu.models.wan.model import forward as wan_forward

    params = convert_wan_model(sd, cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    f, h, w = 3, 4, 4
    x = rng.randn(1, cfg.in_dim, f, h, w).astype(np.float32)  # [B,C,F,H,W]
    t_val = 500.0
    ctx_len = 5
    ctx = rng.randn(ctx_len, cfg.text_dim).astype(np.float32)

    head_dim = cfg.dim // cfg.num_heads
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pp3", "/root/reference/wan/modules/posemb_layers.py"
    )
    pp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pp)
    from ltx_video_gpupoor_tpu.ops.rope import default_rope_dims

    tcos, tsin = pp.get_nd_rotary_pos_embed(
        list(default_rope_dims(head_dim)),
        (f, h // 2, w // 2), theta=10000, use_real=True, enable_riflex=False,
    )

    pipeline = types.SimpleNamespace(_interrupt=False)
    with torch.no_grad():
        ref_out = ref(
            [torch.from_numpy(x[0].copy())],  # list of [C,F,H,W]
            t=torch.tensor([t_val]),
            context=[torch.from_numpy(ctx.copy())],
            freqs=(tcos, tsin),
            pipeline=pipeline,
        )[0].numpy()  # [C_out, F, H, W]

    # ours: channels-last video, zero-padded text to text_len
    xv = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    ctx_padded = np.zeros((1, cfg.text_len, cfg.text_dim), np.float32)
    ctx_padded[0, :ctx_len] = ctx
    cmask = jnp.ones((1, cfg.text_len), jnp.int32)  # ref attends pad too
    from ltx_video_gpupoor_tpu.ops.rope import wan_rope_freqs

    freqs = wan_rope_freqs((f, h // 2, w // 2), head_dim=head_dim)
    out, _ = wan_forward(
        params, cfg, xv, jnp.full((1,), t_val), jnp.asarray(ctx_padded),
        cmask, freqs, attn_mode="xla",
    )
    out_t = np.transpose(np.asarray(out)[0], (3, 0, 1, 2))
    np.testing.assert_allclose(out_t, ref_out, atol=5e-4, rtol=5e-4)
