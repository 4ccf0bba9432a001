"""RoPE golden tests.

The Wan tables are compared against the reference implementation at
/root/reference/wan/modules/posemb_layers.py executed with torch on CPU —
a numerics oracle, not a code dependency.
"""

import importlib.util
import math
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from ltx_video_gpupoor_tpu.ops.rope import (
    apply_rotary_emb,
    identify_k,
    ltx_freqs_cis,
    rope_1d,
    wan_rope_freqs,
)


def _load_reference_posemb():
    spec = importlib.util.spec_from_file_location(
        "ref_posemb", "/root/reference/wan/modules/posemb_layers.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference_posemb()


def test_wan_rope_matches_reference(ref):
    import torch

    f, h, w = 5, 6, 7
    cos, sin = wan_rope_freqs((f, h, w))
    ref_cos, ref_sin = ref.get_nd_rotary_pos_embed(
        [44, 42, 42], (f, h, w), theta=10000, use_real=True, enable_riflex=False
    )
    np.testing.assert_allclose(np.asarray(cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), ref_sin.numpy(), atol=1e-5)


def test_wan_rope_riflex_matches_reference(ref):
    f, h, w = 66, 4, 4
    cos, sin = wan_rope_freqs((f, h, w), enable_riflex=True)
    ref_cos, ref_sin = ref.get_nd_rotary_pos_embed(
        [44, 42, 42], (f, h, w), theta=10000, use_real=True,
        enable_riflex=True, k=6, L_test=f,
    )
    np.testing.assert_allclose(np.asarray(cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), ref_sin.numpy(), atol=1e-5)


def test_identify_k_matches_reference(ref):
    assert identify_k(256, 16, 48) == tuple(ref.identify_k(256.0, 16, 48))


def test_apply_rotary_matches_reference(ref):
    import torch

    s, hd = 24, 44
    cos, sin = rope_1d(hd, np.arange(s))
    x = np.random.RandomState(0).randn(2, s, 4, hd).astype(np.float32)
    out = apply_rotary_emb(
        jnp.asarray(x), jnp.asarray(cos)[None, :, None, :],
        jnp.asarray(sin)[None, :, None, :],
    )
    tq = torch.from_numpy(x.copy())
    tcos, tsin = ref.get_1d_rotary_pos_embed(hd, torch.arange(s).float(), use_real=True)
    ref_q, _ = ref.apply_rotary_emb([tq, tq.clone()], (tcos, tsin), head_first=False)
    np.testing.assert_allclose(np.asarray(out), ref_q.numpy(), atol=1e-5)


def test_ltx_freqs_properties():
    # cos^2 + sin^2 == 1 everywhere; pad lanes (dim % 6) are identity
    b, s, dim = 1, 10, 64  # 64 % 6 = 4 pad lanes
    grid = jnp.stack(
        [
            jnp.arange(s, dtype=jnp.float32)[None, :],
            jnp.zeros((1, s)),
            jnp.ones((1, s)),
        ],
        axis=1,
    )  # [B, 3, S]
    cos, sin = ltx_freqs_cis(grid, dim, max_pos=(20, 2048, 2048))
    assert cos.shape == (b, s, dim)
    np.testing.assert_allclose(
        np.asarray(cos) ** 2 + np.asarray(sin) ** 2, 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(cos[..., :4]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[..., :4]), 0.0)
    # rotation preserves norm
    x = jnp.ones((b, s, dim))
    out = apply_rotary_emb(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_ltx_freqs_exp_spacing_against_formula():
    # direct check of the exp-spacing formula on a tiny case
    dim, theta = 12, 10000.0
    grid = jnp.array([[[2.0], [100.0], [200.0]]])  # B=1, 3 axes, S=1
    cos, sin = ltx_freqs_cis(grid, dim, theta=theta, max_pos=(20, 2048, 2048))
    frac = np.array([2.0 / 20, 100.0 / 2048, 200.0 / 2048])
    indices = theta ** np.linspace(0, 1, dim // 6) * math.pi / 2
    freqs = (indices[:, None] * (frac[None, :] * 2 - 1)).reshape(-1)
    # atol 2e-3: the top frequency's angle is ~theta*pi/2 ~ 1.6e4 rad, where
    # one fp32 ulp is ~1e-3 rad — torch's own fp32 tables differ from the
    # exact formula by the same amount (below bf16 resolution).
    np.testing.assert_allclose(
        np.asarray(cos)[0, 0], np.repeat(np.cos(freqs), 2), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sin)[0, 0], np.repeat(np.sin(freqs), 2), atol=2e-3
    )
