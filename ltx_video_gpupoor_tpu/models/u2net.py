"""U2-Net salient-object detection, TPU-native (the rembg model).

Parity target: the reference's background removal imports ``rembg``
(``/root/reference/wan/utils/utils.py:15,74-79``), whose default
session runs U2-Net (Qin et al., "U2-Net: Going Deeper with Nested
U-Structure for Salient Object Detection") through onnxruntime on the
host. Here the same network is pure JAX: nested RSU encoder/decoder
blocks, inference-folded batch norms, bilinear skip upsampling, side
outputs fused by a 1x1 conv — so the salience pass runs on the
accelerator and ``utils.video_ops.remove_background`` needs neither
rembg nor onnxruntime when a converted checkpoint is available.

Weights convert from the official ``u2net.pth`` / ``u2netp.pth`` naming
(xuebinqin/U-2-Net ``model/u2net.py``): ``stage1.rebnconvin.conv_s1.*``,
``stage5d.rebnconv2d.bn_s1.*``, ``side1.*``, ``outconv.*`` — see
:func:`convert_torch_state_dict`. BN folds into a per-channel
scale/shift at conversion (exact at inference).

TPU-first notes: everything is NHWC so convs lower straight to XLA's
native layout; max-pools are ``lax.reduce_window`` with ceil-mode
padding; the whole forward jits as one program per input size (the
rembg pipeline always resizes to 320x320, so there is exactly one)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class U2NetConfig:
    # (height, in_ch, mid_ch, out_ch, dilated) per encoder stage;
    # decoder mirrors it
    full: bool = True

    @property
    def stages(self):
        if self.full:
            enc = [(7, 3, 32, 64, False), (6, 64, 32, 128, False),
                   (5, 128, 64, 256, False), (4, 256, 128, 512, False),
                   (4, 512, 256, 512, True), (4, 512, 256, 512, True)]
            dec = [(4, 1024, 256, 512, True), (4, 1024, 128, 256, False),
                   (5, 512, 64, 128, False), (6, 256, 32, 64, False),
                   (7, 128, 16, 64, False)]
        else:  # u2netp
            enc = [(7, 3, 16, 64, False), (6, 64, 16, 64, False),
                   (5, 64, 16, 64, False), (4, 64, 16, 64, False),
                   (4, 64, 16, 64, True), (4, 64, 16, 64, True)]
            dec = [(4, 128, 16, 64, True), (4, 128, 16, 64, False),
                   (5, 128, 16, 64, False), (6, 128, 16, 64, False),
                   (7, 128, 16, 64, False)]
        return enc, dec


U2NET = U2NetConfig(full=True)
U2NETP = U2NetConfig(full=False)


def _conv(p, x, dilation=1):
    """3x3 same conv + folded-BN scale/shift + ReLU (REBNCONV)."""
    d = dilation
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1), padding=((d, d), (d, d)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y * p["scale"] + p["shift"])


def _pool(x):
    """2x2 stride-2 max pool, ceil_mode (torch MaxPool2d ceil_mode=True)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % 2, (-w) % 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, ph), (0, pw), (0, 0)))


def _up_to(x, ref):
    """Bilinear resize to ref's spatial size (F.interpolate
    align_corners=False ~ jax.image half-pixel bilinear)."""
    b, h, w, c = ref.shape
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


def _rsu(p, x, height, dilated):
    """One RSU block. ``p`` holds rebnconvin, rebnconv1..H, rebnconv(H-1)d
    ..rebnconv1d (official naming kept as tree keys)."""
    hxin = _conv(p["rebnconvin"], x)
    if dilated:  # RSU4F: dilation doubles each level, no pooling
        hs = [hxin]
        for i in range(1, height + 1):
            hs.append(_conv(p[f"rebnconv{i}"], hs[-1], dilation=2 ** (i - 1)))
        hx = hs[-1]
        for i in range(height - 1, 0, -1):
            hx = _conv(p[f"rebnconv{i}d"], jnp.concatenate([hx, hs[i]], -1),
                       dilation=2 ** (i - 1))
        return hx + hxin
    hs = [hxin]
    hx = _conv(p["rebnconv1"], hxin)
    hs.append(hx)
    for i in range(2, height):
        hx = _conv(p[f"rebnconv{i}"], _pool(hx))
        hs.append(hx)
    hx = _conv(p[f"rebnconv{height}"], hx, dilation=2)  # bottom, no pool
    for i in range(height - 1, 0, -1):
        hx = _conv(p[f"rebnconv{i}d"], jnp.concatenate([hx, hs[i]], -1))
        if i > 1:
            hx = _up_to(hx, hs[i - 1])
    return hx + hxin


def forward(params: dict, cfg: U2NetConfig, x: jax.Array) -> jax.Array:
    """[B, H, W, 3] (normalized) -> [B, H, W, 1] salience in [0, 1]
    (sigmoid of the fused d0 side output — what rembg thresholds)."""
    enc, dec = cfg.stages
    hxs = []
    hx = x
    for i, (height, _, _, _, dil) in enumerate(enc):
        hx = _rsu(params[f"stage{i + 1}"], hx, height, dil)
        hxs.append(hx)
        if i < 5:
            hx = _pool(hx)
    # decoder
    d_in = _up_to(hxs[5], hxs[4])
    outs = [hxs[5]]  # stage6 output feeds side6
    for i, (height, _, _, _, dil) in enumerate(dec):
        stage = 5 - i  # 5d, 4d, 3d, 2d, 1d
        hx = _rsu(params[f"stage{stage}d"],
                  jnp.concatenate([d_in, hxs[stage - 1]], -1), height, dil)
        outs.append(hx)
        if stage > 1:
            d_in = _up_to(hx, hxs[stage - 2])
    # side outputs (1-channel 3x3 convs), all upsampled to full res
    ref = outs[-1]
    sides = []
    for i in range(1, 7):
        src = outs[6 - i]  # side1 <- stage1d ... side6 <- stage6
        p = params[f"side{i}"]
        d = jax.lax.conv_general_dilated(
            src, p["kernel"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        sides.append(_up_to(d, ref) if src is not ref else d)
    fused = jax.lax.conv_general_dilated(
        jnp.concatenate(sides, -1), params["outconv"]["kernel"], (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["outconv"]["bias"]
    return jax.nn.sigmoid(fused)


# ---------------------------------------------------------------------------
# init + conversion
# ---------------------------------------------------------------------------

def _init_rebnconv(key, cin, cout):
    return {
        "kernel": jax.random.normal(key, (3, 3, cin, cout)) *
        (9 * cin) ** -0.5,
        "scale": jnp.ones((cout,)),
        "shift": jnp.zeros((cout,)),
    }


def _init_rsu(key, height, cin, cmid, cout, dilated):
    ks = iter(jax.random.split(key, 2 * height + 2))
    p = {"rebnconvin": _init_rebnconv(next(ks), cin, cout)}
    p["rebnconv1"] = _init_rebnconv(next(ks), cout, cmid)
    for i in range(2, height + 1):
        p[f"rebnconv{i}"] = _init_rebnconv(next(ks), cmid, cmid)
    for i in range(height - 1, 1, -1):
        p[f"rebnconv{i}d"] = _init_rebnconv(next(ks), 2 * cmid, cmid)
    p["rebnconv1d"] = _init_rebnconv(next(ks), 2 * cmid, cout)
    return p


def init_params(key: jax.Array, cfg: U2NetConfig) -> dict:
    enc, dec = cfg.stages
    ks = iter(jax.random.split(key, 20))
    params = {}
    side_ch = []
    for i, (h, cin, cmid, cout, dil) in enumerate(enc):
        params[f"stage{i + 1}"] = _init_rsu(next(ks), h, cin, cmid, cout,
                                            dil)
    side_ch.append(enc[5][3])
    for i, (h, cin, cmid, cout, dil) in enumerate(dec):
        params[f"stage{5 - i}d"] = _init_rsu(next(ks), h, cin, cmid, cout,
                                             dil)
        side_ch.append(cout)
    side_ch = side_ch[::-1]  # side1..6 channel counts
    for i in range(1, 7):
        k = next(ks)
        params[f"side{i}"] = {
            "kernel": jax.random.normal(k, (3, 3, side_ch[i - 1], 1)) * 0.02,
            "bias": jnp.zeros((1,)),
        }
    params["outconv"] = {
        "kernel": jax.random.normal(next(ks), (1, 1, 6, 1)) * 0.1,
        "bias": jnp.zeros((1,)),
    }
    return params


def convert_torch_state_dict(sd: dict, cfg: U2NetConfig,
                             eps: float = 1e-5) -> dict:
    """Official ``u2net.pth``/``u2netp.pth`` naming -> param tree, with
    each REBNCONV's BN folded into a per-channel scale/shift:
    ``y = conv(x) * scale + shift`` where ``scale = gamma/sqrt(var+eps)``
    and ``shift = beta - mean*scale`` (exact at inference)."""
    def g(name):
        return np.asarray(sd[name])

    def rebnconv(pre):
        gamma = g(pre + "bn_s1.weight")
        beta = g(pre + "bn_s1.bias")
        mean = g(pre + "bn_s1.running_mean")
        var = g(pre + "bn_s1.running_var")
        scale = gamma / np.sqrt(var + eps)
        kernel = g(pre + "conv_s1.weight").transpose(2, 3, 1, 0)
        bias = g(pre + "conv_s1.bias")
        return {
            "kernel": jnp.asarray(kernel),
            "scale": jnp.asarray(scale),
            # conv bias rides through the BN fold with the input mean
            "shift": jnp.asarray(beta + (bias - mean) * scale),
        }

    enc, dec = cfg.stages
    params = {}

    def rsu(name, height):
        p = {"rebnconvin": rebnconv(f"{name}.rebnconvin.")}
        for i in range(1, height + 1):
            p[f"rebnconv{i}"] = rebnconv(f"{name}.rebnconv{i}.")
        for i in range(height - 1, 0, -1):
            p[f"rebnconv{i}d"] = rebnconv(f"{name}.rebnconv{i}d.")
        return p

    for i, (h, *_rest) in enumerate(enc):
        params[f"stage{i + 1}"] = rsu(f"stage{i + 1}", h)
    for i, (h, *_rest) in enumerate(dec):
        params[f"stage{5 - i}d"] = rsu(f"stage{5 - i}d", h)
    for i in range(1, 7):
        params[f"side{i}"] = {
            "kernel": jnp.asarray(
                g(f"side{i}.weight").transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(g(f"side{i}.bias")),
        }
    params["outconv"] = {
        "kernel": jnp.asarray(g("outconv.weight").transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(g("outconv.bias")),
    }
    return params


# ---------------------------------------------------------------------------
# rembg-equivalent pipeline
# ---------------------------------------------------------------------------

_SALIENCE_SIZE = 320  # rembg's U2-Net input resolution


def salience_map(params: dict, cfg: U2NetConfig,
                 image: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8 -> [H, W] float32 alpha in [0, 1] — the rembg
    predict pipeline: resize to 320, per-image max-normalize, channel
    stats, forward, min-max rescale, resize back."""
    from PIL import Image

    h, w = image.shape[:2]
    pil = Image.fromarray(image).convert("RGB").resize(
        (_SALIENCE_SIZE, _SALIENCE_SIZE), Image.Resampling.LANCZOS)
    arr = np.asarray(pil, np.float32)
    arr = arr / max(arr.max(), 1e-6)
    arr = (arr - np.asarray((0.485, 0.456, 0.406))) \
        / np.asarray((0.229, 0.224, 0.225))
    pred = np.asarray(_jit_forward(cfg)(
        params, jnp.asarray(arr[None], jnp.float32))[0, :, :, 0])
    pred = (pred - pred.min()) / max(pred.max() - pred.min(), 1e-6)
    out = Image.fromarray((pred * 255).astype(np.uint8)).resize(
        (w, h), Image.Resampling.LANCZOS)
    return np.asarray(out, np.float32) / 255.0


_FWD_CACHE: dict = {}


def _jit_forward(cfg: U2NetConfig):
    fn = _FWD_CACHE.get(cfg.full)
    if fn is None:
        fn = jax.jit(lambda p, x: forward(p, cfg, x))
        _FWD_CACHE[cfg.full] = fn
    return fn


def load_torch_checkpoint(path: str, cfg: U2NetConfig = U2NET):
    """Load the official ``u2net.pth`` (torch pickle) or a safetensors
    export of it."""
    if path.endswith(".safetensors"):
        from ..core.checkpoint import load_safetensors

        sd, _ = load_safetensors(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu",
                         weights_only=True).items()}
    return convert_torch_state_dict(sd, cfg)
