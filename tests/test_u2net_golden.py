"""Golden tests for the U2-Net implementation (models/u2net.py) against
a torch replica of the official architecture (xuebinqin/U-2-Net
``model/u2net.py`` — the network rembg runs for the reference's
background removal, wan/utils/utils.py:74-79). The replica uses the
official module names, so its state dict exercises the same
``convert_torch_state_dict`` path a real ``u2net.pth`` would."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from ltx_video_gpupoor_tpu.models import u2net  # noqa: E402

pytestmark = pytest.mark.golden


class REBNCONV(nn.Module):
    def __init__(self, cin=3, cout=3, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(cin, cout, 3, padding=dirate,
                                 dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(cout)
        self.relu_s1 = nn.ReLU(inplace=False)

    def forward(self, x):
        return self.relu_s1(self.bn_s1(self.conv_s1(x)))


def _up(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear",
                         align_corners=False)


class RSU(nn.Module):
    """Official RSU-L (pooling variant)."""

    def __init__(self, height, cin, cmid, cout):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(cin, cout)
        self.rebnconv1 = REBNCONV(cout, cmid)
        for i in range(2, height):
            setattr(self, f"pool{i - 1}",
                    nn.MaxPool2d(2, stride=2, ceil_mode=True))
            setattr(self, f"rebnconv{i}", REBNCONV(cmid, cmid))
        setattr(self, f"rebnconv{height}", REBNCONV(cmid, cmid, dirate=2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(2 * cmid, cmid))
        self.rebnconv1d = REBNCONV(2 * cmid, cout)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hs = [hxin, self.rebnconv1(hxin)]
        hx = hs[-1]
        for i in range(2, self.height):
            hx = getattr(self, f"rebnconv{i}")(
                getattr(self, f"pool{i - 1}")(hx))
            hs.append(hx)
        hx = getattr(self, f"rebnconv{self.height}")(hx)
        for i in range(self.height - 1, 0, -1):
            hx = getattr(self, f"rebnconv{i}d")(
                torch.cat((hx, hs[i]), 1))
            if i > 1:
                hx = _up(hx, hs[i - 1])
        return hx + hxin


class RSU4F(nn.Module):
    def __init__(self, cin, cmid, cout):
        super().__init__()
        self.rebnconvin = REBNCONV(cin, cout)
        self.rebnconv1 = REBNCONV(cout, cmid, 1)
        self.rebnconv2 = REBNCONV(cmid, cmid, 2)
        self.rebnconv3 = REBNCONV(cmid, cmid, 4)
        self.rebnconv4 = REBNCONV(cmid, cmid, 8)
        self.rebnconv3d = REBNCONV(2 * cmid, cmid, 4)
        self.rebnconv2d = REBNCONV(2 * cmid, cmid, 2)
        self.rebnconv1d = REBNCONV(2 * cmid, cout, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat((hx4, hx3), 1))
        hx2d = self.rebnconv2d(torch.cat((hx3d, hx2), 1))
        hx1d = self.rebnconv1d(torch.cat((hx2d, hx1), 1))
        return hx1d + hxin


class U2NET(nn.Module):
    """Official U2NET/U2NETP composition, parameterized by the same
    stage table the JAX config uses."""

    def __init__(self, cfg):
        super().__init__()
        enc, dec = cfg.stages
        for i, (h, cin, cmid, cout, dil) in enumerate(enc):
            blk = RSU4F(cin, cmid, cout) if dil else RSU(h, cin, cmid, cout)
            setattr(self, f"stage{i + 1}", blk)
        for i, (h, cin, cmid, cout, dil) in enumerate(dec):
            blk = RSU4F(cin, cmid, cout) if dil else RSU(h, cin, cmid, cout)
            setattr(self, f"stage{5 - i}d", blk)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        side_ch = [dec[4][3], dec[3][3], dec[2][3], dec[1][3],
                   dec[0][3], enc[5][3]]
        for i in range(1, 7):
            setattr(self, f"side{i}",
                    nn.Conv2d(side_ch[i - 1], 1, 3, padding=1))
        self.outconv = nn.Conv2d(6, 1, 1)

    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(self.pool(hx1))
        hx3 = self.stage3(self.pool(hx2))
        hx4 = self.stage4(self.pool(hx3))
        hx5 = self.stage5(self.pool(hx4))
        hx6 = self.stage6(self.pool(hx5))
        hx6up = _up(hx6, hx5)
        hx5d = self.stage5d(torch.cat((hx6up, hx5), 1))
        hx4d = self.stage4d(torch.cat((_up(hx5d, hx4), hx4), 1))
        hx3d = self.stage3d(torch.cat((_up(hx4d, hx3), hx3), 1))
        hx2d = self.stage2d(torch.cat((_up(hx3d, hx2), hx2), 1))
        hx1d = self.stage1d(torch.cat((_up(hx2d, hx1), hx1), 1))
        d1 = self.side1(hx1d)
        d2 = _up(self.side2(hx2d), d1)
        d3 = _up(self.side3(hx3d), d1)
        d4 = _up(self.side4(hx4d), d1)
        d5 = _up(self.side5(hx5d), d1)
        d6 = _up(self.side6(hx6), d1)
        d0 = self.outconv(torch.cat((d1, d2, d3, d4, d5, d6), 1))
        return torch.sigmoid(d0)


def _models(cfg):
    torch.manual_seed(0)
    model = U2NET(cfg)
    # randomize BN stats so the fold is actually exercised
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.5)
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = u2net.convert_torch_state_dict(sd, cfg)
    return model, params


@pytest.mark.parametrize("size", [(64, 64), (36, 44)],
                         ids=["even", "odd-ceilmode"])
def test_u2netp_matches_torch_replica(size):
    cfg = u2net.U2NETP
    model, params = _models(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, *size)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(x)).numpy()
    ours = np.asarray(u2net.forward(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), ref, rtol=2e-4, atol=2e-4)


def test_u2net_full_config_shapes():
    """The full-size config builds and the converted tree matches the
    official u2net.pth parameter inventory (no forward — 44M params)."""
    cfg = u2net.U2NET
    import jax

    tree = jax.eval_shape(lambda k: u2net.init_params(k, cfg),
                          jax.ShapeDtypeStruct((2,), np.uint32))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
    # official U2-Net: ~44.0M parameters (convs + folded BN scale/shift)
    assert 43e6 < n < 45.5e6, n


def test_salience_pipeline_shapes():
    cfg = u2net.U2NETP
    import jax

    params = u2net.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 52, 3)).astype(np.uint8)
    alpha = u2net.salience_map(params, cfg, img)
    assert alpha.shape == (40, 52)
    assert 0.0 <= alpha.min() and alpha.max() <= 1.0


@pytest.mark.smoke
def test_remove_background_native_path(tmp_path, monkeypatch):
    """remove_background routes through the native U2-Net when
    LTXV_TPU_U2NET_PATH is set (safetensors export of the official
    naming), compositing onto white like the reference's rembg call."""
    from safetensors.torch import save_file

    from ltx_video_gpupoor_tpu.utils import video_ops

    cfg = u2net.U2NETP
    model, _ = _models(cfg)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()
          if "num_batches_tracked" not in k}
    p = tmp_path / "u2netp.safetensors"
    save_file(sd, str(p))
    monkeypatch.setenv("LTXV_TPU_U2NET_PATH", str(p))
    video_ops._u2net_cache.clear()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)
    out = video_ops.remove_background([img])
    assert len(out) == 1 and out[0].shape == img.shape
    assert out[0].dtype == np.uint8
    # random weights still produce a non-degenerate composite
    assert not np.array_equal(out[0], img)
