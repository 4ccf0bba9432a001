"""Tests for the closed-form alpha matting refinement
(utils/matting.py) — the rembg ``alpha_matting=True`` step the
reference enables (wan/utils/utils.py:74-79), implemented with
numpy/scipy."""

import numpy as np
import pytest

from ltx_video_gpupoor_tpu.utils import matting

pytestmark = pytest.mark.smoke


def _disc_scene(h=160, w=160, r=40, soft=8, seed=0):
    """A colored disc on a contrasting background, with a salience map
    whose soft edge is deliberately OFFSET from the image edge."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    dist = np.sqrt((yy - h / 2.0) ** 2 + (xx - w / 2.0) ** 2)
    img = np.where((dist < r)[..., None], [200, 60, 60],
                   [30, 30, 180]).astype(float)
    img = np.clip(img + rng.normal(0, 4, img.shape), 0, 255) \
        .astype(np.uint8)
    alpha = np.clip((r + soft / 2.0 + 3 - dist) / soft, 0, 1)
    return img, alpha, dist


def test_trimap_thresholds_and_erosion():
    alpha = np.array([[0.0, 0.5, 1.0], [0.02, 0.96, 0.98],
                      [0.0, 0.0, 1.0]])
    tri = matting.build_trimap(alpha, erode_size=0)
    assert tri[0, 0] == 0.0 and tri[0, 2] == 1.0 and tri[0, 1] == 0.5
    # erosion shrinks the certain regions into the unknown band
    tri_e = matting.build_trimap(alpha, erode_size=1)
    assert (tri_e == 0.5).sum() >= (tri == 0.5).sum()


def test_refine_snaps_alpha_to_image_edge():
    """The solved matte follows the IMAGE edge, not the salience's
    offset midpoint — the whole point of the refinement."""
    img, alpha, dist = _disc_scene()
    refined = matting.refine_alpha(img, alpha, erode_size=1)
    assert refined.shape == alpha.shape
    assert refined.min() >= 0.0 and refined.max() <= 1.0
    # certain regions preserved
    assert refined[dist < 20].min() > 0.9
    assert refined[dist > 70].max() < 0.1
    # the 0.5 crossing moved from the salience midpoint (~r+5) to the
    # image edge (r=40)
    h, w = alpha.shape
    ray = refined[h // 2, w // 2:]
    cross = int(np.argmax(ray < 0.5))
    assert 36 <= cross <= 44, cross


def test_all_known_trimap_short_circuits():
    img = np.zeros((8, 8, 3), np.uint8)
    alpha = np.concatenate([np.ones((8, 4)), np.zeros((8, 4))], axis=1)
    out = matting.refine_alpha(img, alpha, erode_size=0)
    np.testing.assert_allclose(out, alpha)


def test_remove_background_applies_matting(tmp_path, monkeypatch):
    """The native rembg path routes through the refinement (and the
    opt-out env skips it)."""
    import torch
    from safetensors.torch import save_file

    from ltx_video_gpupoor_tpu.models import u2net
    from ltx_video_gpupoor_tpu.utils import video_ops
    from tests.test_u2net_golden import _models

    model, _ = _models(u2net.U2NETP)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()
          if "num_batches_tracked" not in k}
    p = tmp_path / "u2netp.safetensors"
    save_file(sd, str(p))
    monkeypatch.setenv("LTXV_TPU_U2NET_PATH", str(p))
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (40, 44, 3)).astype(np.uint8)

    video_ops._u2net_cache.clear()
    monkeypatch.setenv("LTXV_TPU_REMBG_MATTING", "0")
    raw = video_ops.remove_background([img])[0]
    video_ops._u2net_cache.clear()
    monkeypatch.setenv("LTXV_TPU_REMBG_MATTING", "1")
    refined = video_ops.remove_background([img])[0]
    assert raw.shape == refined.shape == img.shape
    # both are valid composites; with random weights the refinement
    # usually changes the matte, but equality is not an error — only
    # shape/dtype and that both paths ran
    assert raw.dtype == refined.dtype == np.uint8
