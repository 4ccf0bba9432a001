"""Qwen-VL vision preprocessing parity tests.

Parity target: ``/root/reference/wan/utils/qwen_vl_utils.py`` — the
smart-resize bounds, frame-count budgeting, image/video fetch, and
``process_vision_info``. Goldens pinned from an offline run of the
reference formulas (2026-08-18).
"""

import base64
import io

import numpy as np
import pytest
from PIL import Image

from ltx_video_gpupoor_tpu.utils import qwen_vl


def test_smart_resize_pinned_goldens():
    cases = {
        (480, 704): (476, 700),
        (37, 53): (56, 84),           # min-pixels upscale path
        (4000, 6000): (2912, 4368),   # max-pixels downscale path
        (28, 28): (56, 56),
        (1080, 1920): (1092, 1932),
    }
    for (h, w), want in cases.items():
        assert qwen_vl.smart_resize(h, w) == want, (h, w)
    # the reference VL processor's pixel budget (prompt_extend.py:340)
    assert qwen_vl.smart_resize(
        480, 704, min_pixels=256 * 28 * 28, max_pixels=1280 * 28 * 28
    ) == (476, 700)
    # video budget path
    assert qwen_vl.smart_resize(
        720, 1280, min_pixels=128 * 28 * 28, max_pixels=768 * 28 * 28
    ) == (560, 1008)
    with pytest.raises(ValueError):
        qwen_vl.smart_resize(1, 250)  # aspect ratio > 200


def test_smart_nframes_pinned_goldens():
    assert qwen_vl.smart_nframes({}, total_frames=120, video_fps=30.0) == 8
    assert qwen_vl.smart_nframes({"nframes": 9}, 120, 30.0) == 8
    assert qwen_vl.smart_nframes({"fps": 6}, 300, 30.0) == 60
    assert qwen_vl.smart_nframes({}, 3, 30.0) == 2  # min clamp to factor
    with pytest.raises(AssertionError):
        qwen_vl.smart_nframes({"fps": 2, "nframes": 4}, 120, 30.0)
    with pytest.raises(ValueError):
        qwen_vl.smart_nframes({"nframes": 300}, 120, 30.0)  # > total


def test_fetch_image_forms(tmp_path):
    img = Image.fromarray(
        (np.random.rand(37, 53, 3) * 255).astype(np.uint8)
    )
    # PIL form: resized to the min-pixels smart bound (56, 84)
    out = qwen_vl.fetch_image({"image": img})
    assert out.size == (84, 56)  # PIL size is (w, h)
    # path + file:// forms
    p = tmp_path / "x.png"
    img.save(p)
    assert qwen_vl.fetch_image({"image": str(p)}).size == (84, 56)
    assert qwen_vl.fetch_image({"image": f"file://{p}"}).size == (84, 56)
    # data: URI form (the server's base64 request schema)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    assert qwen_vl.fetch_image({"image": uri}).size == (84, 56)
    # explicit resized_* override wins
    out = qwen_vl.fetch_image(
        {"image": img, "resized_height": 56, "resized_width": 56}
    )
    assert out.size == (56, 56)


def test_fetch_video_from_path(monkeypatch):
    # 12 frames of 64x96 -> nframes = 12/30*2 -> min clamp 4;
    # smart bound for 64x96 at video budgets upscales to 364x546
    frames = (np.random.rand(12, 64, 96, 3) * 255).astype(np.uint8)
    monkeypatch.setattr(
        "ltx_video_gpupoor_tpu.utils.media.load_video",
        lambda path: frames.astype(np.float32) / 127.5 - 1.0,
    )
    out = qwen_vl.fetch_video({"video": "fake.mp4", "video_fps": 30.0})
    assert out.dtype == np.float32
    assert out.shape[0] == 4
    h, w = out.shape[1:3]
    assert h % 28 == 0 and w % 28 == 0
    assert h * w >= qwen_vl.VIDEO_MIN_PIXELS


def test_fetch_video_from_image_list():
    imgs = [
        Image.fromarray((np.random.rand(37, 53, 3) * 255).astype(np.uint8))
        for _ in range(3)
    ]
    out = qwen_vl.fetch_video({"video": imgs})
    # padded to a FRAME_FACTOR multiple by repeating the last frame
    assert len(out) == 4
    assert out[-1] is out[-2]
    assert all(im.size == (84, 56) for im in out)


def test_process_vision_info_walks_conversation():
    img = Image.fromarray(np.zeros((37, 53, 3), np.uint8))
    messages = [
        {"role": "system", "content": [{"type": "text", "text": "sys"}]},
        {"role": "user", "content": [
            {"type": "image", "image": img},
            {"type": "text", "text": "a cat"},
        ]},
    ]
    images, videos = qwen_vl.process_vision_info(messages)
    assert videos is None
    assert len(images) == 1 and images[0].size == (84, 56)
