"""Native libavcodec/libx264 shim (runtime/h264_codec.cpp) and its wiring
into the media utils — the h264 CRF conditioning round-trip
(``/root/reference/ltx_video/pipelines/crf_compressor.py:34-50``) must run
through a REAL h264 codec in this image, not the JPEG approximation."""

import os

import numpy as np
import pytest

from ltx_video_gpupoor_tpu.utils import media, native_codec


def _smooth_image(h=128, w=128):
    x = np.linspace(0, 1, w)
    y = np.linspace(0, 1, h)
    img = (np.outer(np.sin(y * 9), np.cos(x * 7))[..., None] * 110 + 128)
    return np.repeat(img, 3, axis=2).astype(np.uint8)


def test_native_codec_available_in_image():
    # The image ships libavcodec.so.59 with the libx264 encoder + g++;
    # the shim must build and load here (VERDICT r1 item 8).
    assert native_codec.available()


def test_crf_roundtrip_is_lossy_but_close():
    img = _smooth_image()
    out = native_codec.crf_roundtrip(img, crf=29)
    assert out is not None and out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int)).astype(float)
    assert 0.01 < diff.mean() < 12.0  # compressed, not garbage


def test_crf_compress_uses_native_h264(monkeypatch):
    img = _smooth_image().astype(np.float32) / 255.0
    called = {}
    real = native_codec.crf_roundtrip

    def spy(arr, crf=29):
        called["crf"] = crf
        return real(arr, crf)

    monkeypatch.setattr(native_codec, "crf_roundtrip", spy)
    out = media.crf_compress(img, crf=29)
    assert called.get("crf") == 29  # native path ran, not the JPEG fallback
    assert out.shape == img.shape and out.dtype == np.float32


def test_write_read_mp4_h264(tmp_path):
    img = _smooth_image(96, 112)
    frames = np.stack([np.roll(img, 3 * i, axis=1) for i in range(9)])
    path = str(tmp_path / "clip.mp4")
    assert native_codec.write_mp4(path, frames, fps=30.0, crf=18)
    raw = open(path, "rb").read()
    assert b"avc1" in raw[:4096]  # h264 sample entry in the moov/stbl
    back = native_codec.read_video(path)
    assert back is not None and back.shape == frames.shape
    diff = np.abs(back.astype(int) - frames.astype(int)).mean()
    assert diff < 6.0


def _to_yuv_planes(frames_rgb_u8):
    """Reference BT.601 limited-range RGB->YUV420 on host (mirrors the
    orchestrator's device conversion)."""
    rgb = frames_rgb_u8.astype(np.float32) / 255.0
    m = np.array(
        [[65.481, -37.797, 112.0],
         [128.553, -74.203, -93.786],
         [24.966, 112.0, -18.214]], np.float32,
    )
    yuv = rgb @ m + np.array([16.0, 128.0, 128.0], np.float32)
    y = np.clip(np.round(yuv[..., 0]), 0, 255).astype(np.uint8)
    f, h, w = y.shape
    c = yuv[..., 1:].reshape(f, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    c = np.clip(np.round(c), 0, 255).astype(np.uint8)
    return y, c[..., 0], c[..., 1]


def test_write_mp4_yuv_matches_rgb_path(tmp_path):
    # The planar-YUV420 writer (the serving path's half-bandwidth fetch)
    # must produce a clip that decodes close to the RGB-input path.
    img = _smooth_image(96, 112)
    frames = np.stack([np.roll(img, 3 * i, axis=1) for i in range(9)])
    y, u, v = _to_yuv_planes(frames)
    path = str(tmp_path / "clip_yuv.mp4")
    assert native_codec.write_mp4_yuv(path, y, u, v, fps=30.0, crf=18)
    back = native_codec.read_video(path)
    assert back is not None and back.shape == frames.shape
    diff = np.abs(back.astype(int) - frames.astype(int)).mean()
    assert diff < 6.0


def test_device_rgb_to_yuv420_matches_host_reference():
    from ltx_video_gpupoor_tpu.serving.orchestrator import _rgb_to_yuv420

    img = _smooth_image(64, 96)
    frames = np.stack([img] * 3)
    y_ref, u_ref, v_ref = _to_yuv_planes(frames)
    fdev = frames.astype(np.float32) / 127.5 - 1.0
    y, u, v = (np.asarray(a) for a in _rgb_to_yuv420(fdev))
    assert y.shape == y_ref.shape and u.shape == u_ref.shape
    # round-to-nearest ties may differ by 1 code
    assert np.abs(y.astype(int) - y_ref.astype(int)).max() <= 1
    assert np.abs(u.astype(int) - u_ref.astype(int)).max() <= 1
    assert np.abs(v.astype(int) - v_ref.astype(int)).max() <= 1


def test_save_video_accepts_yuv_tuple(tmp_path):
    img = _smooth_image(64, 64)
    frames = np.stack([img] * 5)
    planes = _to_yuv_planes(frames)
    path = str(tmp_path / "out_yuv.mp4")
    assert media.save_video(planes, path) == path
    raw = open(path, "rb").read()
    assert b"avc1" in raw[:4096]
    back = native_codec.read_video(path)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 6.0


def test_yuv420_to_rgb_inverse():
    img = _smooth_image(64, 64)
    frames = np.stack([img] * 2)
    back = media.yuv420_to_rgb(*_to_yuv_planes(frames))
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 4.0


def test_save_video_and_load_video_roundtrip(tmp_path):
    img = _smooth_image(64, 64)
    frames = np.stack([img] * 5).astype(np.float32) / 127.5 - 1.0
    path = str(tmp_path / "out.mp4")
    assert media.save_video(frames, path) == path
    assert os.path.getsize(path) > 0
    raw = open(path, "rb").read()
    assert b"avc1" in raw[:4096]  # wrote h264, not mp4v
    back = media.load_video(path)
    assert back.shape == frames.shape
    assert np.abs(back - frames).mean() < 0.1
