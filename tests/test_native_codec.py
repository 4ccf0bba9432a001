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
