"""Serving warmup plumbing (serving/warmup.py)."""

import threading
import time

import jax.numpy as jnp
import numpy as np

from ltx_video_gpupoor_tpu.serving import model_zoo
from ltx_video_gpupoor_tpu.serving.warmup import (
    parse_buckets,
    start_background_warmup,
    warmup_shapes,
)


def test_parse_buckets():
    assert parse_buckets("default") == [(704, 480, 121)]
    assert parse_buckets("704x480x121,512x512x57") == [
        (704, 480, 121), (512, 512, 57),
    ]
    assert parse_buckets("off") == []
    assert parse_buckets("") == []
    assert parse_buckets("0") == []


def test_warmup_runs_generation_for_bucket():
    model = model_zoo.build_demo_model()
    elapsed = warmup_shapes(model.generator, [(64, 64, 9)])
    assert elapsed > 0
    # after warmup a real request at the same shape reuses the programs
    emb = jnp.zeros((2, 16, 32), jnp.bfloat16)
    mask = jnp.ones((2, 16), jnp.int32)
    frames = model.generator.generate(
        emb, mask, height=64, width=64, frame_num=9, sampling_steps=2,
        seed=1,
    )
    assert isinstance(frames, np.ndarray) and frames.shape[0] == 9


def test_warmup_blocks_on_generation_lock():
    """The background warmup must serialize behind the server's
    generation lock: while a live request holds it, warmup waits."""
    model = model_zoo.build_demo_model()
    lock = threading.Lock()
    with lock:  # a "live request" in flight
        th = start_background_warmup(
            model.generator, spec="64x64x9", lock=lock
        )
        assert th is not None
        time.sleep(1.0)
        assert th.is_alive()  # parked on the lock, not generating
    th.join(timeout=300)
    assert not th.is_alive()


def test_warmup_spec_off_disables():
    model = model_zoo.build_demo_model()
    assert start_background_warmup(model.generator, spec="off") is None


def test_warmup_matches_serving_output_type(monkeypatch):
    """Warmup must compile the SAME program set the live server runs:
    output_type follows the server's native-codec probe (yuv420 when the
    codec is available), not the pixels default."""
    from types import SimpleNamespace

    from ltx_video_gpupoor_tpu.utils import native_codec

    calls = []

    class FakeGen:
        pipeline = SimpleNamespace(
            transformer_cfg=SimpleNamespace(caption_channels=32),
            t5_params=None,
        )

        def generate(self, *a, **kw):
            calls.append(kw)

    monkeypatch.setattr(native_codec, "available", lambda: True)
    warmup_shapes(FakeGen(), [(64, 64, 9)])
    assert calls and calls[-1]["output_type"] == "yuv420"

    monkeypatch.setattr(native_codec, "available", lambda: False)
    warmup_shapes(FakeGen(), [(64, 64, 9)])
    assert calls[-1]["output_type"] == "pixels"


def test_warmup_survives_bad_bucket():
    model = model_zoo.build_demo_model()
    # 0 frames is invalid; warmup logs and continues instead of raising
    elapsed = warmup_shapes(model.generator, [(64, 63, 0)])
    assert elapsed >= 0
