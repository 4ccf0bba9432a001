"""Native C++ safetensors loader tests: parity with the Python reader."""

import json
import time

import numpy as np
import pytest

from ltx_video_gpupoor_tpu.runtime.native_loader import (
    NativeSafetensors,
    load_safetensors_native,
)


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file
    import ml_dtypes

    path = str(tmp_path_factory.mktemp("ckpt") / "model.safetensors")
    rng = np.random.RandomState(0)
    tensors = {
        "layer.weight": rng.randn(64, 32).astype(np.float32),
        "layer.bias": rng.randn(32).astype(np.float32),
        "embed": rng.randn(10, 8).astype(np.float32).astype(ml_dtypes.bfloat16),
        "counts": rng.randint(0, 100, (5,)).astype(np.int8),
    }
    save_file(tensors, path, metadata={"config": json.dumps({"a": 1})})
    return path, tensors


def test_native_loader_parity(st_file):
    path, expected = st_file
    with NativeSafetensors(path) as f:
        assert set(f.keys()) == set(expected)
        for i, name in enumerate(f.keys()):
            got = f.tensor(i)
            want = expected[name]
            assert got.shape == want.shape
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(want, np.float32)
            )
        assert f.metadata() == {"config": json.dumps({"a": 1})}


def test_load_safetensors_native_api(st_file):
    path, expected = st_file
    tensors, config = load_safetensors_native(path)
    assert config == {"a": 1}
    np.testing.assert_array_equal(
        tensors["layer.weight"], expected["layer.weight"]
    )


def test_native_loader_missing_file():
    with pytest.raises(OSError):
        NativeSafetensors("/nonexistent/file.safetensors")


def test_native_loader_corrupt_file(tmp_path):
    bad = tmp_path / "bad.safetensors"
    bad.write_bytes(b"\xff" * 64)
    with pytest.raises(OSError):
        NativeSafetensors(str(bad))


def test_native_vs_python_reader_speed(st_file):
    """Smoke: native path loads a larger file correctly and quickly."""
    from safetensors.numpy import save_file
    import tempfile, os

    rng = np.random.RandomState(1)
    big = {f"w{i}": rng.randn(256, 256).astype(np.float32) for i in range(16)}
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "big.safetensors")
        save_file(big, p)
        t0 = time.time()
        tensors, _ = load_safetensors_native(p)
        native_t = time.time() - t0
        for k in big:
            np.testing.assert_array_equal(tensors[k], big[k])
        assert native_t < 5.0
