"""ctypes bindings for the native mmap safetensors loader
(``runtime/safetensors_loader.cpp``).

Zero-copy: tensor payloads are numpy views into the file mapping; a
parallel page-prefetch warms the mapping before ``jax.device_put`` streams
it to HBM. Falls back to the Python safetensors reader when the shared
library cannot be built (no compiler in the runtime image).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional

import numpy as np

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_SO_PATH = os.path.join(_RUNTIME_DIR, "libst_loader.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16_dtype():
    import ml_dtypes

    return ml_dtypes.bfloat16


def _build_library() -> Optional[str]:
    src = os.path.join(_RUNTIME_DIR, "safetensors_loader.cpp")
    if not os.path.isfile(src):
        return None
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", src,
             "-o", _SO_PATH, "-lpthread"],
            check=True, capture_output=True,
        )
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


_lib = None
_lib_tried = False


def _get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True  # never re-run the g++ attempt per call
    path = _SO_PATH
    src = os.path.join(_RUNTIME_DIR, "safetensors_loader.cpp")
    stale = (
        os.path.isfile(path) and os.path.isfile(src)
        and os.path.getmtime(src) > os.path.getmtime(path)
    )
    if not os.path.isfile(path) or stale:
        # rebuild when the source is newer than the checked-in .so —
        # otherwise a fix to the C++ silently keeps loading stale code
        path = _build_library() or (path if os.path.isfile(path) else None)
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_error.restype = ctypes.c_char_p
    lib.st_num_tensors.restype = ctypes.c_int64
    lib.st_num_tensors.argtypes = [ctypes.c_void_p]
    lib.st_tensor_name.restype = ctypes.c_char_p
    lib.st_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_dtype.restype = ctypes.c_char_p
    lib.st_tensor_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_ndim.restype = ctypes.c_int
    lib.st_tensor_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_shape.restype = None
    lib.st_tensor_shape.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    ]
    lib.st_tensor_data.restype = ctypes.c_void_p
    lib.st_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_nbytes.restype = ctypes.c_int64
    lib.st_tensor_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_metadata.restype = ctypes.c_char_p
    lib.st_metadata.argtypes = [ctypes.c_void_p]
    lib.st_prefetch.restype = None
    lib.st_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.st_close.restype = None
    lib.st_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeSafetensors:
    """Zero-copy view over a safetensors file via the native loader."""

    def __init__(self, path: str, prefetch_threads: int = 8):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        self._h = lib.st_open(path.encode())
        if not self._h:
            raise OSError(
                f"st_open failed: {lib.st_error().decode()}"
            )
        if prefetch_threads:
            lib.st_prefetch(self._h, prefetch_threads)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._h:
            self._lib.st_close(self._h)
            self._h = None

    def keys(self) -> list[str]:
        n = self._lib.st_num_tensors(self._h)
        return [
            self._lib.st_tensor_name(self._h, i).decode() for i in range(n)
        ]

    def metadata(self) -> dict:
        raw = self._lib.st_metadata(self._h).decode()
        if not raw:
            return {}
        try:
            return json.loads(raw)
        except json.JSONDecodeError:
            return {}

    def tensor(self, index: int) -> np.ndarray:
        """Zero-copy numpy view (valid until close())."""
        lib, h = self._lib, self._h
        dtype_s = lib.st_tensor_dtype(h, index).decode()
        ndim = lib.st_tensor_ndim(h, index)
        shape = (ctypes.c_int64 * max(ndim, 1))()
        lib.st_tensor_shape(h, index, shape)
        shape = tuple(shape[i] for i in range(ndim))
        nbytes = lib.st_tensor_nbytes(h, index)
        ptr = lib.st_tensor_data(h, index)
        buf = (ctypes.c_char * nbytes).from_address(ptr)
        if dtype_s == "BF16":
            dtype = _bf16_dtype()
        else:
            dtype = _DTYPES[dtype_s]
        arr = np.frombuffer(buf, dtype=dtype).reshape(shape)
        # the backing mmap is PROT_READ: an in-place write through a
        # writeable-flagged view would SIGSEGV instead of raising
        arr.flags.writeable = False
        return arr

    def as_dict(self, copy: bool = True) -> dict[str, np.ndarray]:
        out = {}
        for i, name in enumerate(self.keys()):
            arr = self.tensor(i)
            out[name] = arr.copy() if copy else arr
        return out


def load_safetensors_native(
    path: str, prefetch_threads: int = 8
) -> tuple[dict[str, np.ndarray], dict]:
    """Drop-in analogue of ``core.checkpoint.load_safetensors`` backed by
    the native loader; falls back to the Python reader if unavailable."""
    try:
        with NativeSafetensors(path, prefetch_threads) as f:
            tensors = f.as_dict(copy=True)
            meta = f.metadata()
    except Exception:
        # ANY native-path failure falls back (the docstring's contract):
        # unsupported dtypes raise KeyError, corrupt shapes ValueError —
        # the Python safetensors reader handles cases this one doesn't
        from ..core.checkpoint import load_safetensors

        return load_safetensors(path)
    config = {}
    if "config" in meta:
        try:
            config = json.loads(meta["config"])
        except (json.JSONDecodeError, TypeError):
            config = meta["config"] if isinstance(meta["config"], dict) else {}
    return tensors, config
