"""ctypes bindings for the native host codecs in ``native/``.

The reference leans on C++ for stream (de)compression — squish decode at
NetKinectArray.cpp:620, threaded fastdxt encode via DXTCompressor.h:16-48 —
because per-frame DXT work at 4x1280x1080 is a real CPU cost next to a 30 fps
budget. This is the TPU-host equivalent: a small threaded C++ decoder
(native/dxt.cpp) built with the repo Makefile and loaded via ctypes. The
numpy path in io/dxt.py stays as the always-available fallback and the
correctness oracle (the two are bit-identical by construction).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "librgbd_native.so")

_lib = None
_load_failed = False


def _load():
    """Load (building on first use) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        for name in ("rgbd_decode_dxt1", "rgbd_decode_dxt5"):
            fn = getattr(lib, name)
            fn.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            fn.restype = None
        _lib = lib
        return lib
    except Exception:
        _load_failed = True
        return None


def available() -> bool:
    return _load() is not None


def _decode(fn_name: str, block_bytes: int, data, width: int, height: int,
            num_threads: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native codec unavailable (see available())"
    raw = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) \
        else np.ascontiguousarray(data, dtype=np.uint8)
    n_bytes = (width // 4) * (height // 4) * block_bytes
    assert raw.size >= n_bytes, f"payload {raw.size} < expected {n_bytes}"
    out = np.empty((height, width, 3), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    getattr(lib, fn_name)(
        raw.ctypes.data_as(u8p), out.ctypes.data_as(u8p), width, height,
        num_threads,
    )
    return out


def decode_dxt1(data, width: int, height: int, num_threads: int = 0) -> np.ndarray:
    """DXT1 payload -> u8[height, width, 3] (native threaded decoder)."""
    return _decode("rgbd_decode_dxt1", 8, data, width, height, num_threads)


def decode_dxt5(data, width: int, height: int, num_threads: int = 0) -> np.ndarray:
    """DXT5 payload -> u8[height, width, 3], alpha dropped (native decoder)."""
    return _decode("rgbd_decode_dxt5", 16, data, width, height, num_threads)


def best_decoder(kind: str):
    """Preferred decoder for ``kind`` in {"dxt1", "dxt5"}: native if loadable,
    else the numpy oracle. Returns f(data, width, height) -> u8[H, W, 3]."""
    from . import dxt as _dxt

    if available():
        return {"dxt1": decode_dxt1, "dxt5": decode_dxt5}[kind]
    return {"dxt1": _dxt.decode_dxt1, "dxt5": _dxt.decode_dxt5}[kind]
