"""Native host-pipeline components (C++, built on first use).

``decode_jpeg_batch(paths, out_h, out_w, mean, std, scale, threads)``
decodes a list of JPEGs with libjpeg, bilinear-resizes and normalises
them in one multithreaded C++ pass — the hot host path for frame
datasets (SSv2/EK/Charades). Falls back to None if the toolchain or
libjpeg is unavailable; callers keep the PIL path as fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "decode.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_decode.so")


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            _SRC, "-o", _SO, "-ljpeg", "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.decode_jpeg_batch.restype = ctypes.c_int
    lib.decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_int,
    ]
    lib.decode_jpeg_batch_u8.restype = ctypes.c_int
    lib.decode_jpeg_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int,
    ]
    lib.jpeg_dims.restype = ctypes.c_int
    lib.jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _TRIED:
            try:
                _LIB = _build()
            except Exception:  # noqa: BLE001 — PIL fallback covers this
                _LIB = None
            _TRIED = True
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def _warn_decode_failures(failures: int, n: int, paths) -> None:
    import logging

    logging.getLogger(__name__).warning(
        "native decode: %d/%d JPEGs failed (clip head: %s); falling back "
        "to the retrying PIL path for this clip", failures, n,
        paths[0] if paths else "?",
    )


def jpeg_dims(path: str):
    lib = _get_lib()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


def decode_jpeg_batch(
    paths,
    out_h: int,
    out_w: int,
    mean=(0.0, 0.0, 0.0),
    std=(1.0, 1.0, 1.0),
    scale: float = 1.0 / 255.0,
    num_threads: int = 4,
) -> Optional[np.ndarray]:
    """Returns [len(paths), out_h, out_w, 3] float32, or None if the
    native library is unavailable OR any file fails to decode (the
    caller then falls back to ``retry_load_images``, matching the slow
    path's retry semantics instead of shipping black frames)."""
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean_a = (ctypes.c_float * 3)(*map(float, mean))
    std_a = (ctypes.c_float * 3)(*map(float, std))
    failures = lib.decode_jpeg_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mean_a, std_a, ctypes.c_float(scale), num_threads,
    )
    if failures:
        _warn_decode_failures(failures, n, paths)
        return None
    return out


def decode_jpeg_batch_u8(
    paths,
    out_h: int,
    out_w: int,
    num_threads: int = 4,
    dct_scale: bool = False,
) -> Optional[np.ndarray]:
    """Decode + bilinear-resize to [len(paths), out_h, out_w, 3] uint8
    (no normalisation — the device-preprocess graph applies it on the
    TPU). ``dct_scale`` permits libjpeg DCT-scaled decode (faster, but
    an area-average-then-bilinear filter instead of pure bilinear).
    Returns None if the native library is unavailable OR any file fails
    to decode (the caller falls back to ``retry_load_images`` so decode
    failures retry instead of silently becoming black frames)."""
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.decode_jpeg_batch_u8(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads, int(dct_scale),
    )
    if failures:
        _warn_decode_failures(failures, n, paths)
        return None
    return out
