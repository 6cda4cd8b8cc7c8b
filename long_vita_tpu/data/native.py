"""ctypes bindings for the native preprocessing feedworker.

Auto-builds native/liblvpreprocess.so on first use (g++, no deps); falls
back to the PIL path in image_processor.py when unavailable. See
native/preprocess.cpp for semantics (PIL-compatible antialiased bicubic).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblvpreprocess.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception as e:  # noqa: BLE001
                logger.warning("native preprocess build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native preprocess load failed: %s", e)
            return None
        lib.preprocess_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.preprocess_frames_u8.argtypes = lib.preprocess_frames.argtypes
        lib.crop_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def preprocess_frames(
    frames: np.ndarray,  # uint8 [N, H, W, 3]
    out_size: int,
    mean, std,
    num_threads: int = 0,
    square_pad: bool = True,
    precision: str = "u8",
) -> np.ndarray:
    """-> float32 [N, out_size, out_size, 3]: expand2square (mean color),
    antialiased bicubic resize, normalize — reference process_images
    semantics in one native call.

    precision="u8" (default) reproduces the reference's ACTUAL pipeline
    bit-for-bit (PIL uint8-mode resize: int32 filter weights at 2^22,
    uint8-clipped intermediate between the passes) and is the fast path;
    precision="float" matches PIL's float-mode resampler to 1e-5 instead
    (no fixed-point quantization, ~1 LSB from the uint8 path)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    out = np.empty((n, out_size, out_size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    fn = lib.preprocess_frames_u8 if precision == "u8" else lib.preprocess_frames
    fn(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
        1 if square_pad else 0,
    )
    return out


def crop_tiles(
    img: np.ndarray,  # uint8 [gh*tile, gw*tile, 3]
    grid_h: int, grid_w: int, tile: int,
    mean, std,
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((grid_h * grid_w, tile, tile, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.crop_tiles(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        grid_h, grid_w, tile,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
