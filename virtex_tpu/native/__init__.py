r"""
ctypes bindings for the native C++ data-plane (``dataplane.cpp``).

The library is compiled lazily on first use (g++, cached next to the
source); loading is best-effort — callers check :func:`available` and fall
back to the cv2/numpy path (``virtex_tpu/data/transforms.py``) when the
toolchain or libjpeg is missing. This mirrors the split mandated by the
project brief: jax/XLA is the TPU compute path, C++ is the host runtime
around it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataplane.cpp")
_LIB_PATH = os.path.join(_HERE, "_dataplane.so")
_lock = threading.Lock()
_lib = None
_load_error: Optional[str] = None

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-ljpeg",
    ]
    subprocess.check_output(cmd, stderr=subprocess.STDOUT)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.vtx_jpeg_dims.restype = ctypes.c_int
            lib.vtx_decode_crop_resize_normalize.restype = ctypes.c_int
            lib.vtx_decode_crop_resize_jitter_normalize.restype = ctypes.c_int
            lib.vtx_batch_decode_transform.restype = ctypes.c_int
            lib.vtx_batch_decode_transform_jitter.restype = ctypes.c_int
            _lib = lib
        except Exception as e:  # toolchain/libjpeg missing
            _load_error = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(data: bytes) -> Tuple[int, int]:
    """(height, width) of a JPEG byte buffer."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native dataplane unavailable: {_load_error}")
    h = ctypes.c_int()
    w = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    rc = lib.vtx_jpeg_dims(buf, len(data), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError("not a decodable JPEG")
    return h.value, w.value


def jitter_params(order, brightness: float, contrast: float,
                  saturation: float, hue_shift: float) -> np.ndarray:
    """Pack color-jitter parameters for the fused kernel: op order (a
    permutation of 0..3), multiplicative factors, hue shift (fraction of
    the hue circle)."""
    return np.asarray([1.0, *[float(o) for o in order],
                       brightness, contrast, saturation, hue_shift],
                      np.float32)


def decode_transform(data: bytes, crop: Optional[Tuple[int, int, int, int]],
                     out_size: int, flip: bool = False,
                     mean: np.ndarray = IMAGENET_MEAN,
                     std: np.ndarray = IMAGENET_STD,
                     jitter: Optional[np.ndarray] = None) -> np.ndarray:
    """Fused decode → crop → resize(out_size²) → flip → [color jitter] →
    normalize.

    crop = (y, x, h, w) in pixels, or None for the full image;
    jitter = optional 9-float array from :func:`jitter_params`.
    Returns float32 HWC.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native dataplane unavailable: {_load_error}")
    cy, cx, ch, cw = crop if crop is not None else (-1, -1, -1, -1)
    out = np.empty((out_size, out_size, 3), np.float32)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    jp = (None if jitter is None else
          np.ascontiguousarray(jitter, np.float32).ctypes.data_as(
              ctypes.POINTER(ctypes.c_float)))
    rc = lib.vtx_decode_crop_resize_jitter_normalize(
        buf, len(data), cy, cx, ch, cw, out_size, int(flip), jp,
        mean.astype(np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        std.astype(np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"decode/transform failed (rc={rc})")
    return out


def batch_decode_transform(blobs: Sequence[bytes],
                           rects: np.ndarray, flips: np.ndarray,
                           out_size: int,
                           mean: np.ndarray = IMAGENET_MEAN,
                           std: np.ndarray = IMAGENET_STD,
                           jitters: Optional[np.ndarray] = None) -> np.ndarray:
    """OpenMP-parallel batch of fused transforms (the C++ side fans the
    per-image work over cores; one GIL release for the whole batch).

    rects: (N, 4) int32 (y, x, h, w), h/w ≤ 0 → full image.
    jitters: optional (N, 9) float32 from :func:`jitter_params` (a zero
    first element disables jitter for that image).
    Returns (N, out_size, out_size, 3) float32; undecodable slots are zero.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native dataplane unavailable: {_load_error}")
    n = len(blobs)
    keep = [(ctypes.c_uint8 * len(b)).from_buffer_copy(b) for b in blobs]
    buf_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[ctypes.cast(k, ctypes.POINTER(ctypes.c_uint8)) for k in keep])
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    rects = np.ascontiguousarray(rects, np.int32)
    flips = np.ascontiguousarray(flips, np.int32)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    mean_p = mean.astype(np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float))
    std_p = std.astype(np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float))
    out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rects_p = rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    flips_p = flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    if jitters is None:
        failed = lib.vtx_batch_decode_transform(
            buf_ptrs, lens, rects_p, flips_p, n, out_size, mean_p, std_p,
            out_p)
    else:
        jit = np.ascontiguousarray(jitters, np.float32)
        failed = lib.vtx_batch_decode_transform_jitter(
            buf_ptrs, lens, rects_p, flips_p,
            jit.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, out_size, mean_p, std_p, out_p)
    if failed:
        # The C side zero-fills failed slots; raising keeps the batch path
        # consistent with the per-item path (which raises on a corrupt
        # JPEG) instead of silently training on black images.
        raise ValueError(
            f"native batch decode/transform failed for {failed}/{n} images")
    return out
