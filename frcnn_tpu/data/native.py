"""ctypes bindings for the native host pipeline (csrc/host_pipeline.cpp).

Builds ``libfrcnn_host.so`` on demand (g++ + libjpeg/libpng) and exposes:

* :func:`load_process` — decode + resize + color + flip + pad one file,
* :func:`load_process_batch` — whole batch in one GIL-releasing call with a
  C++ thread pool,
* :func:`resample` — the bare Pillow-compatible triangle resampler (tests).

Falls back gracefully: ``available()`` is False when the toolchain or the
libraries are missing, and the Python pipeline is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libfrcnn_host.so")

_lock = threading.Lock()
_lib = None
_tried = False

COLOR_SPACES = {"rgb": 0, "": 0, None: 0, "yuv": 1, "lab": 2, "hsv": 3}


def _build() -> bool:
    src = os.path.join(_CSRC, "host_pipeline.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "libfrcnn_host.so"],
            check=True, capture_output=True, timeout=240,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_CSRC, "host_pipeline.cpp"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.frcnn_load_process.restype = ctypes.c_int
        lib.frcnn_load_process.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.frcnn_load_process_batch.restype = None
        lib.frcnn_load_process_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.frcnn_resample.restype = None
        lib.frcnn_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.frcnn_pack_s2d_batch.restype = None
        lib.frcnn_pack_s2d_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def load_process(path: str, canvas_hw: Tuple[int, int],
                 target_smaller_side: int, max_pixel_size: int,
                 color_space: str = "rgb", hflip: bool = False,
                 vflip: bool = False, jitter=(1.0, 1.0)
                 ) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
    lib = _load()
    if lib is None:
        return None
    H, W = canvas_hw
    canvas = np.zeros((H, W, 3), np.float32)
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    gh = ctypes.c_int()
    gw = ctypes.c_int()
    rc = lib.frcnn_load_process(
        path.encode(), _fptr(canvas), H, W, target_smaller_side,
        max_pixel_size, COLOR_SPACES[color_space], int(hflip), int(vflip),
        float(jitter[0]), float(jitter[1]),
        ctypes.byref(oh), ctypes.byref(ow), ctypes.byref(gh), ctypes.byref(gw),
    )
    if rc != 0:
        return None
    return canvas, (oh.value, ow.value), (gh.value, gw.value)


def load_process_batch(paths: Sequence[str], canvas_hw: Tuple[int, int],
                       target_smaller_side: int, max_pixel_size: int,
                       color_space: str = "rgb",
                       flips: Optional[np.ndarray] = None,
                       jitter: Optional[np.ndarray] = None,
                       num_threads: int = 0):
    """Returns (canvases [n,H,W,3], out_hw [n,4] = (h, w, orig_h, orig_w),
    status [n]); status!=0 rows failed to decode."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    H, W = canvas_hw
    canvases = np.zeros((n, H, W, 3), np.float32)
    out_hw = np.zeros((n, 4), np.int32)
    status = np.zeros((n,), np.int32)
    flips = (flips if flips is not None else np.zeros((n, 2))).astype(np.int32)
    jitter = (jitter if jitter is not None else np.ones((n, 2))).astype(np.float32)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    lib.frcnn_load_process_batch(
        blob, n, _fptr(canvases), H, W, target_smaller_side, max_pixel_size,
        COLOR_SPACES[color_space], _iptr(flips), _fptr(jitter),
        _iptr(out_hw), _iptr(status), num_threads,
    )
    return canvases, out_hw, status


def resample(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    sh, sw = src.shape[:2]
    dst = np.zeros((dh, dw, 3), np.float32)
    lib.frcnn_resample(_fptr(src), sh, sw, _fptr(dst), dh, dw)
    return dst


def pack_s2d_batch(images: np.ndarray, num_threads: int = 0):
    """Native space-to-depth pack of [B, H, W, 3] float32 NHWC into the
    serving layout (lum4 [B, 4, Hc, Wc], chroma [B, Hc, 8, Wc]) — see
    ops/pallas_block0.py::pack_s2d for the layout contract. Returns None
    when the native library is unavailable (callers fall back to the
    numpy packer)."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.float32)
    B, H, W, _ = images.shape
    assert H % 2 == 0 and W % 2 == 0
    Hc, Wc = H // 2 + 1, W // 2 + 1
    lum4 = np.empty((B, 4, Hc, Wc), np.float32)
    chroma = np.empty((B, Hc, 8, Wc), np.float32)
    if num_threads <= 0:
        num_threads = min(B, os.cpu_count() or 1)
    lib.frcnn_pack_s2d_batch(_fptr(images), B, H, W, _fptr(lum4),
                             _fptr(chroma), num_threads)
    return lum4, chroma
