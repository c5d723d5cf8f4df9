"""ctypes bindings for the native host runtime (native/yolo_host.cpp).

Provides the framework's own native equivalents of the reference's native
dependencies (OpenCV resize/letterbox, torchvision NMS — SURVEY §2.1).
Loads `native/libyolo_host.so`; callers fall back to the numpy/cv2 paths
when the library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = (Path(__file__).resolve().parent.parent.parent
            / "native" / "libyolo_host.so")
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    cf = ctypes.c_float

    lib.resize_bilinear_u8.argtypes = [u8p, c, c, c, u8p, c, c]
    lib.letterbox_u8.argtypes = [u8p, c, c, c, u8p, c, c, ctypes.c_uint8,
                                 c, f32p, f32p]
    lib.hsv_augment_u8.argtypes = [u8p, c, c, cf, cf, cf]
    lib.blit_u8.argtypes = [u8p, c, c, u8p, c, c, c, c, c, c, c, c]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def enabled() -> bool:
    """Should the host pipeline dispatch through the native kernels?

    Controlled by YOLO_TPU_NATIVE:
      "0" (default) — cv2/numpy paths (bit-identical to the reference's
                      OpenCV dependency chain),
      "1"           — require the native kernels (raises if the library
                      is not built; `make -C native`),
      "auto"        — native when built, cv2 otherwise.
    The native kernels match cv2 within 1-2 uint8 LSB (tests/test_native.py),
    so "1"/"auto" trade exact cv2-bit-parity for a cv2-free host runtime.
    """
    mode = os.environ.get("YOLO_TPU_NATIVE", "0")
    if mode == "0":
        return False
    if mode == "1":
        if not available():
            raise RuntimeError(
                "YOLO_TPU_NATIVE=1 but native/libyolo_host.so is not "
                "built; run `make -C native`")
        return True
    return available()


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    img = np.ascontiguousarray(img)
    h, w, ch = img.shape
    out = np.empty((out_h, out_w, ch), np.uint8)
    lib.resize_bilinear_u8(img, h, w, ch, out, out_h, out_w)
    return out


def letterbox(img: np.ndarray, out_h: int, out_w: int,
              pad_value: int = 114, scaleup: bool = True):
    """Native letterbox; returns (canvas, (rw, rh), (dw, dh)) matching the
    numpy implementation's contract (data/augment.py)."""
    lib = _lib()
    assert lib is not None
    img = np.ascontiguousarray(img)
    h, w, ch = img.shape
    out = np.empty((out_h, out_w, ch), np.uint8)
    ratio = np.zeros(2, np.float32)
    pad = np.zeros(2, np.float32)
    lib.letterbox_u8(img, h, w, ch, out, out_h, out_w, pad_value,
                     int(scaleup), ratio, pad)
    return out, (float(ratio[0]), float(ratio[1])), (float(pad[0]),
                                                     float(pad[1]))


def blit(canvas: np.ndarray, src: np.ndarray, y1a: int, x1a: int,
         y2a: int, x2a: int, y1b: int, x1b: int) -> None:
    """Copy src[y1b:y1b+(y2a-y1a), x1b:x1b+(x2a-x1a)] into
    canvas[y1a:y2a, x1a:x2a] (bounds-checked row memcpy) — the mosaic
    tile composer (reference tile math: src/yolo/data/transforms.py:114-136)."""
    lib = _lib()
    assert lib is not None
    assert canvas.flags["C_CONTIGUOUS"] and canvas.dtype == np.uint8
    src = np.ascontiguousarray(src)
    ch_, cw = canvas.shape[:2]
    sh, sw = src.shape[:2]
    lib.blit_u8(canvas, ch_, cw, src, sh, sw,
                y1a, x1a, y2a, x2a, y1b, x1b)


def hsv_augment(img: np.ndarray, h_mul: float, s_mul: float,
                v_mul: float) -> np.ndarray:
    """In-place HSV gain augmentation on BGR uint8."""
    lib = _lib()
    assert lib is not None
    assert img.flags["C_CONTIGUOUS"]
    h, w, _ = img.shape
    lib.hsv_augment_u8(img, h, w, h_mul, s_mul, v_mul)
    return img
