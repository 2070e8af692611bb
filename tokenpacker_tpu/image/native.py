"""ctypes bindings for the native preprocessing library (native/preprocess.cpp).

Falls back transparently to the numpy implementations when libtpp.so hasn't
been built (`make -C native`). `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.environ.get("TOKENPACKER_NATIVE_LIB"),
        os.path.join(here, "native", "libtpp.so"),
    ):
        if cand and os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.tpp_resize_bilinear.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.tpp_normalize_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, ctypes.c_int,
            ]
            lib.tpp_hd_slice.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, f32p, ctypes.c_int,
            ]
            lib.tpp_hd_slice.restype = ctypes.c_int
            if hasattr(lib, "tpp_jpeg_decode"):
                lib.tpp_jpeg_decode.argtypes = [
                    u8p, ctypes.c_int, u8p, ctypes.c_long,
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ]
                lib.tpp_jpeg_decode.restype = ctypes.c_int
            _LIB = lib
            break
    return _LIB


def jpeg_available() -> bool:
    lib = _find_lib()
    return lib is not None and hasattr(lib, "tpp_jpeg_decode")


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → RGB uint8 [H, W, 3] via libjpeg (raises on non-JPEG or
    corrupt input). Use image/io.load_image for the PIL-fallback front door."""
    lib = _find_lib()
    if lib is None or not hasattr(lib, "tpp_jpeg_decode"):
        raise RuntimeError("native jpeg decode unavailable (build native/)")
    buf = np.frombuffer(data, dtype=np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.tpp_jpeg_decode(src, len(data), None, 0, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"jpeg header decode failed (rc={rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.tpp_jpeg_decode(
        src, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError(f"jpeg decode failed (rc={rc})")
    return out


def available() -> bool:
    return _find_lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img: np.ndarray, dst_h: int, dst_w: int, n_threads: int = 4) -> np.ndarray:
    """img: [C, H, W] float32 → [C, dst_h, dst_w] (torch interpolate semantics)."""
    lib = _find_lib()
    img = np.ascontiguousarray(img, np.float32)
    c, h, w = img.shape
    if lib is None:
        from tokenpacker_tpu.image.hd_tiler import _resize_bilinear

        return _resize_bilinear(img, dst_h, dst_w)
    out = np.empty((c, dst_h, dst_w), np.float32)
    lib.tpp_resize_bilinear(_fp(img), c, h, w, _fp(out), dst_h, dst_w, n_threads)
    return out


def normalize_u8(img_hwc: np.ndarray, mean, std, n_threads: int = 4) -> np.ndarray:
    """uint8 [H, W, 3] → normalized float32 [3, H, W]."""
    lib = _find_lib()
    img_hwc = np.ascontiguousarray(img_hwc, np.uint8)
    h, w, _ = img_hwc.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is None:
        x = img_hwc.astype(np.float32) / 255.0
        return ((x - mean) / std).transpose(2, 0, 1).copy()
    out = np.empty((3, h, w), np.float32)
    lib.tpp_normalize_u8(
        img_hwc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        _fp(mean), _fp(std), _fp(out), n_threads,
    )
    return out


def hd_slice(img: np.ndarray, hb: int, wb: int, block: int, fit_h: int, fit_w: int,
             g_fit_h: int, g_fit_w: int, n_threads: int = 4) -> np.ndarray:
    """Native HD canvas+crop slicing; img [3, H, W] float32 normalized."""
    lib = _find_lib()
    assert lib is not None, "native lib required (use hd_tiler.slice_image otherwise)"
    img = np.ascontiguousarray(img, np.float32)
    _, h, w = img.shape
    max_crops = hb * wb + (1 if hb * wb > 1 else 0)
    out = np.empty((max_crops, 3, block, block), np.float32)
    n = lib.tpp_hd_slice(
        _fp(img), h, w, hb, wb, block, fit_h, fit_w, g_fit_h, g_fit_w, _fp(out), n_threads
    )
    return out[:n]
