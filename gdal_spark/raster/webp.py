"""WebP codec bound to the system libwebp via ctypes.

Reference: the WEBP driver (frmts/webp/webpdataset.cpp), which is a
thin wrapper over libwebp's WebPDecodeRGB/WebPEncode* — this module is
the same thin wrapper. Lossy VP8 and lossless VP8L bitstreams both
decode through WebPDecodeRGBA; encode offers the lossless path (exact
round-trips, used by the multimodal gate) and the lossy quality path.
The handle loads lazily per process (Arrow-UDF-worker safe).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None


def _webp():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        try:
            lib = ctypes.CDLL(name)
        except OSError as e:  # pragma: no cover - environment-specific
            raise NotImplementedError(
                "WebP decode needs libwebp, which this host lacks") from e
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        _lib = lib
    return _lib


def decode(data: bytes) -> np.ndarray:
    """WebP bytes (VP8, VP8L, or VP8X container) -> (h, w, bands)
    uint8; alpha is dropped when fully opaque (the 3-band shape the
    reference's WEBP driver reports for alpha-less files)."""
    lib = _webp()
    data = bytes(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w),
                           ctypes.byref(h)):
        raise ValueError("not a decodable WebP bitstream")
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not buf:
        raise ValueError("WebP: decode failed")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(buf, shape=(n,)).reshape(
            h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    if np.all(arr[:, :, 3] == 255):
        return np.ascontiguousarray(arr[:, :, :3])
    return arr


def encode(img: np.ndarray, quality: float | None = None) -> bytes:
    """(h, w[, bands<=4]) uint8 -> WebP bytes. quality=None encodes
    LOSSLESS (VP8L — exact round-trips); a float 0..100 encodes lossy
    VP8."""
    lib = _webp()
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nb = img.shape
    if nb == 1:
        img = np.repeat(img, 3, axis=2)
        nb = 3
    if nb == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    rgba = np.ascontiguousarray(img).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if quality is None:
        n = lib.WebPEncodeLosslessRGBA(rgba, w, h, 4 * w,
                                       ctypes.byref(out))
    else:
        n = lib.WebPEncodeRGBA(rgba, w, h, 4 * w,
                               ctypes.c_float(float(quality)),
                               ctypes.byref(out))
    if not n:
        raise ValueError("WebP: encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
