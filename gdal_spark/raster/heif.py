"""AVIF/HEIC decode bound to the system libheif via ctypes.

Reference: the HEIF and AVIF drivers (frmts/heif/, frmts/avif/) —
thin wrappers over libheif/libavif. libheif decodes both ISO-BMFF
families (brand avif/avis via its AV1 plugin, heic/heix via HEVC),
and its C API is all opaque pointers (no struct-layout coupling
except the by-value heif_error triple, which is ABI-stable). Decode
only — the corpus-ingest direction; encode stays out of scope.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


class _HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHROMA_INTERLEAVED_RGBA = 11
_CHANNEL_INTERLEAVED = 10

_lib = None


def _heif():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("heif") or "libheif.so.1"
        try:
            lib = ctypes.CDLL(name)
        except OSError as e:  # pragma: no cover - environment-specific
            raise NotImplementedError(
                "AVIF/HEIC decode needs libheif, which this host "
                "lacks") from e
        vp = ctypes.c_void_p
        lib.heif_context_alloc.restype = vp
        lib.heif_context_alloc.argtypes = []
        lib.heif_context_read_from_memory_without_copy.restype = _HeifError
        lib.heif_context_read_from_memory_without_copy.argtypes = [
            vp, ctypes.c_char_p, ctypes.c_size_t, vp]
        lib.heif_context_get_primary_image_handle.restype = _HeifError
        lib.heif_context_get_primary_image_handle.argtypes = [
            vp, ctypes.POINTER(vp)]
        lib.heif_image_handle_get_width.restype = ctypes.c_int
        lib.heif_image_handle_get_width.argtypes = [vp]
        lib.heif_image_handle_get_height.restype = ctypes.c_int
        lib.heif_image_handle_get_height.argtypes = [vp]
        lib.heif_image_handle_has_alpha_channel.restype = ctypes.c_int
        lib.heif_image_handle_has_alpha_channel.argtypes = [vp]
        lib.heif_decode_image.restype = _HeifError
        lib.heif_decode_image.argtypes = [
            vp, ctypes.POINTER(vp), ctypes.c_int, ctypes.c_int, vp]
        lib.heif_image_get_plane_readonly.restype = \
            ctypes.POINTER(ctypes.c_uint8)
        lib.heif_image_get_plane_readonly.argtypes = [
            vp, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.heif_image_release.restype = None
        lib.heif_image_release.argtypes = [vp]
        lib.heif_image_handle_release.restype = None
        lib.heif_image_handle_release.argtypes = [vp]
        lib.heif_context_free.restype = None
        lib.heif_context_free.argtypes = [vp]
        _lib = lib
    return _lib


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"?").decode(errors="replace")
        raise ValueError(f"HEIF: {what} failed: {msg}")


def decode(data: bytes) -> np.ndarray:
    """AVIF/HEIC bytes -> (h, w, 3|4) uint8 (8-bit output; the
    interleaved-RGB[A] path libheif exposes). Alpha kept only when
    the file declares an alpha channel."""
    lib = _heif()
    data = bytes(data)
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise ValueError("HEIF: context alloc failed")
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None), "parse")
        _check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary image")
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        has_alpha = bool(lib.heif_image_handle_has_alpha_channel(handle))
        chroma = (_CHROMA_INTERLEAVED_RGBA if has_alpha
                  else _CHROMA_INTERLEAVED_RGB)
        nb = 4 if has_alpha else 3
        _check(lib.heif_decode_image(handle, ctypes.byref(img),
                                     _COLORSPACE_RGB, chroma, None),
               "decode")
        stride = ctypes.c_int()
        plane = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        if not plane:
            raise ValueError("HEIF: no interleaved plane")
        rows = np.ctypeslib.as_array(plane, shape=(h * stride.value,))
        out = np.empty((h, w, nb), np.uint8)
        for r in range(h):
            row = rows[r * stride.value:r * stride.value + w * nb]
            out[r] = row.reshape(w, nb)
        return out
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)
