"""ZSTD codec for TIFF blocks, bound to the system libzstd via ctypes.

Reference: the GTiff driver's ZSTD support (frmts/gtiff/, compression
code 50000 via libtiff's tif_zstd.c — itself a thin wrapper over
libzstd). This environment ships libzstd.so but no Python zstd
package, so the binding is the same thin wrapper: one-shot
ZSTD_compress / ZSTD_decompress per independently-compressed TIFF
block (blocks are small and self-contained, so the streaming API is
unnecessary). The library handle loads lazily PER PROCESS, making the
module safe inside Arrow UDF workers.
"""

from __future__ import annotations

import ctypes
import ctypes.util


_lib = None


def _zstd():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("zstd") or "libzstd.so.1"
        try:
            lib = ctypes.CDLL(name)
        except OSError as e:  # pragma: no cover - environment-specific
            raise NotImplementedError(
                "TIFF ZSTD (50000) needs libzstd, which this host "
                "lacks — recompress the file as deflate/LZW or install "
                "libzstd") from e
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        _lib = lib
    return _lib


def decode(data: bytes, max_out: int) -> bytes:
    """One TIFF block; max_out = the block's raw byte size (known
    from the IFD geometry — TIFF blocks never exceed it)."""
    lib = _zstd()
    out = ctypes.create_string_buffer(max_out)
    n = lib.ZSTD_decompress(out, max_out, bytes(data), len(data))
    if lib.ZSTD_isError(n):
        raise ValueError("ZSTD: corrupt frame in TIFF block")
    return out.raw[:n]


def encode(data: bytes, level: int = 9) -> bytes:
    lib = _zstd()
    data = bytes(data)
    cap = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_compress(out, cap, data, len(data), int(level))
    if lib.ZSTD_isError(n):
        raise ValueError("ZSTD: compression failed")
    return out.raw[:n]
