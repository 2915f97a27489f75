"""Minimal pure-Python PNG codec (zlib + struct only — no imaging
libs in this environment).

The reference's tile pipeline writes one image file per tile
(apps/gdalalg_raster_tile.cpp; gdal2tiles' per-tile PNGs are what
autotest/pyscripts/test_gdal2tiles.py:101-143 checksums). This module
gives tilewriter a real per-tile codec: 8-bit grayscale / RGB / RGBA
and 16-bit grayscale, encoder + decoder, with bit-exact roundtrip
(encode uses filter type 0; the decoder un-filters all five standard
filter types so externally-produced PNGs read too).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: (color_type, bit_depth) by (ndim/channels, dtype)
_GRAY8, _GRAY16, _RGB8, _RGBA8 = (0, 8), (0, 16), (2, 8), (6, 8)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode(arr: np.ndarray) -> bytes:
    """uint8 (h,w) | (h,w,3) | (h,w,4), or uint16 (h,w) -> PNG bytes."""
    a = np.asarray(arr)
    if a.ndim == 2 and a.dtype == np.uint8:
        color, depth, ch = 0, 8, 1
    elif a.ndim == 2 and a.dtype == np.uint16:
        color, depth, ch = 0, 16, 1
    elif a.ndim == 3 and a.shape[2] == 3 and a.dtype == np.uint8:
        color, depth, ch = 2, 8, 3
    elif a.ndim == 3 and a.shape[2] == 4 and a.dtype == np.uint8:
        color, depth, ch = 6, 8, 4
    else:
        raise ValueError(f"unsupported array {a.dtype}/{a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    if depth == 16:
        raw = a.astype(">u2").tobytes()
        stride = w * 2
    else:
        raw = a.tobytes()
        stride = w * ch
    lines = b"".join(b"\x00" + raw[y * stride:(y + 1) * stride]
                     for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(lines, 6))
            + _chunk(b"IEND", b""))


def _unfilter(data: bytes, h: int, w: int, bpp: int, stride: int) -> bytearray:
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        ftype = data[pos]
        pos += 1
        line = bytearray(data[pos:pos + stride])
        pos += stride
        prev = out[(y - 1) * stride:y * stride] if y else bytes(stride)
        if ftype == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y * stride:(y + 1) * stride] = line
    return out


def decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> numpy array (shapes/dtypes as `encode`)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = depth = color = None
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload)
            if comp or filt or ilace:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    ch = {0: 1, 2: 3, 6: 4}[color]
    bpp = ch * (depth // 8)
    stride = w * bpp
    raw = _unfilter(zlib.decompress(idat), h, w, bpp, stride)
    if depth == 16:
        return np.frombuffer(bytes(raw), ">u2").reshape(h, w).astype(np.uint16)
    a = np.frombuffer(bytes(raw), np.uint8)
    return a.reshape(h, w) if ch == 1 else a.reshape(h, w, ch)
