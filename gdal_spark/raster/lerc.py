"""LERC codec (TIFF compression 34887) bound to the system libLerc.

Reference: the GTiff driver's LERC support (libtiff tif_lerc.c over
the Esri Lerc library — the public Lerc_c_api.h surface). TIFF blocks
are raw Lerc2 blobs (the LERC_PARAMETERS tag 50674 records
[version, additional_compression]; we read/write plain LERC,
additional deflate/zstd wrapping is not emitted). maxZErr = 0 encodes
LOSSLESS, so round-trips are exact for every band type. The handle
loads lazily per process (Arrow-UDF-worker safe).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

#: Lerc_c_api.h data-type enum
_DT = {"int8": 0, "uint8": 1, "int16": 2, "uint16": 3,
       "int32": 4, "uint32": 5, "float32": 6, "float64": 7}
_NP = {v: k for k, v in _DT.items()}

_lib = None


def _lerc():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("Lerc") or "libLerc.so.4"
        try:
            lib = ctypes.CDLL(name)
        except OSError as e:  # pragma: no cover - environment-specific
            raise NotImplementedError(
                "TIFF LERC (34887) needs libLerc, which this host "
                "lacks") from e
        u, i, d, vp, cp = (ctypes.c_uint, ctypes.c_int, ctypes.c_double,
                           ctypes.c_void_p, ctypes.c_char_p)
        lib.lerc_getBlobInfo.restype = u
        lib.lerc_getBlobInfo.argtypes = [
            cp, u, ctypes.POINTER(u), ctypes.POINTER(d), i, i]
        lib.lerc_decode.restype = u
        lib.lerc_decode.argtypes = [cp, u, i, vp, i, i, i, i, u, vp]
        lib.lerc_encode.restype = u
        lib.lerc_encode.argtypes = [
            vp, u, i, i, i, i, i, vp, d, vp, u, ctypes.POINTER(u)]
        _lib = lib
    return _lib


def decode(blob: bytes, np_dtype: np.dtype) -> bytes:
    """One TIFF block -> raw sample bytes in `np_dtype`'s byte order
    (what the GeoTIFF readers' np.frombuffer expects). Invalid-mask
    pixels, if the blob carries a mask, read as 0."""
    lib = _lerc()
    blob = bytes(blob)
    info = (ctypes.c_uint * 11)()
    rng = (ctypes.c_double * 3)()
    if lib.lerc_getBlobInfo(blob, len(blob), info, rng, 11, 3):
        raise ValueError("LERC: bad blob header")
    _ver, dt, ndim, ncols, nrows, nbands, _nvalid, _bs, nmasks = info[:9]
    if ndim != 1 or nbands != 1:
        raise NotImplementedError(
            f"LERC blob with nDepth={ndim} nBands={nbands}: the tile "
            "model is one sample per pixel per block")
    out = np.empty((nrows, ncols), np.dtype(_NP[dt]))
    mask = np.empty(nrows * ncols, np.uint8) if nmasks else None
    st = lib.lerc_decode(
        blob, len(blob), int(nmasks),
        mask.ctypes.data_as(ctypes.c_void_p) if nmasks else None,
        1, ncols, nrows, 1, dt,
        out.ctypes.data_as(ctypes.c_void_p))
    if st:
        raise ValueError(f"LERC: decode failed (status {st})")
    if nmasks:
        out[(mask == 0).reshape(nrows, ncols)] = 0
    return out.astype(np.dtype(np_dtype), copy=False).tobytes()


def encode(raw: bytes, np_dtype: np.dtype, ncols: int,
           nrows: int) -> bytes:
    """Raw block bytes -> lossless Lerc2 blob (maxZErr = 0)."""
    lib = _lerc()
    arr = np.ascontiguousarray(
        np.frombuffer(raw, np.dtype(np_dtype)).reshape(nrows, ncols))
    native = arr.astype(arr.dtype.newbyteorder("="), copy=False)
    dt = _DT[native.dtype.name]
    cap = native.nbytes + 4096
    buf = ctypes.create_string_buffer(cap)
    nw = ctypes.c_uint()
    st = lib.lerc_encode(
        native.ctypes.data_as(ctypes.c_void_p), dt, 1, ncols, nrows,
        1, 0, None, 0.0, buf, cap, ctypes.byref(nw))
    if st:
        raise ValueError(f"LERC: encode failed (status {st})")
    return buf.raw[:nw.value]
