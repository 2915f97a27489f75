"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The training-data pipeline treats images/audio/video as opaque
`binary` columns with typed metadata extracted by Arrow-batched UDFs
(SURVEY training-data ops):

 - `extract_meta` runs `mapInPandas` over (id, payload) batches and
   returns (id, n_bytes, is_html, feat): byte length, a magic-prefix
   probe, and a deterministic feature derived from the real bytes —
   the stand-in for an embedding/feature vector.
 - `decode_image` REALLY decodes PNG (raster/png.py), JPEG incl.
   progressive (raster/jpeg.py — both pure-Python codecs), WebP
   (raster/webp.py, system libwebp) and AVIF/HEIC (raster/heif.py,
   system libheif) payloads and emits typed image features:
   dimensions, channel count, per-channel means, a downsampled 8x8
   luma fingerprint (the perceptual-hash front half). Unknown magics
   fail loudly per payload.
 - `resize_image` / `sample_frames`-style ops compose from the same
   decoded arrays; `thumbnail8` below is the canonical example.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_META = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("is_html", T.BooleanType(), False),
    T.StructField("feat", T.LongType(), False),
])

FEAT_MULT = 2654435761
FEAT_MOD = 1000003


def extract_meta(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "html") -> DataFrame:
    """Typed metadata per binary payload, Arrow-batched."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, mag, feat = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                ids.append(int(i))
                nb.append(len(b))
                mag.append(b[:12] == b"<html><body>")
                feat.append((len(b) * FEAT_MULT) % FEAT_MOD)
            yield pd.DataFrame({"doc_id": ids, "n_bytes": nb,
                                "is_html": mag, "feat": feat})

    return df.select(id_col, bin_col).mapInPandas(run, _META)


_IMG = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("channels", T.IntegerType(), False),
    T.StructField("mean", T.ArrayType(T.DoubleType()), False),
    T.StructField("luma8", T.ArrayType(T.DoubleType()), False),
])


def _to_hwc(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:
        return arr[:, :, None]
    return arr


def _luma(a: np.ndarray) -> np.ndarray:
    """(h, w, c) -> luma plane (Rec.601 for RGB; identity for gray)."""
    a = a.astype(np.float64)
    if a.shape[2] >= 3:
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return a[:, :, 0]


def _box_resize(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area (box-filter) downsample to (out_h, out_w) — the resize
    kernel for thumbnails/fingerprints (partial boxes at edges)."""
    h, w = plane.shape
    ye = np.linspace(0, h, out_h + 1)
    xe = np.linspace(0, w, out_w + 1)
    out = np.empty((out_h, out_w))
    for i in range(out_h):
        for j in range(out_w):
            y0, y1 = int(np.floor(ye[i])), int(np.ceil(ye[i + 1]))
            x0, x1 = int(np.floor(xe[j])), int(np.ceil(xe[j + 1]))
            out[i, j] = plane[y0:y1, x0:x1].mean()
    return out


def decode_image(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "payload") -> DataFrame:
    """Decode PNG (raster/png.py), JPEG — baseline AND progressive
    SOF2 (raster/jpeg.py) — WebP (raster/webp.py, system libwebp;
    VP8/VP8L/VP8X), or AVIF/HEIC (raster/heif.py, system libheif)
    payloads -> typed image features: (doc_id, width, height,
    channels, per-channel mean, 8x8 luma fingerprint). Unknown magics
    raise NotImplementedError naming the payload — loud, not
    silent."""
    from ..raster import jpeg as JPG
    from ..raster import png as PNG

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(blob)
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    arr = _to_hwc(PNG.decode(b))
                elif b[:2] == b"\xFF\xD8":
                    arr = JPG.decode_jpeg(b)
                elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                    from ..raster import webp as WEBP
                    arr = WEBP.decode(b)
                elif b[4:8] == b"ftyp" and b[8:12] in (
                        b"avif", b"avis", b"heic", b"heix",
                        b"mif1", b"msf1"):
                    from ..raster import heif as HEIF
                    arr = HEIF.decode(b)
                else:
                    sig = b[:4].hex()
                    raise NotImplementedError(
                        f"payload {int(i)} (magic {sig}) is none of "
                        "PNG/JPEG/WebP/AVIF/HEIC — plug a decoder "
                        "into operators.multimodal.decode_image")
                h, w, c = arr.shape
                means = [float(arr[:, :, k].mean()) for k in range(c)]
                luma8 = _box_resize(_luma(arr), 8, 8).ravel().tolist()
                rows.append((int(i), w, h, c, means, luma8))
            yield pd.DataFrame(rows, columns=[f.name for f in _IMG])

    return df.select(id_col, bin_col).mapInPandas(run, _IMG)


_THUMB = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("thumb_png", T.BinaryType(), False),
])


def thumbnail8(df: DataFrame, size: int = 8, id_col: str = "doc_id",
               bin_col: str = "payload") -> DataFrame:
    """Decode -> box-resize to (size, size) grayscale -> re-encode PNG.
    The canonical decode/transform/encode image pipeline, end to end
    inside Arrow batches."""
    from ..raster import png as PNG

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[bin_col]):
                arr = _to_hwc(PNG.decode(bytes(blob)))
                small = np.clip(np.rint(_box_resize(_luma(arr), size, size)),
                                0, 255).astype(np.uint8)
                rows.append((int(i), bytearray(PNG.encode(small))))
            yield pd.DataFrame(rows, columns=[f.name for f in _THUMB])

    return df.select(id_col, bin_col).mapInPandas(run, _THUMB)
