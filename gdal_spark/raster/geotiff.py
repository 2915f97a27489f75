"""GeoTIFF source + sink — from-scratch tiled-TIFF + GeoKey codec.

Reference: the GTiff driver (frmts/gtiff/: IFD walk + block IO via
libtiff, geotransform from ModelPixelScale+ModelTiepoint —
gt_wkt_srs.cpp / gdalgeotiff read path; GeoKey directory per the OGC
GeoTIFF spec, tag 34735). Layout knowledge is the public TIFF 6.0 +
OGC GeoTIFF standards.

Spark-first split: a TILED TIFF is a container of independently
deflate-compressed fixed-size blocks, which maps 1:1 onto the engine's
tile relation (tile_y, tile_x, px):

 - write: per-tile PREDICTOR-free deflate runs DISTRIBUTED in an Arrow
   UDF (the expensive part); the driver only concatenates the already-
   compressed blocks and emits header + IFD — one sequential append,
   no pixel ever re-visits the driver uncompressed.
 - read: the driver parses the ~KB IFD, builds a (tile, offset, count)
   relation, and each TASK opens the file and reads its tiles' byte
   ranges — intra-file parallelism (path must be executor-visible,
   like the GeoPackage reader).

Scope fences (loud raises): single band; TILED organization on read
(strip TIFFs: convert with `gdal_translate -co TILED=YES`-style
retiling); classic TIFF (no BigTIFF); north-up geotransform on write.
Both byte orders read; writes are little-endian (II).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G

_DTYPES = {
    "uint8": (8, 1), "uint16": (16, 1), "uint32": (32, 1),
    "int16": (16, 2), "int32": (32, 2),
    "float32": (32, 3), "float64": (64, 3),
}
_BACK = {(bits, fmt): name for name, (bits, fmt) in _DTYPES.items()}

_TAG_W, _TAG_H = 256, 257
_TAG_BITS, _TAG_COMP, _TAG_PHOTO = 258, 259, 262
_TAG_SPP, _TAG_PLANAR, _TAG_SFMT = 277, 284, 339
_TAG_TW, _TAG_TH, _TAG_TOFF, _TAG_TCNT = 322, 323, 324, 325
_TAG_STRIP_OFF = 273
_TAG_SCALE, _TAG_TIEPOINT, _TAG_GEOKEYS = 33550, 33922, 34735
_TAG_NODATA = 42113


def _crs_geokeys(crs: str) -> list[int]:
    code = int(crs.split(":")[1])
    geographic = code == 4326
    keys = [(1024, 0, 1, 2 if geographic else 1),  # model type
            (1025, 0, 1, 1)]                       # RasterPixelIsArea
    keys.append((2048 if geographic else 3072, 0, 1, code))
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


def _geokeys_crs(shorts: list[int]) -> str:
    n = shorts[3]
    for i in range(n):
        key, _loc, _cnt, val = shorts[4 + 4 * i: 8 + 4 * i]
        if key in (2048, 3072):
            return f"EPSG:{val}"
    return "EPSG:4326"


def write_geotiff(tiles: DataFrame, spec: G.GridSpec, path: str,
                  dtype: str = "float64", compression: str = "deflate",
                  nodata: float | None = None,
                  max_tiles: int = 65536) -> None:
    """Tile relation + GridSpec -> one tiled GeoTIFF. Compression is
    distributed (per-tile deflate in the UDF); the driver only
    concatenates compressed blocks — guarded by max_tiles, since one
    TIFF is a single sequential file. Missing tiles write as
    all-nodata (or zero) blocks."""
    if spec.tiles_x * spec.tiles_y > max_tiles:
        raise ValueError(
            f"{spec.tiles_x * spec.tiles_y} tiles > max_tiles="
            f"{max_tiles}: one TIFF is a single file — write the "
            "parquet tile store or a z/x/y.png pyramid at scale")
    if dtype not in _DTYPES:
        raise ValueError(f"dtype {dtype!r}: want one of {sorted(_DTYPES)}")
    if compression not in ("deflate", "none"):
        raise ValueError("compression: want 'deflate' or 'none'")
    if spec.gt[2] != 0.0 or spec.gt[4] != 0.0:
        raise NotImplementedError(
            "rotated geotransforms not supported in the GeoTIFF writer")
    ts = spec.tile
    if ts % 16:
        raise ValueError("TIFF tile size must be a multiple of 16")
    fill = float(nodata) if nodata is not None else 0.0

    # edge tiles are partial-WIDTH rows, not a prefix: re-pad exactly
    @F.pandas_udf(T.BinaryType())
    def pack_exact(ty: pd.Series, tx: pd.Series, px: pd.Series) -> pd.Series:
        out = []
        for y, x, arr in zip(ty, tx, px):
            h, w = spec.tile_shape(int(y), int(x))
            a = np.asarray(arr, np.float64).reshape(h, w)
            full = np.full((ts, ts), fill, np.float64)
            full[:h, :w] = a
            raw = full.astype(dtype).tobytes()
            out.append(zlib.compress(raw, 6)
                       if compression == "deflate" else raw)
        return pd.Series(out)

    rows = (tiles.select("tile_y", "tile_x",
                         pack_exact("tile_y", "tile_x", "px").alias("blk"))
            .collect())
    blocks = {(r.tile_y, r.tile_x): bytes(r.blk) for r in rows}
    empty_raw = np.full((ts, ts), fill, np.float64).astype(dtype).tobytes()
    empty = zlib.compress(empty_raw, 6) if compression == "deflate" \
        else empty_raw

    ntx, nty = spec.tiles_x, spec.tiles_y
    ordered = [blocks.get((ty, tx), empty)
               for ty in range(nty) for tx in range(ntx)]
    offsets, counts, pos = [], [], 8
    for b in ordered:
        offsets.append(pos)
        counts.append(len(b))
        pos += len(b)

    bits, sfmt = _DTYPES[dtype]
    n = len(ordered)
    entries = [
        (_TAG_W, 4, 1, [spec.width]), (_TAG_H, 4, 1, [spec.height]),
        (_TAG_BITS, 3, 1, [bits]),
        (_TAG_COMP, 3, 1, [8 if compression == "deflate" else 1]),
        (_TAG_PHOTO, 3, 1, [1]), (_TAG_SPP, 3, 1, [1]),
        (_TAG_PLANAR, 3, 1, [1]), (_TAG_SFMT, 3, 1, [sfmt]),
        (_TAG_TW, 4, 1, [ts]), (_TAG_TH, 4, 1, [ts]),
        (_TAG_TOFF, 4, n, offsets), (_TAG_TCNT, 4, n, counts),
        (_TAG_SCALE, 12, 3, [spec.gt[1], -spec.gt[5], 0.0]),
        (_TAG_TIEPOINT, 12, 6, [0.0, 0.0, 0.0, spec.gt[0], spec.gt[3], 0.0]),
        (_TAG_GEOKEYS, 3, None, _crs_geokeys(spec.crs)),
    ]
    if nodata is not None:
        nd = (repr(float(nodata)) + "\x00").encode()
        entries.append((_TAG_NODATA, 2, len(nd), list(nd)))
    entries.sort(key=lambda e: e[0])

    _SZ = {2: 1, 3: 2, 4: 4, 12: 8}
    _FMT = {2: "B", 3: "H", 4: "I", 12: "d"}
    ifd_off = pos
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd, extra = [], []
    for tag, typ, cnt, vals in entries:
        if cnt is None:
            cnt = len(vals)
        payload = struct.pack(f"<{len(vals)}{_FMT[typ]}", *vals)
        if len(payload) <= 4:
            ifd.append(struct.pack("<HHI", tag, typ, cnt)
                       + payload.ljust(4, b"\x00"))
        else:
            ifd.append(struct.pack("<HHII", tag, typ, cnt, data_off))
            extra.append(payload)
            data_off += len(payload)
    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", ifd_off))
        for b in ordered:
            f.write(b)
        f.write(struct.pack("<H", len(entries)) + b"".join(ifd)
                + struct.pack("<I", 0) + b"".join(extra))


def _parse_ifd(path: str):
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:2] == b"II":
            bo = "<"
        elif head[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError("not a TIFF (bad byte-order magic)")
        magic = struct.unpack(bo + "H", head[2:4])[0]
        if magic == 43:
            raise NotImplementedError("BigTIFF not supported")
        if magic != 42:
            raise ValueError("not a TIFF (bad magic)")
        ifd_off = struct.unpack(bo + "I", head[4:8])[0]
        f.seek(ifd_off)
        n = struct.unpack(bo + "H", f.read(2))[0]
        raw = f.read(12 * n)
        tags = {}
        _SZ = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}
        _FMT = {1: "B", 2: "B", 3: "H", 4: "I", 12: "d"}
        for i in range(n):
            tag, typ, cnt = struct.unpack_from(bo + "HHI", raw, 12 * i)
            if typ not in _FMT:
                continue
            size = _SZ[typ] * cnt
            if size <= 4:
                vals = struct.unpack_from(
                    bo + f"{cnt}{_FMT[typ]}", raw, 12 * i + 8)
            else:
                off = struct.unpack_from(bo + "I", raw, 12 * i + 8)[0]
                here = f.tell()
                f.seek(off)
                vals = struct.unpack(bo + f"{cnt}{_FMT[typ]}",
                                     f.read(size))
                f.seek(here)
            tags[tag] = list(vals)
    return bo, tags


def read_geotiff(spark: SparkSession, path: str,
                 partitions: int | None = None
                 ) -> tuple[G.GridSpec, DataFrame]:
    """Tiled GeoTIFF -> (GridSpec, tile relation). One byte-range
    reader per task; px is always float64 (the engine's tile model)."""
    path = os.path.abspath(path)
    bo, tags = _parse_ifd(path)
    if _TAG_STRIP_OFF in tags:
        raise NotImplementedError(
            "strip-organized TIFF: retile it (TILED=YES) — the tiled "
            "layout is the distributed-read path")
    if tags.get(_TAG_SPP, [1])[0] != 1:
        raise NotImplementedError("single-band TIFFs only")
    comp = tags.get(_TAG_COMP, [1])[0]
    if comp not in (1, 8):
        raise NotImplementedError(f"compression {comp}: support none(1)/"
                                  "deflate(8)")
    width, height = tags[_TAG_W][0], tags[_TAG_H][0]
    ts = tags[_TAG_TW][0]
    if tags[_TAG_TH][0] != ts:
        raise NotImplementedError("non-square TIFF tiles")
    bits = tags.get(_TAG_BITS, [8])[0]
    sfmt = tags.get(_TAG_SFMT, [1])[0]
    dtype = _BACK.get((bits, sfmt))
    if dtype is None:
        raise NotImplementedError(f"sample type bits={bits} fmt={sfmt}")
    sx, sy = tags[_TAG_SCALE][0], tags[_TAG_SCALE][1]
    tp = tags[_TAG_TIEPOINT]
    gt = (tp[3] - tp[0] * sx, sx, 0.0, tp[4] + tp[1] * sy, 0.0, -sy)
    crs = _geokeys_crs([int(v) for v in tags[_TAG_GEOKEYS]]) \
        if _TAG_GEOKEYS in tags else "EPSG:4326"
    spec = G.GridSpec(width=width, height=height, gt=gt, crs=crs, tile=ts)

    offs, cnts = tags[_TAG_TOFF], tags[_TAG_TCNT]
    ntx = spec.tiles_x
    meta = [(i // ntx, i % ntx, int(offs[i]), int(cnts[i]))
            for i in range(len(offs))]
    if partitions is None:
        partitions = int(spark.sparkContext.defaultParallelism)
    mdf = spark.createDataFrame(
        meta, "tile_y int, tile_x int, off long, cnt long") \
        .repartition(min(partitions, max(1, len(meta))))
    np_dtype = np.dtype(dtype).newbyteorder("<" if bo == "<" else ">")

    def gen(batches):
        for pdf in batches:
            out_ty, out_tx, out_px = [], [], []
            with open(path, "rb") as f:
                for ty, tx, off, cnt in zip(pdf["tile_y"], pdf["tile_x"],
                                            pdf["off"], pdf["cnt"]):
                    f.seek(int(off))
                    b = f.read(int(cnt))
                    if comp == 8:
                        b = zlib.decompress(b)
                    a = np.frombuffer(b, np_dtype).reshape(ts, ts)
                    h, w = spec.tile_shape(int(ty), int(tx))
                    out_ty.append(int(ty))
                    out_tx.append(int(tx))
                    out_px.append(a[:h, :w].astype(np.float64)
                                  .ravel().tolist())
            yield pd.DataFrame({"tile_y": out_ty, "tile_x": out_tx,
                                "px": out_px})

    return spec, mdf.mapInPandas(gen, schema=G.TILE_SCHEMA)
