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

Multi-band rasters store separate planes (PlanarConfiguration=2,
band-major tile order) — write_geotiff_bands / read_geotiff(band=k).
Reads also cover STRIP-organized files (re-tiled into the square tile
model by a distributed strip->tile shuffle, `_read_strips`) and
BigTIFF (8-byte offsets, LONG8 types). Writes are tiled, classic or
BigTIFF (bigtiff="auto" switches past 4 GB like BIGTIFF=IF_NEEDED);
compression none/deflate/LZW/PackBits/ZSTD/LERC both ways (ZSTD
and lossless LERC via the system libzstd/libLerc — raster/
zstdcodec.py, raster/lerc.py). Scope fences (loud
raises): north-up geotransform on write. Both byte orders read;
writes are little-endian (II).
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

_TAG_SUBFILE = 254
_TAG_W, _TAG_H = 256, 257
_TAG_BITS, _TAG_COMP, _TAG_PHOTO = 258, 259, 262
_TAG_PRED = 317
_COMP_CODES = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773,
               "zstd": 50000, "lerc": 34887}
_TAG_SPP, _TAG_PLANAR, _TAG_SFMT = 277, 284, 339
_TAG_TW, _TAG_TH, _TAG_TOFF, _TAG_TCNT = 322, 323, 324, 325
_TAG_STRIP_OFF = 273
_TAG_SCALE, _TAG_TIEPOINT, _TAG_GEOKEYS = 33550, 33922, 34735
_TAG_LERC_PARAMS = 50674
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
                  max_tiles: int = 65536, cog: bool = False,
                  bigtiff: bool | str = "auto") -> None:
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
    if compression not in _COMP_CODES:
        raise ValueError(f"compression: want one of {sorted(_COMP_CODES)}")
    if spec.gt[2] != 0.0 or spec.gt[4] != 0.0:
        raise NotImplementedError(
            "rotated geotransforms not supported in the GeoTIFF writer")
    ts = spec.tile
    if ts % 16:
        raise ValueError("TIFF tile size must be a multiple of 16")
    fill = float(nodata) if nodata is not None else 0.0

    ordered = _pack_blocks(tiles, spec, dtype, compression, fill)
    _write_container(path, [(spec, dtype, compression, nodata, ordered,
                             False)], cog=cog, bigtiff=bigtiff)


def _image_entries(spec, dtype, compression, nodata, offsets, counts,
                   reduced: bool, n_bands: int = 1):
    bits, sfmt = _DTYPES[dtype]
    n = len(offsets)
    entries = [
        (_TAG_W, 4, 1, [spec.width]), (_TAG_H, 4, 1, [spec.height]),
        (_TAG_BITS, 3, n_bands, [bits] * n_bands),
        (_TAG_COMP, 3, 1, [_COMP_CODES[compression]]),
        (_TAG_PHOTO, 3, 1, [2 if n_bands == 3 else 1]),
        (_TAG_SPP, 3, 1, [n_bands]),
        (_TAG_PLANAR, 3, 1, [2 if n_bands > 1 else 1]),
        (_TAG_SFMT, 3, n_bands, [sfmt] * n_bands),
        (_TAG_TW, 4, 1, [spec.tile]), (_TAG_TH, 4, 1, [spec.tile]),
        (_TAG_TOFF, 4, n, offsets), (_TAG_TCNT, 4, n, counts),
    ]
    if reduced:
        entries.append((_TAG_SUBFILE, 4, 1, [1]))  # reduced-resolution
    else:
        entries.extend([
            (_TAG_SCALE, 12, 3, [spec.gt[1], -spec.gt[5], 0.0]),
            (_TAG_TIEPOINT, 12, 6,
             [0.0, 0.0, 0.0, spec.gt[0], spec.gt[3], 0.0]),
            (_TAG_GEOKEYS, 3, None, _crs_geokeys(spec.crs)),
        ])
    if compression == "lerc":
        entries.append((_TAG_LERC_PARAMS, 4, 2, [4, 0]))
    if nodata is not None:
        nd = (repr(float(nodata)) + "\x00").encode()
        entries.append((_TAG_NODATA, 2, len(nd), list(nd)))
    entries.sort(key=lambda e: e[0])
    return entries


#: switch to BigTIFF when the classic 4-byte offsets would get within
#: one IFD of wrapping
_BIGTIFF_THRESHOLD = (1 << 32) - (1 << 25)


def _write_container(path: str, images: list, cog: bool = False,
                     bigtiff: bool | str = "auto") -> None:
    """images: [(spec, dtype, compression, nodata, ordered_blocks,
    reduced[, n_bands])] -> one TIFF with a chained IFD per image (the
    overview chain layout gdaladdo produces inside the GTiff driver).

    cog=True emits the Cloud-Optimized layout instead
    (frmts/gtiff/cogdriver.cpp contract): the whole IFD chain sits at
    the FRONT of the file so one small initial range-read captures all
    metadata, and pixel data follows with overview blocks FIRST and
    the full-resolution blocks LAST — the order an overview-first
    renderer streams them.

    bigtiff=True (or "auto" past 4 GB of block data) writes the
    BigTIFF layout (the public BigTIFF spec libtiff 4 implements:
    magic 43, 8-byte offsets, 20-byte IFD entries, LONG8 offset
    tags); "auto" mirrors gdal's BIGTIFF=IF_NEEDED creation option
    (frmts/gtiff/geotiff.cpp)."""
    parsed = []
    for img in images:
        spec, dtype, compression, nodata, ordered, reduced = img[:6]
        n_bands = img[6] if len(img) > 6 else 1
        parsed.append((spec, dtype, compression, nodata, ordered,
                       reduced, n_bands))

    if bigtiff == "auto":
        total = sum(len(b) for p in parsed for b in p[4])
        bigtiff = total >= _BIGTIFF_THRESHOLD
    big = bool(bigtiff)
    _FMT = {2: "B", 3: "H", 4: "I", 12: "d", 16: "Q"}
    _UNIT = {2: 1, 3: 2, 4: 4, 12: 8, 16: 8}
    inline = 8 if big else 4
    head = 16 if big else 8
    ent = 20 if big else 12
    pro = 8 if big else 2          # entry-count field
    nxt_sz = 8 if big else 4

    def build_entries(i, offsets, counts):
        s, dt, cp, nd, ordered, rd, nb = parsed[i]
        entries = _image_entries(s, dt, cp, nd, offsets, counts, rd, nb)
        if big:
            # offsets/counts go LONG8 so they can exceed 4 GB
            entries = [(tag, 16 if tag in (_TAG_TOFF, _TAG_TCNT) else typ,
                        cnt, vals) for tag, typ, cnt, vals in entries]
        return entries

    def entry_bytes(entries):
        """(ifd_size, external_payload_size) for a built entry list."""
        ext = 0
        for tag, typ, cnt, vals in entries:
            payload_len = len(vals) * _UNIT[typ]
            if payload_len > inline:
                ext += payload_len
        return pro + ent * len(entries) + nxt_sz, ext

    if cog:
        # IFD chain first: sizes are offset-independent, so build a
        # dummy pass to measure, lay out IFDs from the header, then
        # data (overviews first, full-res last)
        dummy = [build_entries(i, [0] * len(p[4]), [0] * len(p[4]))
                 for i, p in enumerate(parsed)]
        ifd_offs, cursor = [], head
        for entries in dummy:
            ifd_offs.append(cursor)
            sz, ext = entry_bytes(entries)
            cursor += sz + ext
        data_order = list(range(len(parsed)))[::-1]  # overviews first
        block_offs: dict[int, list[int]] = {}
        for i in data_order:
            offs = []
            for b in parsed[i][4]:
                offs.append(cursor)
                cursor += len(b)
            block_offs[i] = offs
    else:
        # classic layout: data after the header, IFD chain at the end
        pos = head
        block_offs = {}
        for i, (s, dt, cp, nd, ordered, rd, nb) in enumerate(parsed):
            offs = []
            for b in ordered:
                offs.append(pos)
                pos += len(b)
            block_offs[i] = offs
        data_order = list(range(len(parsed)))
        ifd_offs, cursor = [], pos

    per_img = []
    for i, (s, dt, cp, nd, ordered, rd, nb) in enumerate(parsed):
        per_img.append(build_entries(i, block_offs[i],
                                     [len(b) for b in ordered]))
    if not cog:
        for entries in per_img:
            ifd_offs.append(cursor)
            sz, ext = entry_bytes(entries)
            cursor += sz + ext

    with open(path, "wb") as f:
        if big:
            f.write(b"II+\x00" + struct.pack("<HHQ", 8, 0, ifd_offs[0]))
        else:
            f.write(b"II*\x00" + struct.pack("<I", ifd_offs[0]))
        if not cog:
            for i in data_order:
                for b in parsed[i][4]:
                    f.write(b)
        for i, entries in enumerate(per_img):
            data_off = ifd_offs[i] + pro + ent * len(entries) + nxt_sz
            nxt = ifd_offs[i + 1] if i + 1 < len(per_img) else 0
            ifd, extra = [], []
            for tag, typ, cnt, vals in entries:
                if cnt is None:
                    cnt = len(vals)
                payload = struct.pack(f"<{len(vals)}{_FMT[typ]}", *vals)
                if len(payload) <= inline:
                    hdr = struct.pack("<HHQ" if big else "<HHI",
                                      tag, typ, cnt)
                    ifd.append(hdr + payload.ljust(inline, b"\x00"))
                else:
                    ifd.append(struct.pack("<HHQQ" if big else "<HHII",
                                           tag, typ, cnt, data_off))
                    extra.append(payload)
                    data_off += len(payload)
            f.write(struct.pack("<Q" if big else "<H", len(entries))
                    + b"".join(ifd)
                    + struct.pack("<Q" if big else "<I", nxt)
                    + b"".join(extra))
        if cog:
            for i in data_order:
                for b in parsed[i][4]:
                    f.write(b)


def _parse_ifds(path: str):
    """-> (byte_order, [tags per IFD along the next-IFD chain]).
    Reads classic TIFF (magic 42) and BigTIFF (magic 43, 8-byte
    offsets/counts, LONG8/SLONG8/IFD8 types — the BigTIFF spec the
    GTiff driver implements); the writer stays classic-only."""
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
            big = True
            offsize, pad = struct.unpack(bo + "HH", head[4:8])
            if offsize != 8 or pad != 0:
                raise ValueError("malformed BigTIFF header")
            ifd_off = struct.unpack(bo + "Q", f.read(8))[0]
        elif magic == 42:
            big = False
            ifd_off = struct.unpack(bo + "I", head[4:8])[0]
        else:
            raise ValueError("not a TIFF (bad magic)")
        _SZ = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8, 13: 4, 16: 8, 17: 8}
        _FMT = {1: "B", 2: "B", 3: "H", 4: "I", 12: "d", 13: "I",
                16: "Q", 17: "q"}
        entry = 20 if big else 12
        inline = 8 if big else 4
        all_tags = []
        while ifd_off:
            f.seek(ifd_off)
            if big:
                n = struct.unpack(bo + "Q", f.read(8))[0]
            else:
                n = struct.unpack(bo + "H", f.read(2))[0]
            raw = f.read(entry * n)
            ifd_off = struct.unpack(bo + ("Q" if big else "I"),
                                    f.read(8 if big else 4))[0]
            tags = {}
            for i in range(n):
                if big:
                    tag, typ = struct.unpack_from(bo + "HH", raw, entry * i)
                    cnt = struct.unpack_from(bo + "Q", raw, entry * i + 4)[0]
                else:
                    tag, typ, cnt = struct.unpack_from(bo + "HHI", raw,
                                                       entry * i)
                if typ not in _FMT:
                    continue
                size = _SZ[typ] * cnt
                voff = entry * i + (12 if big else 8)
                if size <= inline:
                    vals = struct.unpack_from(
                        bo + f"{cnt}{_FMT[typ]}", raw, voff)
                else:
                    off = struct.unpack_from(bo + ("Q" if big else "I"),
                                             raw, voff)[0]
                    here = f.tell()
                    f.seek(off)
                    vals = struct.unpack(bo + f"{cnt}{_FMT[typ]}",
                                         f.read(size))
                    f.seek(here)
                tags[tag] = list(vals)
            all_tags.append(tags)
    return bo, all_tags


def _parse_ifd(path: str):
    bo, all_tags = _parse_ifds(path)
    return bo, all_tags[0]


def read_geotiff(spark: SparkSession, path: str,
                 partitions: int | None = None, overview: int = 0,
                 band: int = 0) -> tuple[G.GridSpec, DataFrame]:
    """Tiled GeoTIFF -> (GridSpec, tile relation). One byte-range
    reader per task; px is always float64 (the engine's tile model).
    overview=k selects the k-th reduced-resolution IFD (0 = full
    resolution); its geotransform derives from the full-resolution
    georeferencing scaled by the size ratio, as the GTiff driver
    serves overview bands."""
    path = os.path.abspath(path)
    bo, all_tags = _parse_ifds(path)
    if overview >= len(all_tags):
        raise ValueError(
            f"overview {overview}: file has {len(all_tags) - 1} overviews")
    tags = all_tags[overview]
    tags0 = all_tags[0]
    stripped = _TAG_STRIP_OFF in tags
    n_bands = tags.get(_TAG_SPP, [1])[0]
    if n_bands > 1 and tags.get(_TAG_PLANAR, [1])[0] != 2:
        raise NotImplementedError(
            "multi-band TIFFs: only separate planes "
            "(PlanarConfiguration=2) are supported")
    if band >= n_bands:
        raise ValueError(f"band {band}: file has {n_bands} band(s)")
    comp = tags.get(_TAG_COMP, [1])[0]
    if comp not in (1, 5, 8, 32773, 50000, 34887):
        raise NotImplementedError(f"compression {comp}: support none(1)/"
                                  "LZW(5)/deflate(8)/PackBits(32773)/"
                                  "LERC(34887)/ZSTD(50000)")
    if comp == 34887 and tags.get(_TAG_LERC_PARAMS, [4, 0])[1] != 0:
        raise NotImplementedError(
            "LERC with additional deflate/zstd wrapping "
            "(LERC_PARAMETERS[1] != 0) not supported — plain LERC only")
    predictor = tags.get(_TAG_PRED, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF Predictor={predictor}: only none(1)/horizontal(2)")
    width, height = tags[_TAG_W][0], tags[_TAG_H][0]
    if stripped:
        # strip files re-tile into the engine's square tile model
        ts = 256
    else:
        ts = tags[_TAG_TW][0]
        if tags[_TAG_TH][0] != ts:
            raise NotImplementedError("non-square TIFF tiles")
    bits = tags.get(_TAG_BITS, [8])[0]
    sfmt = tags.get(_TAG_SFMT, [1])[0]
    dtype = _BACK.get((bits, sfmt))
    if dtype is None:
        raise NotImplementedError(f"sample type bits={bits} fmt={sfmt}")
    if _TAG_SCALE in tags0 and _TAG_TIEPOINT in tags0:
        sx0, sy0 = tags0[_TAG_SCALE][0], tags0[_TAG_SCALE][1]
        # overview pixel size = full extent / overview size
        sx = sx0 * tags0[_TAG_W][0] / width
        sy = sy0 * tags0[_TAG_H][0] / height
        tp = tags0[_TAG_TIEPOINT]
        gt = (tp[3] - tp[0] * sx0, sx, 0.0, tp[4] + tp[1] * sy0, 0.0, -sy)
    else:
        # ungeoreferenced TIFF: identity pixel grid, the GDAL default
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    crs = _geokeys_crs([int(v) for v in tags0[_TAG_GEOKEYS]]) \
        if _TAG_GEOKEYS in tags0 else "EPSG:4326"
    spec = G.GridSpec(width=width, height=height, gt=gt, crs=crs, tile=ts)

    if stripped:
        return spec, _read_strips(spark, path, spec, tags, bo, dtype,
                                  comp, predictor, n_bands, band,
                                  partitions)

    offs, cnts = tags[_TAG_TOFF], tags[_TAG_TCNT]
    per_band = len(offs) // n_bands
    offs = offs[band * per_band:(band + 1) * per_band]
    cnts = cnts[band * per_band:(band + 1) * per_band]
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
                    need = ts * ts * np_dtype.itemsize
                    if comp == 8:
                        b = zlib.decompress(b)
                    elif comp == 5:
                        from . import lzw as _lzw
                        b = _lzw.decode(b)
                    elif comp == 32773:
                        from . import packbits as _pb
                        b = _pb.decode(b)
                    elif comp == 50000:
                        from . import zstdcodec as _zs
                        b = _zs.decode(b, need)
                    elif comp == 34887:
                        from . import lerc as _lerc
                        b = _lerc.decode(b, np_dtype)
                    if comp != 1 and len(b) < need:
                        # short block: libtiff tolerates truncated
                        # final rows and zero-fills (tif_read.c)
                        b = b + b"\x00" * (need - len(b))
                    a = np.frombuffer(b, np_dtype,
                                      count=ts * ts).reshape(ts, ts)
                    if predictor == 2:
                        from . import lzw as _lzw
                        a = _lzw.undo_horizontal_predictor(a)
                    h, w = spec.tile_shape(int(ty), int(tx))
                    out_ty.append(int(ty))
                    out_tx.append(int(tx))
                    out_px.append(a[:h, :w].astype(np.float64)
                                  .ravel().tolist())
            yield pd.DataFrame({"tile_y": out_ty, "tile_x": out_tx,
                                "px": out_px})

    return spec, mdf.mapInPandas(gen, schema=G.TILE_SCHEMA)


def _reduce_2x2_masked(buf: np.ndarray, kernel: str,
                       nodata: float | None, fill: float) -> np.ndarray:
    """(2h, 2w) -> (h, w). NaN marks out-of-extent/absent pixels; a
    user nodata value is excluded too — partial windows reduce over
    their VALID pixels only (overview.cpp's nodata-aware averaging)."""
    h, w = buf.shape[0] // 2, buf.shape[1] // 2
    a = buf.reshape(h, 2, w, 2).transpose(0, 2, 1, 3).reshape(h, w, 4)
    if kernel == "near":
        # top-left child of an in-extent parent pixel always exists
        return np.where(np.isnan(a[:, :, 0]), fill, a[:, :, 0])
    valid = ~np.isnan(a)
    if nodata is not None:
        valid &= a != nodata
    n = valid.sum(-1)
    safe = np.where(valid, a, 0.0)
    if kernel == "average":
        out = safe.sum(-1) / np.maximum(n, 1)
    elif kernel == "sum":
        out = safe.sum(-1)
    elif kernel == "rms":
        out = np.sqrt((safe ** 2).sum(-1) / np.maximum(n, 1))
    elif kernel == "mode":
        out = np.full((h, w), fill)
        for i in range(h):
            for j in range(w):
                vs = a[i, j][valid[i, j]]
                if len(vs):
                    u, c = np.unique(vs, return_counts=True)
                    out[i, j] = u[np.argmax(c)]
        return out
    else:
        raise ValueError(f"overview kernel {kernel!r}: "
                         "want near|average|sum|rms|mode")
    return np.where(n > 0, out, fill)


def overview_once(tiles: DataFrame, spec: G.GridSpec,
                  kernel: str = "average",
                  nodata: float | None = None,
                  fill: float = 0.0) -> tuple[DataFrame, G.GridSpec]:
    """One 2x reduction of an arbitrary GridSpec tile relation
    (overview.cpp downsampling restated as a parent-tile gather:
    parent (ty, tx) groups its <=4 child tiles, one shuffle)."""
    ospec = G.GridSpec(width=-(-spec.width // 2),
                       height=-(-spec.height // 2),
                       gt=(spec.gt[0], spec.gt[1] * 2, spec.gt[2],
                           spec.gt[3], spec.gt[4], spec.gt[5] * 2),
                       crs=spec.crs, tile=spec.tile)
    ts = spec.tile

    keyed = (tiles.withColumn("p_ty", (F.col("tile_y") / 2).cast("int"))
             .withColumn("p_tx", (F.col("tile_x") / 2).cast("int")))

    def reduce_parent(key, pdf: pd.DataFrame) -> pd.DataFrame:
        p_ty, p_tx = int(key[0]), int(key[1])
        buf = np.full((2 * ts, 2 * ts), np.nan, np.float64)
        for _, r in pdf.iterrows():
            cy, cx = int(r.tile_y), int(r.tile_x)
            h, w = spec.tile_shape(cy, cx)
            buf[(cy - 2 * p_ty) * ts:(cy - 2 * p_ty) * ts + h,
                (cx - 2 * p_tx) * ts:(cx - 2 * p_tx) * ts + w] = \
                np.asarray(r.px, np.float64).reshape(h, w)
        red = _reduce_2x2_masked(buf, kernel, nodata, fill)
        oh, ow = ospec.tile_shape(p_ty, p_tx)
        return pd.DataFrame({"tile_y": [p_ty], "tile_x": [p_tx],
                             "px": [red[:oh, :ow].ravel().tolist()]})

    out = (keyed.groupBy("p_ty", "p_tx")
           .applyInPandas(reduce_parent, schema=G.TILE_SCHEMA))
    return out, ospec


def add_overviews(spark: SparkSession, path: str,
                  levels: tuple[int, ...] = (2, 4, 8),
                  kernel: str = "average", dtype: str = "float64",
                  compression: str = "deflate",
                  nodata: float | None = None, cog: bool = False) -> None:
    """gdaladdo analog: rewrite the file with a reduced-resolution IFD
    chain (NewSubfileType=1 per overview, like the GTiff driver's
    internal overviews). levels must be successive powers of two."""
    lv = sorted(set(int(l) for l in levels))
    if any(l & (l - 1) or l < 2 for l in lv):
        raise ValueError(f"levels must be powers of two >= 2, got {levels}")
    # every band gets an overview chain (gdaladdo builds overviews for
    # ALL bands; dropping bands 1..n-1 here would corrupt the file)
    spec, bands = read_geotiff_bands(spark, path)
    fill = float(nodata) if nodata is not None else 0.0
    images = [(spec, list(bands))]
    cur_b, cur_s, factor = list(bands), spec, 1
    for l in lv:
        while factor < l:
            nxt_b, nxt_s = [], None
            for bt in cur_b:
                ot, nxt_s = overview_once(bt, cur_s, kernel,
                                          nodata=nodata, fill=fill)
                nxt_b.append(ot)
            cur_b, cur_s = nxt_b, nxt_s
            factor *= 2
        images.append((cur_s, list(cur_b)))
    packed = []
    for i, (s, bts) in enumerate(images):
        blocks = []
        for bt in bts:  # band-major tile order (PlanarConfiguration=2)
            blocks.extend(_pack_blocks(bt, s, dtype, compression, fill))
        packed.append((s, dtype, compression,
                       nodata if i == 0 else None, blocks, i > 0, len(bts)))
    _write_container(path, packed, cog=cog)


def _pack_blocks(tiles: DataFrame, spec: G.GridSpec, dtype: str,
                 compression: str, fill: float) -> list[bytes]:
    ts = spec.tile

    @F.pandas_udf(T.BinaryType())
    def pack_exact(ty: pd.Series, tx: pd.Series, px: pd.Series) -> pd.Series:
        out = []
        for y, x, arr in zip(ty, tx, px):
            h, w = spec.tile_shape(int(y), int(x))
            a = np.asarray(arr, np.float64).reshape(h, w)
            full = np.full((ts, ts), fill, np.float64)
            full[:h, :w] = a
            raw = full.astype(dtype).tobytes()
            if compression == "deflate":
                raw = zlib.compress(raw, 6)
            elif compression == "lzw":
                from . import lzw as _lzw
                raw = _lzw.encode(raw)
            elif compression == "packbits":
                from . import packbits as _pb
                raw = _pb.encode(raw)
            elif compression == "zstd":
                from . import zstdcodec as _zs
                raw = _zs.encode(raw)
            elif compression == "lerc":
                from . import lerc as _lerc
                raw = _lerc.encode(raw, np.dtype(dtype), ts, ts)
            out.append(raw)
        return pd.Series(out)

    rows = (tiles.select("tile_y", "tile_x",
                         pack_exact("tile_y", "tile_x", "px").alias("blk"))
            .collect())
    blocks = {(r.tile_y, r.tile_x): bytes(r.blk) for r in rows}
    empty_raw = np.full((ts, ts), fill, np.float64).astype(dtype).tobytes()
    if compression == "deflate":
        empty = zlib.compress(empty_raw, 6)
    elif compression == "lzw":
        from . import lzw as _lzw
        empty = _lzw.encode(empty_raw)
    elif compression == "packbits":
        from . import packbits as _pb
        empty = _pb.encode(empty_raw)
    elif compression == "zstd":
        from . import zstdcodec as _zs
        empty = _zs.encode(empty_raw)
    elif compression == "lerc":
        from . import lerc as _lerc
        empty = _lerc.encode(empty_raw, np.dtype(dtype), ts, ts)
    else:
        empty = empty_raw
    return [blocks.get((ty, tx), empty)
            for ty in range(spec.tiles_y) for tx in range(spec.tiles_x)]


def write_geotiff_bands(bands: list[DataFrame], spec: G.GridSpec,
                        path: str, dtype: str = "float64",
                        compression: str = "deflate",
                        nodata: float | None = None,
                        max_tiles: int = 65536) -> None:
    """Multi-band tiled GeoTIFF, separate planes (PlanarConfiguration=2,
    band-major tile order per TIFF 6.0). Each band is its own tile
    relation over the SAME GridSpec; per-tile deflate still runs
    distributed per band."""
    if spec.tiles_x * spec.tiles_y * len(bands) > max_tiles:
        raise ValueError(
            f"{spec.tiles_x * spec.tiles_y * len(bands)} tile blocks > "
            f"max_tiles={max_tiles}: write the parquet tile store at scale")
    fill = float(nodata) if nodata is not None else 0.0
    ordered = []
    for b in bands:
        ordered.extend(_pack_blocks(b, spec, dtype, compression, fill))
    _write_container(path, [(spec, dtype, compression, nodata, ordered,
                             False, len(bands))])


def read_geotiff_bands(spark: SparkSession, path: str,
                       partitions: int | None = None
                       ) -> tuple[G.GridSpec, list[DataFrame]]:
    """All bands of a multi-band GeoTIFF as one tile relation per band."""
    _, all_tags = _parse_ifds(path)
    n = all_tags[0].get(_TAG_SPP, [1])[0]
    spec = None
    out = []
    for b in range(n):
        spec, df = read_geotiff(spark, path, partitions=partitions, band=b)
        out.append(df)
    return spec, out


def overview_count(path: str) -> int:
    """Number of reduced-resolution IFDs in the file."""
    _, all_tags = _parse_ifds(path)
    return len(all_tags) - 1


_TAG_ROWS_PER_STRIP, _TAG_STRIP_CNT = 278, 279


def _read_strips(spark: SparkSession, path: str, spec: G.GridSpec,
                 tags: dict, bo: str, dtype: str, comp: int,
                 predictor: int, n_bands: int, band: int,
                 partitions: int | None) -> DataFrame:
    """Strip-organized TIFF read (the layout most non-COG files in the
    wild use; the GTiff driver reads both): each task byte-range-reads
    and decompresses its strips, undoes the row predictor, slices the
    rows into the engine's square-tile columns, and one groupBy
    assembles the (tile_y, tile_x, px) relation — strips become just
    another physical partitioning of the same tile model."""
    offs = tags[_TAG_STRIP_OFF]
    cnts = tags[_TAG_STRIP_CNT]
    rps = tags.get(_TAG_ROWS_PER_STRIP, [spec.height])[0]
    per_band = len(offs) // n_bands
    offs = offs[band * per_band:(band + 1) * per_band]
    cnts = cnts[band * per_band:(band + 1) * per_band]
    meta = [(s, int(offs[s]), int(cnts[s])) for s in range(len(offs))]
    if partitions is None:
        partitions = int(spark.sparkContext.defaultParallelism)
    mdf = spark.createDataFrame(meta, "sid int, off long, cnt long") \
        .repartition(min(partitions, max(1, len(meta))))
    np_dtype = np.dtype(dtype).newbyteorder("<" if bo == "<" else ">")
    ts = spec.tile
    w, h = spec.width, spec.height

    frag_schema = T.StructType([
        T.StructField("tile_y", T.IntegerType(), False),
        T.StructField("tile_x", T.IntegerType(), False),
        T.StructField("y0", T.IntegerType(), False),   # row offset in tile
        T.StructField("rows", T.IntegerType(), False),
        T.StructField("px", T.ArrayType(T.DoubleType()), False),
    ])

    def frags(batches):
        from . import lzw as _lzw

        for pdf in batches:
            out = []
            with open(path, "rb") as f:
                for sid, off, cnt in zip(pdf["sid"], pdf["off"],
                                         pdf["cnt"]):
                    f.seek(int(off))
                    b = f.read(int(cnt))
                    r0 = int(sid) * rps
                    nr_ = min(rps, h - r0)
                    if comp == 8:
                        b = zlib.decompress(b)
                    elif comp == 5:
                        b = _lzw.decode(b)
                    elif comp == 32773:
                        from . import packbits as _pb
                        b = _pb.decode(b)
                    elif comp == 50000:
                        from . import zstdcodec as _zs
                        b = _zs.decode(b, nr_ * w * np_dtype.itemsize)
                    elif comp == 34887:
                        from . import lerc as _lerc
                        b = _lerc.decode(b, np_dtype)
                    nr = min(rps, h - r0)
                    a = np.frombuffer(b, np_dtype, count=nr * w) \
                        .reshape(nr, w)
                    if predictor == 2:
                        a = _lzw.undo_horizontal_predictor(a)
                    a = a.astype(np.float64)
                    for ty in range(r0 // ts, (r0 + nr - 1) // ts + 1):
                        ya = max(r0, ty * ts)
                        yb = min(r0 + nr, min((ty + 1) * ts, h))
                        for tx in range(spec.tiles_x):
                            xa = tx * ts
                            xb = min(xa + ts, w)
                            out.append((
                                ty, tx, ya - ty * ts, yb - ya,
                                a[ya - r0:yb - r0, xa:xb]
                                .ravel().tolist()))
            yield pd.DataFrame(out, columns=[f.name for f in frag_schema])

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        th, tw = spec.tile_shape(ty, tx)
        canvas = np.zeros((th, tw), np.float64)
        for _, r in pdf.iterrows():
            canvas[int(r.y0):int(r.y0) + int(r.rows)] = \
                np.asarray(r.px, np.float64).reshape(int(r.rows), tw)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [canvas.ravel().tolist()]})

    return (mdf.mapInPandas(frags, frag_schema)
            .groupBy("tile_y", "tile_x")
            .applyInPandas(assemble, G.TILE_SCHEMA))
