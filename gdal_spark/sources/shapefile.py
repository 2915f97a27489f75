"""ESRI Shapefile source + sink — from-scratch .shp/.shx/.dbf codec.

Reference: the Shapefile driver (ogr/ogrsf_frmts/shape/: shapelib/
shpopen.c record walk, shapelib/dbfopen.c attribute table,
shape2ogr.cpp SHPObject -> OGRGeometry incl. ring-orientation polygon
assembly — OGRGeometryFactory::organizePolygons). Format layout is the
public ESRI whitepaper ("ESRI Shapefile Technical Description", 1998).

Spark-first shape: a shapefile is NOT splittable (variable-length
records, offsets only in .shx), but layers ship as directories of many
files — so the unit of parallelism is the FILE PAIR, exactly like the
reference's per-layer access:

    spark.read.format("binaryFile") on *.shp and *.dbf
      -> equi-join pairs on basename (tiny; broadcast)
      -> mapInPandas: decode one pair per row into feature rows

The attribute schema comes from the first .dbf header (driver-side
~32-byte/field read, same as OGR's layer-open probe); all pairs must
share it. Geometry lands as WKB. XY only (Z/M variants parse and drop
the extra ordinates, like OGR's default 2D promotion).

The writer mirrors dbfopen.c's field formatting (right-justified
numerics, space padding) and shpopen.c's record framing; it is a
driver-side single-writer (the format is one file triple) guarded by
max_features — big outputs belong in parquet/GeoJSONSeq.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import geom, wkb

SHP_NULL, SHP_POINT, SHP_ARC, SHP_POLYGON, SHP_MULTIPOINT = 0, 1, 3, 5, 8
_XY_OF = {11: 1, 21: 1, 13: 3, 23: 3, 15: 5, 25: 5, 18: 8, 28: 8}


# ------------------------------------------------------------------ dbf


def _dbf_fields(buf: bytes):
    """-> (n_records, header_size, record_size, [(name, type, len, dec)])."""
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    return n_rec, hdr_size, rec_size, fields


def _dbf_value(raw: bytes, ftype: str, fdec: int):
    s = raw.decode("latin-1").strip()
    if not s or s == "*" * len(s):
        return None
    if ftype == "C" or ftype == "D":
        return s
    if ftype == "L":
        return s in "YyTt"
    if ftype in ("N", "F"):
        try:
            return int(s) if ftype == "N" and fdec == 0 else float(s)
        except ValueError:
            return None
    return s


def _spark_type(ftype: str, flen: int, fdec: int):
    if ftype == "C" or ftype == "D":
        return T.StringType()
    if ftype == "L":
        return T.BooleanType()
    if ftype == "N" and fdec == 0:
        return T.LongType()
    return T.DoubleType()


# ------------------------------------------------------------------ shp


def _rings_to_polys(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Shapefile polygon record -> polygons. Spec: OUTER rings are
    CLOCKWISE, holes counter-clockwise (shape2ogr.cpp ring walk +
    organizePolygons); each hole nests into the smallest containing
    shell. Our convention is shell-CCW, so shells flip on the way in."""
    shells, holes = [], []
    for r in rings:
        (holes if geom.ring_area(r) > 0 else shells).append(r)
    if not shells:  # degenerate: treat every ring as a shell
        return [[r.copy()] for r in holes] if holes else []
    polys = [[s[::-1].copy()] for s in shells]  # flip CW -> CCW
    for h in holes:
        best, best_area = None, None
        hx, hy = h[0]
        for i, p in enumerate(polys):
            a = abs(geom.ring_area(p[0]))
            if geom.points_in_ring(np.array([hx]), np.array([hy]),
                                   p[0])[0]:
                if best is None or a < best_area:
                    best, best_area = i, a
        if best is None:
            polys.append([h.copy()])  # orphan hole -> own CCW shell
        else:
            polys[best].append(h[::-1].copy())  # file CCW -> our CW hole
    return polys


def _shape_to_wkb(stype: int, body: bytes) -> bytes | None:
    stype = _XY_OF.get(stype, stype)
    if stype == SHP_NULL:
        return None
    if stype == SHP_POINT:
        x, y = struct.unpack_from("<dd", body, 4)
        return wkb.point(x, y)
    if stype == SHP_MULTIPOINT:
        n = struct.unpack_from("<i", body, 36)[0]
        pts = np.frombuffer(body, "<f8", n * 2, 40).reshape(-1, 2)
        return wkb.multipoint(pts)
    if stype in (SHP_ARC, SHP_POLYGON):
        nparts, npts = struct.unpack_from("<ii", body, 36)
        parts = np.frombuffer(body, "<i4", nparts, 44)
        pts = np.frombuffer(body, "<f8", npts * 2, 44 + 4 * nparts)
        pts = pts.reshape(-1, 2)
        bounds = list(parts) + [npts]
        segs = [pts[bounds[i]:bounds[i + 1]].copy()
                for i in range(nparts) if bounds[i + 1] > bounds[i]]
        if stype == SHP_ARC:
            if len(segs) == 1:
                return wkb.linestring(segs[0])
            return wkb.multilinestring(segs)
        polys = _rings_to_polys(segs)
        if len(polys) == 1:
            return wkb.polygon(polys[0])
        return wkb.multipolygon(polys)
    raise ValueError(f"unsupported shapefile shape type {stype}")


def _decode_pair(shp: bytes, dbf: bytes):
    """-> (geom_wkb_list, attr_rows) for one .shp/.dbf pair."""
    n_rec, hdr_size, rec_size, fields = _dbf_fields(dbf)
    attrs = []
    pos = hdr_size
    for _ in range(n_rec):
        rec = dbf[pos:pos + rec_size]
        pos += rec_size
        if rec[:1] == b"*":  # deleted row
            continue
        row, off = [], 1
        for name, ftype, flen, fdec in fields:
            row.append(_dbf_value(rec[off:off + flen], ftype, fdec))
            off += flen
        attrs.append(row)
    geoms = []
    pos = 100
    total = struct.unpack_from(">i", shp, 24)[0] * 2
    while pos < total:
        _recno, clen = struct.unpack_from(">ii", shp, pos)
        body = shp[pos + 8:pos + 8 + clen * 2]
        stype = struct.unpack_from("<i", body, 0)[0]
        geoms.append(_shape_to_wkb(stype, body))
        pos += 8 + clen * 2
    return geoms, attrs


def read_shapefile(spark: SparkSession, path: str,
                   geom_col: str = "geom") -> DataFrame:
    """Read a shapefile layer (one .shp or a directory/glob of pairs).
    Parallelism = one task per file pair; schema from the first .dbf
    header (all pairs must agree, as in a partitioned layer)."""
    if path.endswith(".shp"):
        shp_glob, dbf_glob = path, path[:-4] + ".dbf"
    else:
        shp_glob = os.path.join(path, "*.shp")
        dbf_glob = os.path.join(path, "*.dbf")
    shp_df = (spark.read.format("binaryFile").load(shp_glob)
              .select(F.regexp_replace(F.element_at(F.split("path", "/"), -1),
                                       r"\.shp$", "").alias("base"),
                      F.col("content").alias("shp")))
    dbf_df = (spark.read.format("binaryFile").load(dbf_glob)
              .select(F.regexp_replace(F.element_at(F.split("path", "/"), -1),
                                       r"\.dbf$", "").alias("base"),
                      F.col("content").alias("dbf")))
    # schema probe: only the dbf HEADER travels to the driver (dBASE
    # caps at 255 fields -> 32 + 255*32 + 1 bytes bound the descriptor
    # block), not the first file's full contents
    first = (dbf_df.select(F.substring("dbf", 1, 32 + 255 * 32 + 1)
                           .alias("hdr")).limit(1).collect())
    if not first:
        raise FileNotFoundError(f"no .dbf next to {shp_glob}")
    _, _, _, fields = _dbf_fields(bytes(first[0].hdr))
    schema = T.StructType(
        [T.StructField(n, _spark_type(t, l, d), True)
         for n, t, l, d in fields]
        + [T.StructField(geom_col, T.BinaryType(), True)])

    def gen(batches):
        for pdf in batches:
            for shp, dbf in zip(pdf["shp"], pdf["dbf"]):
                geoms, attrs = _decode_pair(bytes(shp), bytes(dbf))
                if len(geoms) != len(attrs):
                    raise ValueError(
                        f".shp has {len(geoms)} records, .dbf {len(attrs)}")
                cols = list(zip(*attrs)) if attrs else [
                    [] for _ in fields]
                data = {n: list(c) for (n, *_), c in zip(fields, cols)}
                data[geom_col] = geoms
                yield pd.DataFrame(data, columns=[f[0] for f in fields]
                                   + [geom_col])

    paired = shp_df.join(F.broadcast(dbf_df), "base", "inner")
    return paired.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------- write


def _wkb_to_shape(buf: bytes | None) -> tuple[int, bytes]:
    if buf is None:
        return SHP_NULL, struct.pack("<i", SHP_NULL)
    t, payload = wkb.decode(bytes(buf))
    if t == wkb.POINT:
        return SHP_POINT, struct.pack("<idd", SHP_POINT, *payload)
    if t == wkb.MULTIPOINT:
        pts = np.asarray(payload, np.float64).reshape(-1, 2)
        return SHP_MULTIPOINT, (
            struct.pack("<i4d i", SHP_MULTIPOINT, *_bbox(pts), len(pts))
            + pts.tobytes())
    if t in (wkb.LINESTRING, wkb.MULTILINESTRING):
        segs = [np.asarray(payload, np.float64)] if t == wkb.LINESTRING \
            else [np.asarray(s, np.float64) for s in payload]
        return SHP_ARC, _parts_record(SHP_ARC, segs)
    if t in (wkb.POLYGON, wkb.MULTIPOLYGON):
        polys = [payload] if t == wkb.POLYGON else payload
        rings = []
        for p in polys:
            from ..geo import overlay
            norm = overlay.normalize(p)
            # spec: shells CW, holes CCW — the reverse of our convention
            rings.append(norm[0][::-1].copy())
            rings.extend(h[::-1].copy() for h in norm[1:])
        return SHP_POLYGON, _parts_record(SHP_POLYGON, rings)
    raise ValueError(f"cannot write WKB type {t} to shapefile")


def _bbox(pts: np.ndarray):
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


def _parts_record(stype: int, segs: list[np.ndarray]) -> bytes:
    allp = np.vstack(segs)
    npts = sum(len(s) for s in segs)
    offs, acc = [], 0
    for s in segs:
        offs.append(acc)
        acc += len(s)
    return (struct.pack("<i4dii", stype, *_bbox(allp), len(segs), npts)
            + np.asarray(offs, "<i4").tobytes()
            + allp.astype("<f8").tobytes())


def _infer_dbf_fields(df_schema: T.StructType, geom_col: str):
    fields = []
    for f in df_schema.fields:
        if f.name == geom_col:
            continue
        name = f.name[:10]
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            fields.append((name, "N", 18, 0))
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType,
                                     T.DecimalType)):
            fields.append((name, "N", 24, 15))
        elif isinstance(f.dataType, T.BooleanType):
            fields.append((name, "L", 1, 0))
        else:
            fields.append((name, "C", 80, 0))
    return fields


def _dbf_format(v, ftype: str, flen: int, fdec: int) -> bytes:
    if v is None:
        return b" " * flen
    if ftype == "L":
        return b"T" if v else b"F"
    if ftype == "N":
        s = f"{v:.{fdec}f}" if fdec else str(int(v))
        if len(s) > flen:
            # dbfopen.c overflow convention: '*' fill, readers see NULL
            # (never silently truncate digits)
            return b"*" * flen
        return s.rjust(flen).encode("latin-1")
    return str(v)[:flen].ljust(flen).encode("latin-1")


def write_shapefile(df: DataFrame, path: str, geom_col: str = "geom",
                    max_features: int = 1_000_000) -> None:
    """Write one .shp/.shx/.dbf triple (path without extension).
    Single-writer by format design (shpopen.c appends to one file);
    guarded by max_features — use parquet/GeoJSONSeq at scale."""
    fields = _infer_dbf_fields(df.schema, geom_col)
    names = [f.name for f in df.schema.fields if f.name != geom_col]

    # shape + dbf record encoding runs DISTRIBUTED; the driver only
    # streams finished bytes (same shape as the GeoPackage writer)
    b_fields = fields

    @F.pandas_udf("stype int, body binary, rec binary, "
                  "xmin double, ymin double, xmax double, ymax double")
    def conv(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            stype, body = _wkb_to_shape(
                bytes(row[geom_col]) if row[geom_col] is not None
                else None)
            if stype != SHP_NULL:
                pts = _shape_points(stype, body)
                bb = (float(pts[:, 0].min()), float(pts[:, 1].min()),
                      float(pts[:, 0].max()), float(pts[:, 1].max()))
            else:
                bb = (None, None, None, None)
            rec = b" " + b"".join(
                _dbf_format(row[nm], ft, fl, fd)
                for nm, (_, ft, fl, fd) in zip(names, b_fields))
            out.append((stype, body, rec) + bb)
        return pd.DataFrame(out, columns=["stype", "body", "rec",
                                          "xmin", "ymin", "xmax",
                                          "ymax"])

    prepared = df.withColumn("__s__", conv(F.struct("*"))).persist()
    agg = prepared.agg(
        F.count(F.lit(1)), F.max("__s__.stype"),
        F.min("__s__.xmin"), F.min("__s__.ymin"),
        F.max("__s__.xmax"), F.max("__s__.ymax")).collect()[0]
    n = agg[0]
    if n > max_features:
        prepared.unpersist()
        raise ValueError(
            f"{n} features > max_features={max_features}: a shapefile "
            "is a single file triple; write parquet or GeoJSONSeq "
            "instead")
    shape_type = int(agg[1] or SHP_NULL)
    bx = [agg[2], agg[3], agg[4], agg[5]]
    if bx[0] is None:
        bx = [0.0, 0.0, 0.0, 0.0]
    shp_recs, dbf_recs = [], []
    for row in prepared.select("__s__.body", "__s__.rec") \
            .toLocalIterator(prefetchPartitions=True):
        shp_recs.append(bytes(row.body))
        dbf_recs.append(bytes(row.rec))
    prepared.unpersist()

    shp_body, shx_body, off = [], [], 50  # offsets in 16-bit words
    for i, body in enumerate(shp_recs):
        clen = len(body) // 2
        shp_body.append(struct.pack(">ii", i + 1, clen) + body)
        shx_body.append(struct.pack(">ii", off, clen))
        off += 4 + clen
    hdr = lambda words: (struct.pack(">i", 9994) + b"\x00" * 20
                         + struct.pack(">i", words)
                         + struct.pack("<ii", 1000, shape_type)
                         + struct.pack("<4d", *bx) + b"\x00" * 32)
    with open(path + ".shp", "wb") as f:
        f.write(hdr(off) + b"".join(shp_body))
    with open(path + ".shx", "wb") as f:
        f.write(hdr(50 + 4 * len(shp_recs)) + b"".join(shx_body))

    rec_size = 1 + sum(fl for _, _, fl, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = [struct.pack("<BBBBIHH", 0x03, 95, 7, 26, len(dbf_recs),
                       hdr_size, rec_size) + b"\x00" * 20]
    for name, ftype, flen, fdec in fields:
        out.append(name.encode("latin-1").ljust(11, b"\x00")
                   + ftype.encode() + b"\x00" * 4
                   + bytes([flen, fdec]) + b"\x00" * 14)
    out.append(b"\x0d")
    out.extend(dbf_recs)
    out.append(b"\x1a")
    with open(path + ".dbf", "wb") as f:
        f.write(b"".join(out))


def _shape_points(stype: int, body: bytes) -> np.ndarray:
    if stype == SHP_POINT:
        return np.array([struct.unpack_from("<dd", body, 4)])
    if stype == SHP_MULTIPOINT:
        n = struct.unpack_from("<i", body, 36)[0]
        return np.frombuffer(body, "<f8", n * 2, 40).reshape(-1, 2)
    nparts, npts = struct.unpack_from("<ii", body, 36)
    return np.frombuffer(body, "<f8", npts * 2,
                         44 + 4 * nparts).reshape(-1, 2)
