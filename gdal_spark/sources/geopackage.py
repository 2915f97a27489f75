"""GeoPackage (OGC .gpkg) source + sink via the stdlib sqlite3 module.

Reference: the GPKG driver (ogr/ogrsf_frmts/gpkg/: layer discovery from
gpkg_contents + gpkg_geometry_columns — ogrgeopackagedatasource.cpp;
StandardGeoPackageBinary blob codec — ogrgeopackageutility.cpp:200-280:
'GP' magic, version, flags byte (bit0 header byte order, bits1-3
envelope contents, bit4 empty), int32 srs_id, optional envelope
doubles, then ISO WKB).

Spark-first shape: a .gpkg is one SQLite file, but SQLite supports any
number of concurrent READERS — so the read path splits ONE file by
rowid range: a driver-side probe reads the layer registry, the column
schema (PRAGMA table_info) and min/max rowid, then each task opens the
file read-only and scans `rowid BETWEEN lo AND hi`. That gives
intra-file parallelism shapefile/GeoJSON-FeatureCollection cannot
(requires the path to be visible from executors: local mode or a
shared/NFS-style mount; on object stores, localize first). Geometry
blobs strip to raw ISO WKB bytes — Z/M geometries pass through
opaquely.

The writer creates a spec-compliant minimal package (application_id
'GPKG', gpkg_spatial_ref_sys with the two mandatory rows + EPSG:4326,
gpkg_contents, gpkg_geometry_columns, feature table with fid INTEGER
PRIMARY KEY) driver-side under a max_features guard — one SQLite file
is a single-writer format.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import curves, geom, wkb

_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def gpkg_blob_to_wkb(blob: bytes | None) -> bytes | None:
    """StandardGeoPackageBinary -> raw WKB (header strip,
    ogrgeopackageutility.cpp GPkgHeaderFromWKB)."""
    if blob is None:
        return None
    b = bytes(blob)
    if len(b) < 8 or b[0] != 0x47 or b[1] != 0x50:
        raise ValueError("not a GeoPackageBinary blob (bad 'GP' magic)")
    flags = b[3]
    if flags & 0x20:
        raise ValueError("Extended GPKG binary not supported")
    if flags & 0x10:  # empty geometry
        return None
    env = _ENV_DOUBLES[(flags >> 1) & 0x07]
    raw = b[8 + 8 * env:]
    # GPKG files may carry curve classes (CircularString/CompoundCurve/
    # CurvePolygon/MultiCurve/MultiSurface, gpkg extension): linearize
    # on ingest so the engine only ever sees linear WKB (the drivers'
    # getLinearGeometry() policy; ogrgeometryfactory.cpp:6020)
    if wkb.peek_type(raw) in curves.CURVE_TYPES:
        raw = curves.linearize(raw)
    return raw


def wkb_to_gpkg_blob(buf: bytes | None, srs_id: int = 4326) -> bytes | None:
    """Raw WKB -> StandardGeoPackageBinary with an X/Y envelope for
    non-point geometries (GPkgGeometryFromOGR convention)."""
    if buf is None:
        return None
    b = bytes(buf)
    t, payload = wkb.decode(b)
    if t == wkb.POINT:
        return b"GP\x00\x01" + struct.pack("<i", srs_id) + b
    pts = _all_points(t, payload)
    flags = 1 | (1 << 1)  # little-endian header + X/Y envelope
    env = struct.pack("<4d", float(pts[:, 0].min()), float(pts[:, 0].max()),
                      float(pts[:, 1].min()), float(pts[:, 1].max()))
    return bytes([0x47, 0x50, 0, flags]) + struct.pack("<i", srs_id) \
        + env + b


def _all_points(t: int, payload) -> np.ndarray:
    if t == wkb.LINESTRING:
        return np.asarray(payload)
    if t == wkb.MULTIPOINT:
        return np.asarray(payload, np.float64).reshape(-1, 2)
    if t == wkb.POLYGON:
        return np.vstack(payload)
    if t == wkb.MULTILINESTRING:
        return np.vstack([np.asarray(l) for l in payload])
    if t == wkb.MULTIPOLYGON:
        return np.vstack([r for p in payload for r in p])
    raise ValueError(f"unsupported WKB type {t}")


def _spark_type(decl: str):
    d = (decl or "").upper()
    if d.startswith("INT") or d in ("MEDIUMINT", "SMALLINT", "TINYINT"):
        return T.LongType()
    if d in ("REAL", "DOUBLE", "FLOAT"):
        return T.DoubleType()
    if d == "BOOLEAN":
        return T.BooleanType()
    if d == "BLOB" or d.startswith("GEOMETRY") or d in (
            "POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
            "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION",
            "CIRCULARSTRING", "COMPOUNDCURVE", "CURVEPOLYGON",
            "MULTICURVE", "MULTISURFACE", "CURVE", "SURFACE"):
        return T.BinaryType()
    return T.StringType()


def _probe(path: str, layer: str | None):
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        layers = [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type='features'")]
        if layer is None:
            if len(layers) != 1:
                raise ValueError(
                    f"package has feature layers {layers}; pass layer=")
            layer = layers[0]
        elif layer not in layers:
            raise ValueError(f"no feature layer {layer!r}; have {layers}")
        row = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns "
            "WHERE table_name=?", (layer,)).fetchone()
        geom_src, srs_id = (row if row else (None, None))
        cols = [(r[1], r[2]) for r in
                con.execute(f'PRAGMA table_info("{layer}")')]
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{layer}"').fetchone()
        return layer, geom_src, srs_id, cols, (lo, hi)
    finally:
        con.close()


def read_geopackage(spark: SparkSession, path: str, layer: str | None = None,
                    geom_col: str = "geom",
                    partitions: int | None = None) -> DataFrame:
    """Read a GPKG feature layer, split by rowid range (one SQLite
    reader per task). Columns keep their declared types; the geometry
    column lands as raw WKB under `geom_col`."""
    path = os.path.abspath(path)
    layer, geom_src, _srs, cols, (lo, hi) = _probe(path, layer)
    if partitions is None:
        partitions = int(spark.sparkContext.defaultParallelism)
    fields, names = [], []
    for name, decl in cols:
        if name == geom_src:
            fields.append(T.StructField(geom_col, T.BinaryType(), True))
        else:
            fields.append(T.StructField(name, _spark_type(decl), True))
        names.append(name)
    schema = T.StructType(fields)
    if lo is None:  # empty layer
        return spark.createDataFrame([], schema)
    n = min(partitions, hi - lo + 1)
    edges = np.linspace(lo, hi + 1, n + 1).astype(np.int64)
    ranges = [(int(edges[i]), int(edges[i + 1]) - 1) for i in range(n)]
    rdf = spark.createDataFrame(ranges, "lo long, hi long").repartition(n)
    sel = ", ".join(f'"{c}"' for c in names)

    def gen(batches):
        for pdf in batches:
            for rlo, rhi in zip(pdf["lo"], pdf["hi"]):
                con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = con.execute(
                        f'SELECT {sel} FROM "{layer}" '
                        f"WHERE rowid BETWEEN ? AND ?",
                        (int(rlo), int(rhi))).fetchall()
                finally:
                    con.close()
                data = {}
                for i, name in enumerate(names):
                    vals = [r[i] for r in rows]
                    if name == geom_src:
                        data[geom_col] = [gpkg_blob_to_wkb(v) for v in vals]
                    else:
                        data[name] = vals
                yield pd.DataFrame(data, columns=[f.name for f in fields])

    return rdf.mapInPandas(gen, schema=schema)


def _decl(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        return "INTEGER"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "REAL"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    return "TEXT"


def write_geopackage(df: DataFrame, path: str, layer: str = "layer",
                     geom_col: str = "geom", srs_id: int = 4326,
                     max_features: int = 1_000_000) -> None:
    """Write one feature layer into a fresh .gpkg (single-writer by
    format; guarded by max_features — use parquet at scale)."""
    if os.path.exists(path):
        os.remove(path)
    attrs = [f for f in df.schema.fields if f.name != geom_col]
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")
        con.execute("PRAGMA user_version = 10300")
        con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL,
            organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
            [("Undefined cartesian SRS", -1, "NONE", -1, "undefined"),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined"),
             ("WGS 84 geodetic", 4326, "EPSG", 4326,
              'GEOGCS["WGS 84",DATUM["WGS_1984",'
              'SPHEROID["WGS 84",6378137,298.257223563]],'
              'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')])
        con.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
            max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
        con.execute("""CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            PRIMARY KEY (table_name, column_name))""")
        # a user integer column named fid becomes the primary key
        # (the reference's FID column mapping, ogrgeopackagetablelayer.cpp)
        fid_field = next(
            (f for f in attrs if f.name.lower() == "fid"
             and isinstance(f.dataType, (T.LongType, T.IntegerType))), None)
        if fid_field is not None:
            attrs = [f for f in attrs if f is not fid_field]
        coldefs = ", ".join(f'"{f.name}" {_decl(f.dataType)}' for f in attrs)
        fid_name = fid_field.name if fid_field is not None else "fid"
        con.execute(f'CREATE TABLE "{layer}" '
                    f'("{fid_name}" INTEGER PRIMARY KEY'
                    f"{'' if fid_field is not None else ' AUTOINCREMENT'}"
                    f"{', ' + coldefs if coldefs else ''}, "
                    f'"{geom_col}" GEOMETRY)')
        ins_cols = ([fid_field.name] if fid_field is not None else []) \
            + [f.name for f in attrs] + [geom_col]
        ins = (f'INSERT INTO "{layer}" '
               f"({', '.join(chr(34) + c + chr(34) for c in ins_cols)}) "
               f"VALUES ({', '.join(['?'] * len(ins_cols))})")
        # WKB -> GeoPackageBinary + envelope runs DISTRIBUTED; the
        # driver only streams finished rows into batched executemany
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("blob binary, xmin double, ymin double, "
                    "xmax double, ymax double")
        def conv(g: pd.Series) -> pd.DataFrame:
            rows = []
            for b in g:
                if b is None:
                    rows.append((None, None, None, None, None))
                    continue
                blob = wkb_to_gpkg_blob(bytes(b), srs_id)
                t, payload = wkb.decode(bytes(b))
                pts = np.array([payload]) if t == wkb.POINT \
                    else _all_points(t, payload)
                rows.append((blob, float(pts[:, 0].min()),
                             float(pts[:, 1].min()),
                             float(pts[:, 0].max()),
                             float(pts[:, 1].max())))
            return pd.DataFrame(rows, columns=["blob", "xmin", "ymin",
                                               "xmax", "ymax"])

        sel = ([F.col(fid_field.name)] if fid_field is not None else []) \
            + [F.col(f.name) for f in attrs] + [F.col("__g__.blob")]
        prepared = (df.withColumn("__g__", conv(F.col(geom_col)))
                    .select(*sel, "__g__.xmin", "__g__.ymin",
                            "__g__.xmax", "__g__.ymax").persist())
        # one job: row-count guard + dataset envelope together
        bounds = prepared.agg(
            F.count(F.lit(1)), F.min("xmin"), F.min("ymin"),
            F.max("xmax"), F.max("ymax")).collect()[0]
        n = bounds[0]
        if n > max_features:
            prepared.unpersist()
            raise ValueError(
                f"{n} features > max_features={max_features}: a "
                "GeoPackage is one SQLite file; write parquet/"
                "GeoJSONSeq at scale")
        bx = [bounds[1], bounds[2], bounds[3], bounds[4]]
        con.commit()  # close the DDL transaction before PRAGMAs
        con.execute("PRAGMA synchronous = OFF")
        con.execute("PRAGMA journal_mode = MEMORY")
        batch: list = []
        ncols = len(ins_cols)
        for row in prepared.drop("xmin", "ymin", "xmax", "ymax") \
                .toLocalIterator(prefetchPartitions=True):
            batch.append(tuple(
                bytes(v) if isinstance(v, (bytes, bytearray)) else v
                for v in row[:ncols]))
            if len(batch) >= 10_000:
                con.executemany(ins, batch)
                batch = []
        if batch:
            con.executemany(ins, batch)
        prepared.unpersist()
        con.execute(
            "INSERT INTO gpkg_contents VALUES "
            "(?, 'features', ?, '', datetime('now'), ?, ?, ?, ?, ?)",
            (layer, layer, bx[0], bx[1], bx[2], bx[3], srs_id))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES "
                    "(?, ?, 'GEOMETRY', ?, 0, 0)", (layer, geom_col, srs_id))
        con.commit()
    finally:
        con.close()
