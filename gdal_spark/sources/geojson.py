"""GeoJSON / GeoJSONSeq source + sink.

Reference: the GeoJSON driver family (ogr/ogrsf_frmts/geojson/
ogrgeojsondriver.cpp, ogrgeojsonreader.cpp — property schema scan +
geometry translation; ogrgeojsonwritelayer.cpp — feature writer;
ogrgeojsonseqdriver.cpp — the line-delimited GeoJSONSeq driver the
reference added precisely because a FeatureCollection is ONE JSON
document and cannot be split; its streaming parser is
ogrjsoncollectionstreamingparser.cpp).

Spark-first shape:
 - GeoJSONSeq (one feature per line, RFC 8142) is the SCALE path:
   `spark.read.json` splits the file across tasks, property schema
   inference is Spark's, and the only Python work is the
   geometry-dict -> WKB conversion in an Arrow-batched UDF. Use this
   for anything big.
 - FeatureCollection (`read_geojson`) parses with multiLine=True —
   inherently one task per FILE (parallel across many files), same as
   every other engine, because the format is a single JSON document.
 - Geometry objects are re-read as raw JSON strings (schema override:
   declaring an object field as StringType makes Spark hand back its
   JSON text), so heterogeneous geometry types in one layer do not
   corrupt schema inference — the same reason the reference translates
   geometry separately from properties (ogrgeojsonreader.cpp
   OGRGeoJSONReadGeometry).

Writers emit `{"type":"Feature","properties":...,"geometry":...}`
lines with properties serialized JVM-side (`to_json`) and only the
WKB -> GeoJSON geometry dict in Python. `coordinate_precision` mirrors
the writer's COORDINATE_PRECISION option (RFC 7946 suggests 7
decimals; default None = full repr precision for lossless
round-trips).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..geo import wkb

# ---------------------------------------------------------- conversions


def geometry_to_wkb(gj: dict | None) -> bytes | None:
    """GeoJSON geometry object -> WKB (RFC 7946 §3.1 type table)."""
    if gj is None:
        return None
    t = gj.get("type")
    c = gj.get("coordinates")
    if t == "Point":
        return wkb.point(float(c[0]), float(c[1]))
    if t == "MultiPoint":
        return wkb.multipoint(np.asarray(c, np.float64))
    if t == "LineString":
        return wkb.linestring(np.asarray(c, np.float64))
    if t == "MultiLineString":
        return wkb.multilinestring([np.asarray(l, np.float64) for l in c])
    if t == "Polygon":
        return wkb.polygon([np.asarray(r, np.float64) for r in c])
    if t == "MultiPolygon":
        return wkb.multipolygon(
            [[np.asarray(r, np.float64) for r in p] for p in c])
    if t == "GeometryCollection":
        return wkb.collection(
            [geometry_to_wkb(g) for g in gj.get("geometries", [])])
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _coords(arr, prec: int | None):
    if prec is None:
        return [[float(x), float(y)] for x, y in np.asarray(arr).reshape(-1, 2)]
    return [[round(float(x), prec), round(float(y), prec)]
            for x, y in np.asarray(arr).reshape(-1, 2)]


def wkb_to_geometry(buf: bytes | None, prec: int | None = None) -> dict | None:
    """WKB -> GeoJSON geometry object (inverse of geometry_to_wkb)."""
    if buf is None:
        return None
    t, payload = wkb.decode(bytes(buf))
    if t == wkb.POINT:
        return {"type": "Point", "coordinates": _coords([payload], prec)[0]}
    if t == wkb.MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": _coords(payload, prec)}
    if t == wkb.LINESTRING:
        return {"type": "LineString", "coordinates": _coords(payload, prec)}
    if t == wkb.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [_coords(l, prec) for l in payload]}
    if t == wkb.POLYGON:
        return {"type": "Polygon",
                "coordinates": [_coords(r, prec) for r in payload]}
    if t == wkb.MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [[_coords(r, prec) for r in p]
                                for p in payload]}
    if t == wkb.GEOMETRYCOLLECTION:
        geoms = []
        for kt, kp in payload:
            enc = {wkb.POINT: lambda p: wkb.point(*p),
                   wkb.LINESTRING: wkb.linestring,
                   wkb.POLYGON: wkb.polygon,
                   wkb.MULTIPOINT: wkb.multipoint,
                   wkb.MULTILINESTRING: wkb.multilinestring,
                   wkb.MULTIPOLYGON: wkb.multipolygon}[kt]
            geoms.append(wkb_to_geometry(enc(kp), prec))
        return {"type": "GeometryCollection", "geometries": geoms}
    raise ValueError(f"unsupported WKB type {t}")


@pandas_udf(T.BinaryType())
def _geojson_to_wkb_udf(s: pd.Series) -> pd.Series:
    return pd.Series([
        geometry_to_wkb(json.loads(v)) if v is not None else None
        for v in s])


def _wkb_to_geojson_udf(prec: int | None):
    @pandas_udf(T.StringType())
    def conv(s: pd.Series) -> pd.Series:
        return pd.Series([
            json.dumps(wkb_to_geometry(bytes(b), prec),
                       separators=(",", ":"))
            if b is not None else "null" for b in s])
    return conv


# ---------------------------------------------------------------- read


def _geometry_as_string(schema: T.StructType) -> T.StructType:
    fields = [T.StructField("geometry", T.StringType(), True)
              if f.name == "geometry" else f for f in schema.fields]
    return T.StructType(fields)


def _finish(df: DataFrame, geom_col: str) -> DataFrame:
    cols = []
    names = df.columns
    if "id" in names:
        cols.append(F.col("id"))
    if "properties" in names:
        cols.append(F.col("properties.*"))
    cols.append(_geojson_to_wkb_udf(F.col("geometry")).alias(geom_col))
    return df.select(*cols)


def read_geojson_seq(spark: SparkSession, path: str,
                     geom_col: str = "geom") -> DataFrame:
    """Line-delimited GeoJSONSeq (RFC 8142 / ogrgeojsonseqdriver.cpp).
    Splittable: property schema inference and line parsing are Spark's;
    one Arrow-batched UDF converts geometry JSON -> WKB."""
    inferred = spark.read.json(path).schema
    df = spark.read.schema(_geometry_as_string(inferred)).json(path)
    return _finish(df, geom_col)


def read_geojson(spark: SparkSession, path: str,
                 geom_col: str = "geom") -> DataFrame:
    """FeatureCollection document(s). One task per FILE (the format is
    a single JSON document — parallelism comes from reading many files
    or from GeoJSONSeq)."""
    inferred = spark.read.option("multiLine", True).json(path).schema
    feat = next(f for f in inferred.fields if f.name == "features")
    elem = _geometry_as_string(feat.dataType.elementType)
    schema = T.StructType([
        T.StructField("features", T.ArrayType(elem), True),
        T.StructField("type", T.StringType(), True)])
    df = (spark.read.option("multiLine", True).schema(schema).json(path)
          .select(F.explode("features").alias("f")).select("f.*"))
    return _finish(df, geom_col)


def read_geojson_seq_stream(spark: SparkSession, path: str,
                            schema: T.StructType | None = None,
                            sample_path: str | None = None,
                            geom_col: str = "geom") -> DataFrame:
    """Structured-Streaming GeoJSONSeq source: new feature files
    dropped into `path` stream through the same geometry -> WKB
    conversion as the batch reader (the streaming analog of the
    reference's append-only seq layer, ogrgeojsonseqdriver.cpp).
    Streaming requires a fixed schema — pass one, or let a batch probe
    of `sample_path` (default: `path` itself, which must already hold
    at least one file) infer it."""
    if schema is None:
        schema = spark.read.json(sample_path or path).schema
    df = spark.readStream.schema(_geometry_as_string(schema)).json(path)
    return _finish(df, geom_col)


# --------------------------------------------------------------- write


def write_geojson_seq(df: DataFrame, path: str, geom_col: str = "geom",
                      coordinate_precision: int | None = None,
                      mode: str = "overwrite") -> None:
    """Distributed GeoJSONSeq sink: one Feature JSON per line.
    Properties serialize JVM-side (`to_json`); only WKB -> geometry
    dict runs in Python (Arrow batches)."""
    props = [c for c in df.columns if c != geom_col]
    gj = _wkb_to_geojson_udf(coordinate_precision)
    line = F.concat(
        F.lit('{"type":"Feature","properties":'),
        F.to_json(F.struct(*[F.col(c) for c in props])),
        F.lit(',"geometry":'),
        gj(F.col(geom_col)),
        F.lit("}"))
    df.select(line.alias("value")).write.mode(mode).text(path)


def write_geojson(df: DataFrame, path: str, geom_col: str = "geom",
                  coordinate_precision: int | None = None,
                  max_features: int = 1_000_000) -> None:
    """Single FeatureCollection DOCUMENT (ogrgeojsonwritelayer.cpp
    semantics). A FeatureCollection is one JSON object, so this sink is
    inherently single-writer: rows stream through toLocalIterator into
    one file. Guarded by max_features — use write_geojson_seq for
    anything large."""
    props = [c for c in df.columns if c != geom_col]
    n = df.count()
    if n > max_features:
        raise ValueError(
            f"{n} features > max_features={max_features}: a "
            "FeatureCollection is a single JSON document; use "
            "write_geojson_seq for the distributed line-delimited form")
    gj = _wkb_to_geojson_udf(coordinate_precision)
    line = F.concat(
        F.lit('{"type":"Feature","properties":'),
        F.to_json(F.struct(*[F.col(c) for c in props])),
        F.lit(',"geometry":'),
        gj(F.col(geom_col)),
        F.lit("}"))
    rows = df.select(line.alias("v")).toLocalIterator()
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[\n')
        for i, r in enumerate(rows):
            f.write((",\n" if i else "") + r.v)
        f.write("\n]}\n")
