"""ST_* spatial function library, mirroring the reference's SQLite-
dialect registrations (ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp
:1172-1224: ST_AsText, ST_GeomFromText, ST_IsEmpty/IsValid,
ST_Intersects/Within/Contains..., ST_Area, ST_Length, ST_Buffer,
ST_MakePoint, ...) plus the geometry-method surface of
ogr/ogr_geometry.h:547-622.

Implementation: geometry columns are WKB `BinaryType`; each function is
an Arrow-batched pandas UDF over the gdal_spark.geo kernels (shapely-
free numpy). Names and 1:1 arity mirror the reference so OGR-SQL-style
`SELECT ST_Area(geom) ...` runs after `register_all(spark)`.

Scale note: scalar geometry functions are embarrassingly parallel; the
Arrow batch (65,536 rows — the reference's own batch size,
ogrlayerarrow.cpp:2079) is the vectorization unit. Predicates that
JOIN two geometry relations should use operators.pip_join instead —
these scalar forms are for row-wise expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..geo import geom, wkb


def _each(series: pd.Series, fn, dtype=object):
    return pd.Series([fn(bytes(b)) if b is not None else None for b in series],
                     dtype=dtype)


@pandas_udf(T.DoubleType())
def st_area(g: pd.Series) -> pd.Series:
    def area(b):
        t, payload = wkb.decode(b)
        if t == wkb.POLYGON:
            return geom.polygon_area(payload)
        if t == wkb.MULTIPOLYGON:
            return float(sum(geom.polygon_area(p) for p in payload))
        return 0.0
    return _each(g, area, dtype="float64")


@pandas_udf(T.DoubleType())
def st_length(g: pd.Series) -> pd.Series:
    def length(b):
        t, payload = wkb.decode(b)
        if t == wkb.LINESTRING:
            return geom.line_length(payload)
        if t == wkb.MULTILINESTRING:
            return float(sum(geom.line_length(c) for c in payload))
        if t == wkb.POLYGON:
            return float(sum(geom.line_length(r) for r in payload))
        return 0.0
    return _each(g, length, dtype="float64")


@pandas_udf(T.StringType())
def st_geometrytype(g: pd.Series) -> pd.Series:
    return _each(g, wkb.geometry_type_name)


@pandas_udf(T.StringType())
def st_astext(g: pd.Series) -> pd.Series:
    return _each(g, wkb.as_text)


@pandas_udf(T.BooleanType())
def st_isempty(g: pd.Series) -> pd.Series:
    def isempty(b):
        t, payload = wkb.decode(b)
        if t == wkb.POLYGON:
            return len(payload) == 0
        if t in (wkb.MULTIPOLYGON, wkb.MULTILINESTRING, wkb.MULTIPOINT,
                 wkb.GEOMETRYCOLLECTION):
            return len(payload) == 0
        if t == wkb.LINESTRING:
            return len(payload) == 0
        return False
    return _each(g, isempty, dtype="boolean")


@pandas_udf(T.BinaryType())
def st_makepoint(x: pd.Series, y: pd.Series) -> pd.Series:
    return pd.Series([wkb.point(float(a), float(b)) for a, b in zip(x, y)])


@pandas_udf(T.DoubleType())
def st_x(g: pd.Series) -> pd.Series:
    return _each(g, lambda b: wkb.decode(b)[1][0], dtype="float64")


@pandas_udf(T.DoubleType())
def st_y(g: pd.Series) -> pd.Series:
    return _each(g, lambda b: wkb.decode(b)[1][1], dtype="float64")


@pandas_udf(T.DoubleType())
def st_centroid_x(g: pd.Series) -> pd.Series:
    return _each(g, lambda b: geom.ring_centroid(wkb.polygon_rings(b)[0][0])[0],
                 dtype="float64")


@pandas_udf(T.DoubleType())
def st_centroid_y(g: pd.Series) -> pd.Series:
    return _each(g, lambda b: geom.ring_centroid(wkb.polygon_rings(b)[0][0])[1],
                 dtype="float64")


@pandas_udf(T.IntegerType())
def st_npoints(g: pd.Series) -> pd.Series:
    def npts(b):
        t, payload = wkb.decode(b)
        if t == wkb.POINT:
            return 1
        if t == wkb.LINESTRING:
            return len(payload)
        if t == wkb.POLYGON:
            return int(sum(len(r) for r in payload))
        if t == wkb.MULTIPOLYGON:
            return int(sum(len(r) for p in payload for r in p))
        return 0
    return _each(g, npts, dtype="int32")


@pandas_udf(T.BooleanType())
def st_intersects_point(g: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """Point-vs-(multi)polygon intersects — the spatial-filter ladder's
    exact stage (ogrlayer.cpp:4064) as a scalar function."""
    out = np.zeros(len(g), dtype=bool)
    px = x.to_numpy(np.float64)
    py = y.to_numpy(np.float64)
    for i, b in enumerate(g):
        if b is None:
            continue
        for rings in wkb.polygon_rings(bytes(b)):
            if geom.points_in_polygon(px[i:i + 1], py[i:i + 1], rings)[0]:
                out[i] = True
                break
    return pd.Series(out)


@pandas_udf(T.DoubleType())
def st_distance_points(ax: pd.Series, ay: pd.Series,
                       bx: pd.Series, by: pd.Series) -> pd.Series:
    return pd.Series(np.hypot(ax.to_numpy() - bx.to_numpy(),
                              ay.to_numpy() - by.to_numpy()))


@pandas_udf(T.BinaryType())
def st_buffer_point(x: pd.Series, y: pd.Series, dist: pd.Series) -> pd.Series:
    return pd.Series([
        wkb.polygon([geom.buffer_point(float(a), float(b), float(d))])
        for a, b, d in zip(x, y, dist)])


@pandas_udf(T.BinaryType())
def st_simplify(g: pd.Series, tol: pd.Series) -> pd.Series:
    def simp(b, t):
        ty, payload = wkb.decode(b)
        if ty == wkb.LINESTRING:
            return wkb.linestring(geom.simplify_dp(payload, t))
        if ty == wkb.POLYGON:
            return wkb.polygon([geom.simplify_dp(r, t) for r in payload])
        return b
    return pd.Series([simp(bytes(b), float(t)) if b is not None else None
                      for b, t in zip(g, tol)])


@pandas_udf(T.BinaryType())
def st_segmentize(g: pd.Series, max_len: pd.Series) -> pd.Series:
    def seg(b, ml):
        ty, payload = wkb.decode(b)
        if ty == wkb.LINESTRING:
            return wkb.linestring(geom.segmentize(payload, ml))
        if ty == wkb.POLYGON:
            return wkb.polygon([geom.segmentize(r, ml) for r in payload])
        return b
    return pd.Series([seg(bytes(b), float(m)) if b is not None else None
                      for b, m in zip(g, max_len)])


@pandas_udf(T.BinaryType())
def st_clip_bbox(g: pd.Series, minx: pd.Series, miny: pd.Series,
                 maxx: pd.Series, maxy: pd.Series) -> pd.Series:
    """Rectangle clip of (multi)polygons — the geometric OUTPUT side of
    the Clip layer-algebra op for rectangular clip geometry
    (ogr2ogr -clipsrc; holes are clipped independently)."""
    def clip(b, x0, y0, x1, y1):
        ty, payload = wkb.decode(b)
        if ty == wkb.POLYGON:
            rings = [geom.clip_ring_bbox(r, x0, y0, x1, y1) for r in payload]
            rings = [r for r in rings if len(r) >= 4]
            return wkb.polygon(rings) if rings else wkb.polygon([])
        return b
    return pd.Series([
        clip(bytes(b), float(a), float(c), float(d), float(e))
        if b is not None else None
        for b, a, c, d, e in zip(g, minx, miny, maxx, maxy)])


_REGISTRY = {
    "st_area": st_area,
    "st_length": st_length,
    "st_geometrytype": st_geometrytype,
    "st_astext": st_astext,
    "st_isempty": st_isempty,
    "st_makepoint": st_makepoint,
    "st_x": st_x,
    "st_y": st_y,
    "st_centroid_x": st_centroid_x,
    "st_centroid_y": st_centroid_y,
    "st_npoints": st_npoints,
    "st_intersects_point": st_intersects_point,
    "st_distance_points": st_distance_points,
    "st_buffer_point": st_buffer_point,
    "st_simplify": st_simplify,
    "st_segmentize": st_segmentize,
    "st_clip_bbox": st_clip_bbox,
}


def register_all(spark: SparkSession) -> list[str]:
    """Register every ST_ function for SQL use; returns the names
    (the analog of OGRSQLiteRegisterSQLFunctions)."""
    for name, fn in _REGISTRY.items():
        spark.udf.register(name, fn)
    return sorted(_REGISTRY)
