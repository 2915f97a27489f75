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

from ..geo import geom, overlay, wkb


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
def st_geomfromtext(w: pd.Series) -> pd.Series:
    """ST_GeomFromText (ogrsqlitesqlfunctions.cpp registration list):
    WKT -> WKB for POINT/LINESTRING/POLYGON/MULTIPOLYGON."""
    return pd.Series([wkb.from_text(s) if s is not None else None
                      for s in w])


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
def st_buffer(g: pd.Series, dist: pd.Series) -> pd.Series:
    """ST_Buffer(geom, dist) — SQLite-dialect signature
    (ogrsqlitesqlfunctions.cpp:1208 OGR2SQLITE_ST_Buffer; GEOS
    defaults: round caps/joins, 8 quadrant segments). Full style
    surface lives on geo.buffer.buffer_wkb / pipeline step "buffer"."""
    from ..geo import buffer as _buffer
    return pd.Series([
        _buffer.buffer_wkb(bytes(b), float(d)) if b is not None else None
        for b, d in zip(g, dist)])


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


def st_transform_fn(src_crs: str, dst_crs: str):
    """Factory for an ST_Transform UDF pinned to a CRS pair
    (OGRGeometry::transform / ogr2ogr -s_srs/-t_srs; Transform3 in the
    SQLite dialect, ogrsqlitesqlfunctions.cpp:1153). Works on any WKB
    geometry through all registered CRS families (geo/crs.py)."""
    from ..geo import crs as _crs

    def fn(xs, ys):
        return _crs.transform_np(src_crs, dst_crs, xs, ys)

    @pandas_udf(T.BinaryType())
    def st_transform(g: pd.Series) -> pd.Series:
        return pd.Series([
            wkb.map_coords(bytes(b), fn) if b is not None else None
            for b in g])

    return st_transform


def _simplify_polygon_topo(rings, tol: float):
    """Per-polygon topology-preserving simplify: every ring keeps
    simplicity (geom.simplify_preserve_topology), and the tolerance
    halves until no two RINGS cross either (hole poking through its
    shell — the cross-ring case GEOS's TopologyPreservingSimplifier
    also guards)."""
    t = float(tol)
    while t > 0.0:
        out = [geom.simplify_preserve_topology(r, t, closed=True)
               for r in rings]
        crossing = False
        for i in range(len(out)):
            for j in range(i + 1, len(out)):
                if any(geom.segments_intersect(tuple(a), tuple(b),
                                               tuple(c), tuple(d))
                       for a, b in zip(out[i][:-1], out[i][1:])
                       for c, d in zip(out[j][:-1], out[j][1:])):
                    crossing = True
                    break
            if crossing:
                break
        if not crossing:
            return out
        t /= 2.0
    return rings


@pandas_udf(T.BinaryType())
def st_simplifypreservetopology(g: pd.Series, tol: pd.Series) -> pd.Series:
    """OGRGeometry::SimplifyPreserveTopology (ogr_geometry.h:595):
    simplified output never self-intersects, rings never collapse."""
    def simp(b, t):
        ty, payload = wkb.decode(b)
        if ty == wkb.LINESTRING:
            return wkb.linestring(
                geom.simplify_preserve_topology(payload, t))
        if ty == wkb.POLYGON:
            return wkb.polygon(_simplify_polygon_topo(payload, t))
        if ty == wkb.MULTIPOLYGON:
            return wkb.multipolygon(
                [_simplify_polygon_topo(p, t) for p in payload])
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


# ------------------------------------------------- geometry construction
# (OGRGeometry::Intersection/Union/Difference/SymDifference,
#  ogr/ogr_geometry.h:567-575; layer algebra ogrlayer.cpp:5385/5803/6340.
#  Results are MULTIPOLYGON — PROMOTE_TO_MULTI semantics.)

def _polys_of(b: bytes):
    return [overlay.normalize(p) for p in wkb.polygon_rings(b)]


def _multi_intersection(pa, pb):
    out = []
    for A in pa:
        for B in pb:
            out.extend(overlay.intersection(A, B))
    return out


def _multi_difference(pa, pb):
    cur = list(pa)
    for B in pb:
        cur = [piece for A in cur for piece in overlay.difference(A, B)]
    return cur


def _multi_union(pa, pb):
    if len(pa) == 1 and len(pb) == 1:
        return overlay.union(pa[0], pb[0])
    # multi inputs: the disjoint decomposition (A - B) |+| B — same
    # coverage/area; parts may touch along former shared boundaries
    return _multi_difference(pa, pb) + list(pb)


def _binary_geom_udf(op):
    def fn(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ga, gb in zip(a, b):
            if ga is None or gb is None:
                out.append(None)
                continue
            polys = op(_polys_of(bytes(ga)), _polys_of(bytes(gb)))
            out.append(wkb.multipolygon(polys))
        return pd.Series(out)
    return pandas_udf(T.BinaryType())(fn)


st_intersection = _binary_geom_udf(_multi_intersection)
st_union = _binary_geom_udf(_multi_union)
st_difference = _binary_geom_udf(_multi_difference)
st_symdifference = _binary_geom_udf(
    lambda pa, pb: _multi_difference(pa, pb) + _multi_difference(pb, pa))


def _relate_udf(key):
    """Areal predicate via overlay.relate; multi inputs fold the
    pairwise matrix the way the layer-algebra row loop does."""
    def fn(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ga, gb in zip(a, b):
            if ga is None or gb is None:
                out.append(None)
                continue
            pa, pb = _polys_of(bytes(ga)), _polys_of(bytes(gb))
            if len(pa) == 1 and len(pb) == 1:
                out.append(bool(overlay.relate(pa[0], pb[0])[key]))
                continue
            # multi fold: derive from areas of the multi-aware ops
            ai = overlay.multi_area(_multi_intersection(pa, pb))
            ar = overlay.multi_area(_multi_difference(pa, pb))
            br = overlay.multi_area(_multi_difference(pb, pa))
            bnd = any(overlay._boundaries_intersect(A, B)
                      for A in pa for B in pb)
            has_i = ai > 0.0
            vals = {
                "intersects": has_i or bnd,
                "disjoint": not (has_i or bnd),
                "touches": bnd and not has_i,
                "within": has_i and ar == 0.0,
                "contains": has_i and br == 0.0,
                "equals": has_i and ar == 0.0 and br == 0.0,
                "overlaps": has_i and ar > 0.0 and br > 0.0,
                "crosses": False,
            }
            out.append(bool(vals[key]))
        return pd.Series(out, dtype="boolean")
    return pandas_udf(T.BooleanType())(fn)


st_intersects = _relate_udf("intersects")
st_disjoint = _relate_udf("disjoint")
st_touches = _relate_udf("touches")
st_within = _relate_udf("within")
st_contains = _relate_udf("contains")
st_overlaps = _relate_udf("overlaps")
st_equals = _relate_udf("equals")
st_crosses = _relate_udf("crosses")


@pandas_udf(T.BinaryType())
def st_makevalid(g: pd.Series) -> pd.Series:
    """OGRGeometry::MakeValid (ogr_geometry.h:430): self-intersecting
    rings split into simple loops; valid input passes through."""
    def mv(b):
        polys = wkb.polygon_rings(b)
        fixed = [q for p in polys for q in overlay.make_valid(p)]
        return wkb.multipolygon(fixed)
    return _each(g, mv)


@pandas_udf(T.BinaryType())
def st_convexhull(g: pd.Series) -> pd.Series:
    """ConvexHull over all vertices of any polygonal geometry
    (ogr_geometry.h:566)."""
    def hull(b):
        polys = wkb.polygon_rings(b)
        pts = np.vstack([r[:, :2] for p in polys for r in p])
        return wkb.polygon([geom.convex_hull(pts[:, 0], pts[:, 1])])
    return _each(g, hull)


@pandas_udf(T.DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """Poly-poly distance: 0 when intersecting, else the min segment-
    segment distance between boundaries (OGRGeometry::Distance)."""
    def seg_seg(p1, p2, q1, q2):
        def pt_seg(p, a_, b_):
            ab = b_ - a_
            L = float(ab @ ab)
            t = 0.0 if L == 0 else float(np.clip((p - a_) @ ab / L, 0, 1))
            d = p - (a_ + t * ab)
            return float(np.hypot(d[0], d[1]))
        return min(pt_seg(p1, q1, q2), pt_seg(p2, q1, q2),
                   pt_seg(q1, p1, p2), pt_seg(q2, p1, p2))

    out = []
    for ga, gb in zip(a, b):
        if ga is None or gb is None:
            out.append(None)
            continue
        pa = _polys_of(bytes(ga))
        pb = _polys_of(bytes(gb))
        if overlay.multi_area(_multi_intersection(pa, pb)) > 0.0 or any(
                overlay._boundaries_intersect(A, B) for A in pa for B in pb):
            out.append(0.0)
            continue
        ea = [e for A in pa for e in overlay._ring_edges(A)]
        eb = [e for B in pb for e in overlay._ring_edges(B)]
        out.append(min(seg_seg(np.asarray(p1), np.asarray(p2),
                               np.asarray(q1), np.asarray(q2))
                       for p1, p2 in ea for q1, q2 in eb))
    return pd.Series(out, dtype="float64")


_REGISTRY = {
    "st_area": st_area,
    "st_length": st_length,
    "st_geometrytype": st_geometrytype,
    "st_astext": st_astext,
    "st_isempty": st_isempty,
    "st_geomfromtext": st_geomfromtext,
    "st_makepoint": st_makepoint,
    "st_x": st_x,
    "st_y": st_y,
    "st_centroid_x": st_centroid_x,
    "st_centroid_y": st_centroid_y,
    "st_npoints": st_npoints,
    "st_intersects_point": st_intersects_point,
    "st_distance_points": st_distance_points,
    "st_buffer_point": st_buffer_point,
    "st_buffer": st_buffer,
    "st_simplify": st_simplify,
    "st_simplifypreservetopology": st_simplifypreservetopology,
    "st_segmentize": st_segmentize,
    "st_clip_bbox": st_clip_bbox,
    "st_intersection": st_intersection,
    "st_union": st_union,
    "st_difference": st_difference,
    "st_symdifference": st_symdifference,
    "st_intersects": st_intersects,
    "st_disjoint": st_disjoint,
    "st_touches": st_touches,
    "st_within": st_within,
    "st_contains": st_contains,
    "st_overlaps": st_overlaps,
    "st_equals": st_equals,
    "st_crosses": st_crosses,
    "st_makevalid": st_makevalid,
    "st_convexhull": st_convexhull,
    "st_distance": st_distance,
}


def register_all(spark: SparkSession) -> list[str]:
    """Register every ST_ function for SQL use; returns the names
    (the analog of OGRSQLiteRegisterSQLFunctions)."""
    for name, fn in _REGISTRY.items():
        spark.udf.register(name, fn)
    return sorted(_REGISTRY)
