"""Minimal ISO WKB codec (pure struct/numpy — no GEOS/OGR).

Geometry columns in the engine are `BinaryType` WKB, mirroring the
reference's data model (OGRFeature geometry fields, SURVEY §1.2). Type
codes follow ISO WKB (ogr/ogr_core.h:421-460): 1=Point, 2=LineString,
3=Polygon, 4=MultiPoint, 5=MultiLineString, 6=MultiPolygon,
7=GeometryCollection. Little-endian only on encode; both endians on
decode. Z/M variants are rejected in v1 (2-D engine, like the tile
path of the reference).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION = 4, 5, 6, 7
# curve classes (ogr_core.h:439-460) — parsed here, linearized on
# ingest by geo/curves.py; downstream operators see types 1-7 only
CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON = 8, 9, 10
MULTICURVE, MULTISURFACE = 11, 12

_NAMES = {
    POINT: "POINT", LINESTRING: "LINESTRING", POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT", MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON", GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
    CIRCULARSTRING: "CIRCULARSTRING", COMPOUNDCURVE: "COMPOUNDCURVE",
    CURVEPOLYGON: "CURVEPOLYGON", MULTICURVE: "MULTICURVE",
    MULTISURFACE: "MULTISURFACE",
}


def point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def linestring(coords) -> bytes:
    c = np.asarray(coords, np.float64)
    return struct.pack("<BII", 1, LINESTRING, len(c)) + c.tobytes()


def polygon(rings) -> bytes:
    """rings: list of (N,2) arrays; each ring closed on encode."""
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for r in rings:
        r = np.asarray(r, np.float64)
        if len(r) and (r[0] != r[-1]).any():
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)) + r.tobytes())
    return b"".join(out)


def multipolygon(polys) -> bytes:
    """polys: list of ring-lists."""
    out = [struct.pack("<BII", 1, MULTIPOLYGON, len(polys))]
    out += [polygon(p) for p in polys]
    return b"".join(out)


def multipoint(coords) -> bytes:
    c = np.asarray(coords, np.float64).reshape(-1, 2)
    out = [struct.pack("<BII", 1, MULTIPOINT, len(c))]
    out += [point(x, y) for x, y in c]
    return b"".join(out)


def multilinestring(lines) -> bytes:
    out = [struct.pack("<BII", 1, MULTILINESTRING, len(lines))]
    out += [linestring(c) for c in lines]
    return b"".join(out)


def collection(children: list) -> bytes:
    """children: list of WKB bytes."""
    out = [struct.pack("<BII", 1, GEOMETRYCOLLECTION, len(children))]
    out += [bytes(c) for c in children]
    return b"".join(out)


def circularstring(coords) -> bytes:
    c = np.asarray(coords, np.float64)
    return struct.pack("<BII", 1, CIRCULARSTRING, len(c)) + c.tobytes()


def _typed_container(t: int, children: list) -> bytes:
    out = [struct.pack("<BII", 1, t, len(children))]
    out += [bytes(c) for c in children]
    return b"".join(out)


def compoundcurve(segment_wkbs: list) -> bytes:
    """segments: LineString / CircularString WKBs sharing endpoints."""
    return _typed_container(COMPOUNDCURVE, segment_wkbs)


def curvepolygon(ring_wkbs: list) -> bytes:
    """rings: LineString / CircularString / CompoundCurve WKBs."""
    return _typed_container(CURVEPOLYGON, ring_wkbs)


def multicurve(curve_wkbs: list) -> bytes:
    return _typed_container(MULTICURVE, curve_wkbs)


def multisurface(surface_wkbs: list) -> bytes:
    return _typed_container(MULTISURFACE, surface_wkbs)


def encode_typed(t: int, payload) -> bytes:
    """Re-encode a decode() result (inverse of _decode for every
    supported type)."""
    if t == POINT:
        return point(*payload)
    if t == LINESTRING:
        return linestring(payload)
    if t == POLYGON:
        return polygon(payload)
    if t == MULTIPOINT:
        return multipoint(np.asarray(payload, np.float64).reshape(-1, 2))
    if t == MULTILINESTRING:
        return multilinestring(payload)
    if t == MULTIPOLYGON:
        return multipolygon(payload)
    if t == CIRCULARSTRING:
        return circularstring(payload)
    if t in (GEOMETRYCOLLECTION, COMPOUNDCURVE, CURVEPOLYGON,
             MULTICURVE, MULTISURFACE):
        return _typed_container(t, [encode_typed(ct, cp)
                                    for ct, cp in payload])
    raise ValueError(f"encode_typed: unsupported type {t}")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def header(self):
        (endian,) = struct.unpack_from("B", self.buf, self.pos)
        self.pos += 1
        bo = "<" if endian == 1 else ">"
        (gtype,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        base = gtype % 1000
        if gtype != base:
            raise ValueError(f"Z/M WKB variant {gtype} not supported in v1")
        return bo, base

    def u32(self, bo):
        (v,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self, bo, n):
        arr = np.frombuffer(self.buf, dtype=bo + "f8", count=2 * n, offset=self.pos)
        self.pos += 16 * n
        return arr.reshape(n, 2).astype(np.float64, copy=True)


def decode(buf: bytes):
    """-> (type_code, payload).

    Point -> (x, y); LineString -> (N,2); Polygon -> [rings];
    Multi* / collection -> list of child payloads (typed tuples for
    collections).
    """
    return _decode(_Reader(bytes(buf)))


def _decode(r: _Reader):
    bo, t = r.header()
    if t == POINT:
        x, y = struct.unpack_from(bo + "dd", r.buf, r.pos)
        r.pos += 16
        return t, (x, y)
    if t == LINESTRING:
        return t, r.coords(bo, r.u32(bo))
    if t == POLYGON:
        nrings = r.u32(bo)
        return t, [r.coords(bo, r.u32(bo)) for _ in range(nrings)]
    if t == CIRCULARSTRING:
        return t, r.coords(bo, r.u32(bo))
    if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION,
             COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE):
        n = r.u32(bo)
        kids = [_decode(r) for _ in range(n)]
        if t in (GEOMETRYCOLLECTION, COMPOUNDCURVE, CURVEPOLYGON,
                 MULTICURVE, MULTISURFACE):
            return t, kids
        return t, [payload for _, payload in kids]
    raise ValueError(f"unsupported WKB type {t}")


def map_coords(buf: bytes, fn) -> bytes:
    """Apply fn(xs, ys) -> (xs', ys') to every coordinate of the
    geometry and re-encode (the transform hook OGRGeometry::transform
    drives through OGRCoordinateTransformation)."""
    t, payload = decode(buf)
    if t == POINT:
        xs, ys = fn(np.array([payload[0]]), np.array([payload[1]]))
        return point(float(xs[0]), float(ys[0]))

    def ring(c):
        c = np.asarray(c, np.float64)
        xs, ys = fn(c[:, 0], c[:, 1])
        return np.column_stack([xs, ys])

    if t == LINESTRING:
        return linestring(ring(payload))
    if t == MULTIPOINT:
        return multipoint(ring(np.asarray(payload, np.float64)
                               .reshape(-1, 2)))
    if t == MULTILINESTRING:
        return multilinestring([ring(l) for l in payload])
    if t == POLYGON:
        return polygon([ring(r) for r in payload])
    if t == MULTIPOLYGON:
        return multipolygon([[ring(r) for r in p] for p in payload])
    if t == GEOMETRYCOLLECTION:
        enc = {POINT: lambda p: point(*p), LINESTRING: linestring,
               POLYGON: polygon, MULTIPOINT: multipoint,
               MULTILINESTRING: multilinestring,
               MULTIPOLYGON: multipolygon}

        def encode_child(kt, kp):
            # nested collections re-encode recursively (legal WKB;
            # ogrgeometrycollection.cpp allows collection members)
            if kt == GEOMETRYCOLLECTION:
                return collection([encode_child(ct, cp) for ct, cp in kp])
            return enc[kt](kp)

        return collection([map_coords(encode_child(kt, kp), fn)
                           for kt, kp in payload])
    raise ValueError(f"map_coords unsupported for type {t}")


def geometry_type_name(buf: bytes) -> str:
    """ST_GeometryType analog (returns OGC name)."""
    _, t = _Reader(bytes(buf)).header()
    return _NAMES[t]


def explode_parts(buf: bytes) -> list[bytes]:
    """Split a Multi*/GeometryCollection WKB into its single-part
    member WKBs; a single geometry comes back as [itself]. Nested
    collections flatten recursively (the reference's
    explode-collections promotes every leaf to its own feature,
    apps/gdalalg_vector_explode_collections.cpp)."""
    t, payload = decode(buf)
    if t == POINT or t == LINESTRING or t == POLYGON:
        return [bytes(buf)]
    out: list[bytes] = []
    if t == MULTIPOINT:
        return [point(x, y) for x, y in payload]
    if t == MULTILINESTRING:
        return [linestring(c) for c in payload]
    if t == MULTIPOLYGON:
        return [polygon(rings) for rings in payload]
    # GEOMETRYCOLLECTION: typed children, recurse through re-encode
    for kt, kp in payload:
        if kt == POINT:
            out.append(point(*kp))
        elif kt == LINESTRING:
            out.append(linestring(kp))
        elif kt == POLYGON:
            out.append(polygon(kp))
        elif kt == MULTIPOINT:
            out.extend(point(x, y) for x, y in kp)
        elif kt == MULTILINESTRING:
            out.extend(linestring(c) for c in kp)
        elif kt == MULTIPOLYGON:
            out.extend(polygon(rings) for rings in kp)
        else:
            raise ValueError(f"nested collection type {kt} unsupported")
    return out


def peek_type(buf: bytes) -> int:
    """Base geometry type code without decoding the body."""
    b = bytes(buf)
    bo = "<" if b[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", b, 1)
    return gtype % 1000


def polygon_rings(buf: bytes) -> list[np.ndarray]:
    """Decode Polygon or MultiPolygon into a flat ring list where each
    entry is (rings_of_one_polygon) — convenience for PIP kernels.
    Curve polygons linearize on the way in, exactly where the
    reference's rasterizer strokes them (alg/gdalrasterize.cpp:
    587-597 getLinearGeometry)."""
    if peek_type(buf) in (CURVEPOLYGON, MULTISURFACE):
        from . import curves

        buf = curves.linearize(bytes(buf))
    t, payload = decode(buf)
    if t == POLYGON:
        return [payload]
    if t == MULTIPOLYGON:
        return payload
    raise ValueError(f"expected (Multi)Polygon, got {_NAMES.get(t, t)}")


def as_text(buf: bytes) -> str:
    """ST_AsText analog (minimal WKT writer)."""
    t, payload = decode(buf)

    def fmt1(v):
        # integral doubles print bare (OGRMakeWktCoordinate trim);
        # otherwise repr = shortest string that round-trips exactly
        f = float(v)
        return str(int(f)) if f == int(f) else repr(f)

    def fmt_pt(xy):
        return f"{fmt1(xy[0])} {fmt1(xy[1])}"

    def fmt_ring(c):
        return "(" + ", ".join(fmt_pt(p) for p in np.asarray(c)) + ")"

    if t == POINT:
        return f"POINT ({fmt_pt(payload)})"
    if t == LINESTRING:
        return f"LINESTRING {fmt_ring(payload)}"
    if t == POLYGON:
        return "POLYGON (" + ", ".join(fmt_ring(r) for r in payload) + ")"
    if t == MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(
            f"({fmt_pt(p)})" for p in payload) + ")"
    if t == MULTILINESTRING:
        return "MULTILINESTRING (" + ", ".join(
            fmt_ring(l) for l in payload) + ")"
    if t == MULTIPOLYGON:
        polys = ["(" + ", ".join(fmt_ring(r) for r in p) + ")" for p in payload]
        return "MULTIPOLYGON (" + ", ".join(polys) + ")"
    raise ValueError(f"as_text unsupported for type {t}")


def from_text(wkt: str) -> bytes:
    """ST_GeomFromText analog: minimal WKT parser for POINT /
    LINESTRING / POLYGON / MULTIPOLYGON (the inverse of as_text;
    ogr OGRGeometryFactory::createFromWkt's 2-D subset)."""
    import re as _re

    s = wkt.strip()
    m = _re.match(r"^([A-Za-z]+)\s*(.*)$", s, _re.DOTALL)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:40]!r}")
    kind = m.group(1).upper()
    body = m.group(2).strip()

    def parse_pts(txt: str) -> np.ndarray:
        pts = []
        for pair in txt.split(","):
            xy = pair.split()
            pts.append((float(xy[0]), float(xy[1])))
        return np.array(pts, np.float64)

    def split_groups(txt: str) -> list[str]:
        """Split a parenthesized list at depth-0 commas."""
        assert txt[0] == "(" and txt[-1] == ")", txt[:20]
        inner = txt[1:-1]
        out, depth, cur = [], 0, []
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        out.append("".join(cur).strip())
        return out

    if kind == "POINT":
        p = parse_pts(body.strip("()"))
        return point(float(p[0, 0]), float(p[0, 1]))
    if kind == "LINESTRING":
        return linestring(parse_pts(body.strip("()")))
    if kind == "POLYGON":
        rings = [parse_pts(g.strip("()")) for g in split_groups(body)]
        return polygon(rings)
    if kind == "MULTIPOINT":
        return multipoint(np.vstack([parse_pts(g.strip("()"))
                                     for g in split_groups(body)]))
    if kind == "MULTILINESTRING":
        return multilinestring([parse_pts(g.strip("()"))
                                for g in split_groups(body)])
    if kind == "MULTIPOLYGON":
        polys = []
        for grp in split_groups(body):
            polys.append([parse_pts(g.strip("()"))
                          for g in split_groups(grp)])
        return multipolygon(polys)
    raise ValueError(f"from_text unsupported for {kind}")
