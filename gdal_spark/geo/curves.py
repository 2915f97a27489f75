"""Curve geometry classes (WKB types 8-12) + linearization on ingest.

Reference: ogr/ogr_core.h:439-460 (wkbCircularString=8,
wkbCompoundCurve=9, wkbCurvePolygon=10, wkbMultiCurve=11,
wkbMultiSurface=12); arc stroking from
ogr/ogrgeometryfactory.cpp:6020 `curveToLineString` with
`GetCurveParameters` (:5809) and `OGRGeometryFactoryStrokeArc`
(:5906). The engine — like the reference's own rasterizer
(alg/gdalrasterize.cpp:587-597) and most drivers — linearizes curves
at ingest, so every downstream operator keeps seeing only the linear
WKB types 1-7.

Divergence note: the reference's default stroking hides the
intermediate-point angle in low-significant coordinate bits
(ADD_INTERMEDIATE_POINT=STEALTH) so PostGIS can reconstruct arcs; we
produce the plain ADD_INTERMEDIATE_POINT=YES form (explicit
intermediate vertex, no bit steganography) — geometrically identical,
bit-honest coordinates. The reversed-input symmetry guarantee
(OGRGF_NeedSwithArcOrder, :6014) is preserved.
"""

from __future__ import annotations

import math

import numpy as np

from . import wkb as W

CIRCULARSTRING = 8
COMPOUNDCURVE = 9
CURVEPOLYGON = 10
MULTICURVE = 11
MULTISURFACE = 12

CURVE_TYPES = {CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON,
               MULTICURVE, MULTISURFACE}

DEFAULT_ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (:4735)


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """ogrgeometryfactory.cpp:5809 GetCurveParameters — circle through
    3 points -> (ok, R, cx, cy, alpha0, alpha1, alpha2); full circle
    when start == end; ok=False for (near-)aligned points."""
    if any(math.isnan(v) for v in (x0, y0, x1, y1, x2, y2)):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    if x0 == x2 and y0 == y2:
        if x0 != x1 or y0 != y1:
            cx = (x0 + x1) / 2
            cy = (y0 + y1) / 2
            R = math.hypot(x0 - cx, y0 - cy)
            a0 = math.atan2(y0 - cy, x0 - cx)
            return True, R, cx, cy, a0, a0 + math.pi, a0 + 2 * math.pi
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    dx01, dy01 = x1 - x0, y1 - y0
    dx12, dy12 = x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1.0e-8 or math.isnan(det):
        return False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
    x01m, x12m = (x0 + x1) * inv, (x1 + x2) * inv
    y01m, y12m = (y0 + y1) * inv, (y1 + y2) * inv
    c01 = dx01 * x01m + dy01 * y01m
    c12 = dx12 * x12m + dy12 * y12m
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    a1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    a2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    R = math.hypot(x0 - cx, y0 - cy)
    if det < 0:                      # clockwise
        if a1 > a0:
            a1 -= 2 * math.pi
        if a2 > a1:
            a2 -= 2 * math.pi
    else:
        if a1 < a0:
            a1 += 2 * math.pi
        if a2 < a1:
            a2 += 2 * math.pi
    return True, R, cx, cy, a0, a1, a2


def _stroke_arc(out, cx, cy, R, a0, a1, step):
    """OGRGeometryFactoryStrokeArc (:5906), non-stealth: intermediate
    vertices strictly between a0 and a1, constant angle step."""
    sign = 1 if step > 0 else -1
    nsteps = int(abs((a1 - a0) / step) + 0.5)
    if nsteps < 4:
        nsteps = 4
    step = sign * abs((a1 - a0) / nsteps)
    alpha = a0 + step
    while (alpha - a1) * sign < -1e-8:
        out.append((cx + R * math.cos(alpha), cy + R * math.sin(alpha)))
        alpha += step


def arc_to_points(x0, y0, x1, y1, x2, y2,
                  max_step_deg: float = DEFAULT_ARC_STEP_DEG):
    """curveToLineString (:6020) for one arc triplet -> [(x, y), ...]
    including both endpoints and the explicit intermediate point.
    Calling with swapped endpoints returns the exact reversed vertex
    list (the no-gap guarantee for shared arcs, :6033-6036)."""
    if x0 < x2 or (x0 == x2 and y0 < y2):     # OGRGF_NeedSwithArcOrder
        rev = arc_to_points(x2, y2, x1, y1, x0, y0, max_step_deg)
        return rev[::-1]
    ok, R, cx, cy, a0, a1, a2 = get_curve_parameters(x0, y0, x1, y1,
                                                     x2, y2)
    if max_step_deg < 1e-6:
        max_step_deg = DEFAULT_ARC_STEP_DEG
    step = max(max_step_deg, 0.01) / 180.0 * math.pi
    pts = [(x0, y0)]
    if not ok:                                # aligned: keep 3 vertices
        pts.append((x1, y1))
    else:
        step *= 1 if a1 >= a0 else -1
        _stroke_arc(pts, cx, cy, R, a0, a1, step)
        pts.append((x1, y1))
        _stroke_arc(pts, cx, cy, R, a1, a2, step)
    pts.append((x2, y2))
    return pts


def circularstring_to_coords(coords,
                             max_step_deg: float = DEFAULT_ARC_STEP_DEG):
    """CircularString point list (odd length >= 3: arcs over
    consecutive overlapping triplets) -> stroked coordinate list."""
    c = np.asarray(coords, np.float64)
    n = len(c)
    if n < 3 or n % 2 == 0:
        raise ValueError(f"CircularString needs an odd point count >= 3,"
                         f" got {n} (ogrcircularstring.cpp)")
    out = []
    for i in range(0, n - 2, 2):
        seg = arc_to_points(c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1],
                            c[i + 2, 0], c[i + 2, 1], max_step_deg)
        out.extend(seg if not out else seg[1:])
    return out


def _ring_coords(t, payload, max_step_deg):
    """A curve-polygon ring (LineString / CircularString /
    CompoundCurve child) -> closed linear coordinate list."""
    if t == W.LINESTRING:
        return [tuple(p) for p in np.asarray(payload, np.float64)]
    if t == CIRCULARSTRING:
        return circularstring_to_coords(payload, max_step_deg)
    if t == COMPOUNDCURVE:
        out = []
        for ct, cp in payload:
            seg = _ring_coords(ct, cp, max_step_deg)
            out.extend(seg if not out else seg[1:])
        return out
    raise ValueError(f"unsupported curve-ring type {t}")


def linearize(buf: bytes,
              max_step_deg: float = DEFAULT_ARC_STEP_DEG) -> bytes:
    """Any WKB -> linear WKB (types 1-7): curves stroked, linear
    geometries returned unchanged; collections recurse. The ingest
    hook, mirroring alg/gdalrasterize.cpp:587-597 / drivers'
    getLinearGeometry()."""
    t, payload = W.decode(buf)
    if t not in CURVE_TYPES:
        if t == W.GEOMETRYCOLLECTION:
            return W.collection([linearize(W.encode_typed(ct, cp),
                                           max_step_deg)
                                 for ct, cp in payload])
        return bytes(buf)
    if t == CIRCULARSTRING:
        return W.linestring(circularstring_to_coords(payload, max_step_deg))
    if t == COMPOUNDCURVE:
        return W.linestring(_ring_coords(t, payload, max_step_deg))
    if t == CURVEPOLYGON:
        return W.polygon([_ring_coords(ct, cp, max_step_deg)
                          for ct, cp in payload])
    if t == MULTICURVE:
        lines = []
        for ct, cp in payload:
            lines.append(W.decode(linearize(W.encode_typed(ct, cp),
                                            max_step_deg))[1])
        return W.multilinestring([np.asarray(l, np.float64)
                                  for l in lines])
    # MULTISURFACE: children are Polygon or CurvePolygon
    polys = []
    for ct, cp in payload:
        pt, pp = W.decode(linearize(W.encode_typed(ct, cp), max_step_deg))
        if pt != W.POLYGON:
            raise ValueError(f"MultiSurface child of type {pt}")
        polys.append([np.asarray(r, np.float64) for r in pp])
    return W.multipolygon(polys)
