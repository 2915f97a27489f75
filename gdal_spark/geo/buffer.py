"""Geometry buffer (dilate / erode) — composed from the overlay engine.

Reference contract: OGRGeometry::Buffer (ogr/ogr_geometry.h:573) and
the `gdal vector buffer` pipeline step (apps/gdalalg_vector_buffer.cpp:
28-56 / .h:33-41: distance, endcap-style round|flat|square, join-style
round|mitre|bevel, mitre-limit default 5, quadrant-segments default 8,
side both|left|right). The reference delegates the construction to
GEOS (HAVE_GEOS gate at gdalalg_vector_buffer.cpp:59) and errors
without it; this sandbox has no GEOS, so buffer is COMPOSED from the
from-scratch boolean overlay instead of ported:

    dilate(P, r)  = union( P, rect(e, r) per edge, join piece per vertex )
    line buffer   = union( rects + join pieces + end caps )
    erode(P, r)   = P \\ dilate(boundary(P), r)

Join piece per vertex: full disc (round — the concave-side surplus is
always covered by the adjacent edge rectangles, so a disc is exact),
outward triangle (bevel), outward mitre quad (mitre; a corner whose
mitre point would exceed mitre_limit*r falls back to bevel — GEOS
instead chamfers AT the limit, a sub-eps*r area difference fenced in
the docstring because reproducing it needs GEOS's internal chamfer
points). Caps: end discs (round), nothing (flat), half-square
extensions (square). `side=left/right` (single-sided line buffers) is
scope-fenced: raises NotImplementedError.

Arc discretization follows the reference's quadrant-segments contract:
4*quad_segs vertices per full circle. Discs are generated from one
mirrored quadrant so the four axis points are float-EXACT — quarter
discs at square corners then tile to exactly one full disc, which the
tests exploit for closed-form area oracles.

All unions/differences run through the adaptive-precision overlay
(geo/overlay.py), so results are exact w.r.t. the generated piece
vertices. Scale shape: one buffer call per geometry inside a pandas
UDF (st_funcs.st_buffer / pipeline step "buffer") — embarrassingly
parallel per row, no shuffle, no driver participation.
"""

from __future__ import annotations

import numpy as np

from . import geom, overlay, wkb


def disc_ring(cx: float, cy: float, r: float, quad_segs: int = 8) -> np.ndarray:
    """Closed CCW ring of the inscribed 4*quad_segs-gon of the circle.

    Built from one quadrant mirrored twice, so the points at angles
    0, pi/2, pi, 3pi/2 are exactly (r,0),(0,r),(-r,0),(0,-r) offsets —
    no cos(pi/2)=6e-17 drift on the axes.
    """
    q = max(1, int(quad_segs))
    th = np.arange(1, q) * (np.pi / (2.0 * q))
    x = np.cos(th) * r
    y = np.sin(th) * r
    # quadrant I including both axis endpoints, then mirror
    q1x = np.concatenate([[r], x, [0.0]])
    q1y = np.concatenate([[0.0], y, [r]])
    xs = np.concatenate([q1x, -q1y[1:], -q1x[1:], q1y[1:]])
    ys = np.concatenate([q1y, q1x[1:], -q1y[1:], -q1x[1:]])
    ring = np.column_stack([cx + xs, cy + ys])
    ring[-1] = ring[0]  # Q4 mirror ends at angle 2*pi == start
    return ring


def _unit(v: np.ndarray) -> np.ndarray | None:
    n = float(np.hypot(v[0], v[1]))
    if n == 0.0:
        return None
    return v / n


def _edge_rect(p0: np.ndarray, p1: np.ndarray, r: float) -> np.ndarray | None:
    """Full-width rectangle swept by the edge (both sides; the inner
    half is absorbed by the source polygon / opposite-segment rects in
    the union, which keeps one code path for side=both)."""
    d = _unit(p1 - p0)
    if d is None:
        return None
    n = np.array([-d[1], d[0]]) * r
    ring = np.array([p0 + n, p0 - n, p1 - n, p1 + n, p0 + n])
    return ring


def _join_pieces(v: np.ndarray, d_in: np.ndarray, d_out: np.ndarray,
                 r: float, join: str, mitre_limit: float,
                 quad_segs: int) -> list[np.ndarray]:
    """Corner fill between the rectangles of two consecutive edges.

    d_in / d_out are the unit directions of the incoming and outgoing
    edges at vertex v. The gap to fill is on the CONVEX side (the side
    the boundary turns away from); on the concave side the two
    rectangles already overlap and cover any piece we could add, so
    round can use a full disc while bevel/mitre construct only the
    outward wedge.
    """
    turn = float(d_in[0] * d_out[1] - d_in[1] * d_out[0])
    if join == "round":
        return [disc_ring(float(v[0]), float(v[1]), r, quad_segs)]
    if turn == 0.0:
        return []  # straight or U-turn: rectangles already meet
    # outward normals of the two edges on the convex side
    if turn < 0.0:  # right turn -> gap on the left side
        n1 = np.array([-d_in[1], d_in[0]]) * r
        n2 = np.array([-d_out[1], d_out[0]]) * r
    else:  # left turn -> gap on the right side
        n1 = np.array([d_in[1], -d_in[0]]) * r
        n2 = np.array([d_out[1], -d_out[0]]) * r
    a = v + n1
    b = v + n2
    if join == "bevel":
        return [np.array([v, a, b, v])] if turn < 0 else [np.array([v, b, a, v])]
    if join == "mitre":
        bis = _unit(n1 + n2)
        if bis is not None:
            cos_half = float(np.dot(bis, n1)) / r  # = cos(theta/2)
            if cos_half > 0.0:
                mdist = r / cos_half
                if mdist <= mitre_limit * r:
                    m = v + bis * mdist
                    quad = [v, a, m, b, v] if turn < 0 else [v, b, m, a, v]
                    return [np.array(quad)]
        # mitre-limit exceeded (or anti-parallel): bevel fallback
        return [np.array([v, a, b, v])] if turn < 0 else [np.array([v, b, a, v])]
    raise ValueError(f"join-style {join!r}: want round|mitre|bevel")


def _ring_pieces(ring: np.ndarray, r: float, join: str, mitre_limit: float,
                 quad_segs: int, polygon_mode: bool = False) -> list[np.ndarray]:
    """Rectangles + join pieces covering all points within r of the
    closed ring's boundary.

    polygon_mode: the ring belongs to a NORMALIZED polygon (interior on
    the left of every directed edge — CCW shell / CW hole). Join pieces
    are then only emitted where the fill side faces AWAY from the
    interior (turn > 0): at interior-facing corners the source polygon
    plus the edge rectangles already cover the corner, and a mitre
    point reaching into the interior could poke out the far side of a
    polygon thinner than mitre_limit*r — adding area the true buffer
    does not have."""
    c = np.asarray(ring, np.float64)
    if len(c) and (c[0] != c[-1]).any():
        c = np.vstack([c, c[:1]])
    pts = c[:-1]
    pieces = []
    dirs = []
    for i in range(len(pts)):
        p0, p1 = pts[i], pts[(i + 1) % len(pts)]
        rect = _edge_rect(p0, p1, r)
        d = _unit(p1 - p0)
        dirs.append(d)
        if rect is not None:
            pieces.append(rect)
    for i in range(len(pts)):
        d_in = dirs[(i - 1) % len(pts)]
        d_out = dirs[i]
        if d_in is None or d_out is None:
            # zero-length neighbor edge: a disc always closes the gap
            pieces.append(disc_ring(float(pts[i][0]), float(pts[i][1]),
                                    r, quad_segs))
            continue
        if polygon_mode:
            turn = float(d_in[0] * d_out[1] - d_in[1] * d_out[0])
            if turn <= 0.0:
                continue  # interior-facing corner: rects + P cover it
        pieces.extend(_join_pieces(pts[i], d_in, d_out, r, join,
                                   mitre_limit, quad_segs))
    return pieces


def _union_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    return overlay.union_all([[rg] for rg in rings])


def buffer_polygon(poly: list, dist: float, quad_segs: int = 8,
                   join: str = "round",
                   mitre_limit: float = 5.0) -> list[list[np.ndarray]]:
    """Buffer a polygon (rings[0] shell, rest holes) -> multipolygon
    (list of ring-lists). Negative dist erodes; erosion supports the
    default round join only (the reference's negative-distance mitre/
    bevel need GEOS's raw offset curve; fenced loudly)."""
    if dist == 0.0:
        return [overlay.normalize(poly)]
    if dist > 0.0:
        norm = overlay.normalize(poly)
        pieces: list = [norm]
        for ring in norm:
            pieces.extend([[p] for p in _ring_pieces(
                ring, dist, join, mitre_limit, quad_segs,
                polygon_mode=True)])
        return overlay.union_all(pieces)
    if join != "round":
        raise NotImplementedError(
            "negative-distance buffer supports join='round' only "
            "(GEOS raw offset curves are required for mitre/bevel "
            "erosion; see gdalalg_vector_buffer.cpp HAVE_GEOS gate)")
    r = -dist
    boundary: list[np.ndarray] = []
    for ring in poly:
        boundary.extend(_ring_pieces(ring, r, "round", mitre_limit,
                                     quad_segs))
    parts = [overlay.normalize(poly)]
    for blob in _union_rings(boundary):
        parts = [q for p in parts for q in overlay.difference(p, blob)]
        if not parts:
            break
    return parts


def buffer_line(coords: np.ndarray, dist: float, quad_segs: int = 8,
                end_cap: str = "round", join: str = "round",
                mitre_limit: float = 5.0) -> list[list[np.ndarray]]:
    """Buffer a linestring -> multipolygon. dist <= 0 -> empty
    (GEOS contract for non-areal input)."""
    if dist <= 0.0:
        return []
    c = np.asarray(coords, np.float64)
    pieces: list[np.ndarray] = []
    dirs: list = []
    for i in range(len(c) - 1):
        rect = _edge_rect(c[i], c[i + 1], dist)
        d = _unit(c[i + 1] - c[i])
        if rect is not None:
            pieces.append(rect)
            dirs.append((i, d))
    if not pieces:
        if end_cap == "round":  # degenerate: all points coincide
            return [[disc_ring(float(c[0][0]), float(c[0][1]), dist,
                               quad_segs)]]
        return []
    # interior joins between consecutive non-degenerate segments
    for (i1, d1), (i2, d2) in zip(dirs[:-1], dirs[1:]):
        v = c[i2]
        pieces.extend(_join_pieces(v, d1, d2, dist, join, mitre_limit,
                                   quad_segs))
    # end caps
    first_d, last_d = dirs[0][1], dirs[-1][1]
    p_start, p_end = c[dirs[0][0]], c[dirs[-1][0] + 1]
    if end_cap == "round":
        pieces.append(disc_ring(float(p_start[0]), float(p_start[1]),
                                dist, quad_segs))
        pieces.append(disc_ring(float(p_end[0]), float(p_end[1]),
                                dist, quad_segs))
    elif end_cap == "square":
        for p, d in ((p_start, -first_d), (p_end, last_d)):
            n = np.array([-d[1], d[0]]) * dist
            e = p + d * dist
            pieces.append(np.array([p + n, e + n, e - n, p - n, p + n]))
    elif end_cap != "flat":
        raise ValueError(f"endcap-style {end_cap!r}: want round|flat|square")
    return _union_rings(pieces) if len(pieces) > 1 else [[pieces[0]]]


def buffer_wkb(buf: bytes, dist: float, quad_segs: int = 8,
               end_cap: str = "round", join: str = "round",
               mitre_limit: float = 5.0, side: str = "both") -> bytes:
    """WKB -> WKB MULTIPOLYGON buffer, the st_buffer / pipeline-step
    kernel. Mirrors the `gdal vector buffer` argument surface
    (apps/gdalalg_vector_buffer.cpp:28-56)."""
    if side != "both":
        raise NotImplementedError(
            "side=left/right (single-sided buffers) not implemented — "
            "use side='both' (GEOS GEOSBufferParams_setSingleSided path)")
    ty, payload = wkb.decode(buf)
    kw = dict(quad_segs=quad_segs, join=join, mitre_limit=mitre_limit)
    if ty == wkb.POINT:
        if dist <= 0.0:
            polys = []
        else:
            polys = [[disc_ring(float(payload[0]), float(payload[1]),
                                dist, quad_segs)]]
    elif ty == wkb.LINESTRING:
        polys = buffer_line(payload, dist, end_cap=end_cap, **kw)
    elif ty == wkb.POLYGON:
        polys = buffer_polygon(payload, dist, **kw)
    elif ty == wkb.MULTIPOLYGON:
        if dist > 0.0:
            # one union across ALL parts: dilated parts may merge
            norms = [overlay.normalize(p) for p in payload]
            pieces = list(norms)
            for p in norms:
                for ring in p:
                    pieces.extend([[rg] for rg in _ring_pieces(
                        ring, dist, join, mitre_limit, quad_segs,
                        polygon_mode=True)])
            polys = overlay.union_all(pieces)
        elif dist == 0.0:
            polys = [overlay.normalize(p) for p in payload]
        else:
            # erosion never merges parts: erode each independently
            polys = [q for p in payload
                     for q in buffer_polygon(p, dist, **kw)]
    else:
        raise NotImplementedError(
            f"buffer of geometry type {ty} not implemented")
    return wkb.multipolygon(polys)


def multi_area(polys: list) -> float:
    return overlay.multi_area(polys)
