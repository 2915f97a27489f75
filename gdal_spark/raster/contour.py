"""Contour: iso-line extraction from a raster (marching squares).

Reference: alg/contour.cpp:569 `GDALContourGenerateEx` with the
marching-squares core under alg/marching_squares/ — for each 2x2 pixel
window ("square") whose corner values straddle a level, emit the
linearly-interpolated crossing segment(s); segments chain into
polylines downstream.

Distributed restatement: squares on tile-interior pixels are
independent; squares STRADDLING a tile boundary need the neighbor's
edge pixels — the same 1-px halo join the focal ops use. Each task
emits exact segment endpoints in GLOBAL pixel-center coordinates, so
the distributed segment set equals the single-node one exactly
(stitching segments into rings is the polygonize boundary-merge
pattern; v1 gates on the segment set + per-level stats, which is what
the marching-squares core itself produces).

Saddle rule: the ambiguous case (diagonal corners high) resolves by
the center-average rule (mean of the 4 corners vs level), matching the
reference's default (no NODATA path in v1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G
from .focal import _halo_window

SEG_SCHEMA = T.StructType([
    T.StructField("level", T.DoubleType(), False),
    T.StructField("x1", T.DoubleType(), False),
    T.StructField("y1", T.DoubleType(), False),
    T.StructField("x2", T.DoubleType(), False),
    T.StructField("y2", T.DoubleType(), False),
])


def _interp(va: float, vb: float, level: float) -> float:
    return (level - va) / (vb - va)


def _square_segments(v00, v10, v01, v11, level, saddle="center"):
    """Marching squares for one square with corners
    v00=(0,0) v10=(1,0) v01=(0,1) v11=(1,1) (x right, y down).
    Returns 0-2 DIRECTED segments in unit-square coordinates, oriented
    so the HIGH side (>= level) is on the LEFT of start->end (left in
    this y-down frame == cross((b-a),(p-a)) < 0).  The orientation is
    what lets the POLYGONIZE mode chain region boundaries into
    consistently-wound rings, exactly as the reference orients its
    square table (alg/marching_squares/square.h:165-266).

    saddle: 'center' disambiguates the two ambiguous cases by the
    corner mean (classic marching squares); 'fixed' always picks the
    (left-bottom)+(top-right) chord pairing, the reference's
    polygonize choice (square.h:249-266 — a fixed configuration can
    never make contours of different levels cross, which would
    produce invalid polygons)."""
    idx = ((v00 >= level) | 0) | (((v10 >= level) | 0) << 1) \
        | (((v01 >= level) | 0) << 2) | (((v11 >= level) | 0) << 3)
    if idx in (0, 15):
        return []
    # edge crossing points (on edges where corners straddle)
    top = (_interp(v00, v10, level), 0.0)
    bottom = (_interp(v01, v11, level), 1.0)
    left = (0.0, _interp(v00, v01, level))
    right = (1.0, _interp(v10, v11, level))
    table = {
        1: [(left, top)], 14: [(top, left)],
        2: [(top, right)], 13: [(right, top)],
        3: [(left, right)], 12: [(right, left)],
        4: [(bottom, left)], 11: [(left, bottom)],
        5: [(bottom, top)], 10: [(top, bottom)],   # vertical sides
        7: [(bottom, right)], 8: [(right, bottom)],
    }
    if idx in table:
        return table[idx]
    # saddles (diagonal corners high): 9 = v00+v11, 6 = v10+v01
    if saddle == "fixed":
        # fixed (left,bottom)+(top,right) chords; orientation from the
        # cut-off corner's side exactly as the single-corner cases
        return [(left, bottom), (right, top)] if idx == 9 \
            else [(bottom, left), (top, right)]
    center_high = (v00 + v10 + v01 + v11) / 4.0 >= level
    if idx == 9:  # v00, v11 high
        return [(right, top), (left, bottom)] if center_high \
            else [(left, top), (right, bottom)]
    # idx == 6: v10, v01 high
    return [(top, left), (bottom, right)] if center_high \
        else [(top, right), (bottom, left)]


def contour_segments_np(canvas: np.ndarray, levels: list[float],
                        x0: int = 0, y0: int = 0,
                        saddle: str = "center") -> list[tuple]:
    """All segments of a canvas; endpoints in global pixel-center
    coords (square corner (i,j) is pixel center (x0+j+0.5, y0+i+0.5))."""
    h, w = canvas.shape
    out = []
    # non-straddling edges divide by zero in the eager crossing-point
    # computation; those points are never used by the segment table
    with np.errstate(divide="ignore", invalid="ignore"):
        for level in levels:
            # on-level corner values are nudged up (the reference's
            # marching-squares fudge) so contours never pass exactly
            # through a sample node — avoids degenerate zero-length
            # segments and >2-way endpoint junctions
            fudge = 1e-9 * max(1.0, abs(level))
            canvas = np.where(canvas == level, level + fudge, canvas)
            ge = canvas >= level
            for i in range(h - 1):
                for j in range(w - 1):
                    # quick reject: all four same side
                    s = int(ge[i, j]) + int(ge[i, j + 1]) \
                        + int(ge[i + 1, j]) + int(ge[i + 1, j + 1])
                    if s in (0, 4):
                        continue
                    segs = _square_segments(
                        canvas[i, j], canvas[i, j + 1],
                        canvas[i + 1, j], canvas[i + 1, j + 1],
                        level, saddle)
                    for (ax, ay), (bx, by) in segs:
                        out.append((level,
                                    x0 + j + 0.5 + ax, y0 + i + 0.5 + ay,
                                    x0 + j + 0.5 + bx, y0 + i + 0.5 + by))
    return out


def chain_segments(segs: list[tuple]) -> list[np.ndarray]:
    """Chain (x1,y1,x2,y2) segments of ONE level into polylines
    (closed rings where the iso-line closes; open lines where it exits
    the raster) — the arc-assembly the reference does downstream of
    marching squares. Endpoints are matched exactly (crossings on a
    shared square edge are computed from the same two corner values on
    both sides, so their floats agree bit-for-bit)."""
    adj: dict[tuple, list] = {}
    for x1, y1, x2, y2 in segs:
        a, b = (x1, y1), (x2, y2)
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    def pop_edge(a, b):
        adj[a].remove(b)
        if not adj[a]:
            del adj[a]
        if b in adj:
            adj[b].remove(a)
            if not adj[b]:
                del adj[b]

    lines = []
    # open chains first (start at degree-1 endpoints)
    while True:
        start = next((p for p, ns in adj.items() if len(ns) == 1), None)
        if start is None:
            break
        line = [start]
        cur = start
        while cur in adj:
            nxt = adj[cur][0]
            pop_edge(cur, nxt)
            line.append(nxt)
            cur = nxt
        lines.append(np.array(line))
    # remaining edges form closed loops
    while adj:
        start = next(iter(adj))
        line = [start]
        cur = start
        while cur in adj:
            nxt = adj[cur][0]
            pop_edge(cur, nxt)
            line.append(nxt)
            cur = nxt
            if cur == start:
                break
        lines.append(np.array(line))
    return lines


def contour_polylines(tiles: DataFrame, spec: G.GridSpec,
                      levels: list[float]) -> DataFrame:
    """Distributed contour with ASSEMBLED polylines: one row per
    chained line — (level, n_points, closed, length, wkb). Chaining
    groups by level (each level's segment set goes to one task — iso-
    line graphs are metadata-sized relative to the raster; shard by
    region first if a single level's segments outgrow a task)."""
    from ..geo import geom as _geom
    from ..geo import wkb as _wkb

    segs = contour(tiles, spec, levels)
    out_schema = T.StructType([
        T.StructField("level", T.DoubleType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("closed", T.BooleanType(), False),
        T.StructField("length", T.DoubleType(), False),
        T.StructField("geom", T.BinaryType(), False),
    ])

    def chain(key, pdf: pd.DataFrame) -> pd.DataFrame:
        level = float(key[0])
        lines = chain_segments(list(zip(pdf["x1"], pdf["y1"],
                                        pdf["x2"], pdf["y2"])))
        rows = []
        for ln in lines:
            closed = bool((ln[0] == ln[-1]).all()) and len(ln) > 1
            rows.append((level, len(ln), closed,
                         _geom.line_length(ln),
                         bytearray(_wkb.linestring(ln))))
        return pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return segs.groupBy("level").applyInPandas(chain, out_schema)


# =====================================================================
# POLYGONIZE mode: iso-polygons between consecutive levels
# (GDALContourGenerateEx POLYGONIZE option, alg/contour.cpp:569; ring
# assembly alg/marching_squares/segment_merger.h:26 + nesting
# polygon_ring_appender.h:30)
# =====================================================================
#
# Slot j = the region where  level_{j-1} <= v < level_j  (slot 0 is
# "below the first level", slot m "above the last" — the reference's
# "Inf slot", square.h:300-303).  Its boundary is assembled from three
# directed sources, all oriented REGION-ON-THE-LEFT (left in this
# y-down frame == cross((b-a),(p-a)) < 0):
#   * contour segments at level_{j-1} as emitted (high side left),
#   * contour segments at level_j REVERSED (the reference adds each
#     contour to the next level's polygon too, square.h:356-366),
#   * pieces of the raster frame (the loop through the border pixel
#     CENTERS, [0.5, W-0.5]x[0.5, H-0.5]) where the linearly
#     interpolated border value falls inside the slot — the
#     addBorderSegment path of square.h:291-337, split at each
#     crossing level.
# Every vertex then has in-degree == out-degree == 1 per slot, so the
# directed chains close into rings: exteriors wind with NEGATIVE
# shoelace area in this y-down frame, holes POSITIVE, and nesting is
# a winding-number containment test (polygon_ring_appender.h:50-99).

#: sides of the raster frame; (reverse) = walk direction vs the
#: canonical ascending axis so the interior stays on the LEFT
_SIDES = (("top", False, True), ("bottom", False, False),
          ("left", True, False), ("right", True, True))


def _slot_bounds(levels: list[float]) -> list[tuple[int, float, float]]:
    lv = sorted(levels)
    bounds = [-float("inf")] + lv + [float("inf")]
    return [(j, bounds[j], bounds[j + 1]) for j in range(len(lv) + 1)]


def border_pieces_np(canvas: np.ndarray, levels: list[float]) -> list[tuple]:
    """Directed frame pieces per slot: (slot, x1, y1, x2, y2), with the
    raster interior on the left.  Crossing positions use the SAME
    division (level - va) / (vb - va) on the canonical ascending axis
    as the marching-squares interpolation, so a contour segment that
    ends on the frame meets its border piece bit-exactly."""
    h, w = canvas.shape
    lv = sorted(levels)
    vals = {
        "top": canvas[0, :].astype(np.float64).copy(),
        "bottom": canvas[h - 1, :].astype(np.float64).copy(),
        "left": canvas[:, 0].astype(np.float64).copy(),
        "right": canvas[:, w - 1].astype(np.float64).copy(),
    }
    # progressive on-level fudge, mirroring contour_segments_np: the
    # crossing at level i sees values fudged for levels <= i only
    crossings: dict[str, list[list[tuple[int, float]]]] = {
        s: [[] for _ in range(len(vals[s]) - 1)] for s in vals}
    for li, level in enumerate(lv):
        fudge = 1e-9 * max(1.0, abs(level))
        for s, v in vals.items():
            v[v == level] = level + fudge
            ge = v >= level
            for i in range(len(v) - 1):
                if ge[i] != ge[i + 1]:
                    t = (level - v[i]) / (v[i + 1] - v[i])
                    crossings[s][i].append((li, t))
    out = []
    for side, vertical, reverse in _SIDES:
        v = vals[side]
        n = len(v)
        if side == "top":
            fx, fy = None, 0.5
        elif side == "bottom":
            fx, fy = None, (h - 1) + 0.5
        elif side == "left":
            fx, fy = 0.5, None
        else:
            fx, fy = (w - 1) + 0.5, None

        def pt(i, t):
            c = (i + 0.5) + t
            return (c, fy) if not vertical else (fx, c)

        for i in range(n - 1):
            slot = int(np.sum(v[i] >= np.asarray(lv)))
            asc = v[i] < v[i + 1]
            cr = [t for _, t in crossings[side][i]]
            if not asc:
                cr = cr[::-1]  # descending edge: levels cross in reverse t
            ts = [0.0] + cr + [1.0]
            for k in range(len(ts) - 1):
                a, b = pt(i, ts[k]), pt(i, ts[k + 1])
                if reverse:
                    a, b = b, a
                out.append((slot, a[0], a[1], b[0], b[1]))
                slot += 1 if asc else -1
    return out


def slot_boundary_np(canvas: np.ndarray, levels: list[float]) -> list[tuple]:
    """Full directed boundary relation per slot (single-node
    reference): contour chords (fixed saddle) duplicated into the two
    adjacent slots + frame pieces."""
    lv = sorted(levels)
    k_of = {l: i for i, l in enumerate(lv)}
    out = []
    for level, x1, y1, x2, y2 in contour_segments_np(canvas, lv,
                                                     saddle="fixed"):
        k = k_of[level]
        out.append((k + 1, x1, y1, x2, y2))     # high side, as emitted
        out.append((k, x2, y2, x1, y1))         # low side, reversed
    out.extend(border_pieces_np(canvas, levels))
    return out


def assemble_rings(segs) -> list[np.ndarray]:
    """Chain DIRECTED segments head->tail into closed rings.  Raises
    on an open chain or a duplicated start vertex — per-slot region
    boundaries are closed by construction, so either means segments
    were lost or mis-oriented upstream.  Ring start = the
    lexicographically smallest vertex (deterministic ids)."""
    nxt: dict[tuple, tuple] = {}
    for x1, y1, x2, y2 in segs:
        a, b = (x1, y1), (x2, y2)
        if a in nxt:
            raise RuntimeError(f"degenerate boundary: two segments leave {a}")
        nxt[a] = b
    rings = []
    while nxt:
        start = min(nxt)
        ring = [start]
        cur = nxt.pop(start)
        ring.append(cur)
        while cur != start:
            if cur not in nxt:
                raise RuntimeError(f"open boundary chain at {cur}")
            cur = nxt.pop(cur)
            ring.append(cur)
        rings.append(np.asarray(ring, np.float64))
    return rings


def ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) / 2.0)


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    """Winding-number containment (polygon_ring_appender.h:50-99)."""
    x, y = float(pt[0]), float(pt[1])
    wn = 0
    xs, ys = ring[:, 0], ring[:, 1]
    for i in range(len(ring) - 1):
        x1, y1, x2, y2 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        if y1 <= y:
            if y2 > y and (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) > 0:
                wn += 1
        elif y2 <= y and (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) < 0:
            wn -= 1
    return wn != 0


def nest_rings(rings: list[np.ndarray]) -> list[tuple[np.ndarray, list]]:
    """[(shell, [holes...])]: negative-shoelace rings are exteriors
    (region-on-left + y-down), positive are holes assigned to the
    smallest enclosing exterior — PolygonRingAppender's organization
    of rings into (multi)polygons with interior rings."""
    ext = [(r, abs(ring_signed_area(r))) for r in rings
           if ring_signed_area(r) < 0]
    holes = [r for r in rings if ring_signed_area(r) >= 0]
    ext.sort(key=lambda e: e[1])  # smallest first -> first hit is tightest
    polys = [(r, []) for r, _ in ext]
    for hole in holes:
        for i, (shell, _) in enumerate(ext):
            if _point_in_ring(hole[0], shell):
                polys[i][1].append(hole)
                break
        else:
            raise RuntimeError("hole with no enclosing exterior ring")
    return polys


def contour_polygons_np(canvas: np.ndarray, levels: list[float]) -> dict:
    """{slot -> [(shell, [holes]), ...]} — the single-node oracle the
    distributed assembly is pytest-gated against."""
    by_slot: dict[int, list] = {}
    for slot, x1, y1, x2, y2 in slot_boundary_np(canvas, levels):
        by_slot.setdefault(slot, []).append((x1, y1, x2, y2))
    return {slot: nest_rings(assemble_rings(segs))
            for slot, segs in sorted(by_slot.items())}


def _border_edges(px: DataFrame, spec: G.GridSpec) -> DataFrame:
    """Frame-edge relation (side, vertical, reverse, idx, va, vb) from
    the SPARSE pixel relation px(gx, gy, v) — absent pixels are 0.
    The frame is O(W+H), one dimension below the raster, so the four
    range+join builds stay metadata-sized even at a 10^6-px world
    grid; values join against px filtered to the single border
    row/column (partition-pruned on gy/gx)."""
    spark = px.sparkSession
    w, h = spec.width, spec.height
    parts = []
    for side, vertical, reverse in _SIDES:
        if side == "top":
            cond, idx_col, length = (F.col("gy") == 0), "gx", w
        elif side == "bottom":
            cond, idx_col, length = (F.col("gy") == h - 1), "gx", w
        elif side == "left":
            cond, idx_col, length = (F.col("gx") == 0), "gy", h
        else:
            cond, idx_col, length = (F.col("gx") == w - 1), "gy", h
        vals = (spark.range(length).select(F.col("id").alias("idx"))
                .join(px.filter(cond).select(F.col(idx_col).alias("idx"),
                                             "v"), "idx", "left")
                .select("idx", F.coalesce("v", F.lit(0.0)).alias("v")))
        a, b = vals.alias("a"), vals.alias("b")
        parts.append(
            a.join(b, F.col("b.idx") == F.col("a.idx") + 1)
            .select(F.lit(side).alias("side"),
                    F.lit(vertical).alias("vertical"),
                    F.lit(reverse).alias("reverse"),
                    F.col("a.idx").alias("idx"),
                    F.col("a.v").alias("va"), F.col("b.v").alias("vb")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def border_pieces(px: DataFrame, spec: G.GridSpec,
                  levels: list[float]) -> DataFrame:
    """Distributed frame pieces (slot, x1, y1, x2, y2) — pure JVM
    column math (interval splitting per slot), bit-identical to
    border_pieces_np whenever no border value equals a level exactly
    (half-integer levels on count rasters guarantee this; the np
    reference additionally implements the on-level fudge)."""
    edges = _border_edges(px, spec)
    # constant slot fan-out as a JVM Generate (explode over a literal
    # array) — same pattern as the halo-offset fan, no join node
    slots = F.array(*[
        F.struct(F.lit(int(s)).alias("slot"),
                 F.lit(float(lo)).alias("lo"),
                 F.lit(float(hi)).alias("hi"))
        for s, lo, hi in _slot_bounds(levels)])
    e = (edges.withColumn("sl", F.explode(slots))
         .select("*", F.col("sl.slot").alias("slot"),
                 F.col("sl.lo").alias("lo"),
                 F.col("sl.hi").alias("hi"))
         .drop("sl"))
    va, vb, lo, hi = F.col("va"), F.col("vb"), F.col("lo"), F.col("hi")
    flat, asc = va == vb, va < vb
    dead = (F.when(flat, (va < lo) | (va >= hi))
            .when(asc, (va >= hi) | (vb < lo))
            .otherwise((va < lo) | (vb >= hi)))
    t_start = (F.when(flat, F.lit(0.0))
               .when(asc, F.when(va >= lo, F.lit(0.0))
                     .otherwise((lo - va) / (vb - va)))
               .otherwise(F.when(va < hi, F.lit(0.0))
                          .otherwise((hi - va) / (vb - va))))
    t_end = (F.when(flat, F.lit(1.0))
             .when(asc, F.when(vb < hi, F.lit(1.0))
                   .otherwise((hi - va) / (vb - va)))
             .otherwise(F.when(vb >= lo, F.lit(1.0))
                        .otherwise((lo - va) / (vb - va))))
    e = (e.filter(~dead)
         .withColumn("t1", t_start).withColumn("t2", t_end)
         .filter(F.col("t1") < F.col("t2")))
    w, h = spec.width, spec.height
    base = F.col("idx").cast("double") + F.lit(0.5)
    fixed = (F.when(F.col("side") == "top", F.lit(0.5))
             .when(F.col("side") == "bottom", F.lit(float(h - 1) + 0.5))
             .when(F.col("side") == "left", F.lit(0.5))
             .otherwise(F.lit(float(w - 1) + 0.5)))
    c1, c2 = base + F.col("t1"), base + F.col("t2")
    x1 = F.when(F.col("vertical"), fixed).otherwise(c1)
    y1 = F.when(F.col("vertical"), c1).otherwise(fixed)
    x2 = F.when(F.col("vertical"), fixed).otherwise(c2)
    y2 = F.when(F.col("vertical"), c2).otherwise(fixed)
    rev = F.col("reverse")
    return e.select(
        "slot",
        F.when(rev, x2).otherwise(x1).alias("x1"),
        F.when(rev, y2).otherwise(y1).alias("y1"),
        F.when(rev, x1).otherwise(x2).alias("x2"),
        F.when(rev, y1).otherwise(y2).alias("y2"))


def contour_polygon_boundary(tiles: DataFrame, px: DataFrame,
                             spec: G.GridSpec,
                             levels: list[float]) -> DataFrame:
    """Directed per-slot boundary relation (slot, x1, y1, x2, y2):
    contour chords at each level assigned to BOTH adjacent slots
    (high side as emitted, low side reversed — square.h:356-366's
    'the contour is used in the polygon of higher level as well')
    plus the frame pieces."""
    lv = sorted(levels)
    segs = contour(tiles, spec, lv, saddle="fixed")
    k = F.lit(None).cast("int")
    for i, level in enumerate(lv):
        k = F.when(F.col("level") == F.lit(float(level)), F.lit(i)).otherwise(k)
    segs = segs.withColumn("k", k)
    hi_side = segs.select((F.col("k") + 1).alias("slot"),
                          "x1", "y1", "x2", "y2")
    lo_side = segs.select(F.col("k").alias("slot"),
                          F.col("x2").alias("x1"), F.col("y2").alias("y1"),
                          F.col("x1").alias("x2"), F.col("y1").alias("y2"))
    return (hi_side.unionByName(lo_side)
            .unionByName(border_pieces(px, spec, levels)))


RING_EDGE_SCHEMA = T.StructType([
    T.StructField("slot", T.IntegerType(), False),
    T.StructField("ring_id", T.IntegerType(), False),
    T.StructField("seq", T.IntegerType(), False),
    T.StructField("x1", T.DoubleType(), False),
    T.StructField("y1", T.DoubleType(), False),
    T.StructField("x2", T.DoubleType(), False),
    T.StructField("y2", T.DoubleType(), False),
])

POLY_SCHEMA = T.StructType([
    T.StructField("slot", T.IntegerType(), False),
    T.StructField("poly_id", T.IntegerType(), False),
    T.StructField("n_holes", T.IntegerType(), False),
    T.StructField("n_points", T.IntegerType(), False),
    T.StructField("area", T.DoubleType(), False),
    T.StructField("geom", T.BinaryType(), False),
])


def contour_ring_edges(boundary: DataFrame) -> DataFrame:
    """Assemble each slot's directed boundary into closed rings and
    re-emit the ring EDGES (slot, ring_id, seq, x1, y1, x2, y2).
    Chaining neither moves nor re-orients a segment, so the edge
    multiset equals the input boundary multiset exactly — which is
    what lets the driver gate hash assembled output against a purely
    relational oracle.  One task per slot: the iso-graph is
    one-dimensional (O(N) for an N^2 raster), the same size argument
    as contour_polylines; shard by region first if a single slot's
    boundary outgrows a task."""
    def chain(key, pdf: pd.DataFrame) -> pd.DataFrame:
        slot = int(key[0])
        rings = assemble_rings(list(zip(pdf["x1"], pdf["y1"],
                                        pdf["x2"], pdf["y2"])))
        rows = []
        for rid, ring in enumerate(rings):
            for s in range(len(ring) - 1):
                rows.append((slot, rid, s, ring[s, 0], ring[s, 1],
                             ring[s + 1, 0], ring[s + 1, 1]))
        return pd.DataFrame(rows, columns=[f.name for f in RING_EDGE_SCHEMA])

    return boundary.groupBy("slot").applyInPandas(chain, RING_EDGE_SCHEMA)


def contour_polygons(boundary: DataFrame) -> DataFrame:
    """Assembled iso-POLYGON features per slot: exterior + interior
    rings nested by winding containment, emitted as polygon WKB with
    |shoelace| areas (holes subtracted)."""
    from ..geo import wkb as _wkb

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        slot = int(key[0])
        rings = assemble_rings(list(zip(pdf["x1"], pdf["y1"],
                                        pdf["x2"], pdf["y2"])))
        rows = []
        for pid, (shell, holes) in enumerate(nest_rings(rings)):
            area = -ring_signed_area(shell) - sum(
                ring_signed_area(hl) for hl in holes)
            npts = sum(len(r) for r in [shell] + holes)
            rows.append((slot, pid, len(holes), npts, area,
                         bytearray(_wkb.polygon([shell] + holes))))
        return pd.DataFrame(rows, columns=[f.name for f in POLY_SCHEMA])

    return boundary.groupBy("slot").applyInPandas(build, POLY_SCHEMA)


def contour(tiles: DataFrame, spec: G.GridSpec,
            levels: list[float], saddle: str = "center") -> DataFrame:
    """Distributed contour -> segment DataFrame (level, x1, y1, x2, y2)
    in global pixel-center coordinates.

    Each task owns the squares whose TOP-LEFT corner pixel lies in its
    tile; the right/bottom halo supplies the neighbor corners, so no
    square is emitted twice and boundary squares are exact."""
    from .focal import focal  # noqa: F401  (shared fan-out pattern below)

    t = spec.tile
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    # 9-way halo fan as a JVM Generate (explode over a literal array)
    # — no join node, no broadcast exchange
    off_arr = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    fan = (tiles.withColumn("off", F.explode(off_arr))
           .withColumn("t_ty", F.col("tile_y") + F.col("off.dy"))
           .withColumn("t_tx", F.col("tile_x") + F.col("off.dx"))
           .filter((F.col("t_ty") >= 0) & (F.col("t_ty") < tiles_y)
                   & (F.col("t_tx") >= 0) & (F.col("t_tx") < tiles_x))
           .select("t_ty", "t_tx", "tile_y", "tile_x", "px"))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        neigh = {}
        for _, row in pdf.iterrows():
            h, w = spec.tile_shape(int(row["tile_y"]), int(row["tile_x"]))
            neigh[(int(row["tile_y"]), int(row["tile_x"]))] = \
                np.asarray(row["px"], np.float64).reshape(h, w)
        if (ty, tx) not in neigh:
            neigh[(ty, tx)] = np.zeros(spec.tile_shape(ty, tx))
        win = _halo_window(neigh, ty, tx, spec)
        # squares owned: top-left corner in this tile => rows/cols
        # [1, t] of the halo window, plus one extra row/col of corners
        sub = win[1:t + 2, 1:t + 2]
        # at the raster's south/east boundary there is no next pixel:
        # _halo_window replicated it; drop those squares (they belong
        # to nobody — a square needs 4 REAL pixels)
        hh = t if ty < tiles_y - 1 else t - 1
        ww = t if tx < tiles_x - 1 else t - 1
        segs = contour_segments_np(sub[:hh + 1, :ww + 1], levels,
                                   x0=tx * t, y0=ty * t, saddle=saddle)
        return pd.DataFrame(segs, columns=[f.name for f in SEG_SCHEMA]) \
            if segs else pd.DataFrame(
                {f.name: pd.Series(dtype="float64") for f in SEG_SCHEMA})

    return fan.groupBy("t_ty", "t_tx").applyInPandas(run, SEG_SCHEMA)
