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


def _square_segments(v00, v10, v01, v11, level):
    """Marching squares for one square with corners
    v00=(0,0) v10=(1,0) v01=(0,1) v11=(1,1) (x right, y down).
    Returns 0-2 segments in unit-square coordinates."""
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
        1: [(left, top)], 14: [(left, top)],
        2: [(top, right)], 13: [(top, right)],
        3: [(left, right)], 12: [(left, right)],
        4: [(bottom, left)], 11: [(bottom, left)],
        5: [(top, bottom)], 10: [(top, bottom)],   # vertical sides
        7: [(bottom, right)], 8: [(bottom, right)],
    }
    if idx in table:
        return table[idx]
    # saddles (diagonal corners high): 9 = v00+v11, 6 = v10+v01;
    # disambiguate by the center mean (reference default)
    center_high = (v00 + v10 + v01 + v11) / 4.0 >= level
    if idx == 9:  # v00, v11 high
        return [(top, right), (bottom, left)] if center_high \
            else [(left, top), (bottom, right)]
    # idx == 6: v10, v01 high
    return [(left, top), (bottom, right)] if center_high \
        else [(top, right), (bottom, left)]


def contour_segments_np(canvas: np.ndarray, levels: list[float],
                        x0: int = 0, y0: int = 0) -> list[tuple]:
    """All segments of a canvas; endpoints in global pixel-center
    coords (square corner (i,j) is pixel center (x0+j+0.5, y0+i+0.5))."""
    h, w = canvas.shape
    out = []
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
                s = int(ge[i, j]) + int(ge[i, j + 1]) + int(ge[i + 1, j]) \
                    + int(ge[i + 1, j + 1])
                if s in (0, 4):
                    continue
                segs = _square_segments(canvas[i, j], canvas[i, j + 1],
                                        canvas[i + 1, j], canvas[i + 1, j + 1],
                                        level)
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


def contour(tiles: DataFrame, spec: G.GridSpec,
            levels: list[float]) -> DataFrame:
    """Distributed contour -> segment DataFrame (level, x1, y1, x2, y2)
    in global pixel-center coordinates.

    Each task owns the squares whose TOP-LEFT corner pixel lies in its
    tile; the right/bottom halo supplies the neighbor corners, so no
    square is emitted twice and boundary squares are exact."""
    from .focal import focal  # noqa: F401  (shared fan-out pattern below)

    t = spec.tile
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    off_df = tiles.sparkSession.createDataFrame(offsets, "dy int, dx int")
    fan = (tiles.crossJoin(F.broadcast(off_df))
           .withColumn("t_ty", F.col("tile_y") + F.col("dy"))
           .withColumn("t_tx", F.col("tile_x") + F.col("dx"))
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
                                   x0=tx * t, y0=ty * t)
        return pd.DataFrame(segs, columns=[f.name for f in SEG_SCHEMA]) \
            if segs else pd.DataFrame(
                {f.name: pd.Series(dtype="float64") for f in SEG_SCHEMA})

    return fan.groupBy("t_ty", "t_tx").applyInPandas(run, SEG_SCHEMA)
