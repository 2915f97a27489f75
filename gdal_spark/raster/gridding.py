"""Grid interpolation: scattered points -> raster via IDW.

Reference: alg/gdalgrid.cpp — `GDALGridInverseDistanceToAPower` (:124)
and the nearest-neighbour-bounded variant (:242): for each output grid
node, value = sum(v_i / d_i^p) / sum(1 / d_i^p) over points within
`radius`; nodes with no point in radius get `nodata`; a point exactly
on the node short-circuits to its value.

Two physical strategies, same numerics:

  scatter path (default for finite radius) — each point is exploded to
      the tile keys whose nodes it can influence (pure column math:
      radius in pixels -> a sequence() of tile indices per axis), both
      sides hash-partition by tile key, and each tile computes its
      nodes from ONLY its gathered candidates. This is the distributed
      restatement of gdalgrid.cpp:242's quadtree radius probe: the
      per-point fan-out is bounded by (radius/tile_size + 1)^2, so the
      job scales linearly with points — no driver collect, no
      broadcast cap. Tiles outside every point's radius still emit
      (nodata surface) via a JVM-generated key grid.

  broadcast path (radius = inf, or forced) — with an unbounded radius
      every point influences every node (inherently all-to-all, which
      is why the reference's scalable variant is the radius-bounded
      one), so the point set is collected and broadcast, guarded by
      MAX_BROADCAST_POINTS.

Determinism across paths: float IDW sums are order-sensitive, so both
paths process points in (x, y, v)-lexsorted order — the scatter
gather's shuffle order and the driver collect order both normalize to
the same sequence, making the two paths (and the single-node oracle on
sorted points) bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import grid as G

MAX_BROADCAST_POINTS = 2_000_000


def sort_points(px: np.ndarray, py: np.ndarray, pv: np.ndarray):
    """Normalize point order (lexsort by x, then y, then v) so every
    execution strategy sums the same float sequence."""
    idx = np.lexsort((pv, py, px))
    return px[idx], py[idx], pv[idx]


def idw_np(px_nodes_x: np.ndarray, px_nodes_y: np.ndarray,
           pts_x: np.ndarray, pts_y: np.ndarray, pts_v: np.ndarray,
           power: float = 2.0, radius: float = np.inf,
           nodata: float = 0.0) -> np.ndarray:
    """IDW at arbitrary nodes (world coords). Vectorized (nodes x pts).
    Callers comparing across strategies must pass sorted points
    (sort_points) — this kernel sums in the order given."""
    out = np.full(px_nodes_x.shape, nodata, dtype=np.float64)
    if len(pts_x) == 0:
        return out
    step = max(1, int(4_000_000 // max(len(pts_x), 1)))
    for i in range(0, len(px_nodes_x), step):
        dx = px_nodes_x[i:i + step, None] - pts_x[None, :]
        dy = px_nodes_y[i:i + step, None] - pts_y[None, :]
        d2 = dx * dx + dy * dy
        within = d2 <= radius * radius
        exact = d2 == 0.0
        with np.errstate(divide="ignore"):
            w = np.where(within, 1.0 / np.power(d2, power / 2.0), 0.0)
        wsum = w.sum(axis=1)
        vsum = (w * pts_v[None, :]).sum(axis=1)
        chunk = np.where(wsum > 0, vsum / np.where(wsum > 0, wsum, 1.0), nodata)
        # on-node points short-circuit (gdalgrid.cpp exact-hit rule)
        hit = exact.any(axis=1)
        if hit.any():
            first = exact.argmax(axis=1)
            chunk[hit] = pts_v[first[hit]]
        out[i:i + step] = chunk
    return out


def _tile_span_np(p: np.ndarray, r: float, t: int, n_tiles: int):
    """numpy mirror of the scatter path's per-axis tile-span column
    math (same expression tree, so same IEEE results): node j has
    center j + 0.5; a point at fractional pixel coord p influences
    nodes |j + 0.5 - p| <= r -> tiles floor(j/t) over that j range."""
    jlo = np.ceil(p - (0.5 + r))
    jhi = np.floor((p - 0.5) + r)
    tlo = np.maximum(np.floor(jlo / t), 0)
    thi = np.minimum(np.floor(jhi / t), n_tiles - 1)
    return tlo, thi


def _key_grid(spark, spec: G.GridSpec) -> DataFrame:
    """All (tile_y, tile_x) keys, generated JVM-side (no O(#tiles)
    driver list — a z15 grid has 10^9 tiles)."""
    return (spark.range(spec.tiles_y * spec.tiles_x)
            .select(F.expr(f"CAST(id DIV {spec.tiles_x} AS INT)").alias("tile_y"),
                    F.pmod(F.col("id"), F.lit(spec.tiles_x))
                    .cast("int").alias("tile_x")))


def _tile_nodes(spec: G.GridSpec, ty: int, tx: int):
    """World coords of a tile's pixel-center nodes (row-major)."""
    t = spec.tile
    h, w = spec.tile_shape(ty, tx)
    gx, gy = np.meshgrid(np.arange(tx * t, tx * t + w, dtype=np.float64),
                         np.arange(ty * t, ty * t + h, dtype=np.float64))
    return spec.pixel_center_world(gx.ravel(), gy.ravel())


def grid_idw(points: DataFrame, spec: G.GridSpec,
             value_col: str = "v", x_col: str = "x", y_col: str = "y",
             power: float = 2.0, radius: float = np.inf,
             nodata: float = 0.0,
             force_broadcast: bool = False) -> DataFrame:
    """-> dense tile DataFrame over the WHOLE grid (every tile emitted:
    gridding produces a full surface, unlike the sparse density path).

    Finite radius -> scatter path (scales with points, no collect);
    radius = inf -> broadcast path (guarded; unbounded-radius IDW is
    inherently all-to-all).
    """
    if force_broadcast or np.isinf(radius):
        return _grid_idw_broadcast(points, spec, value_col, x_col, y_col,
                                   power, radius, nodata)
    return _grid_idw_scatter(points, spec, value_col, x_col, y_col,
                             power, radius, nodata)


def _grid_idw_broadcast(points, spec, value_col, x_col, y_col,
                        power, radius, nodata) -> DataFrame:
    rows = points.select(x_col, y_col, value_col).collect()
    if len(rows) > MAX_BROADCAST_POINTS:
        raise ValueError("point set exceeds broadcast budget; pass a "
                         "finite radius to take the scatter path")
    px = np.array([r[x_col] for r in rows], np.float64)
    py = np.array([r[y_col] for r in rows], np.float64)
    pv = np.array([r[value_col] for r in rows], np.float64)
    px, py, pv = sort_points(px, py, pv)
    b = points.sparkSession.sparkContext.broadcast((px, py, pv))
    gt, t = spec.gt, spec.tile

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by, bv = b.value
        ty, tx = int(key[0]), int(key[1])
        if np.isfinite(radius) and len(bx):
            # restrict to the SAME per-tile candidate set the scatter
            # path gathers: zero-weight points don't change the math,
            # but they do change numpy's pairwise-summation tree, and
            # the two strategies must stay bit-identical
            ppx = (bx - gt[0]) / gt[1]
            ppy = (by - gt[3]) / gt[5]
            txlo, txhi = _tile_span_np(ppx, abs(radius / gt[1]), t, spec.tiles_x)
            tylo, tyhi = _tile_span_np(ppy, abs(radius / gt[5]), t, spec.tiles_y)
            keep = (txlo <= tx) & (tx <= txhi) & (tylo <= ty) & (ty <= tyhi)
            cx, cy, cv = bx[keep], by[keep], bv[keep]
        else:
            cx, cy, cv = bx, by, bv
        wx, wy = _tile_nodes(spec, ty, tx)
        out = idw_np(wx, wy, cx, cy, cv, power, radius, nodata)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    kdf = _key_grid(points.sparkSession, spec)
    return kdf.groupBy("tile_y", "tile_x").applyInPandas(run, G.TILE_SCHEMA)


def nearest_np(nodes_x: np.ndarray, nodes_y: np.ndarray,
               pts_x: np.ndarray, pts_y: np.ndarray, pts_v: np.ndarray,
               radius: float, nodata: float = 0.0) -> np.ndarray:
    """GDALGridNearestNeighbor (alg/gdalgrid.cpp): each node takes the
    value of its nearest point within `radius`; ties on distance break
    to the SMALLEST value (deterministic, relationally expressible).
    Pure value selection — no float accumulation — so a SQL oracle
    reproduces it bit-for-bit."""
    out = np.full(nodes_x.shape, nodata, dtype=np.float64)
    if len(pts_x) == 0:
        return out
    r2 = radius * radius
    step = max(1, int(4_000_000 // max(len(pts_x), 1)))
    for i in range(0, len(nodes_x), step):
        dx = nodes_x[i:i + step, None] - pts_x[None, :]
        dy = nodes_y[i:i + step, None] - pts_y[None, :]
        d2 = dx * dx + dy * dy
        d2w = np.where(d2 <= r2, d2, np.inf)
        dmin = d2w.min(axis=1)
        has = np.isfinite(dmin)
        vm = np.where(d2w == dmin[:, None], pts_v[None, :], np.inf).min(axis=1)
        chunk = out[i:i + step]
        chunk[has] = vm[has]
        out[i:i + step] = chunk
    return out


def grid_nearest(points: DataFrame, spec: G.GridSpec,
                 value_col: str = "v", x_col: str = "x", y_col: str = "y",
                 radius: float = np.inf, nodata: float = 0.0,
                 force_broadcast: bool = False) -> DataFrame:
    """Nearest-neighbour gridding over the same scatter/broadcast
    physical strategies as grid_idw."""
    kern = lambda wx, wy, px, py, pv: nearest_np(  # noqa: E731
        wx, wy, px, py, pv, radius, nodata)
    if force_broadcast or np.isinf(radius):
        return _grid_broadcast(points, spec, value_col, x_col, y_col,
                               radius, nodata, kern)
    return _grid_scatter(points, spec, value_col, x_col, y_col,
                         radius, nodata, kern)


def _grid_broadcast(points, spec, value_col, x_col, y_col,
                    radius, nodata, kernel) -> DataFrame:
    rows = points.select(x_col, y_col, value_col).collect()
    if len(rows) > MAX_BROADCAST_POINTS:
        raise ValueError("point set exceeds broadcast budget; pass a "
                         "finite radius to take the scatter path")
    px = np.array([r[x_col] for r in rows], np.float64)
    py = np.array([r[y_col] for r in rows], np.float64)
    pv = np.array([r[value_col] for r in rows], np.float64)
    px, py, pv = sort_points(px, py, pv)
    b = points.sparkSession.sparkContext.broadcast((px, py, pv))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by, bv = b.value
        ty, tx = int(key[0]), int(key[1])
        wx, wy = _tile_nodes(spec, ty, tx)
        out = kernel(wx, wy, bx, by, bv)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    kdf = _key_grid(points.sparkSession, spec)
    return kdf.groupBy("tile_y", "tile_x").applyInPandas(run, G.TILE_SCHEMA)


def _grid_scatter(points, spec, value_col, x_col, y_col,
                  radius, nodata, kernel) -> DataFrame:
    """Generic scatter-gather gridding (see _grid_idw_scatter for the
    plan shape; `kernel` computes the per-tile node values)."""
    spark = points.sparkSession
    t = spec.tile
    gt = spec.gt
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise NotImplementedError("rotated geotransforms out of scope v1")
    ppx = (F.col(x_col) - F.lit(gt[0])) / F.lit(gt[1])
    ppy = (F.col(y_col) - F.lit(gt[3])) / F.lit(gt[5])
    rx = abs(radius / gt[1])
    ry = abs(radius / gt[5])

    def tile_span(p, r, n_tiles):
        jlo = F.ceil(p - F.lit(0.5 + r)).cast("long")
        jhi = F.floor(p - F.lit(0.5) + F.lit(r)).cast("long")
        tlo = F.greatest(F.floor(jlo / t).cast("int"), F.lit(0))
        thi = F.least(F.floor(jhi / t).cast("int"), F.lit(n_tiles - 1))
        return tlo, thi

    txlo, txhi = tile_span(ppx, rx, spec.tiles_x)
    tylo, tyhi = tile_span(ppy, ry, spec.tiles_y)
    scattered = (points.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(value_col).alias("v"),
        txlo.alias("txlo"), txhi.alias("txhi"),
        tylo.alias("tylo"), tyhi.alias("tyhi"))
        .filter((F.col("txlo") <= F.col("txhi"))
                & (F.col("tylo") <= F.col("tyhi")))
        .withColumn("tile_y", F.explode(F.sequence("tylo", "tyhi")))
        .withColumn("tile_x", F.explode(F.sequence("txlo", "txhi")))
        .select("tile_y", "tile_x", "x", "y", "v"))
    empties = (_key_grid(spark, spec)
               .withColumn("x", F.lit(None).cast("double"))
               .withColumn("y", F.lit(None).cast("double"))
               .withColumn("v", F.lit(None).cast("double")))
    allrows = scattered.unionByName(empties)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        cand = pdf.dropna(subset=["x"])
        px = cand["x"].to_numpy(np.float64)
        py = cand["y"].to_numpy(np.float64)
        pv = cand["v"].to_numpy(np.float64)
        px, py, pv = sort_points(px, py, pv)
        wx, wy = _tile_nodes(spec, ty, tx)
        out = kernel(wx, wy, px, py, pv)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    return allrows.groupBy("tile_y", "tile_x").applyInPandas(run, G.TILE_SCHEMA)


def _grid_idw_scatter(points, spec, value_col, x_col, y_col,
                      power, radius, nodata) -> DataFrame:
    """Explode each point to its influenced tile keys (column math),
    hash-partition by key, per-tile vectorized IDW over ONLY the
    gathered candidates. Candidates form a per-axis superset of the
    radius disc; out-of-radius candidates get exactly zero weight in
    idw_np, so values are identical to the broadcast path."""
    spark = points.sparkSession
    t = spec.tile
    gt = spec.gt
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise NotImplementedError("rotated geotransforms out of scope v1")
    # fractional pixel coords of the point; node j has center j + 0.5
    ppx = (F.col(x_col) - F.lit(gt[0])) / F.lit(gt[1])
    ppy = (F.col(y_col) - F.lit(gt[3])) / F.lit(gt[5])
    rx = abs(radius / gt[1])
    ry = abs(radius / gt[5])

    def tile_span(p, r, n_tiles):
        jlo = F.ceil(p - F.lit(0.5 + r)).cast("long")
        jhi = F.floor(p - F.lit(0.5) + F.lit(r)).cast("long")
        tlo = F.greatest(F.floor(jlo / t).cast("int"), F.lit(0))
        thi = F.least(F.floor(jhi / t).cast("int"), F.lit(n_tiles - 1))
        return tlo, thi

    txlo, txhi = tile_span(ppx, rx, spec.tiles_x)
    tylo, tyhi = tile_span(ppy, ry, spec.tiles_y)
    scattered = (points.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        F.col(value_col).alias("v"),
        txlo.alias("txlo"), txhi.alias("txhi"),
        tylo.alias("tylo"), tyhi.alias("tyhi"))
        .filter((F.col("txlo") <= F.col("txhi"))
                & (F.col("tylo") <= F.col("tyhi")))
        .withColumn("tile_y", F.explode(F.sequence("tylo", "tyhi")))
        .withColumn("tile_x", F.explode(F.sequence("txlo", "txhi")))
        .select("tile_y", "tile_x", "x", "y", "v"))

    # tiles with no candidate still emit (nodata surface): a marker row
    # per key, dropped inside the UDF
    empties = (_key_grid(spark, spec)
               .withColumn("x", F.lit(None).cast("double"))
               .withColumn("y", F.lit(None).cast("double"))
               .withColumn("v", F.lit(None).cast("double")))
    allrows = scattered.unionByName(empties)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        cand = pdf.dropna(subset=["x"])
        px = cand["x"].to_numpy(np.float64)
        py = cand["y"].to_numpy(np.float64)
        pv = cand["v"].to_numpy(np.float64)
        px, py, pv = sort_points(px, py, pv)
        wx, wy = _tile_nodes(spec, ty, tx)
        out = idw_np(wx, wy, px, py, pv, power, radius, nodata)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    return allrows.groupBy("tile_y", "tile_x").applyInPandas(run, G.TILE_SCHEMA)


# --------------------------------------------------------------------
# Data metrics / moving average / invdistnn (alg/gdalgrid.cpp:1024+,
# :589, :242, :351). Same two physical strategies as IDW/nearest: the
# kernels plug into _grid_scatter / _grid_broadcast, whose candidate
# gathering is a superset of the search ellipse (out-of-ellipse
# candidates contribute nothing), and whose sorted-candidate contract
# ((x, y, v) lexsort) pins every order-sensitive float fold so the
# scatter path, the broadcast path, the single-node oracle and the
# DuckDB list_reduce oracle are all bit-identical.

DATA_METRICS = ("minimum", "maximum", "range", "count",
                "average_distance", "average_distance_pts")


def _ellipse_inside(dx: np.ndarray, dy: np.ndarray, radius1: float,
                    radius2: float, angle: float) -> np.ndarray:
    """GDAL search-ellipse membership (gdalgrid.cpp:644-694): rotate by
    `angle` degrees, then radius2^2*x^2 + radius1^2*y^2 <= r1^2*r2^2."""
    r1sq = radius1 * radius1
    r2sq = radius2 * radius2
    if angle != 0.0:
        a = np.radians(angle)
        c1, c2 = np.cos(a), np.sin(a)
        dx, dy = dx * c1 + dy * c2, dy * c1 - dx * c2
    return r2sq * (dx * dx) + r1sq * (dy * dy) <= r1sq * r2sq


def data_metric_np(nodes_x: np.ndarray, nodes_y: np.ndarray,
                   pts_x: np.ndarray, pts_y: np.ndarray,
                   pts_v: np.ndarray, metric: str,
                   radius1: float, radius2: float | None = None,
                   angle: float = 0.0, min_points: int = 0,
                   nodata: float = 0.0) -> np.ndarray:
    """GDALGridDataMetric{Minimum,Maximum,Range,Count,AverageDistance,
    AverageDistancePts} (alg/gdalgrid.cpp:1058+,1378+,1545+,1841+,
    2135+,2410+). average_distance_pts follows the reference's direct
    (non-quadtree) branch: unordered pairs i<j, never the self-pair the
    quadtree branch's `j = k` start admits. Float folds run in the
    given (sorted) point order, i-outer j-inner for pairs."""
    if metric not in DATA_METRICS:
        raise ValueError(f"unknown data metric {metric!r}")
    r2 = radius1 if radius2 is None else radius2
    out = np.full(nodes_x.shape, nodata, dtype=np.float64)
    if len(pts_x) == 0:
        return out
    step = max(1, int(4_000_000 // max(len(pts_x), 1)))
    for i in range(0, len(nodes_x), step):
        dx = pts_x[None, :] - nodes_x[i:i + step, None]
        dy = pts_y[None, :] - nodes_y[i:i + step, None]
        inside = _ellipse_inside(dx, dy, radius1, r2, angle)
        n = inside.sum(axis=1)
        ok = n >= max(min_points, 1)
        if metric == "minimum":
            vals = np.where(inside, pts_v[None, :], np.inf).min(axis=1)
        elif metric == "maximum":
            vals = np.where(inside, pts_v[None, :], -np.inf).max(axis=1)
        elif metric == "range":
            vals = (np.where(inside, pts_v[None, :], -np.inf).max(axis=1)
                    - np.where(inside, pts_v[None, :], np.inf).min(axis=1))
        elif metric == "count":
            vals = n.astype(np.float64)
        elif metric == "average_distance":
            dist = np.sqrt(dx * dx + dy * dy)
            acc = np.zeros(len(n), np.float64)
            for k in range(len(pts_x)):  # sequential fold, sorted order
                acc = acc + np.where(inside[:, k], dist[:, k], 0.0)
            vals = np.where(n > 0, acc / np.maximum(n, 1), nodata)
        else:  # average_distance_pts
            vals = np.empty(len(n), np.float64)
            npairs = np.zeros(len(n), np.int64)
            for r in range(len(n)):
                idx = np.nonzero(inside[r])[0]
                acc = 0.0
                cnt = 0
                for a in range(len(idx) - 1):
                    ia = idx[a]
                    ddx = pts_x[idx[a + 1:]] - pts_x[ia]
                    ddy = pts_y[idx[a + 1:]] - pts_y[ia]
                    for d in np.sqrt(ddx * ddx + ddy * ddy):
                        acc += float(d)
                        cnt += 1
                vals[r] = acc / cnt if cnt else nodata
                npairs[r] = cnt
            ok = npairs >= max(min_points, 1)
        out[i:i + step] = np.where(ok, vals, nodata)
    return out


def moving_average_np(nodes_x: np.ndarray, nodes_y: np.ndarray,
                      pts_x: np.ndarray, pts_y: np.ndarray,
                      pts_v: np.ndarray, radius1: float,
                      radius2: float | None = None, angle: float = 0.0,
                      min_points: int = 0,
                      nodata: float = 0.0) -> np.ndarray:
    """GDALGridMovingAverage (alg/gdalgrid.cpp:630): mean of values in
    the search ellipse; < min_points (or 0) -> nodata. The fold runs
    sequentially in sorted point order (matching the reference's
    sequential accumulator on its scan order, pinned here)."""
    r2 = radius1 if radius2 is None else radius2
    out = np.full(nodes_x.shape, nodata, dtype=np.float64)
    if len(pts_x) == 0:
        return out
    step = max(1, int(4_000_000 // max(len(pts_x), 1)))
    for i in range(0, len(nodes_x), step):
        dx = pts_x[None, :] - nodes_x[i:i + step, None]
        dy = pts_y[None, :] - nodes_y[i:i + step, None]
        inside = _ellipse_inside(dx, dy, radius1, r2, angle)
        n = inside.sum(axis=1)
        acc = np.zeros(len(n), np.float64)
        for k in range(len(pts_x)):
            acc = acc + np.where(inside[:, k], pts_v[k], 0.0)
        ok = n >= max(min_points, 1)
        out[i:i + step] = np.where(ok, acc / np.maximum(n, 1), nodata)
    return out


def invdistnn_np(nodes_x: np.ndarray, nodes_y: np.ndarray,
                 pts_x: np.ndarray, pts_y: np.ndarray, pts_v: np.ndarray,
                 radius: float, power: float = 2.0, smoothing: float = 0.0,
                 max_points: int = 12, min_points: int = 0,
                 min_points_per_quadrant: int = 0,
                 max_points_per_quadrant: int = 0,
                 nodata: float = 0.0) -> np.ndarray:
    """GDALGridInverseDistanceToAPowerNearestNeighbor
    (alg/gdalgrid.cpp:242; per-quadrant :351): IDW over the nearest
    max_points within `radius`, ranked by smoothed distance (ties pin
    to the smaller value — the reference's multimap leaves equal keys
    in scan order, which its own quadtree makes nondeterministic).
    Quadrant mode consumes candidates round-robin across quadrants
    (:434-462) with per-quadrant caps/minima. power=2 avoids pow(), so
    every term is elementary IEEE arithmetic."""
    s2 = smoothing * smoothing
    rr = radius * radius
    out = np.full(nodes_x.shape, nodata, dtype=np.float64)
    if len(pts_x) == 0:
        return out
    quadrant_mode = min_points_per_quadrant > 0 or max_points_per_quadrant > 0
    step = max(1, int(2_000_000 // max(len(pts_x), 1)))
    for i in range(0, len(nodes_x), step):
        dx = pts_x[None, :] - nodes_x[i:i + step, None]
        dy = pts_y[None, :] - nodes_y[i:i + step, None]
        d2 = dx * dx + dy * dy
        rsm2 = d2 + s2
        elig = d2 <= rr
        for r in range(rsm2.shape[0]):
            idx = np.nonzero(elig[r])[0]
            if len(idx) == 0:
                continue
            key = rsm2[r, idx]
            hit = key < 1e-13  # exact-hit short-circuit (:289,:398)
            if hit.any():
                out[i + r] = pts_v[idx[np.argmax(hit)]]
                continue
            order = idx[np.lexsort((pts_v[idx], key))]
            if quadrant_mode:
                quad = ((dx[r, order] >= 0).astype(np.int64)
                        | ((dy[r, order] >= 0).astype(np.int64) << 1))
                per_q = [order[quad == q] for q in range(4)]
                picked, per_count = [], [0, 0, 0, 0]
                iters = [0, 0, 0, 0]
                finished = 0
                q = 0
                while finished != 15:
                    if iters[q] >= len(per_q[q]) or (
                            max_points_per_quadrant > 0
                            and per_count[q] >= max_points_per_quadrant):
                        finished |= 1 << q
                        q = (q + 1) % 4
                        continue
                    picked.append(per_q[q][iters[q]])
                    iters[q] += 1
                    per_count[q] += 1
                    if max_points > 0 and len(picked) >= max_points:
                        break
                    q = (q + 1) % 4
                if min_points_per_quadrant > 0 and \
                        min(per_count) < min_points_per_quadrant:
                    continue
                chosen = np.asarray(picked, np.int64)
            else:
                chosen = order[:max_points] if max_points > 0 else order
            if len(chosen) < min_points:
                continue
            num = 0.0
            den = 0.0
            for j in chosen:  # sequential fold in consumption order
                w = 1.0 / (rsm2[r, j] if power == 2.0
                           else np.power(rsm2[r, j], power / 2.0))
                num += w * pts_v[j]
                den += w
            out[i + r] = num / den if den != 0.0 else nodata
    return out


def grid_data_metric(points: DataFrame, spec: G.GridSpec, metric: str,
                     radius1: float, radius2: float | None = None,
                     angle: float = 0.0, min_points: int = 0,
                     value_col: str = "v", x_col: str = "x",
                     y_col: str = "y", nodata: float = 0.0,
                     force_broadcast: bool = False) -> DataFrame:
    """`gdal vector grid <metric>` analogs
    (apps/gdalalg_vector_grid_data_metrics.cpp)."""
    r2 = radius1 if radius2 is None else radius2
    search = max(abs(radius1), abs(r2))
    kern = lambda wx, wy, px, py, pv: data_metric_np(  # noqa: E731
        wx, wy, px, py, pv, metric, radius1, r2, angle, min_points, nodata)
    if force_broadcast or not np.isfinite(search):
        return _grid_broadcast(points, spec, value_col, x_col, y_col,
                               search, nodata, kern)
    return _grid_scatter(points, spec, value_col, x_col, y_col,
                         search, nodata, kern)


def grid_average(points: DataFrame, spec: G.GridSpec, radius1: float,
                 radius2: float | None = None, angle: float = 0.0,
                 min_points: int = 0, value_col: str = "v",
                 x_col: str = "x", y_col: str = "y", nodata: float = 0.0,
                 force_broadcast: bool = False) -> DataFrame:
    """`gdal vector grid average` (apps/gdalalg_vector_grid_average.cpp)."""
    r2 = radius1 if radius2 is None else radius2
    search = max(abs(radius1), abs(r2))
    kern = lambda wx, wy, px, py, pv: moving_average_np(  # noqa: E731
        wx, wy, px, py, pv, radius1, r2, angle, min_points, nodata)
    if force_broadcast or not np.isfinite(search):
        return _grid_broadcast(points, spec, value_col, x_col, y_col,
                               search, nodata, kern)
    return _grid_scatter(points, spec, value_col, x_col, y_col,
                         search, nodata, kern)


def grid_invdistnn(points: DataFrame, spec: G.GridSpec, radius: float,
                   power: float = 2.0, smoothing: float = 0.0,
                   max_points: int = 12, min_points: int = 0,
                   min_points_per_quadrant: int = 0,
                   max_points_per_quadrant: int = 0,
                   value_col: str = "v", x_col: str = "x",
                   y_col: str = "y", nodata: float = 0.0,
                   force_broadcast: bool = False) -> DataFrame:
    """`gdal vector grid invdistnn` (+ per-quadrant options of
    gdalalg_vector_grid.cpp). Radius is required and circular, per the
    reference options struct."""
    if not np.isfinite(radius):
        raise ValueError("invdistnn requires a finite radius "
                         "(GDALGridInverseDistanceToAPowerNearestNeighbor"
                         "Options.dfRadius)")
    kern = lambda wx, wy, px, py, pv: invdistnn_np(  # noqa: E731
        wx, wy, px, py, pv, radius, power, smoothing, max_points,
        min_points, min_points_per_quadrant, max_points_per_quadrant,
        nodata)
    if force_broadcast:
        return _grid_broadcast(points, spec, value_col, x_col, y_col,
                               radius, nodata, kern)
    return _grid_scatter(points, spec, value_col, x_col, y_col,
                         radius, nodata, kern)


MAX_TRIANGULATION_POINTS = 2_000_000


def grid_linear(points: DataFrame, spec: G.GridSpec,
                radius: float = -1.0, value_col: str = "v",
                x_col: str = "x", y_col: str = "y", nodata: float = 0.0,
                bary_eps: float = 0.0) -> DataFrame:
    """GDALGridLinear (alg/gdalgrid.cpp:2565, alg/delaunay.c;
    `gdal vector grid linear`, apps/gdalalg_vector_grid_linear.cpp):
    Delaunay-TIN barycentric interpolation; outside the hull, nearest
    point within `radius` (negative = unbounded, the CLI default) or
    nodata when radius == 0.

    Physical strategy: the triangulation is GLOBAL (each facet can
    join any two ends of the point cloud), so the scatter points are
    collected under MAX_TRIANGULATION_POINTS — the same documented
    driver budget palette/proximity use — triangulated once, and the
    (facets, coords, values) tuple is broadcast; node evaluation (the
    part proportional to raster size, hence to the 100 TB side) runs
    fully distributed, one task per tile. A 2M-vertex TIN is ~100 MB
    broadcast — the reference's own qhull stage is single-node too."""
    from ..geo import delaunay as DL

    rows = points.select(x_col, y_col, value_col) \
        .limit(MAX_TRIANGULATION_POINTS + 1).collect()
    if len(rows) > MAX_TRIANGULATION_POINTS:
        raise ValueError(
            f"point set exceeds the triangulation budget "
            f"({MAX_TRIANGULATION_POINTS}); thin the scatter first "
            f"(the reference's qhull stage has the same single-node "
            f"bound)")
    px = np.array([r[x_col] for r in rows], np.float64)
    py = np.array([r[y_col] for r in rows], np.float64)
    pv = np.array([r[value_col] for r in rows], np.float64)
    px, py, pv = sort_points(px, py, pv)
    tris = DL.delaunay_np(px, py)
    b = points.sparkSession.sparkContext.broadcast((px, py, pv, tris))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by, bv, btris = b.value
        ty, tx = int(key[0]), int(key[1])
        wx, wy = _tile_nodes(spec, ty, tx)
        out = DL.linear_np(wx, wy, bx, by, bv, btris, radius, nodata,
                           bary_eps)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    kdf = _key_grid(points.sparkSession, spec)
    return kdf.groupBy("tile_y", "tile_x").applyInPandas(run, G.TILE_SCHEMA)
