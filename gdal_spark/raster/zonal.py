"""Raster zonal statistics with FRACTIONAL pixel weighting.

Reference: alg/zonal.cpp:346 — the FRACTIONAL strategy weights each
pixel by the fraction of its square covered by the zone polygon
(versus the default center-in / ALL_TOUCHED binary strategies). Stats
per zone: weighted count (= covered area in pixel units), weighted
sum, weighted mean, min/max over touched pixels (zonal.cpp:661-695).

Distributed shape: zones are the broadcast dimension (a zone table is
small next to a 100 TB raster); each TILE task computes its pixels'
coverage fractions against every overlapping zone and emits one
PARTIAL row per (zone, tile) — map-side combine, so the shuffle is
|zones x touched tiles| rows, never pixels. The final groupBy(zone)
folds partials associatively (weighted sums add; min/max combine).

Coverage fraction of a pixel square against a CONVEX ring is computed
by Sutherland–Hodgman clipping (exact up to float rounding). Convex
zones only — decompose concave zones upstream (the admin fixtures are
convex; GDAL reaches the same numbers via per-scanline segment
clipping).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G


def _clip_area(px0: float, py0: float, px1: float, py1: float,
               ring: np.ndarray) -> float:
    """Area of pixel square [px0,px1]x[py0,py1] clipped to a convex
    CCW ring (Sutherland–Hodgman: clip the square by each ring
    half-plane)."""
    poly = [(px0, py0), (px1, py0), (px1, py1), (px0, py1)]
    for k in range(len(ring) - 1):
        ex, ey = ring[k]
        dx = ring[k + 1][0] - ex
        dy = ring[k + 1][1] - ey
        out = []
        n = len(poly)
        if n == 0:
            return 0.0
        for i in range(n):
            cx, cy = poly[i]
            nx, ny = poly[(i + 1) % n]
            sc = dx * (cy - ey) - dy * (cx - ex)
            sn = dx * (ny - ey) - dy * (nx - ex)
            if sc >= 0.0:
                out.append((cx, cy))
            if (sc >= 0.0) != (sn >= 0.0):
                t = sc / (sc - sn)
                out.append((cx + t * (nx - cx), cy + t * (ny - cy)))
        poly = out
    if len(poly) < 3:
        return 0.0
    a = 0.0
    for i in range(len(poly)):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % len(poly)]
        a += x0 * y1 - x1 * y0
    return abs(a) / 2.0


def _fractions_np(arr: np.ndarray, ox: float, oy: float,
                  resx: float, resy: float, ring: np.ndarray) -> np.ndarray:
    """Per-pixel coverage fraction of a convex CCW ring over a tile
    whose pixel (i, j) spans world x [ox + j*resx, ox + (j+1)*resx],
    y [oy + (i+1)*resy, oy + i*resy] (resy < 0 for north-up grids).

    Fast paths: pixels fully inside every half-plane get 1.0 without
    clipping; pixels whose square misses the ring bbox get 0.0; only
    the boundary shell pays for Sutherland–Hodgman."""
    h, w = arr.shape
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    x_lo = ox + jj * resx
    x_hi = x_lo + resx
    y_a = oy + ii * resy
    y_b = y_a + resy
    y_lo, y_hi = np.minimum(y_a, y_b), np.maximum(y_a, y_b)
    bx0, by0 = ring[:-1, 0].min(), ring[:-1, 1].min()
    bx1, by1 = ring[:-1, 0].max(), ring[:-1, 1].max()
    touch = ((x_hi > bx0) & (x_lo < bx1) & (y_hi > by0) & (y_lo < by1))
    inside = touch.copy()
    for k in range(len(ring) - 1):
        ex, ey = ring[k]
        dx = ring[k + 1][0] - ex
        dy = ring[k + 1][1] - ey
        # all four pixel corners weakly inside this half-plane
        for cx, cy in ((x_lo, y_lo), (x_hi, y_lo), (x_lo, y_hi),
                       (x_hi, y_hi)):
            inside &= (dx * (cy - ey) - dy * (cx - ex)) >= 0.0
    frac = np.zeros((h, w))
    frac[inside] = 1.0
    shell = touch & ~inside
    area_px = abs(resx * resy)
    for i, j in zip(*np.nonzero(shell)):
        a = _clip_area(x_lo[i, j], y_lo[i, j], x_hi[i, j], y_hi[i, j], ring)
        frac[i, j] = a / area_px
    return frac


_PARTIAL = T.StructType([
    T.StructField("poly_id", T.IntegerType(), False),
    T.StructField("w_count", T.DoubleType(), False),
    T.StructField("w_sum", T.DoubleType(), False),
    T.StructField("vmin", T.DoubleType(), True),
    T.StructField("vmax", T.DoubleType(), True),
])


def zonal_stats_fractional(tiles: DataFrame, spec: G.GridSpec,
                           zones: list[tuple[int, np.ndarray]]) -> DataFrame:
    """-> (poly_id, w_count, w_sum, w_mean, vmin, vmax): FRACTIONAL
    zonal stats of the tile raster against convex CCW world-coordinate
    rings [(poly_id, ring), ...] (broadcast with the task closure)."""
    gt = spec.gt
    tile = spec.tile

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ty, tx = int(r["tile_y"]), int(r["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(r["px"], np.float64).reshape(h, w)
                ox = gt[0] + tx * tile * gt[1]
                oy = gt[3] + ty * tile * gt[5]
                for pid, ring in zones:
                    frac = _fractions_np(arr, ox, oy, gt[1], gt[5], ring)
                    m = frac > 0.0
                    if not m.any():
                        continue
                    rows.append((pid, float(frac.sum()),
                                 float((frac * arr).sum()),
                                 float(arr[m].min()), float(arr[m].max())))
            yield pd.DataFrame(rows, columns=[f.name for f in _PARTIAL])

    partials = tiles.mapInPandas(run, _PARTIAL)
    return (partials.groupBy("poly_id")
            .agg(F.sum("w_count").alias("w_count"),
                 F.sum("w_sum").alias("w_sum"),
                 F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"))
            .withColumn("w_mean", F.col("w_sum") / F.col("w_count"))
            .select("poly_id", "w_count", "w_sum", "w_mean", "vmin", "vmax"))


def zonal_fractional_np(canvas: np.ndarray, spec: G.GridSpec,
                        zones: list[tuple[int, np.ndarray]]) -> dict:
    """Single-node oracle over a full canvas (same clip kernel)."""
    out = {}
    for pid, ring in zones:
        frac = _fractions_np(canvas, spec.gt[0], spec.gt[3],
                             spec.gt[1], spec.gt[5], ring)
        m = frac > 0.0
        if not m.any():
            continue
        wc = float(frac.sum())
        ws = float((frac * canvas).sum())
        out[pid] = {"w_count": wc, "w_sum": ws, "w_mean": ws / wc,
                    "vmin": float(canvas[m].min()),
                    "vmax": float(canvas[m].max())}
    return out
