"""Viewshed: per-pixel visibility from one observer over a DEM.

Reference: alg/viewshed/viewshed.cpp:124 (Wang, Robinson, White 2000
— ring-expanding auxiliary surface). That algorithm is a sequential
wavefront; our distributed restatement uses the equivalent DIRECT
line-of-sight definition, which is embarrassingly parallel per target
pixel:

    target T is visible from observer O iff for every intermediate
    sample along the ray O->T (one per integer step of the dominant
    axis), the bilinear-interpolated terrain elevation lies on or
    below the chord from (O, z_obs) to (T, z_target).

This is the classic sampled-ray LOS criterion; it matches the
reference's results on generic terrain (both compare interpolated
intermediate elevations against the line of sight) and is exactly
reproducible: the distributed path and the single-node oracle share
`_visible_mask`, so they are bit-identical by construction.

Physical plan: each TARGET tile is one task; the source tiles it needs
are those crossed by any ray from the observer into the tile — the
convex hull of {observer} ∪ tile, enumerated per intervening tile row
(a thin triangle, not the bounding rectangle). The dep relation is
built by a vectorized mapInPandas over a spark.range key grid and
exploded JVM-side — the same driver-free shape as warp's. Work per
tile scales with ray length; absent tiles read elevation 0 (sparse
raster convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G


def _bilinear(sample_of, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Bilinear terrain elevation at fractional pixel-center coords
    (gx, gy are positions in center space: pixel (i,j) center sits at
    (j + 0.5, i + 0.5)). `sample_of(ix, iy)` returns the DEM value of
    integer pixels (vectorized), 0 outside coverage."""
    fx = gx - 0.5
    fy = gy - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    v00 = sample_of(x0, y0)
    v01 = sample_of(x0 + 1, y0)
    v10 = sample_of(x0, y0 + 1)
    v11 = sample_of(x0 + 1, y0 + 1)
    return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty + v11 * tx * ty)


def _visible_mask(sample_of, px: np.ndarray, py: np.ndarray,
                  pz: np.ndarray, ox: int, oy: int, oz: float,
                  max_distance: float = np.inf,
                  out_of_range: float = 0.0) -> np.ndarray:
    """Visibility of target pixels (px, py integer indices; pz their
    DEM values) from observer pixel (ox, oy) at elevation oz.
    Returns 1.0 visible / 0.0 hidden / `out_of_range` beyond
    max_distance. Shared by the distributed path and the oracle."""
    dx = px - ox
    dy = py - oy
    dist = np.hypot(dx, dy)
    n = np.maximum(np.abs(dx), np.abs(dy)).astype(np.int64)
    out = np.ones(px.shape, dtype=np.float64)
    in_range = dist <= max_distance
    visible = np.ones(px.shape, dtype=bool)
    kmax = int(n.max()) if len(n) else 0
    # center coords of observer / targets
    ocx, ocy = ox + 0.5, oy + 0.5
    tcx, tcy = px + 0.5, py + 0.5
    for k in range(1, kmax):
        act = (n > k) & visible & in_range
        if not act.any():
            continue
        t = k / n[act]
        sx = ocx + (tcx[act] - ocx) * t
        sy = ocy + (tcy[act] - ocy) * t
        terrain = _bilinear(sample_of, sx, sy)
        chord = oz + (pz[act] - oz) * t
        ok = terrain <= chord
        idx = np.nonzero(act)[0]
        visible[idx[~ok]] = False
    out[~visible] = 0.0
    out[(px == ox) & (py == oy)] = 1.0  # the observer's own pixel
    out[~in_range] = out_of_range
    return out


def viewshed_np(canvas: np.ndarray, ox: int, oy: int,
                obs_height: float = 2.0,
                max_distance: float = np.inf,
                out_of_range: float = 0.0) -> np.ndarray:
    """Single-node oracle over a full canvas."""
    h, w = canvas.shape

    def sample_of(ix, iy):
        ixc = np.clip(ix, 0, w - 1)
        iyc = np.clip(iy, 0, h - 1)
        v = canvas[iyc, ixc]
        return np.where((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h), v, 0.0)

    gy, gx = np.mgrid[0:h, 0:w]
    oz = float(canvas[oy, ox]) + obs_height
    vis = _visible_mask(sample_of, gx.ravel(), gy.ravel(),
                        canvas.ravel().astype(np.float64),
                        ox, oy, oz, max_distance, out_of_range)
    return vis.reshape(h, w)


def _hull_dep_ranges(spark, spec: G.GridSpec, ox: int, oy: int) -> DataFrame:
    """(d_ty, d_tx, tile_y, tile_x): source tiles crossed by rays from
    the observer into each target tile — per target tile, the convex
    hull of {observer} ∪ tile square scanned per tile row (thin
    triangle, not the bounding rectangle). Vectorized over key batches;
    exploded JVM-side."""
    t = spec.tile
    schema = T.StructType([
        T.StructField("d_ty", T.IntegerType(), False),
        T.StructField("d_tx", T.IntegerType(), False),
        T.StructField("tile_y", T.IntegerType(), False),
        T.StructField("sx0", T.IntegerType(), False),
        T.StructField("sx1", T.IntegerType(), False),
    ])
    ocx, ocy = ox + 0.5, oy + 0.5
    # Bilinear support margin: a ray sample at center-coord s reads
    # integer pixels floor(s-0.5) and floor(s-0.5)+1, i.e. pixels up to
    # 1.5 below / 0.5 above the sample coordinate. Dilating the exact
    # ray envelope by MARGIN pixels on every side (band y-range, the
    # per-band clip window, and the band x extremes) makes the gathered
    # source set a superset of every pixel `_bilinear` can touch —
    # without it a support pixel one row/col outside the hull reads as
    # 0 and visibility flips vs the single-node oracle.
    MARGIN = 2.0

    def run(batches):
        for pdf in batches:
            rows = []
            for d_ty, d_tx in zip(pdf["d_ty"], pdf["d_tx"]):
                d_ty, d_tx = int(d_ty), int(d_tx)
                h, w = spec.tile_shape(d_ty, d_tx)
                ys = [ocy, d_ty * t, d_ty * t + h]
                ty_lo = int((min(ys) - MARGIN) // t)
                ty_hi = int((max(ys) + MARGIN - 1e-9) // t)
                # hull = segments observer -> each tile corner; per
                # tile-row band take the x extreme of every segment
                # clipped to the band widened by the support margin
                corners = [(d_tx * t, d_ty * t), (d_tx * t + w, d_ty * t),
                           (d_tx * t, d_ty * t + h),
                           (d_tx * t + w, d_ty * t + h)]
                for ry in range(max(0, ty_lo), min(spec.tiles_y - 1, ty_hi) + 1):
                    ylo, yhi = ry * t - MARGIN, (ry + 1) * t + MARGIN
                    band_x = []
                    for cx, cy in corners:
                        # clip segment (ocx,ocy)-(cx,cy) to [ylo, yhi]
                        if max(ocy, cy) < ylo or min(ocy, cy) > yhi:
                            continue
                        if cy == ocy:
                            band_x += [ocx, cx]
                            continue
                        for yb in (max(ylo, min(ocy, cy)),
                                   min(yhi, max(ocy, cy))):
                            s = (yb - ocy) / (cy - ocy)
                            band_x.append(ocx + (cx - ocx) * s)
                    if not band_x:
                        continue
                    sx0 = int(np.clip((min(band_x) - MARGIN) // t, 0,
                                      spec.tiles_x - 1))
                    sx1 = int(np.clip((max(band_x) + MARGIN - 1e-9) // t, 0,
                                      spec.tiles_x - 1))
                    rows.append((d_ty, d_tx, ry, sx0, sx1))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema])

    keys = (spark.range(spec.tiles_y * spec.tiles_x)
            .select(F.expr(f"CAST(id DIV {spec.tiles_x} AS INT)").alias("d_ty"),
                    F.pmod(F.col("id"), F.lit(spec.tiles_x))
                    .cast("int").alias("d_tx")))
    return (keys.mapInPandas(run, schema)
            .withColumn("tile_x", F.explode(F.sequence("sx0", "sx1")))
            .select("d_ty", "d_tx", "tile_y", "tile_x"))


def viewshed(tiles: DataFrame, spec: G.GridSpec, ox: int, oy: int,
             obs_height: float = 2.0, max_distance: float = np.inf,
             out_of_range: float = 0.0) -> DataFrame:
    """Distributed viewshed -> visibility tiles over the full grid.

    The observer's own elevation reads from the tile containing it
    (one tiny lookup job), then every target tile gathers its hull's
    source tiles and runs the shared `_visible_mask` kernel."""
    spark = tiles.sparkSession
    t = spec.tile
    o_ty, o_tx = oy // t, ox // t
    orow = (tiles.filter((F.col("tile_y") == o_ty)
                         & (F.col("tile_x") == o_tx))
            .select("px").collect())
    if orow:
        h0, w0 = spec.tile_shape(o_ty, o_tx)
        oz = float(np.asarray(orow[0]["px"]).reshape(h0, w0)[
            oy - o_ty * t, ox - o_tx * t]) + obs_height
    else:
        oz = obs_height  # observer over an absent (zero) tile

    dep = _hull_dep_ranges(spark, spec, ox, oy)
    gathered = dep.join(tiles, ["tile_y", "tile_x"], "inner")
    # tiles with no present source tile in their hull still emit
    # (all-zero terrain -> fully visible or out-of-range): marker rows
    keys = (spark.range(spec.tiles_y * spec.tiles_x)
            .select(F.expr(f"CAST(id DIV {spec.tiles_x} AS INT)").alias("d_ty"),
                    F.pmod(F.col("id"), F.lit(spec.tiles_x))
                    .cast("int").alias("d_tx"),
                    F.lit(None).cast("int").alias("tile_y"),
                    F.lit(None).cast("int").alias("tile_x"),
                    F.lit(None).cast("array<double>").alias("px")))
    allrows = gathered.select("d_ty", "d_tx", "tile_y", "tile_x", "px") \
        .unionByName(keys)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        d_ty, d_tx = int(key[0]), int(key[1])
        local: dict[tuple[int, int], np.ndarray] = {}
        for _, r in pdf.dropna(subset=["tile_y"]).iterrows():
            sty, stx = int(r["tile_y"]), int(r["tile_x"])
            sh, sw = spec.tile_shape(sty, stx)
            local[(sty, stx)] = np.asarray(r["px"], np.float64).reshape(sh, sw)

        def sample_of(ix, iy):
            out = np.zeros(ix.shape, dtype=np.float64)
            inb = ((ix >= 0) & (ix < spec.width)
                   & (iy >= 0) & (iy < spec.height))
            tyq = np.where(inb, iy // t, 0)
            txq = np.where(inb, ix // t, 0)
            for (sty, stx), arr in local.items():
                m = inb & (tyq == sty) & (txq == stx)
                if m.any():
                    out[m] = arr[iy[m] - sty * t, ix[m] - stx * t]
            return out

        h, w = spec.tile_shape(d_ty, d_tx)
        gy, gx = np.mgrid[0:h, 0:w]
        px = (gx + d_tx * t).ravel()
        py = (gy + d_ty * t).ravel()
        own = local.get((d_ty, d_tx))
        pz = (own.ravel().astype(np.float64) if own is not None
              else np.zeros(h * w))
        vis = _visible_mask(sample_of, px, py, pz, ox, oy, oz,
                            max_distance, out_of_range)
        return pd.DataFrame({"tile_y": [d_ty], "tile_x": [d_tx],
                             "px": [vis.tolist()]})

    return allrows.groupBy("d_ty", "d_tx").applyInPandas(run, G.TILE_SCHEMA)
