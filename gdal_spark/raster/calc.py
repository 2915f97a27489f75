"""Per-pixel raster operators: band calc, reclassify, mosaic,
interpolate-at-point.

Reference semantics:
 - calc       — apps/gdalalg_raster_calc.cpp + VRT pixel functions
                (frmts/vrt/pixelfunctions.cpp:4322-4441: sum, mul,
                sqrt, log10, pow, min, max, mean, expression ...):
                elementwise expressions over aligned bands.
 - reclassify — apps/gdalalg_raster_reclassify.cpp /
                frmts/vrt/vrtreclassifier.cpp: value/range remap.
 - mosaic     — apps/gdalalg_raster_mosaic.cpp (+ gdalbuildvrt_lib):
                combine overlapping rasters; first / sum / max / mean.
 - interpolate-at-point — alg/gdal_interpolateatpoint.cpp:165
                (bilinear kernel :273): sample a raster at arbitrary
                world points.

Spark-first shape: calc/reclassify are pure elementwise `F.transform`
over the tile's pixel array — JVM higher-order functions, zero
Python. Mosaic is a groupBy(tile) merge of the union. Interpolate is
a join of points to their containing tile then a numpy kernel per
tile — the same gather pattern warp uses.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import grid as G


def calc(tiles: DataFrame, fn: Callable[[Column], Column]) -> DataFrame:
    """Elementwise band calc: `fn` maps one pixel Column expression to
    another (e.g. lambda v: F.sqrt(v) * 2). Runs as F.transform —
    whole-stage codegen over the array."""
    return tiles.withColumn("px", F.transform(F.col("px"), fn))


def reclassify(tiles: DataFrame, bounds: list[float],
               values: list[float], default: float = 0.0) -> DataFrame:
    """Range remap: pixel in [bounds[i], bounds[i+1]) -> values[i]
    (vrtreclassifier range table semantics). len(values) ==
    len(bounds) - 1."""
    def remap(v: Column) -> Column:
        expr = F.lit(float(default))
        for i in range(len(values)):
            cond = (v >= F.lit(float(bounds[i]))) & (v < F.lit(float(bounds[i + 1])))
            expr = F.when(cond, F.lit(float(values[i]))).otherwise(expr)
        return expr
    return calc(tiles, remap)


def crop(tiles: DataFrame, spec: G.GridSpec,
         x0: int, y0: int, w: int, h: int):
    """`gdal raster clip` on a pixel window: -> (tiles', spec') where
    spec' is the window's grid (geotransform shifted) and tiles'
    re-addresses from (0, 0). Only tiles intersecting the window are
    touched (a JVM tile-range filter prunes the rest before any Python
    stage); window edges may cut tiles, handled per-tile in numpy.
    Requires the window to be tile-aligned OR partial edge tiles are
    emitted with their true (smaller) shapes via the new spec."""
    import pandas as pd
    from pyspark.sql import types as T

    t = spec.tile
    new_spec = G.GridSpec(
        w, h,
        (spec.gt[0] + x0 * spec.gt[1] + y0 * spec.gt[2],
         spec.gt[1], spec.gt[2],
         spec.gt[3] + x0 * spec.gt[4] + y0 * spec.gt[5],
         spec.gt[4], spec.gt[5]),
        crs=spec.crs, tile=t)
    tx0, tx1 = x0 // t, (x0 + w - 1) // t
    ty0, ty1 = y0 // t, (y0 + h - 1) // t
    cand = tiles.filter(
        (F.col("tile_x") >= tx0) & (F.col("tile_x") <= tx1)
        & (F.col("tile_y") >= ty0) & (F.col("tile_y") <= ty1))

    def recut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # assemble the window's intersection per NEW tile key
            pieces: dict[tuple[int, int], np.ndarray] = {}
            for _, r in pdf.iterrows():
                sty, stx = int(r["tile_y"]), int(r["tile_x"])
                sh, sw = spec.tile_shape(sty, stx)
                arr = np.asarray(r["px"], np.float64).reshape(sh, sw)
                gy0, gx0 = sty * t, stx * t
                iy0, iy1 = max(gy0, y0), min(gy0 + sh, y0 + h)
                ix0, ix1 = max(gx0, x0), min(gx0 + sw, x0 + w)
                if iy0 >= iy1 or ix0 >= ix1:
                    continue
                sub = arr[iy0 - gy0:iy1 - gy0, ix0 - gx0:ix1 - gx0]
                # new-grid coords of the slice
                ny0, nx0 = iy0 - y0, ix0 - x0
                for nty in range(ny0 // t, (ny0 + sub.shape[0] - 1) // t + 1):
                    for ntx in range(nx0 // t,
                                     (nx0 + sub.shape[1] - 1) // t + 1):
                        nh, nw = new_spec.tile_shape(nty, ntx)
                        blk = pieces.setdefault(
                            (nty, ntx), np.zeros((nh, nw)))
                        oy0 = max(ny0, nty * t)
                        ox0 = max(nx0, ntx * t)
                        oy1 = min(ny0 + sub.shape[0], nty * t + nh)
                        ox1 = min(nx0 + sub.shape[1], ntx * t + nw)
                        blk[oy0 - nty * t:oy1 - nty * t,
                            ox0 - ntx * t:ox1 - ntx * t] = \
                            sub[oy0 - ny0:oy1 - ny0, ox0 - nx0:ox1 - nx0]
            rows = [(nty, ntx, blk.ravel().tolist())
                    for (nty, ntx), blk in pieces.items()]
            yield pd.DataFrame(rows, columns=["tile_y", "tile_x", "px"])

    # one source tile can contribute to up to 4 new tiles; group-merge
    # partial contributions of the same new tile across source tiles
    parts = cand.mapInPandas(recut, G.TILE_SCHEMA)
    merged = (parts.groupBy("tile_y", "tile_x")
              .applyInPandas(_merge_tile_parts_factory(new_spec),
                             G.TILE_SCHEMA))
    return merged, new_spec


def _merge_tile_parts_factory(spec: G.GridSpec):
    import pandas as pd

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        h, w = spec.tile_shape(ty, tx)
        acc = np.zeros((h, w))
        for _, r in pdf.iterrows():
            acc += np.asarray(r["px"], np.float64).reshape(h, w)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [acc.ravel().tolist()]})

    return merge


def resize(tiles: DataFrame, spec: G.GridSpec, out_w: int, out_h: int,
           kernel: str = "bilinear", tile: int | None = None) -> DataFrame:
    """`gdal raster resize` (apps/gdalalg_raster_resize.cpp): same
    extent, new pixel dimensions — delegated to the warp operator with
    an identity CRS transform (resize IS a same-CRS warp), so every
    warp kernel (near/bilinear/cubic/average) is available."""
    from . import warp as W

    x0, y0 = spec.gt[0], spec.gt[3]
    x1 = x0 + spec.width * spec.gt[1]
    y1 = y0 + spec.height * spec.gt[5]
    dst = G.GridSpec(out_w, out_h,
                     (x0, (x1 - x0) / out_w, 0.0,
                      y0, 0.0, (y1 - y0) / out_h),
                     crs=spec.crs, tile=tile or spec.tile)
    return W.warp(tiles, spec, dst, kernel=kernel), dst


def color_relief(tiles: DataFrame,
                 ramp: list[tuple[float, tuple[int, int, int]]],
                 nearest: bool = False) -> DataFrame:
    """gdaldem color-relief (apps/gdaldem_lib.cpp color-relief mode):
    map pixel values to RGB through a color ramp — linear interpolation
    between ramp stops (the default) or nearest-entry when
    `nearest=True` (-nearest_color_entry). Values below/above the ramp
    clamp to the first/last color. Output: (tile_y, tile_x, r, g, b)
    byte-valued double arrays — pure JVM F.transform per channel, ready
    for tilewriter.write_tiles_png_rgb."""
    stops = sorted(ramp)

    def channel(ch: int):
        def fn(v: Column) -> Column:
            if nearest:
                # nearest stop by |v - stop|; ties to the lower stop
                expr = F.lit(float(stops[0][1][ch]))
                for i in range(1, len(stops)):
                    mid = (stops[i - 1][0] + stops[i][0]) / 2.0
                    expr = F.when(v > F.lit(float(mid)),
                                  F.lit(float(stops[i][1][ch]))).otherwise(expr)
                return expr
            expr = F.lit(float(stops[-1][1][ch]))
            for i in range(len(stops) - 1, 0, -1):
                v0, c0 = float(stops[i - 1][0]), float(stops[i - 1][1][ch])
                v1, c1 = float(stops[i][0]), float(stops[i][1][ch])
                t = (v - F.lit(v0)) / F.lit(v1 - v0)
                expr = F.when(v <= F.lit(v1),
                              F.round(F.lit(c0) + t * F.lit(c1 - c0))
                              ).otherwise(expr)
            expr = F.when(v <= F.lit(float(stops[0][0])),
                          F.lit(float(stops[0][1][ch]))).otherwise(expr)
            return expr
        return fn

    return (tiles
            .withColumn("r", F.transform(F.col("px"), channel(0)))
            .withColumn("g", F.transform(F.col("px"), channel(1)))
            .withColumn("b", F.transform(F.col("px"), channel(2)))
            .drop("px"))


def mosaic(sources: list[DataFrame], method: str = "sum") -> DataFrame:
    """Combine overlapping tile sets: per (tile, pixel) reduce with
    sum/max/min/mean/first (first = first source wins, by source
    order). One union + one groupBy(tile)."""
    tagged = [df.withColumn("src", F.lit(i)) for i, df in enumerate(sources)]
    allt = tagged[0]
    for t in tagged[1:]:
        allt = allt.unionByName(t)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        arrs = [np.asarray(r["px"], np.float64)
                for _, r in pdf.sort_values("src").iterrows()]
        stack = np.stack(arrs)
        if method == "sum":
            out = stack.sum(axis=0)
        elif method == "max":
            out = stack.max(axis=0)
        elif method == "min":
            out = stack.min(axis=0)
        elif method == "mean":
            out = stack.mean(axis=0)
        elif method == "first":
            out = stack[0].copy()
            for layer in stack[1:]:
                zero = out == 0
                out[zero] = layer[zero]
        else:
            raise ValueError(f"unknown mosaic method {method!r}")
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    return allt.groupBy("tile_y", "tile_x").applyInPandas(merge, G.TILE_SCHEMA)


_SAMPLE_SCHEMA = T.StructType([
    T.StructField("pt_id", T.LongType(), False),
    T.StructField("value", T.DoubleType(), True),
])


def interpolate_at_points(tiles: DataFrame, spec: G.GridSpec,
                          points: DataFrame, kernel: str = "near",
                          id_col: str = "pt_id", x_col: str = "x",
                          y_col: str = "y") -> DataFrame:
    """Sample the raster at world points -> (pt_id, value).

    Points are routed to their containing tile with pure column math
    (tile assignment), then each tile task samples its points with the
    numpy kernel (near, or bilinear over the in-tile 2x2 support;
    bilinear points whose support crosses a tile edge fall back to
    near — alg/gdal_interpolateatpoint.cpp clamps similarly at
    dataset edges)."""
    px = (F.col(x_col) - F.lit(spec.gt[0])) / F.lit(spec.gt[1])
    py = (F.col(y_col) - F.lit(spec.gt[3])) / F.lit(spec.gt[5])
    routed = (points
              .withColumn("spx", px).withColumn("spy", py)
              .withColumn("tile_x", F.floor(F.col("spx") / spec.tile).cast("int"))
              .withColumn("tile_y", F.floor(F.col("spy") / spec.tile).cast("int"))
              .filter((F.col("tile_x") >= 0) & (F.col("tile_x") < spec.tiles_x)
                      & (F.col("tile_y") >= 0) & (F.col("tile_y") < spec.tiles_y)))
    joined = routed.join(tiles, ["tile_y", "tile_x"], "left")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vals = [], []
            for _, row in pdf.iterrows():
                ids.append(int(row[id_col]))
                if row["px"] is None:
                    vals.append(0.0)  # empty (sparse) tile => zeros
                    continue
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                arr = np.asarray(row["px"], np.float64).reshape(h, w)
                lx = float(row["spx"]) - tx * spec.tile
                ly = float(row["spy"]) - ty * spec.tile
                if kernel == "bilinear":
                    fx, fy = lx - 0.5, ly - 0.5
                    x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                    if 0 <= x0 < w - 1 and 0 <= y0 < h - 1:
                        wx, wy = fx - x0, fy - y0
                        v = (arr[y0, x0] * (1 - wx) * (1 - wy)
                             + arr[y0, x0 + 1] * wx * (1 - wy)
                             + arr[y0 + 1, x0] * (1 - wx) * wy
                             + arr[y0 + 1, x0 + 1] * wx * wy)
                        vals.append(float(v))
                        continue
                vals.append(float(arr[min(int(ly), h - 1), min(int(lx), w - 1)]))
            yield pd.DataFrame({"pt_id": ids, "value": vals})

    return joined.mapInPandas(sample, _SAMPLE_SCHEMA)
