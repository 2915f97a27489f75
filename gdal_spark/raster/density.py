"""Points -> density raster: the bridge from the pages table to the
raster world (the engine's `gdal_rasterize -burn 1 -add` analog for
point layers, alg/gdalrasterize.cpp point path + llrasterize.cpp:233
GDALdllImagePoint: a point burns the pixel containing it).

Spark-first: pixel assignment is pure JVM column math (floor exprs —
the same math `gdal raster tile` uses for tile indices), the count per
pixel is a partial-aggregated groupBy, and tile assembly is one
`applyInPandas` per tile. The sparse (pixel -> count) relation IS the
scale-friendly representation at 10^12 rows; dense tile arrays only
materialize per task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geo import mercator
from . import grid as G


def global_pixel_cols_3857(lon: Column, lat: Column, zoom: int,
                           tile: int = 256) -> tuple[Column, Column]:
    """(gx, gy) global pixel indices on a world_3857 grid — JVM only."""
    n = (1 << zoom) * tile
    gx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    gx = F.greatest(F.least(gx, F.lit(n - 1)), F.lit(0)).cast("long")
    my = mercator.merc_y_col(lat)
    gy = F.floor((F.lit(mercator.ORIGIN_SHIFT) - my)
                 / F.lit(2.0 * mercator.ORIGIN_SHIFT) * F.lit(float(n)))
    gy = F.greatest(F.least(gy, F.lit(n - 1)), F.lit(0)).cast("long")
    return gx, gy


def points_to_pixel_counts(points: DataFrame, zoom: int, tile: int = 256,
                           lon_col: str = "lon", lat_col: str = "lat",
                           weight_col: str | None = None) -> DataFrame:
    """-> (tile_y, tile_x, pxi, v): sparse pixel counts (or weight sums).

    One shuffle (groupBy pixel) with map-side partial aggregation; at
    10^12 input rows the output is bounded by the number of nonzero
    pixels, not rows.
    """
    gx, gy = global_pixel_cols_3857(F.col(lon_col), F.col(lat_col), zoom, tile)
    with_px = points.withColumn("gx", gx).withColumn("gy", gy)
    agg = (F.sum(weight_col) if weight_col else F.count(F.lit(1))).cast("double")
    return (
        with_px.groupBy("gx", "gy").agg(agg.alias("v"))
        .select(
            (F.col("gy") / tile).cast("int").alias("tile_y"),
            (F.col("gx") / tile).cast("int").alias("tile_x"),
            ((F.col("gy") % tile) * tile + (F.col("gx") % tile)).alias("pxi"),
            F.col("v"),
        )
    )


def pixel_counts_to_tiles(pixels: DataFrame, spec: G.GridSpec) -> DataFrame:
    """Assemble sparse pixels into dense tile rows (tile_y, tile_x, px)."""
    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        h, w = spec.tile_shape(ty, tx)
        canvas = np.zeros(h * w, dtype=np.float64)
        canvas[pdf["pxi"].to_numpy(np.int64)] = pdf["v"].to_numpy(np.float64)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [canvas.tolist()]})

    return pixels.groupBy("tile_y", "tile_x").applyInPandas(build, G.TILE_SCHEMA)


def tiles_to_pixels(tiles: DataFrame, spec: G.GridSpec) -> DataFrame:
    """Inverse of pixel_counts_to_tiles: dense tile rows -> the sparse
    NONZERO global-pixel relation (gx, gy, v). Arrow-batched; output
    is bounded by occupied pixels, not raster size."""
    import pyarrow  # noqa: F401  (mapInPandas transport)

    t = spec.tile

    def emit(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                ty, tx = int(row["tile_y"]), int(row["tile_x"])
                h, w = spec.tile_shape(ty, tx)
                a = np.asarray(row["px"], np.float64).reshape(h, w)
                iy, ix = np.nonzero(a)
                yield pd.DataFrame({
                    "gx": tx * t + ix, "gy": ty * t + iy,
                    "v": a[iy, ix]})

    return tiles.mapInPandas(emit, "gx long, gy long, v double")


def density_tiles(points: DataFrame, zoom: int, tile: int = 256,
                  lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """points -> dense density tiles on the world_3857 grid at `zoom`."""
    spec = G.world_3857(zoom, tile)
    return pixel_counts_to_tiles(
        points_to_pixel_counts(points, zoom, tile, lon_col, lat_col), spec)
