"""Proximity raster: per-pixel distance to the nearest target pixel.

Reference: alg/gdalproximity.cpp:94 `GDALComputeProximity` — for each
pixel, the euclidean PIXEL distance to the nearest pixel whose value
is in the target set, capped at maxdist (beyond -> nodata/maxdist).
The reference runs a two-pass chamfer over scanlines.

Distributed restatement: the target pixels of a density-style raster
are its sparse nonzero relation — usually MUCH smaller than the
raster. We broadcast the target coordinate array and compute each
tile's distance field vectorized ((tile_px x targets) numpy min) —
embarrassingly parallel, no halo, exact (not chamfer-approximate).
For target sets too big to broadcast, the chamfer alternative is the
focal halo pattern run to fixpoint; this module implements the
broadcast path and guards it with an explicit size check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import grid as G

MAX_BROADCAST_TARGETS = 2_000_000


def proximity(tiles: DataFrame, spec: G.GridSpec,
              max_dist: float = float("inf"),
              nodata: float = -1.0) -> DataFrame:
    """-> distance tiles over the SAME tile set. Pixels farther than
    max_dist from every target get `nodata` (gdalproximity maxdist
    semantics). Distance unit: pixels."""
    # sparse target relation: (gx, gy) of nonzero pixels
    t = spec.tile
    targets = (tiles.select(
        "tile_y", "tile_x",
        F.posexplode("px").alias("pxi", "v"))
        .filter(F.col("v") != 0)
        .select((F.col("tile_x") * t + F.col("pxi") % t).alias("gx"),
                (F.col("tile_y") * t + (F.col("pxi") / t).cast("int")).alias("gy")))
    rows = targets.collect()
    if len(rows) > MAX_BROADCAST_TARGETS:
        raise ValueError(
            f"{len(rows)} target pixels exceed the broadcast budget; "
            "use a coarser zoom or a chamfer (halo-iteration) pass")
    tx = np.array([r["gx"] for r in rows], dtype=np.float64)
    ty = np.array([r["gy"] for r in rows], dtype=np.float64)
    b = tiles.sparkSession.sparkContext.broadcast((tx, ty))

    def dist_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ctx, cty = b.value
        ty_, tx_ = int(key[0]), int(key[1])
        h, w = spec.tile_shape(ty_, tx_)
        gx, gy = np.meshgrid(np.arange(tx_ * t, tx_ * t + w, dtype=np.float64),
                             np.arange(ty_ * t, ty_ * t + h, dtype=np.float64))
        px = gx.ravel()
        py = gy.ravel()
        if len(ctx) == 0:
            out = np.full(px.shape, nodata)
        else:
            # chunk over pixels to bound the (px x targets) matrix
            out = np.empty(px.shape)
            step = max(1, int(4_000_000 // max(len(ctx), 1)))
            for i in range(0, len(px), step):
                dx = px[i:i + step, None] - ctx[None, :]
                dy = py[i:i + step, None] - cty[None, :]
                out[i:i + step] = np.sqrt((dx * dx + dy * dy).min(axis=1))
            out = np.where(out <= max_dist, out, nodata)
        return pd.DataFrame({"tile_y": [ty_], "tile_x": [tx_],
                             "px": [out.tolist()]})

    return tiles.groupBy("tile_y", "tile_x").applyInPandas(dist_tile, G.TILE_SCHEMA)


def proximity_np(canvas: np.ndarray, max_dist: float = float("inf"),
                 nodata: float = -1.0) -> np.ndarray:
    """Single-node oracle (brute force)."""
    ys, xs = np.nonzero(canvas)
    out = np.full(canvas.shape, nodata, dtype=np.float64)
    if len(xs) == 0:
        return out
    gy, gx = np.mgrid[0:canvas.shape[0], 0:canvas.shape[1]]
    d = np.sqrt(
        (gx[..., None] - xs[None, None, :]) ** 2.0
        + (gy[..., None] - ys[None, None, :]) ** 2.0).min(axis=2)
    return np.where(d <= max_dist, d, nodata)
