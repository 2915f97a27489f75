"""Grid interpolation: scattered points -> raster via IDW.

Reference: alg/gdalgrid.cpp — `GDALGridInverseDistanceToAPower` (:124)
and the nearest-neighbour-bounded variant (:242): for each output grid
node, value = sum(v_i / d_i^p) / sum(1 / d_i^p) over points within
`radius`; nodes with no point in radius get `nodata`; a point exactly
on the node short-circuits to its value.

Distributed shape: like proximity, the scattered points are broadcast
(guarded) and each output tile computes its nodes vectorized; at
larger point sets the candidate gathering becomes the cell-ring join
the kNN operator implements — this module is the dense-output half.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import grid as G

MAX_BROADCAST_POINTS = 2_000_000


def idw_np(px_nodes_x: np.ndarray, px_nodes_y: np.ndarray,
           pts_x: np.ndarray, pts_y: np.ndarray, pts_v: np.ndarray,
           power: float = 2.0, radius: float = np.inf,
           nodata: float = 0.0) -> np.ndarray:
    """IDW at arbitrary nodes (world coords). Vectorized (nodes x pts)."""
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


def grid_idw(points: DataFrame, spec: G.GridSpec,
             value_col: str = "v", x_col: str = "x", y_col: str = "y",
             power: float = 2.0, radius: float = np.inf,
             nodata: float = 0.0) -> DataFrame:
    """-> dense tile DataFrame over the WHOLE grid (every tile emitted:
    gridding produces a full surface, unlike the sparse density path)."""
    rows = points.select(x_col, y_col, value_col).collect()
    if len(rows) > MAX_BROADCAST_POINTS:
        raise ValueError("point set exceeds broadcast budget; use the "
                         "cell-ring join path (operators.knn) instead")
    px = np.array([r[x_col] for r in rows], np.float64)
    py = np.array([r[y_col] for r in rows], np.float64)
    pv = np.array([r[value_col] for r in rows], np.float64)
    b = points.sparkSession.sparkContext.broadcast((px, py, pv))

    spark = points.sparkSession
    keys = [(ty, tx) for ty in range(spec.tiles_y) for tx in range(spec.tiles_x)]
    kdf = spark.createDataFrame(keys, "tile_y int, tile_x int")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by, bv = b.value
        ty, tx = int(key[0]), int(key[1])
        h, w = spec.tile_shape(ty, tx)
        gx, gy = np.meshgrid(
            np.arange(tx * spec.tile, tx * spec.tile + w, dtype=np.float64),
            np.arange(ty * spec.tile, ty * spec.tile + h, dtype=np.float64))
        wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
        out = idw_np(wx, wy, bx, by, bv, power, radius, nodata)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    return kdf.groupBy("tile_y", "tile_x").applyInPandas(run, G.TILE_SCHEMA)
