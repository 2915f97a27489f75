"""Focal (neighborhood) raster operators via tile halo exchange.

Reference semantics: the DEM derivatives of apps/gdaldem_lib.cpp
(slope :~alg Horn, aspect, hillshade, TPI, TRI, roughness — 3x3 focal
kernels over elevation) and `gdal raster neighbors`
(apps/gdalalg_raster_neighbors.cpp). GDAL computes these a scanline at
a time with the previous/current/next rows in memory; the distributed
restatement is the SURVEY §2.5 halo pattern: join every tile with its
8 neighbors, assemble a (tile+2-halo) window per task, run the numpy
kernel on the interior.

Formulas (gdaldem_lib.cpp, Horn's method on a 3x3 window with cell
sizes ewres/nsres; zenith/azimuth defaults 45/315):

  dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * ewres)
  dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * nsres)
  slope_deg  = atan(z_factor * hypot(dzdx, dzdy)) in degrees
  hillshade  = 255 * (cos(zen)cos(slope) +
                      sin(zen)sin(slope)cos(az - aspect))
  TPI  = center - mean(8 neighbors)
  TRI  = mean(|center - neighbor|)           (Wilson variant)
  roughness = max(window) - min(window)

Border semantics: GDAL computes edges by mirroring the interior
(gdaldem edge handling); we reproduce by clamping the halo at the
raster boundary (edge replicate), which matches its INTERPOL_GRADIENT
edge fill for the tested kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import grid as G


def _halo_window(full_tiles: dict, ty: int, tx: int, spec: G.GridSpec) -> np.ndarray:
    """Assemble tile (ty,tx) plus a 1-px halo from its neighbors.

    A neighbor tile missing from `full_tiles` but inside the raster is
    an implicit ZERO tile (sparse raster convention); halo pixels
    beyond the raster boundary edge-replicate (gdaldem edge fill).
    Requires a full-tile grid (square world grids)."""
    t = spec.tile
    win = np.zeros((t + 2, t + 2), dtype=np.float64)
    win[1:-1, 1:-1] = full_tiles[(ty, tx)]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ys = slice(1, t + 1) if dy == 0 else (
                slice(0, 1) if dy < 0 else slice(t + 1, t + 2))
            xs = slice(1, t + 1) if dx == 0 else (
                slice(0, 1) if dx < 0 else slice(t + 1, t + 2))
            nty, ntx = ty + dy, tx + dx
            if 0 <= nty < spec.tiles_y and 0 <= ntx < spec.tiles_x:
                nb = full_tiles.get((nty, ntx))
                if nb is None:
                    win[ys, xs] = 0.0
                else:
                    sy = slice(t - 1, t) if dy < 0 else (
                        slice(0, 1) if dy > 0 else slice(0, t))
                    sx = slice(t - 1, t) if dx < 0 else (
                        slice(0, 1) if dx > 0 else slice(0, t))
                    win[ys, xs] = nb[sy, sx]
            else:
                win[ys, xs] = np.nan  # marked; replicated below
    # edge replicate beyond the raster boundary
    for idx, src in ((0, 1), (t + 1, t)):
        row = win[idx, :]
        win[idx, :] = np.where(np.isnan(row), win[src, :], row)
        col = win[:, idx]
        win[:, idx] = np.where(np.isnan(col), win[:, src], col)
    return win


def _kernel_np(win: np.ndarray, op: str, ewres: float, nsres: float,
               z_factor: float = 1.0, zenith: float = 45.0,
               azimuth: float = 315.0, nodata: float = 0.0) -> np.ndarray:
    """Apply the named focal kernel to a haloed window -> interior."""
    a = win[:-2, :-2]; b = win[:-2, 1:-1]; c = win[:-2, 2:]
    d = win[1:-1, :-2]; e = win[1:-1, 1:-1]; f = win[1:-1, 2:]
    g = win[2:, :-2]; h = win[2:, 1:-1]; i = win[2:, 2:]
    if op in ("slope", "aspect", "hillshade"):
        dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * ewres)
        dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * nsres)
        # sqrt(x^2+y^2), not hypot: the reference's own Horn form
        # (apps/gdaldem_lib.cpp GDALSlopeHornAlg) and SQL-mirrorable
        grad = np.sqrt(dzdx * dzdx + dzdy * dzdy)
        if op == "slope":
            return np.degrees(np.arctan(z_factor * grad))
        aspect = np.arctan2(dzdy, -dzdx)
        if op == "aspect":
            deg = np.degrees(aspect)
            deg = 90.0 - deg
            deg = np.where(deg < 0, deg + 360.0, deg)
            return np.where(deg >= 360.0, deg - 360.0, deg)
        zen = np.radians(90.0 - zenith)
        az = np.radians(azimuth)
        slope_r = np.arctan(z_factor * grad)
        asp = np.arctan2(dzdy, -dzdx)
        shade = (np.cos(zen) * np.cos(slope_r)
                 + np.sin(zen) * np.sin(slope_r) * np.cos(az - asp))
        return np.clip(255.0 * shade, 0.0, 255.0)
    if op == "tpi":
        return e - (a + b + c + d + f + g + h + i) / 8.0
    if op == "tri":
        return (np.abs(e - a) + np.abs(e - b) + np.abs(e - c) + np.abs(e - d)
                + np.abs(e - f) + np.abs(e - g) + np.abs(e - h) + np.abs(e - i)) / 8.0
    if op == "roughness":
        stack = np.stack([a, b, c, d, e, f, g, h, i])
        return stack.max(axis=0) - stack.min(axis=0)
    if op == "mean3x3":
        return (a + b + c + d + e + f + g + h + i) / 9.0
    if op == "gauss3x3":
        # the normalized 3x3 gaussian of GDAL's GAUSS overview kernel
        # (gcore/overview.cpp:1996: 1-2-1 / 2-4-2 / 1-2-1, /16)
        return (a + 2.0 * b + c + 2.0 * d + 4.0 * e + 2.0 * f
                + g + 2.0 * h + i) / 16.0
    if op == "sum3x3":
        return a + b + c + d + e + f + g + h + i
    if op == "fillnodata_step":
        # one fill iteration (alg/rasterfill.cpp semantics family):
        # nodata pixels take the mean of their VALID 8-neighbours;
        # valid pixels pass through
        nod = nodata
        stack = np.stack([a, b, c, d, f, g, h, i])
        valid = stack != nod
        cnt = valid.sum(axis=0)
        s = np.where(valid, stack, 0.0).sum(axis=0)
        fill = np.where(cnt > 0, s / np.maximum(cnt, 1), nod)
        return np.where(e == nod, fill, e)
    raise ValueError(f"unknown focal op {op!r}")


def focal_np(canvas: np.ndarray, op: str, ewres: float = 1.0,
             nsres: float = 1.0, **kw) -> np.ndarray:
    """Single-node oracle: focal op over a full canvas (edge replicate)."""
    win = np.pad(canvas, 1, mode="edge")
    return _kernel_np(win, op, ewres, nsres, **kw)


def focal(tiles: DataFrame, spec: G.GridSpec, op: str,
          z_factor: float = 1.0, nodata: float = 0.0) -> DataFrame:
    """Distributed focal op: halo join (each tile replicated to its 8
    neighbors' groups — one shuffle keyed by target tile) + numpy
    kernel per tile. ewres/nsres come from the grid geotransform."""
    ewres, nsres = abs(spec.gt[1]), abs(spec.gt[5])
    t = spec.tile
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y

    # replicate each tile row to every neighbor target (incl. itself)
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
            # center tile absent (sparse raster): implicit zeros
            neigh[(ty, tx)] = np.zeros(spec.tile_shape(ty, tx))
        win = _halo_window(neigh, ty, tx, spec)
        out = _kernel_np(win, op, ewres, nsres, z_factor=z_factor,
                         nodata=nodata)
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.ravel().tolist()]})

    return fan.groupBy("t_ty", "t_tx").applyInPandas(run, G.TILE_SCHEMA)


def fillnodata(tiles: DataFrame, spec: G.GridSpec, nodata: float,
               iterations: int = 3) -> DataFrame:
    """Fill nodata holes by iterated neighbor-mean passes
    (alg/rasterfill.cpp's interpolation family; each pass is one halo
    shuffle, holes shrink one ring per pass — `iterations` bounds the
    fillable hole radius)."""
    cur = tiles
    for _ in range(iterations):
        cur = focal(cur, spec, "fillnodata_step", nodata=nodata)
    return cur


def fillnodata_np(canvas: np.ndarray, nodata: float,
                  iterations: int = 3) -> np.ndarray:
    cur = canvas
    for _ in range(iterations):
        cur = focal_np(cur, "fillnodata_step", nodata=nodata)
    return cur
