"""Warp / reproject (EPSG:3857 <-> EPSG:4326) by inverse mapping.

Reference semantics (alg/gdalwarpoperation.cpp design doc :90-151 and
alg/gdalwarpkernel.cpp): for each DESTINATION pixel, transform its
center into source coordinates and sample with the chosen kernel —
near (index), bilinear (2x2 weighted; gdalwarper.h:35-67 lists the
kernel set), average. The output grid comes from
`GDALSuggestedWarpOutput2` (alg/gdaltransformer.cpp:132-173), which
walks ~21 sample points per edge of the source extent through the
transform and sizes the output so overall pixel count is preserved
along the diagonal — reproduced in `suggested_warp_output`.

Spark-first restatement: each OUTPUT tile is one task ("the chunk of
the reference = our tile", SURVEY §2.9). Which source tiles a given
output tile needs is CLOSED-FORM (the 4326<->3857 transform is
monotone per axis), so the gather is a deterministic equi-join:
enumerate (dst_tile, src_tile) pairs with pure column math, join the
source tile rows, then one `applyInPandas` per dst tile computes the
coordinate arrays with numpy and applies the kernel. No driver-side
data movement; the source tile fan-out is bounded by the zoom-ratio.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geo import mercator
from . import grid as G


def edge_walk_points(spec: G.GridSpec, samples_per_edge: int = 21):
    """The SuggestedWarpOutput sampling ring: 21 points per edge of the
    source extent (gdaltransformer.cpp:139-141) + corners."""
    x0, y0 = spec.gt[0], spec.gt[3]
    x1 = x0 + spec.width * spec.gt[1]
    y1 = y0 + spec.height * spec.gt[5]
    t = np.linspace(0.0, 1.0, samples_per_edge)
    xs = np.concatenate([x0 + (x1 - x0) * t, np.full_like(t, x1),
                         x1 + (x0 - x1) * t, np.full_like(t, x0)])
    ys = np.concatenate([np.full_like(t, y0), y0 + (y1 - y0) * t,
                         np.full_like(t, y1), y1 + (y0 - y1) * t])
    return xs, ys


def suggested_warp_output(src: G.GridSpec, dst_crs: str,
                          samples_per_edge: int = 21, tile: int = 256) -> G.GridSpec:
    """Choose the destination grid the way GDALSuggestedWarpOutput2
    does: transform the edge-walk ring, take the bbox, keep the source
    diagonal pixel count."""
    xs, ys = edge_walk_points(src, samples_per_edge)
    if src.crs == "EPSG:3857" and dst_crs == "EPSG:4326":
        tx, ty = mercator.meters_to_lonlat_np(xs, ys)
    elif src.crs == "EPSG:4326" and dst_crs == "EPSG:3857":
        tx, ty = mercator.lonlat_to_meters_np(
            xs, np.clip(ys, -mercator.MERCATOR_MAX_LAT, mercator.MERCATOR_MAX_LAT))
    else:
        raise NotImplementedError(f"{src.crs} -> {dst_crs}")
    minx, maxx = float(tx.min()), float(tx.max())
    miny, maxy = float(ty.min()), float(ty.max())
    diag_px = float(np.hypot(src.width, src.height))
    res = float(np.hypot(maxx - minx, maxy - miny)) / diag_px
    width = max(1, int(round((maxx - minx) / res)))
    height = max(1, int(round((maxy - miny) / res)))
    return G.GridSpec(width, height, (minx, (maxx - minx) / width, 0.0,
                                      maxy, 0.0, -(maxy - miny) / height),
                      crs=dst_crs, tile=tile)


def _dst_center_in_src_px(dst: G.GridSpec, src: G.GridSpec,
                          gx: np.ndarray, gy: np.ndarray):
    """Global dest pixel indices -> fractional source pixel coords."""
    wx, wy = dst.pixel_center_world(gx, gy)
    if dst.crs == src.crs:
        sx, sy = wx, wy
    elif dst.crs == "EPSG:4326" and src.crs == "EPSG:3857":
        sx, sy = mercator.lonlat_to_meters_np(
            wx, np.clip(wy, -mercator.MERCATOR_MAX_LAT, mercator.MERCATOR_MAX_LAT))
    elif dst.crs == "EPSG:3857" and src.crs == "EPSG:4326":
        sx, sy = mercator.meters_to_lonlat_np(wx, wy)
    else:
        raise NotImplementedError(f"{dst.crs} -> {src.crs}")
    return src.world_to_pixel(sx, sy)


def warp(src_tiles: DataFrame, src: G.GridSpec, dst: G.GridSpec,
         kernel: str = "near", nodata: float = 0.0) -> DataFrame:
    """Distributed warp: src tile rows -> dst tile rows.

    Builds the (dst_tile, src_tile) dependency relation by evaluating
    the corner mapping of every dst tile (driver-side numpy over the
    dst tile index range — O(#dst tiles) metadata, no data), joins, and
    warps per dst tile.
    """
    spark = src_tiles.sparkSession
    # --- dependency relation (metadata-sized)
    dts, dxs = np.meshgrid(np.arange(dst.tiles_y), np.arange(dst.tiles_x),
                           indexing="ij")
    dts, dxs = dts.ravel(), dxs.ravel()
    pairs = []
    for ty, tx in zip(dts, dxs):
        h, w = dst.tile_shape(int(ty), int(tx))
        gx = np.array([tx * dst.tile, tx * dst.tile + w - 1], np.float64)
        gy = np.array([ty * dst.tile, ty * dst.tile + h - 1], np.float64)
        cx, cy = np.meshgrid(gx, gy)
        spx, spy = _dst_center_in_src_px(dst, src, cx.ravel(), cy.ravel())
        sx0 = int(np.floor(spx.min() - 1)) // src.tile
        sx1 = int(np.floor(spx.max() + 1)) // src.tile
        sy0 = int(np.floor(spy.min() - 1)) // src.tile
        sy1 = int(np.floor(spy.max() + 1)) // src.tile
        for sy in range(max(0, sy0), min(src.tiles_y - 1, sy1) + 1):
            for sx in range(max(0, sx0), min(src.tiles_x - 1, sx1) + 1):
                pairs.append((int(ty), int(tx), int(sy), int(sx)))
    dep = spark.createDataFrame(
        pairs, "d_ty int, d_tx int, tile_y int, tile_x int")

    gathered = dep.join(src_tiles, ["tile_y", "tile_x"], "inner")

    def warp_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ty, tx = int(key[0]), int(key[1])
        h, w = dst.tile_shape(ty, tx)
        gx, gy = np.meshgrid(np.arange(tx * dst.tile, tx * dst.tile + w, dtype=np.float64),
                             np.arange(ty * dst.tile, ty * dst.tile + h, dtype=np.float64))
        spx, spy = _dst_center_in_src_px(dst, src, gx.ravel(), gy.ravel())
        out = np.full(h * w, nodata, dtype=np.float64)

        # mosaic the gathered source tiles into one local window
        sxs = pdf["tile_x"].to_numpy(np.int64)
        sys_ = pdf["tile_y"].to_numpy(np.int64)
        wx0, wx1 = sxs.min() * src.tile, (sxs.max() + 1) * src.tile
        wy0, wy1 = sys_.min() * src.tile, (sys_.max() + 1) * src.tile
        win = np.full((wy1 - wy0, wx1 - wx0), nodata, dtype=np.float64)
        for _, row in pdf.iterrows():
            sh, sw = src.tile_shape(int(row["tile_y"]), int(row["tile_x"]))
            oy = int(row["tile_y"]) * src.tile - wy0
            ox = int(row["tile_x"]) * src.tile - wx0
            win[oy:oy + sh, ox:ox + sw] = \
                np.asarray(row["px"], np.float64).reshape(sh, sw)

        lx, ly = spx - wx0, spy - wy0
        if kernel == "near":
            ix = np.floor(lx).astype(np.int64)
            iy = np.floor(ly).astype(np.int64)
            ok = (ix >= 0) & (ix < win.shape[1]) & (iy >= 0) & (iy < win.shape[0])
            out[ok] = win[iy[ok], ix[ok]]
        elif kernel == "bilinear":
            fx, fy = lx - 0.5, ly - 0.5  # sample space: pixel centers
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            wxf, wyf = fx - x0, fy - y0
            ok = (x0 >= 0) & (x0 + 1 < win.shape[1]) & (y0 >= 0) & (y0 + 1 < win.shape[0])
            x0c, y0c = x0[ok], y0[ok]
            v00 = win[y0c, x0c]; v01 = win[y0c, x0c + 1]
            v10 = win[y0c + 1, x0c]; v11 = win[y0c + 1, x0c + 1]
            out[ok] = (v00 * (1 - wxf[ok]) * (1 - wyf[ok]) + v01 * wxf[ok] * (1 - wyf[ok])
                       + v10 * (1 - wxf[ok]) * wyf[ok] + v11 * wxf[ok] * wyf[ok])
        else:
            raise ValueError(f"unknown kernel {kernel!r}")
        return pd.DataFrame({"tile_y": [ty], "tile_x": [tx],
                             "px": [out.tolist()]})

    return gathered.groupBy("d_ty", "d_tx").applyInPandas(warp_tile, G.TILE_SCHEMA)
