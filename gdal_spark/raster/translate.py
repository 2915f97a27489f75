"""gdalwarp / gdal_translate file-to-file drivers over the GeoTIFF
codec — the CLI-shaped top of the raster stack.

Reference surfaces: apps/gdalwarp_lib.cpp (reproject: suggested output
grid + kernel choice + nodata) and apps/gdal_translate_lib.cpp
(-projwin window, -outsize resize, -scale linear rescale, -ot type,
-a_nodata). Each option maps onto an existing distributed operator —
this module only composes:

    read_geotiff -> [crop | resize | scale | warp] -> write_geotiff

so the plan stays the operators' plans (byte-range tile reads, tile
dependency joins, distributed deflate on write); nothing new touches
the driver beyond the IFD probe and the block concatenation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import calc as C
from . import geotiff as GT
from . import grid as G
from . import warp as W


def gdalwarp(spark: SparkSession, src_path: str, dst_path: str,
             dst_crs: str, kernel: str = "near", nodata: float = 0.0,
             tile: int = 256, dtype: str = "float64",
             compression: str = "deflate",
             dst_spec: G.GridSpec | None = None) -> G.GridSpec:
    """`gdalwarp -t_srs <dst_crs> -r <kernel> src dst` — reproject one
    GeoTIFF into another. The destination grid defaults to the
    GDALSuggestedWarpOutput edge-walk choice; pass dst_spec to pin it
    (gdalwarp -te/-tr/-ts). Returns the destination GridSpec."""
    src_spec, src_bands = GT.read_geotiff_bands(spark, src_path)
    dst = dst_spec or W.suggested_warp_output(src_spec, dst_crs, tile=tile)
    warped = [W.warp(b, src_spec, dst, kernel=kernel, nodata=nodata)
              for b in src_bands]
    nd = nodata if nodata != 0.0 else None
    if len(warped) == 1:
        GT.write_geotiff(warped[0], dst, dst_path, dtype=dtype,
                         compression=compression, nodata=nd)
    else:
        GT.write_geotiff_bands(warped, dst, dst_path, dtype=dtype,
                               compression=compression, nodata=nd)
    return dst


def gdal_translate(spark: SparkSession, src_path: str, dst_path: str,
                   projwin: tuple[float, float, float, float] | None = None,
                   outsize: tuple[int, int] | None = None,
                   scale: tuple[float, float, float, float] | None = None,
                   resize_kernel: str = "bilinear",
                   dtype: str = "float64", compression: str = "deflate",
                   nodata: float | None = None,
                   band: int = 0) -> G.GridSpec:
    """`gdal_translate [-b band] [-projwin ulx uly lrx lry]
    [-outsize w h] [-scale src_min src_max dst_min dst_max] [-ot type]
    src dst`. Options apply in the reference's order: band selection,
    window, resize, rescale, then type conversion at write."""
    from .vrt import open_raster

    spec, tiles = open_raster(spark, src_path, band=band)
    if projwin is not None:
        ulx, uly, lrx, lry = projwin
        px0, py0 = spec.world_to_pixel(np.array([ulx]), np.array([uly]))
        px1, py1 = spec.world_to_pixel(np.array([lrx]), np.array([lry]))
        x0 = max(0, int(np.floor(px0[0])))
        y0 = max(0, int(np.floor(py0[0])))
        x1 = min(spec.width, int(np.ceil(px1[0])))
        y1 = min(spec.height, int(np.ceil(py1[0])))
        if x1 <= x0 or y1 <= y0:
            raise ValueError(f"-projwin {projwin} is outside the raster")
        tiles, spec = C.crop(tiles, spec, x0, y0, x1 - x0, y1 - y0)
    if outsize is not None:
        tiles, spec = C.resize(tiles, spec, outsize[0], outsize[1],
                               kernel=resize_kernel)
    if scale is not None:
        s0, s1, d0, d1 = (float(v) for v in scale)
        if s1 == s0:
            raise ValueError("-scale: src_min == src_max")
        a = (d1 - d0) / (s1 - s0)
        tiles = C.calc(tiles, lambda v: (v - F.lit(s0)) * F.lit(a)
                       + F.lit(d0))
    GT.write_geotiff(tiles, spec, dst_path, dtype=dtype,
                     compression=compression, nodata=nodata)
    return spec
