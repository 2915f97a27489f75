"""Raster grid model: a georeferenced 2-D pixel grid split into tiles.

The reference's GDALDataset is (size, geotransform, SRS, bands) served
block-by-block (gcore/gdal_dataset.h; block model
gcore/gdalrasterblock.cpp). Our distributed restatement: a `GridSpec`
(metadata, carried as plain Python on the driver / broadcast literals)
plus a DataFrame of tile rows `(tile_y, tile_x, px: array<double>)`
where `px` is the row-major tile block — a Spark partition of tile
rows is the analog of the reference's block cache working set.

Geotransform convention is GDAL's 6-tuple (gcore/gdal_geotransform.h):
  world_x = gt0 + px * gt1 + py * gt2
  world_y = gt3 + px * gt4 + py * gt5
with north-up rasters having gt2 = gt4 = 0, gt5 < 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import types as T

from ..geo import mercator

#: tile-row schema used by every raster operator
TILE_SCHEMA = T.StructType([
    T.StructField("tile_y", T.IntegerType(), False),
    T.StructField("tile_x", T.IntegerType(), False),
    T.StructField("px", T.ArrayType(T.DoubleType()), False),
])


@dataclass(frozen=True)
class GridSpec:
    """Full-raster geometry + tiling. crs is a tag ('EPSG:4326'|'EPSG:3857')."""

    width: int
    height: int
    gt: tuple[float, float, float, float, float, float]
    crs: str = "EPSG:4326"
    tile: int = 256

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile)

    def tile_shape(self, ty: int, tx: int) -> tuple[int, int]:
        """(h, w) of a tile — edge tiles may be partial."""
        w = min(self.tile, self.width - tx * self.tile)
        h = min(self.tile, self.height - ty * self.tile)
        return h, w

    def world_to_pixel(self, x: np.ndarray, y: np.ndarray):
        """Inverse geotransform -> fractional pixel coords. North-up
        grids keep the round-1 two-division fast path (bit-stable for
        every existing oracle); rotated geotransforms invert the full
        2x2 affine (GDALInvGeoTransform, alg/gdaltransformer.cpp)."""
        xv = np.asarray(x, np.float64)
        yv = np.asarray(y, np.float64)
        if self.gt[2] == 0.0 and self.gt[4] == 0.0:
            return (xv - self.gt[0]) / self.gt[1], \
                (yv - self.gt[3]) / self.gt[5]
        det = self.gt[1] * self.gt[5] - self.gt[2] * self.gt[4]
        dx = xv - self.gt[0]
        dy = yv - self.gt[3]
        px = (dx * self.gt[5] - dy * self.gt[2]) / det
        py = (dy * self.gt[1] - dx * self.gt[4]) / det
        return px, py

    def pixel_center_world(self, px: np.ndarray, py: np.ndarray):
        pxc = np.asarray(px, np.float64) + 0.5
        pyc = np.asarray(py, np.float64) + 0.5
        if self.gt[2] == 0.0 and self.gt[4] == 0.0:
            return self.gt[0] + pxc * self.gt[1], self.gt[3] + pyc * self.gt[5]
        x = self.gt[0] + pxc * self.gt[1] + pyc * self.gt[2]
        y = self.gt[3] + pxc * self.gt[4] + pyc * self.gt[5]
        return x, y


def world_4326(width: int, height: int, tile: int = 256) -> GridSpec:
    """Whole-world plate-carree grid (lon [-180,180], lat [90,-90])."""
    return GridSpec(width, height, (-180.0, 360.0 / width, 0.0,
                                    90.0, 0.0, -180.0 / height),
                    crs="EPSG:4326", tile=tile)


def world_3857(zoom: int, tile: int = 256) -> GridSpec:
    """Whole-world web-mercator grid at a pyramid zoom — pixel (0,0) is
    the NW corner, identical addressing to the tile pyramid
    (apps/gdalalg_raster_tile.cpp WebMercatorQuad)."""
    n = (1 << zoom) * tile
    res = 2.0 * mercator.ORIGIN_SHIFT / n
    return GridSpec(n, n, (-mercator.ORIGIN_SHIFT, res, 0.0,
                           mercator.ORIGIN_SHIFT, 0.0, -res),
                    crs="EPSG:3857", tile=tile)


def pixel_index_sql_3857(zoom: int, tile: int, lon_expr: str, lat_expr: str):
    """DuckDB SQL (gx, gy) global-pixel exprs for a world_3857 grid —
    keeps the oracle in lockstep with points_to_density."""
    n = (1 << zoom) * tile
    gx = f"cast(least(greatest(floor(({lon_expr} + 180.0) / 360.0 * {float(n)!r}), 0), {n - 1}) as bigint)"
    my = mercator.merc_y_sql(lat_expr)
    gy = (f"cast(least(greatest(floor(({mercator.ORIGIN_SHIFT!r} - ({my}))"
          f" / {2.0 * mercator.ORIGIN_SHIFT!r} * {float(n)!r}), 0), {n - 1}) as bigint)")
    return gx, gy
