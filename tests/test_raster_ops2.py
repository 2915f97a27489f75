"""Focal (halo-exchange) and per-pixel raster operators vs oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.raster import calc as C
from gdal_spark.raster import density as D
from gdal_spark.raster import focal as FO
from gdal_spark.raster import grid as G
from gdal_spark.sources import pages
from tests.test_raster_spark import tiles_to_canvas


def _dense_tiles(spark, canvas, spec):
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            h, w = spec.tile_shape(ty, tx)
            sub = canvas[ty * spec.tile:ty * spec.tile + h,
                         tx * spec.tile:tx * spec.tile + w]
            rows.append((ty, tx, sub.ravel().tolist()))
    return spark.createDataFrame(rows, "tile_y int, tile_x int, px array<double>")


@pytest.mark.parametrize("op", ["slope", "aspect", "hillshade", "tpi",
                                "tri", "roughness", "mean3x3"])
def test_focal_distributed_matches_oracle(spark, op):
    rng = np.random.default_rng(11)
    spec = G.world_3857(2, 16)  # 64x64 world, 4x4 tiles of 16
    canvas = rng.uniform(0, 100, size=(spec.height, spec.width))
    tiles = _dense_tiles(spark, canvas, spec)
    got = tiles_to_canvas(FO.focal(tiles, spec, op), spec)
    want = FO.focal_np(canvas, op, abs(spec.gt[1]), abs(spec.gt[5]))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_focal_sparse_missing_tiles_are_zero(spark, sf_dir):
    """Density rasters omit empty tiles; focal must treat absent
    neighbors as zero tiles, matching the dense oracle."""
    pts = pages.page_points(spark, sf_dir)
    spec = G.world_3857(3, 32)
    tiles = D.density_tiles(pts, 3, 32)
    got = tiles_to_canvas(FO.focal(tiles, spec, "mean3x3"), spec)
    dense = tiles_to_canvas(tiles, spec)
    want = FO.focal_np(dense, "mean3x3", abs(spec.gt[1]), abs(spec.gt[5]))
    # absent tiles produce no output rows; compare where tiles exist
    have = tiles_to_canvas(
        tiles.select("tile_y", "tile_x",
                     F.transform("px", lambda v: v * 0 + 1).alias("px")), spec)
    mask = np.repeat(np.repeat(
        have.reshape(spec.tiles_y, 32, spec.tiles_x, 32).max(axis=(1, 3)) > 0,
        32, axis=0), 32, axis=1)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-12)


def test_calc_and_reclassify(spark):
    spec = G.GridSpec(8, 8, (0, 1, 0, 8, 0, -1), tile=8)
    canvas = np.arange(64, dtype=np.float64).reshape(8, 8)
    tiles = _dense_tiles(spark, canvas, spec)
    doubled = tiles_to_canvas(C.calc(tiles, lambda v: v * 2 + 1), spec)
    np.testing.assert_array_equal(doubled, canvas * 2 + 1)
    rc = tiles_to_canvas(C.reclassify(tiles, [0, 16, 48, 64], [1, 2, 3]), spec)
    want = np.where(canvas < 16, 1.0, np.where(canvas < 48, 2.0, 3.0))
    np.testing.assert_array_equal(rc, want)


def test_mosaic_methods(spark):
    spec = G.GridSpec(4, 4, (0, 1, 0, 4, 0, -1), tile=4)
    a = np.zeros((4, 4)); a[0, 0] = 5.0; a[1, 1] = 2.0
    b = np.zeros((4, 4)); b[0, 0] = 3.0; b[2, 2] = 7.0
    ta, tb = _dense_tiles(spark, a, spec), _dense_tiles(spark, b, spec)
    s = tiles_to_canvas(C.mosaic([ta, tb], "sum"), spec)
    np.testing.assert_array_equal(s, a + b)
    m = tiles_to_canvas(C.mosaic([ta, tb], "max"), spec)
    np.testing.assert_array_equal(m, np.maximum(a, b))
    f = tiles_to_canvas(C.mosaic([ta, tb], "first"), spec)
    want = a.copy(); want[b != 0] = np.where(a[b != 0] == 0, b[b != 0], a[b != 0])
    np.testing.assert_array_equal(f, want)


def test_interpolate_at_points(spark):
    spec = G.GridSpec(8, 8, (0.0, 1.0, 0.0, 8.0, 0.0, -1.0), tile=4)
    canvas = np.arange(64, dtype=np.float64).reshape(8, 8)
    tiles = _dense_tiles(spark, canvas, spec)
    # world (2.5, 5.5) -> pixel center (2, 2) exactly -> value 18
    pts = spark.createDataFrame(
        [(0, 2.5, 5.5), (1, 0.5, 7.5), (2, 3.0, 5.0)],
        "pt_id long, x double, y double")
    near = {r["pt_id"]: r["value"]
            for r in C.interpolate_at_points(tiles, spec, pts, "near").collect()}
    assert near[0] == canvas[2, 2] and near[1] == canvas[0, 0]
    bil = {r["pt_id"]: r["value"]
           for r in C.interpolate_at_points(tiles, spec, pts, "bilinear").collect()}
    assert bil[0] == canvas[2, 2]  # exact center: weights collapse
    # (3.0, 5.0) is a pixel corner: average of the 4 surrounding pixels
    assert bil[2] == pytest.approx((canvas[2, 2] + canvas[2, 3]
                                    + canvas[3, 2] + canvas[3, 3]) / 4.0)
