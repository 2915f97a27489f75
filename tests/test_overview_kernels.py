"""Gauss + cubic overview kernels (gcore/overview.cpp:1996/3393)."""

import numpy as np

from gdal_spark.raster import focal as FO
from gdal_spark.raster import grid as G
from gdal_spark.raster import pyramid as P
from tests.test_raster_spark import tiles_to_canvas
from tests.test_sieve import _tiles


def test_gauss_overview_matches_convolve_then_sample(spark):
    zoom, tile = 2, 16  # 64px world, 4x4 tiles
    spec = G.world_3857(zoom, tile)
    rng = np.random.default_rng(6)
    canvas = rng.integers(0, 50, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(P.overview_level(tiles, zoom, "gauss", tile),
                          G.world_3857(zoom - 1, tile))
    want = FO.focal_np(canvas, "gauss3x3")[::2, ::2]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_gauss_overview_preserves_constant(spark):
    zoom, tile = 1, 16
    spec = G.world_3857(zoom, tile)
    tiles = _tiles(spark, np.full((32, 32), 6.0), spec)
    got = tiles_to_canvas(P.overview_level(tiles, zoom, "gauss", tile),
                          G.world_3857(0, tile))
    np.testing.assert_allclose(got, 6.0, rtol=1e-12)


def test_cubic_overview_reproduces_linear_ramp(spark):
    zoom, tile = 2, 16
    spec = G.world_3857(zoom, tile)
    gy, gx = np.mgrid[0:64, 0:64]
    canvas = 3.0 * gx + 2.0 * gy + 5.0
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(P.overview_level(tiles, zoom, "cubic", tile),
                          G.world_3857(zoom - 1, tile))
    # dst pixel (i, j) samples src position (2j + 0.5, 2i + 0.5) in
    # value space: ramp(2j + 0.5, 2i + 0.5); borders where the 4x4
    # support leaves the raster emit 0 (documented)
    di, dj = np.mgrid[0:32, 0:32]
    want = 3.0 * (2 * dj + 0.5) + 2.0 * (2 * di + 0.5) + 5.0
    interior = (slice(1, 31), slice(1, 31))
    np.testing.assert_allclose(got[interior], want[interior], rtol=1e-10)
    assert got[0, 0] == 0.0  # support off-raster -> nodata
