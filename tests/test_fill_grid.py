"""fillnodata + IDW gridding vs single-node oracles."""

import numpy as np

from gdal_spark.raster import focal as FO
from gdal_spark.raster import grid as G
from gdal_spark.raster import gridding as GR
from tests.test_raster_spark import tiles_to_canvas
from tests.test_sieve import _tiles


def test_fillnodata_distributed_matches_oracle(spark):
    rng = np.random.default_rng(4)
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=16)
    canvas = rng.uniform(1, 9, size=(32, 32))
    # punch holes, including one crossing a tile boundary
    canvas[5:8, 14:19] = -1.0
    canvas[20, 20] = -1.0
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(FO.fillnodata(tiles, spec, -1.0, iterations=3), spec)
    want = FO.fillnodata_np(canvas, -1.0, iterations=3)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert (got != -1.0).all()


def test_grid_idw_matches_oracle_and_hits(spark):
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=8)
    pts = [(2.5, 13.5, 10.0),   # exactly on a pixel center node
           (9.1, 6.3, 20.0),
           (14.0, 2.0, 30.0)]
    pdf = spark.createDataFrame(pts, "x double, y double, v double")
    got = tiles_to_canvas(GR.grid_idw(pdf, spec, power=2.0), spec)
    gx, gy = np.meshgrid(np.arange(16, dtype=float), np.arange(16, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    want = GR.idw_np(wx, wy,
                     np.array([p[0] for p in pts]),
                     np.array([p[1] for p in pts]),
                     np.array([p[2] for p in pts]), power=2.0).reshape(16, 16)
    np.testing.assert_array_equal(got, want)
    # the on-node point short-circuits to its exact value
    assert got[2, 2] == 10.0
    # all interpolated values within data range
    assert got.min() >= 10.0 and got.max() <= 30.0


def test_grid_idw_radius_nodata(spark):
    spec = G.GridSpec(8, 8, (0.0, 1.0, 0.0, 8.0, 0.0, -1.0), tile=8)
    pdf = spark.createDataFrame([(0.5, 7.5, 5.0)], "x double, y double, v double")
    got = tiles_to_canvas(GR.grid_idw(pdf, spec, radius=2.0, nodata=-99.0), spec)
    assert got[0, 0] == 5.0
    assert got[7, 7] == -99.0  # far corner outside radius


def test_grid_idw_scatter_matches_broadcast_bitexact(spark):
    """The scale path (per-point tile fan-out, no driver collect) must
    be bit-identical to the broadcast path: both normalize point order
    and out-of-radius candidates get exactly zero weight."""
    rng = np.random.default_rng(11)
    spec = G.GridSpec(40, 24, (0.0, 0.5, 0.0, 12.0, 0.0, -0.5), tile=8)
    n = 300
    pts = list(zip(rng.uniform(-2, 22, n).tolist(),
                   rng.uniform(-2, 14, n).tolist(),
                   rng.uniform(1, 9, n).tolist()))
    pdf = spark.createDataFrame(pts, "x double, y double, v double")
    scatter = tiles_to_canvas(
        GR.grid_idw(pdf, spec, radius=1.7, nodata=-5.0), spec)
    bcast = tiles_to_canvas(
        GR.grid_idw(pdf, spec, radius=1.7, nodata=-5.0,
                    force_broadcast=True), spec)
    np.testing.assert_array_equal(scatter, bcast)
    # and both match the single-node oracle on sorted points (allclose,
    # not equal: the oracle sums zero-weight out-of-radius terms too,
    # which shifts numpy's pairwise-summation tree by an ulp)
    gx, gy = np.meshgrid(np.arange(40, dtype=float), np.arange(24, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    sx, sy, sv = GR.sort_points(np.array([p[0] for p in pts]),
                                np.array([p[1] for p in pts]),
                                np.array([p[2] for p in pts]))
    want = GR.idw_np(wx, wy, sx, sy, sv, power=2.0, radius=1.7,
                     nodata=-5.0).reshape(24, 40)
    np.testing.assert_allclose(scatter, want, rtol=1e-12)


def test_grid_nearest_matches_oracle_and_ties(spark):
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=8)
    # two points equidistant from node center (8.5, 7.5): tie -> min v
    pts = [(6.5, 7.5, 9.0), (10.5, 7.5, 4.0), (2.0, 14.0, 7.0)]
    pdf = spark.createDataFrame(pts, "x double, y double, v double")
    got = tiles_to_canvas(
        GR.grid_nearest(pdf, spec, radius=5.0, nodata=-1.0), spec)
    gx, gy = np.meshgrid(np.arange(16, dtype=float), np.arange(16, dtype=float))
    wx, wy = spec.pixel_center_world(gx.ravel(), gy.ravel())
    sx, sy, sv = GR.sort_points(np.array([p[0] for p in pts]),
                                np.array([p[1] for p in pts]),
                                np.array([p[2] for p in pts]))
    want = GR.nearest_np(wx, wy, sx, sy, sv, radius=5.0,
                         nodata=-1.0).reshape(16, 16)
    np.testing.assert_array_equal(got, want)
    assert got[8, 8] == 4.0  # the tie at (8.5, 7.5) breaks to min v
    bcast = tiles_to_canvas(
        GR.grid_nearest(pdf, spec, radius=5.0, nodata=-1.0,
                        force_broadcast=True), spec)
    np.testing.assert_array_equal(got, bcast)


def test_grid_idw_scatter_all_nodata_region(spark):
    """Tiles no point can reach still emit (full-surface contract)."""
    spec = G.GridSpec(32, 32, (0.0, 1.0, 0.0, 32.0, 0.0, -1.0), tile=8)
    pdf = spark.createDataFrame([(1.0, 31.0, 7.0)], "x double, y double, v double")
    out = GR.grid_idw(pdf, spec, radius=3.0, nodata=-1.0)
    assert out.count() == 16  # every tile present
    canvas = tiles_to_canvas(out, spec)
    assert canvas[0, 0] != -1.0
    assert (canvas[16:, 16:] == -1.0).all()
