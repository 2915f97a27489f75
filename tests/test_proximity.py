"""Proximity: ring scale path == broadcast path == single-node oracle."""

import numpy as np

from gdal_spark.raster import grid as G
from gdal_spark.raster import proximity as PX
from tests.test_raster_spark import tiles_to_canvas
from tests.test_sieve import _tiles


def _canvas(seed=7, shape=(32, 48), n_targets=9):
    rng = np.random.default_rng(seed)
    c = np.zeros(shape)
    ys = rng.integers(0, shape[0], n_targets)
    xs = rng.integers(0, shape[1], n_targets)
    c[ys, xs] = 1.0
    return c


def test_proximity_ring_matches_broadcast_bitexact(spark):
    spec = G.GridSpec(48, 32, (0, 1, 0, 32, 0, -1), tile=8)
    c = _canvas()
    tiles = _tiles(spark, c, spec)
    ring = tiles_to_canvas(
        PX.proximity(tiles, spec, strategy="ring"), spec)
    bcast = tiles_to_canvas(
        PX.proximity(tiles, spec, strategy="broadcast"), spec)
    np.testing.assert_array_equal(ring, bcast)
    want = PX.proximity_np(c)
    np.testing.assert_array_equal(ring, want)


def test_proximity_ring_max_dist_nodata_tiles(spark):
    """Finite max_dist: tiles beyond the gather cap emit pure nodata,
    identically to the broadcast path."""
    spec = G.GridSpec(64, 64, (0, 1, 0, 64, 0, -1), tile=8)
    c = np.zeros((64, 64))
    c[2, 3] = 1.0  # single target in the NW corner
    tiles = _tiles(spark, c, spec)
    ring = tiles_to_canvas(
        PX.proximity(tiles, spec, max_dist=10.0, nodata=-7.0,
                     strategy="ring"), spec)
    bcast = tiles_to_canvas(
        PX.proximity(tiles, spec, max_dist=10.0, nodata=-7.0,
                     strategy="broadcast"), spec)
    np.testing.assert_array_equal(ring, bcast)
    assert ring[2, 3] == 0.0
    assert (ring[40:, 40:] == -7.0).all()
    want = PX.proximity_np(c, max_dist=10.0, nodata=-7.0)
    np.testing.assert_array_equal(ring, want)


def test_proximity_ring_no_targets(spark):
    spec = G.GridSpec(16, 16, (0, 1, 0, 16, 0, -1), tile=8)
    tiles = _tiles(spark, np.zeros((16, 16)), spec)
    out = tiles_to_canvas(
        PX.proximity(tiles, spec, nodata=-1.0, strategy="ring"), spec)
    assert (out == -1.0).all()


def test_proximity_ring_dense_targets(spark):
    """Every tile holds a target (r0 == 0 everywhere): the gather stays
    local and results still match."""
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=8)
    rng = np.random.default_rng(3)
    c = (rng.uniform(size=(32, 32)) < 0.2).astype(float)
    tiles = _tiles(spark, c, spec)
    ring = tiles_to_canvas(PX.proximity(tiles, spec, strategy="ring"), spec)
    np.testing.assert_array_equal(ring, PX.proximity_np(c))
