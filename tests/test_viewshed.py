"""Viewshed: distributed == single-node (shared LOS kernel), plus
geometric sanity on constructed terrain."""

import numpy as np

from gdal_spark.raster import grid as G
from gdal_spark.raster import viewshed as V
from tests.test_raster_spark import tiles_to_canvas
from tests.test_sieve import _tiles


def test_viewshed_flat_terrain_all_visible():
    c = np.zeros((32, 32))
    vis = V.viewshed_np(c, 16, 16, obs_height=2.0)
    assert (vis == 1.0).all()


def test_viewshed_wall_shadows():
    c = np.zeros((33, 33))
    c[:, 20] = 50.0  # a tall north-south wall east of the observer
    vis = V.viewshed_np(c, 10, 16, obs_height=2.0)
    # everything west of the wall is visible
    assert (vis[:, :20] == 1.0).all()
    # directly east of the wall along the observer row: hidden
    assert (vis[16, 22:] == 0.0).all()
    # the wall crest itself is visible
    assert vis[16, 20] == 1.0


def test_viewshed_max_distance():
    c = np.zeros((32, 32))
    vis = V.viewshed_np(c, 0, 0, max_distance=10.0, out_of_range=-1.0)
    gy, gx = np.mgrid[0:32, 0:32]
    far = np.hypot(gx, gy) > 10.0
    assert (vis[far] == -1.0).all()
    assert (vis[~far] == 1.0).all()


def test_viewshed_distributed_matches_oracle(spark):
    rng = np.random.default_rng(12)
    spec = G.GridSpec(64, 64, (0, 1, 0, 64, 0, -1), tile=16)
    base = rng.uniform(0, 5, size=(8, 8))
    canvas = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    canvas[30:34, 30:34] = 40.0  # a central butte
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(
        V.viewshed(tiles, spec, ox=5, oy=5, obs_height=2.0), spec)
    want = V.viewshed_np(canvas, 5, 5, obs_height=2.0)
    np.testing.assert_array_equal(got, want)
    assert (want == 0.0).any() and (want == 1.0).any()  # non-trivial


def test_viewshed_distributed_max_distance(spark):
    spec = G.GridSpec(48, 48, (0, 1, 0, 48, 0, -1), tile=16)
    canvas = np.zeros((48, 48))
    canvas[10, 4:7] = 9.0
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(
        V.viewshed(tiles, spec, ox=2, oy=10, obs_height=1.0,
                   max_distance=25.0, out_of_range=-2.0), spec)
    want = V.viewshed_np(canvas, 2, 10, obs_height=1.0,
                         max_distance=25.0, out_of_range=-2.0)
    np.testing.assert_array_equal(got, want)
