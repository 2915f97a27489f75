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


def test_viewshed_bilinear_support_margin(spark):
    """ADVICE r2 repro: a terrain spike whose pixel sits one bilinear
    support step outside the exact ray hull of a far target tile. The
    gather must include it or those targets flip to visible."""
    spec = G.GridSpec(64, 64, (0, 1, 0, 64, 0, -1), tile=16)
    canvas = np.zeros((64, 64))
    canvas[16, 48] = 80.0  # spike at pixel (x=48, y=16) = tile (1, 3)
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(
        V.viewshed(tiles, spec, ox=51, oy=5, obs_height=2.0), spec)
    want = V.viewshed_np(canvas, 51, 5, obs_height=2.0)
    np.testing.assert_array_equal(got, want)
    assert (want == 0.0).any()  # the spike casts a shadow


def test_viewshed_boundary_adversarial_observers(spark):
    """Spikes placed exactly on tile boundaries, observers near tile
    corners: distributed must stay bit-identical to the oracle."""
    spec = G.GridSpec(48, 48, (0, 1, 0, 48, 0, -1), tile=16)
    canvas = np.zeros((48, 48))
    for xy in (15, 16, 17, 31, 32, 33):
        canvas[xy, xy] = 25.0
        canvas[xy, 47 - xy] = 25.0
    tiles = _tiles(spark, canvas, spec)
    for ox, oy in ((0, 0), (15, 16), (32, 31), (47, 0), (1, 46)):
        got = tiles_to_canvas(
            V.viewshed(tiles, spec, ox=ox, oy=oy, obs_height=1.5), spec)
        want = V.viewshed_np(canvas, ox, oy, obs_height=1.5)
        np.testing.assert_array_equal(got, want)
