"""Sieve filter: distributed == single-node cascade, GDAL semantics."""

import numpy as np

from gdal_spark.raster import grid as G
from gdal_spark.raster import sieve as SV
from tests.test_raster_spark import tiles_to_canvas


def _tiles(spark, canvas, spec):
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            h, w = spec.tile_shape(ty, tx)
            sub = canvas[ty * spec.tile:ty * spec.tile + h,
                         tx * spec.tile:tx * spec.tile + w]
            rows.append((ty, tx, sub.ravel().tolist()))
    return spark.createDataFrame(rows, "tile_y int, tile_x int, px array<double>")


def test_sieve_simple_semantics():
    # one big region (value 1) with a 2-px island (value 2) inside
    c = np.ones((8, 8))
    c[3, 3] = c[3, 4] = 2.0
    out = SV.sieve_np(c, threshold=3)
    assert (out == 1.0).all()
    # threshold 2 keeps the island
    out2 = SV.sieve_np(c, threshold=2)
    assert out2[3, 3] == 2.0


def test_sieve_merges_into_largest_neighbor():
    c = np.zeros((6, 10))
    c[:, :4] = 5.0          # 24 px
    c[:, 4:6] = 7.0         # 12 px small-ish
    c[:, 6:] = 9.0          # 24 px
    out = SV.sieve_np(c, threshold=13)
    # the 7-region borders both; sizes tie (24, 24) -> larger value wins
    assert (out[:, 4:6] == 9.0).all()
    assert (out[:, :4] == 5.0).all()


def test_sieve_background_untouched():
    c = np.zeros((6, 6))
    c[2, 2] = 3.0
    out = SV.sieve_np(c, threshold=5)
    assert out[2, 2] == 3.0  # isolated (only background neighbors): kept
    assert (out == c).all()


def test_sieve_distributed_matches_oracle(spark):
    rng = np.random.default_rng(9)
    spec = G.GridSpec(48, 32, (0, 1, 0, 32, 0, -1), tile=16)
    # blocky random regions so components span tiles
    base = rng.integers(0, 3, size=(8, 12)).astype(np.float64)
    canvas = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
    # sprinkle small islands
    for _ in range(25):
        y, x = rng.integers(0, 31), rng.integers(0, 47)
        canvas[y, x] = rng.integers(1, 4)
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(SV.sieve(tiles, spec, threshold=6), spec)
    want = SV.sieve_np(canvas, threshold=6)
    np.testing.assert_array_equal(got, want)


def test_sieve_distributed_merge_matches_driver_path(spark):
    """Forcing the large-star/small-star merge must give the same
    raster as the driver union-find path and the single-node oracle."""
    rng = np.random.default_rng(13)
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=8)
    base = rng.integers(0, 3, size=(8, 8)).astype(np.float64)
    canvas = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
    for _ in range(15):
        y, x = rng.integers(0, 31), rng.integers(0, 31)
        canvas[y, x] = rng.integers(1, 4)
    tiles = _tiles(spark, canvas, spec)
    got = tiles_to_canvas(
        SV.sieve(tiles, spec, threshold=6, distributed_merge=True), spec)
    np.testing.assert_array_equal(got, SV.sieve_np(canvas, threshold=6))


def test_sieve_cascade_until_stable(spark):
    """A chain of small same-size components must cascade into the big
    region regardless of merge order."""
    c = np.zeros((4, 16))
    c[:, :8] = 1.0
    c[0, 8] = 2.0
    c[0, 9] = 3.0
    out = SV.sieve_np(c, threshold=4)
    assert (out[:, :8] == 1.0).all()
    assert out[0, 8] == 1.0 and out[0, 9] == 1.0


def test_sieve_worstcase_speckle_distributed(spark):
    """Worst-case speckle raster: thousands of 1-px components. The
    distributed cascade must (a) match the single-node oracle exactly
    and (b) factor into MANY independent interaction groups whose max
    size is far below the total component count — the property that
    makes the per-group executor tasks scale (nothing is collected to
    the driver at any group size)."""
    rng = np.random.default_rng(33)
    spec = G.GridSpec(64, 64, (0, 1, 0, 64, 0, -1), tile=16)
    # checkerboard-ish speckle: values 1..4, plus solid anchor stripes
    canvas = rng.integers(1, 5, size=(64, 64)).astype(np.float64)
    canvas[::8, :] = 9.0  # big stripes every 8 rows anchor the merges
    got = tiles_to_canvas(SV.sieve(_tiles(spark, canvas, spec), spec,
                                   threshold=3), spec)
    want = SV.sieve_np(canvas, threshold=3)
    np.testing.assert_array_equal(got, want)
    # structural scale evidence: stripes partition the speckle into
    # independent bands, so >= 7 interaction groups exist by design
    from gdal_spark.raster.polygonize import label_tile_np
    labels = label_tile_np(canvas, False)
    assert labels.max() > 500  # genuinely speckled
