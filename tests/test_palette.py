"""Median-cut palette (alg/gdalmediancut.cpp analog), nearest-entry
palettization, and the gdaltindex footprint relation."""

import numpy as np
import pytest

from gdal_spark.geo import geom, wkb
from gdal_spark.raster import grid as G
from gdal_spark.raster import palette as PAL

TS = 16


def _rgb(spark, colors):
    """One tile whose pixels cycle through the given colors."""
    n = TS * TS
    r = [float(colors[i % len(colors)][0]) for i in range(n)]
    g = [float(colors[i % len(colors)][1]) for i in range(n)]
    b = [float(colors[i % len(colors)][2]) for i in range(n)]
    return spark.createDataFrame(
        [(0, 0, r, g, b)],
        "tile_y int, tile_x int, r array<double>, g array<double>, "
        "b array<double>")


def test_median_cut_recovers_distinct_colors(spark):
    colors = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (128, 128, 0)]
    rgb = _rgb(spark, colors)
    pal = PAL.compute_median_cut_pct(rgb, n_colors=4)
    assert pal.shape == (4, 3)
    # every source color has a palette entry within the 5-bit bin width
    for c in colors:
        d = np.abs(pal.astype(int) - np.array(c)).max(axis=1).min()
        assert d <= 8, (c, pal)


def test_rgb_to_pct_assignment(spark):
    colors = [(250, 10, 10), (10, 250, 10)]
    rgb = _rgb(spark, colors)
    pal = np.array([[250, 10, 10], [10, 250, 10]], np.uint8)
    idx = PAL.rgb_to_pct(rgb, pal)
    [row] = idx.collect()
    got = np.asarray(row.px, int)
    assert set(got) == {0, 1}
    assert got[0] == 0 and got[1] == 1  # alternating pattern preserved


def test_palette_caps_at_requested_size(spark):
    rng = np.random.default_rng(2)
    n = TS * TS
    df = spark.createDataFrame(
        [(0, 0, rng.integers(0, 256, n).astype(float).tolist(),
          rng.integers(0, 256, n).astype(float).tolist(),
          rng.integers(0, 256, n).astype(float).tolist())],
        "tile_y int, tile_x int, r array<double>, g array<double>, "
        "b array<double>")
    pal = PAL.compute_median_cut_pct(df, n_colors=16)
    assert pal.shape[0] == 16


def test_tile_index_footprints(spark):
    spec = G.GridSpec(width=40, height=35,
                      gt=(100.0, 0.5, 0.0, 60.0, 0.0, -0.5),
                      crs="EPSG:4326", tile=TS)
    tiles = spark.createDataFrame(
        [(ty, tx, [0.0]) for ty in range(3) for tx in range(3)],
        G.TILE_SCHEMA)
    out = {(r.tile_y, r.tile_x): bytes(r.geom)
           for r in PAL.tile_index(tiles, spec).collect()}
    t, rings = wkb.decode(out[(0, 0)])
    assert abs(geom.ring_area(rings[0])) == pytest.approx(
        (TS * 0.5) ** 2)
    # edge tile footprint is clipped to the raster extent
    t2, rings2 = wkb.decode(out[(2, 2)])
    assert abs(geom.ring_area(rings2[0])) == pytest.approx(
        (8 * 0.5) * (3 * 0.5))  # 40-32=8 cols x 35-32=3 rows


def test_dither_rgb_kernel_semantics():
    """gdaldither.cpp error-diffusion rules: trunc-/6 weights, four
    neighbors, per-row error carry, exact-palette zero error."""
    import numpy as np

    from gdal_spark.raster.palette import dither_rgb_np

    pal = np.array([[0, 0, 0], [255, 255, 255]])
    g = np.full((1, 4), 128, np.uint8)
    assert dither_rgb_np(g, g, g, pal).tolist() == [[1, 0, 1, 0]]
    exact = np.array([[0, 255], [255, 0]], np.uint8)
    assert dither_rgb_np(exact, exact, exact, pal).tolist() == \
        [[0, 1], [1, 0]]
    # a flat mid-gray field dithers to ~50% coverage
    g = np.full((48, 48), 128, np.uint8)
    assert 0.45 < dither_rgb_np(g, g, g, pal).mean() < 0.55


def test_rgb_to_pct_dithered_distributed(spark):
    """Driver-side exact FS (budget-guarded) over the tile relation:
    tiles round-trip through the canvas and back; index stats match
    the kernel run directly."""
    import numpy as np
    import pytest

    from gdal_spark.raster import grid as G
    from gdal_spark.raster.palette import (dither_rgb_np,
                                           rgb_to_pct_dithered)

    rng = np.random.default_rng(5)
    spec = G.GridSpec(32, 16, (0, 1, 0, 16, 0, -1), tile=8)
    full = {c: rng.integers(0, 256, (16, 32)).astype(np.uint8)
            for c in "rgb"}
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            h, w = spec.tile_shape(ty, tx)
            rows.append((ty, tx) + tuple(
                full[c][ty * 8:ty * 8 + h, tx * 8:tx * 8 + w]
                .astype(float).ravel().tolist() for c in "rgb"))
    rgb = spark.createDataFrame(
        rows, "tile_y int, tile_x int, r array<double>, "
              "g array<double>, b array<double>")
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [255, 255, 255]])
    got_tiles = rgb_to_pct_dithered(rgb, spec, pal).collect()
    want = dither_rgb_np(full["r"], full["g"], full["b"], pal)
    got = np.zeros((16, 32))
    for r in got_tiles:
        h, w = spec.tile_shape(r.tile_y, r.tile_x)
        got[r.tile_y * 8:r.tile_y * 8 + h,
            r.tile_x * 8:r.tile_x * 8 + w] = \
            np.asarray(r.px).reshape(h, w)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="sequential"):
        rgb_to_pct_dithered(rgb, spec, pal, max_pixels=10)
