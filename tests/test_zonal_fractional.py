"""FRACTIONAL zonal statistics (alg/zonal.cpp:346): distributed ==
single-node, plus the exact-partition analytic oracle (pixel coverage
fractions of a polygon sum to its area)."""

import numpy as np
import pytest

from gdal_spark.raster import grid as G
from gdal_spark.raster import zonal as Z
from tests.test_sieve import _tiles


def _ccw(pts):
    r = np.asarray(pts, np.float64)
    return np.vstack([r, r[:1]])


SPEC = G.GridSpec(64, 64, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0), tile=16)

ZONES = [
    (1, _ccw([(3.3, 5.7), (20.9, 8.1), (15.2, 25.6)])),          # triangle
    (2, _ccw([(30.5, 30.5), (50.5, 30.5), (50.5, 50.5),
              (30.5, 50.5)])),                                    # square
    (3, _ccw([(10.25, 40.75), (26.5, 35.25), (33.75, 48.5),
              (18.0, 58.9)])),                                    # quad
]


def _ring_area(r):
    return 0.5 * abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))


def test_fraction_partition_identity():
    """Coverage fractions over the full grid sum EXACTLY (to float
    accumulation) to the polygon's area — the independent oracle for
    the clipping kernel."""
    canvas = np.ones((64, 64))
    for pid, ring in ZONES:
        frac = Z._fractions_np(canvas, 0.0, 64.0, 1.0, -1.0, ring)
        assert np.isclose(frac.sum(), _ring_area(ring), rtol=1e-12)
        assert (frac >= 0).all() and (frac <= 1 + 1e-12).all()


def test_fraction_aligned_square_exact():
    """A pixel-aligned square covers whole pixels with fraction 1."""
    ring = _ccw([(8.0, 8.0), (16.0, 8.0), (16.0, 16.0), (8.0, 16.0)])
    frac = Z._fractions_np(np.ones((64, 64)), 0.0, 64.0, 1.0, -1.0, ring)
    assert frac.sum() == 64.0
    assert ((frac == 0.0) | (frac == 1.0)).all()


def test_zonal_fractional_distributed_matches_oracle(spark):
    rng = np.random.default_rng(17)
    canvas = rng.integers(0, 100, size=(64, 64)).astype(np.float64)
    tiles = _tiles(spark, canvas, SPEC)
    got = {r["poly_id"]: r
           for r in Z.zonal_stats_fractional(tiles, SPEC, ZONES).collect()}
    want = Z.zonal_fractional_np(canvas, SPEC, ZONES)
    assert set(got) == set(want)
    for pid, w in want.items():
        g = got[pid]
        assert g["w_count"] == pytest.approx(w["w_count"], rel=1e-12)
        assert g["w_sum"] == pytest.approx(w["w_sum"], rel=1e-12)
        assert g["w_mean"] == pytest.approx(w["w_mean"], rel=1e-12)
        assert g["vmin"] == w["vmin"] and g["vmax"] == w["vmax"]


def test_zonal_fractional_weighted_sum_of_constant_band(spark):
    """With a constant band v, w_sum == v * polygon_area / pixel_area
    (FRACTIONAL semantics, alg/zonal.cpp:346) — independent of tiling."""
    tiles = _tiles(spark, np.full((64, 64), 7.0), SPEC)
    rows = {r["poly_id"]: r
            for r in Z.zonal_stats_fractional(tiles, SPEC, ZONES).collect()}
    for pid, ring in ZONES:
        assert rows[pid]["w_sum"] == pytest.approx(
            7.0 * _ring_area(ring), rel=1e-11)
        assert rows[pid]["w_mean"] == pytest.approx(7.0, rel=1e-12)
