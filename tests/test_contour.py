"""Contour (marching squares) — distributed segment set == single-node."""

import numpy as np

from gdal_spark.raster import contour as CN
from gdal_spark.raster import grid as G
from tests.test_sieve import _tiles


def _segset(rows):
    out = set()
    for r in rows:
        a = (round(r[1], 9), round(r[2], 9))
        b = (round(r[3], 9), round(r[4], 9))
        out.add((r[0],) + tuple(sorted([a, b])))
    return out


def test_contour_distributed_matches_oracle(spark):
    rng = np.random.default_rng(13)
    spec = G.GridSpec(48, 32, (0, 1, 0, 32, 0, -1), tile=16)
    canvas = rng.uniform(0, 10, size=(32, 48))
    levels = [2.5, 5.0, 7.5]
    tiles = _tiles(spark, canvas, spec)
    got = _segset([tuple(r) for r in CN.contour(tiles, spec, levels).collect()])
    want = _segset(CN.contour_segments_np(canvas, levels))
    assert got == want
    assert len(want) > 100


def test_contour_cone_is_closed_ring():
    """Iso-lines of a radial cone: every crossing point lies near the
    expected radius and the segments chain into one closed loop."""
    gy, gx = np.mgrid[0:33, 0:33]
    canvas = 16.0 - np.hypot(gx - 16, gy - 16)
    segs = CN.contour_segments_np(canvas, [8.0])
    assert segs
    pts = []
    for _, x1, y1, x2, y2 in segs:
        pts += [(x1, y1), (x2, y2)]
    r = np.hypot(np.array([p[0] for p in pts]) - 16.5,
                 np.array([p[1] for p in pts]) - 16.5)
    np.testing.assert_allclose(r, 8.0, atol=0.45)
    # closed loop: every endpoint appears exactly twice
    from collections import Counter
    c = Counter((round(x, 9), round(y, 9)) for x, y in pts)
    assert all(v == 2 for v in c.values())


def test_contour_polylines_chain(spark):
    """Distributed chained polylines: the cone's level-8 iso-line must
    assemble into exactly ONE closed ring whose length ~ 2*pi*8."""
    gy, gx = np.mgrid[0:33, 0:33]
    canvas = 16.0 - np.hypot(gx - 16, gy - 16)
    spec = G.GridSpec(33, 33, (0, 1, 0, 0, 0, 1), tile=11)
    # pad to 33x33 with 11px tiles -> 3x3 full tiles
    tiles = _tiles(spark, canvas, spec)
    rows = CN.contour_polylines(tiles, spec, [8.0]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["closed"] and r["level"] == 8.0
    assert abs(r["length"] - 2 * np.pi * 8) < 0.35
    from gdal_spark.geo import wkb
    t, coords = wkb.decode(bytes(r["geom"]))
    assert t == wkb.LINESTRING and len(coords) == r["n_points"]


def test_contour_open_lines_at_border(spark):
    """A linear ramp's iso-line crosses the whole raster: one OPEN
    polyline from border to border."""
    gy, gx = np.mgrid[0:16, 0:16]
    canvas = gx.astype(float)
    spec = G.GridSpec(16, 16, (0, 1, 0, 0, 0, 1), tile=8)
    rows = CN.contour_polylines(_tiles(spark, canvas, spec), spec, [7.3]).collect()
    assert len(rows) == 1 and not rows[0]["closed"]
    assert rows[0]["length"] == 15.0  # 15 unit steps down the column


def test_contour_saddle_consistency():
    """The saddle rule must not drop or duplicate crossings."""
    canvas = np.array([[9.0, 1.0], [1.0, 9.0]])
    segs = CN.contour_segments_np(canvas, [5.0])
    assert len(segs) == 2  # two segments, one per corner pair
    canvas2 = np.array([[1.0, 9.0], [9.0, 1.0]])
    segs2 = CN.contour_segments_np(canvas2, [5.0])
    assert len(segs2) == 2
