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


# ---------------------------------------------------------------------
# POLYGONIZE mode (GDALContourGenerateEx POLYGONIZE; ring assembly
# segment_merger.h, nesting polygon_ring_appender.h)
# ---------------------------------------------------------------------

def _px_df(spark, canvas):
    iy, ix = np.nonzero(canvas)
    rows = [(int(x), int(y), float(canvas[y, x])) for y, x in zip(iy, ix)]
    return spark.createDataFrame(rows, "gx long, gy long, v double")


def test_contour_polygons_np_partitions_domain():
    """Iso-polygons must PARTITION the frame: net region areas sum to
    (W-1)*(H-1) exactly, every slot's boundary closes into rings, and
    every hole finds an enclosing shell (saddle-heavy random input)."""
    rng = np.random.default_rng(7)
    canvas = rng.uniform(0, 10, size=(24, 40))
    levels = [2.5, 5.0, 7.5]
    polys = CN.contour_polygons_np(canvas, levels)
    total = 0.0
    for slot, plist in polys.items():
        for shell, holes in plist:
            area = -CN.ring_signed_area(shell) - sum(
                CN.ring_signed_area(h) for h in holes)
            assert area > 0
            total += area
    np.testing.assert_allclose(total, 39 * 23, rtol=1e-12)


def test_contour_polygons_cone_hole_nesting():
    """Radial cone at one level: slot 1 is the disk (no holes), slot 0
    is the frame with the disk as a HOLE."""
    gy, gx = np.mgrid[0:33, 0:33]
    canvas = 16.0 - np.hypot(gx - 16, gy - 16)
    polys = CN.contour_polygons_np(canvas, [8.0])
    assert sorted(polys) == [0, 1]
    (shell1, holes1), = polys[1]
    assert not holes1 and -CN.ring_signed_area(shell1) > 0
    (shell0, holes0), = polys[0]
    assert len(holes0) == 1
    disk = -CN.ring_signed_area(shell1)
    np.testing.assert_allclose(CN.ring_signed_area(holes0[0]), disk,
                               rtol=1e-12)
    np.testing.assert_allclose(-CN.ring_signed_area(shell0) - disk
                               + disk, 32.0 * 32.0, rtol=1e-12)


def _boundary_multiset(rows):
    from collections import Counter
    return Counter((r[0], round(r[1], 9), round(r[2], 9),
                    round(r[3], 9), round(r[4], 9)) for r in rows)


def test_contour_polygon_boundary_distributed_matches_np(spark):
    rng = np.random.default_rng(42)
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=16)
    canvas = rng.uniform(0, 10, size=(32, 32))
    levels = [3.0, 6.0]
    tiles = _tiles(spark, canvas, spec)
    px = _px_df(spark, canvas)
    got = _boundary_multiset(
        [tuple(r) for r in
         CN.contour_polygon_boundary(tiles, px, spec, levels).collect()])
    want = _boundary_multiset(CN.slot_boundary_np(canvas, levels))
    assert got == want


def test_contour_ring_edges_preserve_multiset_and_close(spark):
    """Distributed ring assembly: edge multiset unchanged, every ring
    closed (seq wraps), per-slot ring rows equal the single-node ones."""
    rng = np.random.default_rng(5)
    spec = G.GridSpec(32, 16, (0, 1, 0, 16, 0, -1), tile=16)
    canvas = rng.uniform(0, 4, size=(16, 32))
    levels = [1.0, 2.0, 3.0]
    tiles = _tiles(spark, canvas, spec)
    px = _px_df(spark, canvas)
    boundary = CN.contour_polygon_boundary(tiles, px, spec, levels)
    edges = CN.contour_ring_edges(boundary).collect()
    got = _boundary_multiset([(r["slot"], r["x1"], r["y1"],
                               r["x2"], r["y2"]) for r in edges])
    want = _boundary_multiset(CN.slot_boundary_np(canvas, levels))
    assert got == want

    # per-ring: walk closes (last end == first start within each ring)
    from collections import defaultdict
    by_ring = defaultdict(list)
    for r in edges:
        by_ring[(r["slot"], r["ring_id"])].append(r)
    for k, es in by_ring.items():
        es.sort(key=lambda r: r["seq"])
        assert (es[-1]["x2"], es[-1]["y2"]) == (es[0]["x1"], es[0]["y1"])
        for a, b in zip(es, es[1:]):
            assert (a["x2"], a["y2"]) == (b["x1"], b["y1"])


def test_contour_polygons_distributed_matches_np(spark):
    gy, gx = np.mgrid[0:32, 0:32]
    canvas = (16.0 - np.hypot(gx - 15.5, gy - 15.5)).clip(0)
    spec = G.GridSpec(32, 32, (0, 1, 0, 32, 0, -1), tile=16)
    levels = [4.0, 9.0]
    tiles = _tiles(spark, canvas, spec)
    px = _px_df(spark, canvas)
    boundary = CN.contour_polygon_boundary(tiles, px, spec, levels)
    rows = CN.contour_polygons(boundary).collect()
    want = CN.contour_polygons_np(canvas, levels)
    got_by_slot = {}
    for r in rows:
        got_by_slot.setdefault(r["slot"], []).append(r)
    assert sorted(got_by_slot) == sorted(want)
    from gdal_spark.geo import wkb
    for slot, plist in want.items():
        wa = sorted(round(-CN.ring_signed_area(s)
                          - sum(CN.ring_signed_area(h) for h in hs), 9)
                    for s, hs in plist)
        ga = sorted(round(r["area"], 9) for r in got_by_slot[slot])
        assert wa == ga
        for r in got_by_slot[slot]:
            t, _ = wkb.decode(bytes(r["geom"]))
            assert t == wkb.POLYGON
