"""Unit tests: mercator math, cell index, WKB codec, geometry kernels.

The three parallel forms (numpy / Column / SQL) of every geo function
must agree bit-for-bit — these tests pin that contract.
"""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.geo import cells, geom, mercator, wkb


# ---------------------------------------------------------------- mercator

def test_mercator_roundtrip():
    lon = np.linspace(-179.9, 179.9, 1000)
    lat = np.linspace(-84.9, 84.9, 1000)
    mx, my = mercator.lonlat_to_meters_np(lon, lat)
    lon2, lat2 = mercator.meters_to_lonlat_np(mx, my)
    np.testing.assert_allclose(lon, lon2, atol=1e-9)
    np.testing.assert_allclose(lat, lat2, atol=1e-9)


def test_mercator_known_values():
    # equator/meridian corners of the square world
    mx, my = mercator.lonlat_to_meters_np(np.array([180.0, 0.0]),
                                          np.array([0.0, mercator.MERCATOR_MAX_LAT]))
    assert abs(mx[0] - mercator.ORIGIN_SHIFT) < 1e-6
    assert abs(my[0]) < 1e-6
    assert abs(my[1] - mercator.ORIGIN_SHIFT) < 1e-3


def test_tile_xy_np_z1():
    tx, ty = mercator.tile_xy_np(np.array([-90.0, 90.0]), np.array([45.0, -45.0]), 1)
    assert list(tx) == [0, 1]
    assert list(ty) == [0, 1]  # XYZ: north row is y=0


def test_tile_math_col_vs_np(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    lon = np.linspace(-179.5, 179.5, 500)
    lat = np.linspace(-79.5, 79.5, 500)
    for z in (3, 8, 12):
        tx_np, ty_np = mercator.tile_xy_np(lon, lat, z)
        pdf = pd.DataFrame({"lon": lon, "lat": lat})
        out = (spark.createDataFrame(pdf)
               .select(mercator.tile_x_col(F.col("lon"), z).alias("tx"),
                       mercator.tile_y_col(F.col("lat"), z).alias("ty"))
               .toPandas())
        np.testing.assert_array_equal(out["tx"].to_numpy(), tx_np)
        np.testing.assert_array_equal(out["ty"].to_numpy(), ty_np)


def test_tile_math_sql_vs_np():
    lon = np.linspace(-179.5, 179.5, 400)
    lat = np.linspace(-79.5, 79.5, 400)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES " +
                ",".join(f"({x!r},{y!r})" for x, y in zip(lon, lat)) +
                ") t(lon, lat)")
    for z in (5, 9):
        tx_np, ty_np = mercator.tile_xy_np(lon, lat, z)
        rows = con.execute(
            f"SELECT {mercator.tile_x_sql('lon', z)}, {mercator.tile_y_sql('lat', z)} FROM pts"
        ).fetchall()
        np.testing.assert_array_equal(np.array([r[0] for r in rows]), tx_np)
        np.testing.assert_array_equal(np.array([r[1] for r in rows]), ty_np)


# ------------------------------------------------------------------- cells

def test_cell_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-80, 80, 2000)
    for res in (3, 7, 12):
        c = cells.cell_encode_np(lon, lat, res)
        tx, ty, r = cells.cell_to_tile_np(c)
        assert (r == res).all()
        tx2, ty2 = mercator.tile_xy_np(lon, lat, res)
        np.testing.assert_array_equal(tx, tx2)
        np.testing.assert_array_equal(ty, ty2)


def test_cell_parent_is_containing():
    lon = np.array([2.35, -74.0, 151.2])
    lat = np.array([48.85, 40.7, -33.87])
    child = cells.cell_encode_np(lon, lat, 10)
    parent = cells.cell_parent_np(child, 1)
    np.testing.assert_array_equal(parent, cells.cell_encode_np(lon, lat, 9))


def test_cell_zorder_locality():
    """Morton ids of a 2x2 block of tiles are 4 consecutive ids."""
    c = cells.cell_from_tile_np(np.array([4, 5, 4, 5]), np.array([6, 6, 7, 7]), 4)
    c.sort()
    assert list(np.diff(c)) == [1, 1, 1]


def test_neighbors_ring():
    c = int(cells.cell_encode_np(np.array([10.0]), np.array([50.0]), 7)[0])
    ring1 = cells.neighbors_np(c, 1)
    assert len(ring1) == 9 and c in ring1
    ring2 = cells.neighbors_np(c, 2)
    assert len(ring2) == 25
    assert set(ring1) <= set(ring2)


def test_cell_sql_matches_np():
    tx = np.arange(0, 128, 7)
    ty = np.arange(0, 128, 7)
    want = cells.cell_from_tile_np(tx, ty, 7)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS tx, unnest(?) AS ty",
                [[int(v) for v in tx], [int(v) for v in ty]])
    got = [r[0] for r in con.execute(
        f"SELECT {cells.cell_from_tile_sql('tx', 'ty', 7)} FROM t").fetchall()]
    np.testing.assert_array_equal(np.array(got), want)


# --------------------------------------------------------------------- wkb

def test_wkb_polygon_roundtrip():
    shell = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    buf = wkb.polygon([shell, hole])
    t, rings = wkb.decode(buf)
    assert t == wkb.POLYGON and len(rings) == 2
    np.testing.assert_array_equal(rings[0], shell)
    assert wkb.geometry_type_name(buf) == "POLYGON"
    assert wkb.as_text(buf).startswith("POLYGON ((0 0, 4 0")


def test_wkb_multipolygon_and_big_endian():
    import struct

    p1 = [np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)]
    mp = wkb.multipolygon([p1, p1])
    t, polys = wkb.decode(mp)
    assert t == wkb.MULTIPOLYGON and len(polys) == 2
    # big-endian point decodes too
    be_pt = struct.pack(">BIdd", 0, 1, 3.5, -2.25)
    t, (x, y) = wkb.decode(be_pt)
    assert (t, x, y) == (wkb.POINT, 3.5, -2.25)


def test_wkb_rejects_zm():
    import struct

    buf = struct.pack("<BIdd", 1, 1001, 0.0, 0.0)  # wkbPointZ
    with pytest.raises(ValueError):
        wkb.decode(buf)


# -------------------------------------------------------------------- geom

def test_pip_square_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    px = np.array([5.0, 2.0, 11.0, 5.0])
    py = np.array([5.0, 2.0, 5.0, 4.5])
    got = geom.points_in_polygon(px, py, [shell, hole])
    assert list(got) == [False, True, False, False]


@settings(max_examples=200, deadline=None)
@given(st.floats(-20, 20), st.floats(-20, 20), st.integers(3, 9),
       st.floats(0.5, 8), st.floats(0, 6.28))
def test_pip_convex_agrees_with_evenodd(cx, cy, nv, r, rot):
    """On convex rings the even-odd kernel and the half-plane kernel
    (the oracle's form) must agree away from the boundary."""
    ang = rot + np.linspace(0, 2 * np.pi, nv, endpoint=False)
    ring = np.column_stack([cx + r * np.cos(ang), cy + 0.8 * r * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    rng = np.random.default_rng(42)
    px = rng.uniform(cx - 2 * r, cx + 2 * r, 300)
    py = rng.uniform(cy - 2 * r, cy + 2 * r, 300)
    a = geom.points_in_ring(px, py, ring)
    b = geom.points_in_convex(px, py, ring)
    # ignore points numerically on the boundary
    d = np.abs(a.astype(int) - b.astype(int))
    disagree = np.nonzero(d)[0]
    for i in disagree:
        # any disagreement must be within float-noise of an edge
        e = min(abs((x2 - x1) * (py[i] - y1) - (y2 - y1) * (px[i] - x1))
                / max(np.hypot(x2 - x1, y2 - y1), 1e-30)
                for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]))
        assert e < 1e-9


def test_convex_halfplane_sql_matches_numpy():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    px = np.array([1.0, 5.0, 3.999, -0.001])
    py = np.array([1.0, 1.0, 3.999, 2.0])
    want = geom.points_in_convex(px, py, ring)
    con = duckdb.connect()
    con.execute("CREATE TABLE p AS SELECT unnest(?) AS x, unnest(?) AS y",
                [px.tolist(), py.tolist()])
    got = [r[0] for r in con.execute(
        f"SELECT {geom.convex_halfplane_sql(ring, 'x', 'y')} FROM p").fetchall()]
    assert got == list(want)


def test_area_length_centroid():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    assert geom.ring_area(sq) == 4.0
    assert geom.polygon_area([sq, np.array([[0.5, 0.5], [1, 0.5], [1, 1], [0.5, 1]], float)]) == pytest.approx(3.75)
    assert geom.line_length(np.array([[0, 0], [3, 4]], float)) == 5.0
    assert geom.ring_centroid(sq) == (1.0, 1.0)


def test_segmentize():
    line = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 3.0]])
    out = geom.segmentize(line, 2.5)
    # 10/2.5 = 4 parts + 3/2.5 -> 2 parts => 1 + 4 + 2 points
    assert len(out) == 7
    d = np.hypot(*np.diff(out, axis=0).T)
    assert d.max() <= 2.5 + 1e-12
    np.testing.assert_array_equal(out[0], line[0])
    np.testing.assert_array_equal(out[-1], line[-1])


def test_clip_ring_bbox():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    out = geom.clip_ring_bbox(sq, 2, 3, 8, 12)
    assert abs(geom.ring_area(out)) == (8 - 2) * (10 - 3)
    # fully inside: unchanged area
    out2 = geom.clip_ring_bbox(sq, -1, -1, 11, 11)
    assert abs(geom.ring_area(out2)) == 100.0
    # fully outside: empty
    out3 = geom.clip_ring_bbox(sq, 20, 20, 30, 30)
    assert len(out3) == 0
    # hypotenuse x+y=4 cuts the [0,3]^2 box; the part of the box beyond
    # the line is the triangle (1,3)-(3,1)-(3,3) of area 2 -> expect 7
    tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], float)
    out4 = geom.clip_ring_bbox(tri, 0, 0, 3, 3)
    assert abs(geom.ring_area(out4)) == 7.0


def test_convex_hull_and_simplify():
    rng = np.random.default_rng(0)
    px, py = rng.uniform(0, 1, 100), rng.uniform(0, 1, 100)
    hull = geom.convex_hull(px, py)
    assert (hull[0] == hull[-1]).all()  # closed ring
    # hull extent == point extent, vertices drawn from the input set
    assert hull[:, 0].min() == px.min() and hull[:, 0].max() == px.max()
    assert hull[:, 1].min() == py.min() and hull[:, 1].max() == py.max()
    pts = {(x, y) for x, y in zip(px, py)}
    assert all((x, y) in pts for x, y in hull[:-1])
    # interior points (shrunk toward centroid) all pass the convex test
    cx, cy = hull[:-1, 0].mean(), hull[:-1, 1].mean()
    ring = hull if geom.ring_area(hull) > 0 else hull[::-1]
    sx = cx + 0.99 * (px - cx)
    sy = cy + 0.99 * (py - cy)
    assert geom.points_in_convex(sx, sy, ring).all()
    line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.3], [4, 0]], float)
    simp = geom.simplify_dp(line, 0.01)
    assert len(simp) == 4  # drops the 0.001 vertex, keeps the 0.3 one


def test_map_coords_nested_geometry_collection():
    """A GeometryCollection containing a GeometryCollection (legal WKB)
    must transform recursively, not die on the encoder lookup."""
    from gdal_spark.geo import wkb as W

    inner = W.collection([W.point(1.0, 2.0),
                          W.linestring([[0.0, 0.0], [3.0, 4.0]])])
    outer = W.collection([W.point(10.0, 20.0), inner])
    out = W.map_coords(outer, lambda xs, ys: (xs + 1.0, ys * 2.0))
    t, kids = W.decode(out)
    assert t == W.GEOMETRYCOLLECTION
    assert kids[0] == (W.POINT, (11.0, 40.0))
    it, ikids = kids[1]
    assert it == W.GEOMETRYCOLLECTION
    assert ikids[0] == (W.POINT, (2.0, 4.0))
    assert ikids[1][1].tolist() == [[1.0, 0.0], [4.0, 8.0]]
