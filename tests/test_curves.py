"""Curve geometry classes (WKB 8-12): parsing, linearization
(ogrgeometryfactory.cpp:6020 curveToLineString), and the ingest hooks
(GPKG reader, rasterize/PIP via polygon_rings)."""

import math
import sqlite3
import struct

import numpy as np
import pytest

from gdal_spark.geo import curves as C
from gdal_spark.geo import wkb as W


def test_arc_parameters_match_reference_rules():
    # quarter arc on the unit circle
    ok, R, cx, cy, a0, a1, a2 = C.get_curve_parameters(
        1.0, 0.0, math.sqrt(0.5), math.sqrt(0.5), 0.0, 1.0)
    assert ok and abs(R - 1.0) < 1e-12 and abs(cx) < 1e-12 and abs(cy) < 1e-12
    assert (a0 <= a1 <= a2) or (a0 >= a1 >= a2)
    # aligned points -> not an arc
    ok, *_ = C.get_curve_parameters(0.0, 0.0, 1.0, 1.0, 2.0, 2.0)
    assert not ok
    # start == end -> full circle, ccw, alpha span 2*pi
    ok, R, cx, cy, a0, a1, a2 = C.get_curve_parameters(
        1.0, 0.0, -1.0, 0.0, 1.0, 0.0)
    assert ok and abs(a2 - a0 - 2 * math.pi) < 1e-12


def test_arc_reversal_symmetry_binary_identical():
    """curveToLineString's no-gap guarantee (:6033): swapped endpoints
    yield the exact reversed vertex list."""
    fwd = C.arc_to_points(3.0, 1.0, 5.0, 4.0, 7.5, 0.5)
    rev = C.arc_to_points(7.5, 0.5, 5.0, 4.0, 3.0, 1.0)
    assert fwd == rev[::-1]


def test_circularstring_linearize_radius_and_step():
    cs = W.circularstring([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    t, coords = W.decode(C.linearize(cs))
    assert t == W.LINESTRING
    c = np.asarray(coords)
    np.testing.assert_allclose(np.hypot(c[:, 0], c[:, 1]), 1.0, rtol=1e-12)
    # default 4-degree step over 180 degrees -> ~46 vertices
    assert 40 <= len(c) <= 50
    # finer step -> more vertices
    t2, c2 = W.decode(C.linearize(cs, max_step_deg=1.0))
    assert len(c2) > 3 * len(c) // 2


def test_curvepolygon_full_circle_area():
    cp = W.curvepolygon([W.circularstring(
        [[2.0, 0.0], [-2.0, 0.0], [2.0, 0.0]])])
    t, rings = W.decode(C.linearize(cp))
    assert t == W.POLYGON
    r = np.asarray(rings[0])
    x, y = r[:, 0], r[:, 1]
    area = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    assert abs(area - math.pi * 4.0) < 0.02  # 4-deg chords inscribe
    assert area < math.pi * 4.0              # inscribed, never over


def test_compoundcurve_and_multis():
    cc = W.compoundcurve([
        W.circularstring([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]),
        W.linestring([[2.0, 0.0], [4.0, 0.0]])])
    t, coords = W.decode(C.linearize(cc))
    c = np.asarray(coords)
    assert t == W.LINESTRING and tuple(c[-1]) == (4.0, 0.0)
    mc = W.multicurve([cc, W.linestring([[0.0, 0.0], [1.0, 0.0]])])
    t, lines = W.decode(C.linearize(mc))
    assert t == W.MULTILINESTRING and len(lines) == 2
    ms = W.multisurface([
        W.curvepolygon([W.circularstring(
            [[1.0, 0.0], [-1.0, 0.0], [1.0, 0.0]])]),
        W.polygon([[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]])])
    t, polys = W.decode(C.linearize(ms))
    assert t == W.MULTIPOLYGON and len(polys) == 2


def test_polygon_rings_linearizes_curve_polygons():
    """rasterize/PIP ingest (alg/gdalrasterize.cpp:587-597 analog)."""
    cp = W.curvepolygon([W.circularstring(
        [[1.0, 0.0], [-1.0, 0.0], [1.0, 0.0]])])
    rings = W.polygon_rings(cp)
    assert len(rings) == 1 and len(rings[0][0]) > 40
    with pytest.raises(ValueError, match="Polygon"):
        W.polygon_rings(W.circularstring([[0, 0], [1, 1], [2, 0]]))


def test_gpkg_curve_geometry_roundtrip(spark, tmp_path):
    """A GPKG layer with a CurvePolygon opens and lands as the
    linearized Polygon (reader-side getLinearGeometry policy)."""
    from gdal_spark.sources import geopackage as GP

    path = str(tmp_path / "curves.gpkg")
    con = sqlite3.connect(path)
    con.executescript("""
    PRAGMA application_id = 1196444487;
    CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id INTEGER
      PRIMARY KEY, organization TEXT, organization_coordsys_id INTEGER,
      definition TEXT, description TEXT);
    INSERT INTO gpkg_spatial_ref_sys VALUES
      ('WGS84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL);
    CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY,
      data_type TEXT, identifier TEXT, srs_id INTEGER);
    INSERT INTO gpkg_contents VALUES ('arcs', 'features', 'arcs', 4326);
    CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name
      TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT,
      m TINYINT);
    INSERT INTO gpkg_geometry_columns VALUES
      ('arcs', 'geometry', 'CURVEPOLYGON', 4326, 0, 0);
    CREATE TABLE arcs (fid INTEGER PRIMARY KEY, name TEXT,
      geometry CURVEPOLYGON);
    """)
    cp = W.curvepolygon([W.circularstring(
        [[1.0, 0.0], [-1.0, 0.0], [1.0, 0.0]])])
    blob = b"GP\x00\x01" + struct.pack("<i", 4326) + cp
    con.execute("INSERT INTO arcs VALUES (1, 'disc', ?)", (blob,))
    con.commit()
    con.close()
    df = GP.read_geopackage(spark, path, layer="arcs")
    rows = df.collect()
    assert len(rows) == 1
    t, rings = W.decode(bytes(rows[0]["geom"]))
    assert t == W.POLYGON and len(np.asarray(rings[0])) > 40
