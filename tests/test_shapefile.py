"""Shapefile codec round-trips (shapelib/shpopen.c + dbfopen.c layout,
shape2ogr.cpp ring-orientation polygon assembly)."""

import struct

import numpy as np
import pytest

from gdal_spark.geo import geom, wkb
from gdal_spark.sources import shapefile as SHP


def _mkdf(spark):
    sq = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
    donut = [np.array([[10, 10], [18, 10], [18, 18], [10, 18], [10, 10]],
                      float),
             np.array([[12, 12], [12, 14], [14, 14], [14, 12], [12, 12]],
                      float)]
    rows = [
        (1, "alpha", 1.5, True, wkb.point(1.25, -2.5)),
        (2, "beta", -0.25, False,
         wkb.linestring(np.array([[0, 0], [2, 1], [4, 0]], float))),
        (3, "gamma", 99.0, True, wkb.polygon(sq)),
        (4, "delta", 0.0, False, wkb.multipolygon([sq, donut])),
        (5, "empty", None, None, None),
        (6, "mls", 7.0, True, wkb.multilinestring(
            [np.array([[0, 0], [1, 1]], float),
             np.array([[2, 2], [3, 3]], float)])),
        (7, "mpt", 8.0, False,
         wkb.multipoint(np.array([[5, 5], [6, 6]], float))),
    ]
    return spark.createDataFrame(
        rows, "fid long, name string, score double, flag boolean, geom binary")


def test_write_read_roundtrip(spark, tmp_path):
    df = _mkdf(spark)
    # one layer per geometry class (shapefiles are single-type layers)
    for ids, tag in [((1,), "pt"), ((2, 6), "ln"), ((3, 4), "pg"),
                     ((7,), "mp")]:
        sub = df.filter(df.fid.isin(*ids))
        base = str(tmp_path / tag)
        SHP.write_shapefile(sub, base)
        back = SHP.read_shapefile(spark, base + ".shp")
        got = {r.fid: r for r in back.collect()}
        want = {r.fid: r for r in sub.collect()}
        assert set(got) == set(want)
        for fid in want:
            assert got[fid].name == want[fid].name
            assert got[fid].score == want[fid].score
            assert got[fid].flag == want[fid].flag


def test_polygon_hole_roundtrip(spark, tmp_path):
    donut = [np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], float),
             np.array([[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]], float)]
    df = spark.createDataFrame([(1, wkb.polygon(donut))],
                               "fid long, geom binary")
    base = str(tmp_path / "donut")
    SHP.write_shapefile(df, base)
    [r] = SHP.read_shapefile(spark, base + ".shp").collect()
    t, rings = wkb.decode(bytes(r.geom))
    assert t == wkb.POLYGON and len(rings) == 2
    # area accounts for the hole either way the rings come back
    area = sum(geom.ring_area(rg) for rg in rings)
    assert abs(area) == pytest.approx(64 - 4)


def test_null_geometry_record(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", wkb.point(0.0, 0.0)), (2, "b", None)],
        "fid long, name string, geom binary")
    base = str(tmp_path / "nulls")
    SHP.write_shapefile(df, base)
    got = {r.fid: r.geom for r in
           SHP.read_shapefile(spark, base + ".shp").collect()}
    assert got[2] is None and got[1] is not None


def test_multi_pair_directory_parallel_read(spark, tmp_path):
    for i in range(3):
        df = spark.createDataFrame(
            [(i * 10 + j, f"f{i}", wkb.point(float(i), float(j)))
             for j in range(4)],
            "fid long, name string, geom binary")
        SHP.write_shapefile(df, str(tmp_path / f"part{i}"))
    back = SHP.read_shapefile(spark, str(tmp_path))
    assert back.count() == 12
    assert back.select("name").distinct().count() == 3
    # one input task per file pair
    assert back.rdd.getNumPartitions() >= 1


def test_shp_header_and_shx(spark, tmp_path):
    df = spark.createDataFrame([(1, wkb.point(3.0, 4.0))],
                               "fid long, geom binary")
    base = str(tmp_path / "hdr")
    SHP.write_shapefile(df, base)
    shp = open(base + ".shp", "rb").read()
    assert struct.unpack_from(">i", shp, 0)[0] == 9994
    assert struct.unpack_from("<i", shp, 28)[0] == 1000
    assert struct.unpack_from("<i", shp, 32)[0] == SHP.SHP_POINT
    assert struct.unpack_from("<4d", shp, 36) == (3.0, 4.0, 3.0, 4.0)
    assert struct.unpack_from(">i", shp, 24)[0] * 2 == len(shp)
    shx = open(base + ".shx", "rb").read()
    off, clen = struct.unpack_from(">ii", shx, 100)
    assert off == 50 and clen == (len(shp) - 100 - 8) // 2


def test_write_guard(spark, tmp_path):
    df = _mkdf(spark)
    with pytest.raises(ValueError, match="max_features"):
        SHP.write_shapefile(df, str(tmp_path / "x"), max_features=2)


def test_dbf_numeric_overflow_writes_star_fill(spark, tmp_path):
    """dbfopen.c convention: a numeric wider than its field writes '*'
    fill (reader -> NULL) instead of silently truncating digits."""
    from gdal_spark.sources.shapefile import _dbf_format, _dbf_value

    raw = _dbf_format(9223372036854775807, "N", 18, 0)
    assert raw == b"*" * 18
    assert _dbf_value(raw, "N", 0) is None
    # in-range values still round-trip
    ok = _dbf_format(123456, "N", 18, 0)
    assert _dbf_value(ok, "N", 0) == 123456
