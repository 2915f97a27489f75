"""GeoPackage source + sink (ogr/ogrsf_frmts/gpkg blob codec +
layer registry; rowid-range parallel read)."""

import sqlite3
import struct

import numpy as np
import pytest

from gdal_spark.geo import wkb
from gdal_spark.sources import geopackage as GPKG


def _mkdf(spark):
    sq = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
    rows = [(i, f"name{i}", float(i) * 1.5, i % 2 == 0,
             wkb.point(float(i), float(-i)) if i % 5 else None)
            for i in range(1, 41)] + [
        (41, "poly", 0.0, True, wkb.polygon(sq)),
        (42, "line", 1.0, False,
         wkb.linestring(np.array([[0, 0], [3, 4]], float)))]
    return spark.createDataFrame(
        rows, "oid long, name string, score double, flag boolean, geom binary")


def test_blob_codec_roundtrip():
    sq = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
    for g in (wkb.point(1.5, -2.5), wkb.polygon(sq),
              wkb.linestring(np.array([[0, 0], [1, 1]], float)),
              wkb.multipolygon([sq])):
        blob = GPKG.wkb_to_gpkg_blob(g, srs_id=4326)
        assert blob[:2] == b"GP"
        assert GPKG.gpkg_blob_to_wkb(blob) == g
    # point blobs carry no envelope (8-byte header), others do
    assert len(GPKG.wkb_to_gpkg_blob(wkb.point(0, 0))) == 8 + 21
    pg = GPKG.wkb_to_gpkg_blob(wkb.polygon(sq))
    flags = pg[3]
    assert (flags >> 1) & 0x7 == 1  # X/Y envelope
    xmin, xmax, ymin, ymax = struct.unpack_from("<4d", pg, 8)
    assert (xmin, xmax, ymin, ymax) == (0.0, 4.0, 0.0, 4.0)
    assert GPKG.gpkg_blob_to_wkb(None) is None
    with pytest.raises(ValueError, match="magic"):
        GPKG.gpkg_blob_to_wkb(b"XX\x00\x00\x00\x00\x00\x00")


def test_write_read_roundtrip(spark, tmp_path):
    df = _mkdf(spark)
    p = str(tmp_path / "t.gpkg")
    GPKG.write_geopackage(df, p, layer="pages")
    back = GPKG.read_geopackage(spark, p)
    assert set(back.columns) == {"fid", "oid", "name", "score", "flag",
                                 "geom"}
    want = {r.oid: (r.name, r.score, r.flag,
                    None if r.geom is None else bytes(r.geom))
            for r in df.collect()}
    got = {r.oid: (r.name, r.score, r.flag,
                   None if r.geom is None else bytes(r.geom))
           for r in back.collect()}
    assert want == got  # WKB byte-identical through the blob codec


def test_parallel_rowid_ranges(spark, tmp_path):
    df = _mkdf(spark)
    p = str(tmp_path / "t.gpkg")
    GPKG.write_geopackage(df, p, layer="pages")
    back = GPKG.read_geopackage(spark, p, partitions=7)
    assert back.rdd.getNumPartitions() == 7
    assert back.count() == 42  # no row lost or duplicated across ranges
    assert back.select("oid").distinct().count() == 42


def test_package_metadata_spec(spark, tmp_path):
    df = _mkdf(spark)
    p = str(tmp_path / "t.gpkg")
    GPKG.write_geopackage(df, p, layer="pages")
    con = sqlite3.connect(p)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    assert con.execute(
        "SELECT data_type, srs_id FROM gpkg_contents").fetchone() == \
        ("features", 4326)
    assert con.execute(
        "SELECT column_name FROM gpkg_geometry_columns "
        "WHERE table_name='pages'").fetchone()[0] == "geom"
    # mandatory SRS rows (-1, 0) + 4326
    srs = {r[0] for r in con.execute(
        "SELECT srs_id FROM gpkg_spatial_ref_sys")}
    assert {-1, 0, 4326} <= srs
    con.close()


def test_layer_selection_and_errors(spark, tmp_path):
    df = _mkdf(spark)
    p = str(tmp_path / "t.gpkg")
    GPKG.write_geopackage(df, p, layer="pages")
    assert GPKG.read_geopackage(spark, p, layer="pages").count() == 42
    with pytest.raises(ValueError, match="no feature layer"):
        GPKG.read_geopackage(spark, p, layer="nope")
    with pytest.raises(ValueError, match="max_features"):
        GPKG.write_geopackage(df, str(tmp_path / "x.gpkg"), max_features=3)
