"""GeoJSON / GeoJSONSeq source + sink round-trips.

Reference: ogr/ogrsf_frmts/geojson (ogrgeojsonreader.cpp geometry
translation, ogrgeojsonwritelayer.cpp writer, ogrgeojsonseqdriver.cpp
line-delimited form).
"""

import json
import os

import numpy as np
import pytest

from gdal_spark.geo import geom, wkb
from gdal_spark.sources import geojson as GJ

FEATS = [
    {"type": "Feature", "properties": {"name": "a", "pop": 10},
     "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
    {"type": "Feature", "properties": {"name": "b", "pop": 20},
     "geometry": {"type": "Polygon",
                  "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4],
                                   [0, 0]]]}},
    {"type": "Feature", "properties": {"name": "c", "pop": None},
     "geometry": None},
    {"type": "Feature", "properties": {"name": "d", "pop": 5},
     "geometry": {"type": "MultiLineString",
                  "coordinates": [[[0, 0], [1, 1]], [[2, 2], [3, 3]]]}},
]


def _write_seq(path):
    with open(path, "w") as f:
        for ft in FEATS:
            f.write(json.dumps(ft) + "\n")


def test_geometry_conversion_all_types_roundtrip():
    cases = [
        {"type": "Point", "coordinates": [1.25, -2.5]},
        {"type": "MultiPoint", "coordinates": [[0.5, 1.5], [2.5, 3.5]]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.5, 2.25]]},
        {"type": "MultiLineString",
         "coordinates": [[[0.0, 0.0], [1.0, 1.0]],
                         [[2.0, 2.0], [3.0, 3.0]]]},
        {"type": "Polygon",
         "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                          [0.0, 0.0]],
                         [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0],
                          [1.0, 1.0]]]},
        {"type": "MultiPolygon",
         "coordinates": [[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0],
                           [0.0, 0.0]]]]},
    ]
    for gj in cases:
        buf = GJ.geometry_to_wkb(gj)
        back = GJ.wkb_to_geometry(buf)
        assert back == gj, gj["type"]
    # collection wraps members
    coll = {"type": "GeometryCollection", "geometries": cases[:3]}
    assert GJ.wkb_to_geometry(GJ.geometry_to_wkb(coll)) == coll
    assert GJ.geometry_to_wkb(None) is None
    assert GJ.wkb_to_geometry(None) is None
    with pytest.raises(ValueError):
        GJ.geometry_to_wkb({"type": "Weird", "coordinates": []})


def test_coordinate_precision_option():
    gj = {"type": "Point", "coordinates": [1.123456789, 2.987654321]}
    out = GJ.wkb_to_geometry(GJ.geometry_to_wkb(gj), prec=3)
    assert out["coordinates"] == [1.123, 2.988]


def test_read_seq_and_featurecollection(spark, tmp_path):
    p = str(tmp_path / "f.geojsonl")
    _write_seq(p)
    df = GJ.read_geojson_seq(spark, p)
    assert set(df.columns) == {"name", "pop", "geom"}
    rows = {r.name: r for r in df.collect()}
    assert rows["c"].geom is None and rows["c"].pop is None
    ty, (x, y) = wkb.decode(bytes(rows["a"].geom))
    assert ty == wkb.POINT and (x, y) == (1.5, 2.5)
    assert geom.polygon_area(wkb.decode(bytes(rows["b"].geom))[1]) == 16.0

    fc = str(tmp_path / "fc.geojson")
    with open(fc, "w") as f:
        json.dump({"type": "FeatureCollection", "features": FEATS}, f)
    df2 = GJ.read_geojson(spark, fc)
    assert sorted(r.name for r in df2.collect()) == ["a", "b", "c", "d"]


def test_seq_write_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "f.geojsonl")
    _write_seq(p)
    df = GJ.read_geojson_seq(spark, p)
    out = str(tmp_path / "out_seq")
    GJ.write_geojson_seq(df, out)
    back = GJ.read_geojson_seq(spark, out)
    want = {(r.name, r.pop, None if r.geom is None else bytes(r.geom))
            for r in df.collect()}
    got = {(r.name, r.pop, None if r.geom is None else bytes(r.geom))
           for r in back.collect()}
    assert want == got  # byte-identical WKB through the sink


def test_streaming_seq_source_matches_batch(spark, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    _write_seq(str(d / "a.geojsonl"))
    stream = GJ.read_geojson_seq_stream(spark, str(d))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("gj_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.name, r.pop, None if r.geom is None else bytes(r.geom))
           for r in spark.sql("SELECT * FROM gj_stream").collect()}
    want = {(r.name, r.pop, None if r.geom is None else bytes(r.geom))
            for r in GJ.read_geojson_seq(spark, str(d)).collect()}
    assert got == want


def test_featurecollection_write_guard_and_roundtrip(spark, tmp_path):
    p = str(tmp_path / "f.geojsonl")
    _write_seq(p)
    df = GJ.read_geojson_seq(spark, p)
    out = str(tmp_path / "out.geojson")
    GJ.write_geojson(df, out)
    doc = json.load(open(out))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 4
    back = GJ.read_geojson(spark, out)
    assert sorted(r.name for r in back.collect()) == ["a", "b", "c", "d"]
    with pytest.raises(ValueError, match="max_features"):
        GJ.write_geojson(df, out, max_features=2)
