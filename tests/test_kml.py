"""KML source + sink (ogr/ogrsf_frmts/kml Placemark mapping)."""

import numpy as np
import pytest

from gdal_spark.geo import geom, wkb
from gdal_spark.sources import kml as KML


def _df(spark):
    sq = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
          np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], float)]
    rows = [
        (1, "pt & co", "cat<1>", wkb.point(10.5, -3.25)),
        (2, "line", "cat2",
         wkb.linestring(np.array([[0, 0], [2, 1], [4, 0]], float))),
        (3, "donut", "cat3", wkb.polygon(sq)),
        (4, "multi", None,
         wkb.multipoint(np.array([[1, 2], [3, 4]], float))),
        (5, "empty", "cat5", None),
    ]
    return spark.createDataFrame(
        rows, "fid long, title string, cat string, geom binary")


def test_write_read_roundtrip(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "layer.kml")
    KML.write_kml(df, p, name_col="title")
    back = KML.read_kml(spark, p)
    assert set(back.columns) == {"name", "description", "cat", "fid",
                                 "geom"}
    got = {r.name: r for r in back.collect()}
    assert len(got) == 5
    # XML escaping round-trips special characters
    r = got["pt & co"]
    assert r.cat == "cat<1>"
    t, (x, y) = wkb.decode(bytes(r.geom))
    assert t == wkb.POINT and (x, y) == (10.5, -3.25)
    # polygon with hole survives via inner/outerBoundaryIs
    t3, rings = wkb.decode(bytes(got["donut"].geom))
    assert t3 == wkb.POLYGON and len(rings) == 2
    assert abs(sum(geom.ring_area(rg) for rg in rings)) == \
        pytest.approx(16 - 1)
    # multipoint via MultiGeometry
    t4, pts = wkb.decode(bytes(got["multi"].geom))
    assert t4 == wkb.MULTIPOINT and len(pts) == 2
    assert got["empty"].geom is None
    # attributes ride in ExtendedData as strings
    assert got["line"].fid == "2"


def test_hand_written_kml_parses(spark, tmp_path):
    doc = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
  <Placemark>
    <name>alpha</name><description>first</description>
    <Point><coordinates>12.5,47.25,99.0</coordinates></Point>
  </Placemark>
  <Placemark>
    <name>beta</name>
    <LineString><coordinates>
      0,0 1,1 2,0
    </coordinates></LineString>
  </Placemark>
</Document></kml>"""
    p = str(tmp_path / "hand.kml")
    open(p, "w").write(doc)
    rows = {r.name: r for r in KML.read_kml(spark, p).collect()}
    assert rows["alpha"].description == "first"
    t, (x, y) = wkb.decode(bytes(rows["alpha"].geom))
    assert (x, y) == (12.5, 47.25)  # altitude dropped
    t2, line = wkb.decode(bytes(rows["beta"].geom))
    assert t2 == wkb.LINESTRING and len(line) == 3


def test_write_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="max_features"):
        KML.write_kml(_df(spark), str(tmp_path / "x.kml"),
                      max_features=2)


def test_esc_quotes_in_attribute_position(spark, tmp_path):
    """A '"' in a column name lands inside <Data name="...">; it must
    escape to &quot; or ET.fromstring rejects the file."""
    import xml.etree.ElementTree as ET

    from gdal_spark.sources.kml import _esc

    assert _esc('he said "hi" & <bye>') == "he said &quot;hi&quot; &amp; &lt;bye&gt;"
    name = 'a"b'
    ET.fromstring(f'<Data name="{_esc(name)}"><value>x</value></Data>')
