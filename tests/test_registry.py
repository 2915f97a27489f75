"""Driver registry dispatch (OGROpen analog) + CSV-with-WKT layer."""

import json

import numpy as np
import pytest

from gdal_spark.geo import wkb
from gdal_spark.sources import registry as R


def _df(spark):
    sq = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
    rows = [(1, "a", wkb.point(1.5, -2.5)),
            (2, "b", wkb.polygon(sq)),
            (3, "c", wkb.multipoint(np.array([[1, 2], [3, 4]], float))),
            (4, "d", None)]
    return spark.createDataFrame(rows, "fid long, name string, geom binary")


def test_csv_wkt_roundtrip(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "out.csv")
    R.write_csv_wkt(df, p)
    back = R.read_csv_wkt(spark, p)
    want = {r.fid: (r.name, None if r.geom is None else bytes(r.geom))
            for r in df.collect()}
    got = {r.fid: (r.name, None if r.geom is None else bytes(r.geom))
           for r in back.collect()}
    assert want == got  # repr-precision WKT makes this byte-lossless


def test_wkt_irrational_coords_lossless():
    g = wkb.point(np.pi, np.sqrt(2) / 3)
    assert wkb.from_text(wkb.as_text(g)) == g
    mls = wkb.multilinestring(
        [np.array([[np.e, 1.0 / 3], [0.1, 0.2]], float)])
    assert wkb.from_text(wkb.as_text(mls)) == mls


def test_open_vector_dispatch(spark, tmp_path):
    df = _df(spark)
    # every writable format reads back through the registry
    gpkg = str(tmp_path / "t.gpkg")
    R.write_vector(df, gpkg, layer="pages")
    assert R.open_vector(spark, gpkg).count() == 4

    seq = str(tmp_path / "t.geojsonl")
    R.write_vector(df, seq)
    assert R.open_vector(spark, seq).count() == 4

    shp = str(tmp_path / "pts.shp")
    R.write_vector(df.filter(df.fid == 1), shp)
    assert R.open_vector(spark, shp).count() == 1

    pq = str(tmp_path / "t.parquet")
    R.write_vector(df, pq)
    assert R.open_vector(spark, pq).count() == 4

    with pytest.raises(ValueError, match="no registered driver"):
        R.open_vector(spark, "file.xyz")
    with pytest.raises(ValueError, match="no registered driver"):
        R.write_vector(df, "file.xyz")
