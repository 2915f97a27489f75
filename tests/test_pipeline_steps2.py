"""Round-3 pipeline steps: explode-collections, update, partition,
simplify-coverage, info, create (apps/gdalalg_vector_pipeline.cpp
registry remainder)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.geo import wkb
from gdal_spark.plans import Pipeline


def _sq(x0, y0, x1, y1, extra_on=None):
    """Square ring x0..x1/y0..y1 counterclockwise; extra_on inserts
    redundant collinear vertices on the named edges."""
    pts = []
    def edge(a, b, name):
        pts.append(a)
        if extra_on and name in extra_on:
            for t in (0.25, 0.5, 0.75):
                pts.append((a[0] + (b[0] - a[0]) * t,
                            a[1] + (b[1] - a[1]) * t))
    edge((x0, y0), (x1, y0), "s")
    edge((x1, y0), (x1, y1), "e")
    edge((x1, y1), (x0, y1), "n")
    edge((x0, y1), (x0, y0), "w")
    pts.append((x0, y0))
    return np.asarray(pts, float)


# ------------------------------------------------- explode-collections

def test_explode_collections(spark):
    mp = wkb.multipolygon([[_sq(0, 0, 1, 1)], [_sq(2, 2, 3, 3)]])
    single = wkb.polygon([_sq(5, 5, 6, 6)])
    df = spark.createDataFrame([(1, bytearray(mp)), (2, bytearray(single)),
                                (3, None)],
                               "id long, geom binary")
    out = (Pipeline(spark).from_df(df)
           .step("explode_collections").df().orderBy("id").collect())
    assert [r["id"] for r in out] == [1, 1, 2, 3]
    types = [wkb.geometry_type_name(bytes(r["geom"])) if r["geom"] is not None
             else None for r in out]
    assert types == ["POLYGON", "POLYGON", "POLYGON", None]


def test_explode_parts_collection_flattens():
    gc = b"".join([
        bytes([1]) + (7).to_bytes(4, "little") + (2).to_bytes(4, "little"),
        wkb.point(1.0, 2.0),
        wkb.multipolygon([[_sq(0, 0, 1, 1)], [_sq(2, 2, 3, 3)]]),
    ])
    parts = wkb.explode_parts(gc)
    assert [wkb.geometry_type_name(p) for p in parts] == [
        "POINT", "POLYGON", "POLYGON"]


# --------------------------------------------------------------- update

@pytest.fixture()
def upd_layers(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    inp = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string")
    return base, inp


def _kv(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def test_update_merge(spark, upd_layers):
    base, inp = upd_layers
    out = Pipeline(spark).from_df(base).step("update", other=inp, key="k").df()
    assert _kv(out) == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_update_update_only(spark, upd_layers):
    base, inp = upd_layers
    out = (Pipeline(spark).from_df(base)
           .step("update", other=inp, key="k", mode="update-only").df())
    assert _kv(out) == {(1, "a"), (2, "B"), (3, "c")}


def test_update_append_only(spark, upd_layers):
    base, inp = upd_layers
    out = (Pipeline(spark).from_df(base)
           .step("update", other=inp, key="k", mode="append-only").df())
    assert _kv(out) == {(1, "a"), (2, "b"), (3, "c"), (4, "D")}


def test_update_bad_mode(spark, upd_layers):
    base, inp = upd_layers
    with pytest.raises(ValueError):
        Pipeline(spark).from_df(base).step("update", other=inp, key="k",
                                           mode="replace")


# ------------------------------------------------------------ partition

def test_partition_hive(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["en", "de"][i % 2]) for i in range(20)], "id long, lang string")
    Pipeline(spark).from_df(df).step(
        "partition", path=str(tmp_path / "hive"), fields="lang")
    back = spark.read.parquet(str(tmp_path / "hive"))
    assert back.count() == 20
    assert sorted((tmp_path / "hive").glob("lang=*")) and \
        {d.name for d in (tmp_path / "hive").iterdir() if d.is_dir()} == \
        {"lang=en", "lang=de"}


def test_partition_flat(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["en", "de"][i % 2]) for i in range(20)], "id long, lang string")
    Pipeline(spark).from_df(df).step(
        "partition", path=str(tmp_path / "flat"), fields="lang",
        scheme="flat")
    dirs = {d.name for d in (tmp_path / "flat").iterdir() if d.is_dir()}
    assert dirs == {"en", "de"}
    back = spark.read.parquet(str(tmp_path / "flat" / "en"))
    assert back.count() == 10


# ---------------------------------------------------- simplify-coverage

def _coverage_df(spark):
    """2x2 grid of unit squares; every edge carries 3 redundant
    collinear vertices."""
    rows = []
    pid = 0
    for gy in range(2):
        for gx in range(2):
            ring = _sq(gx, gy, gx + 1, gy + 1, extra_on="senw")
            rows.append((pid, bytearray(wkb.polygon([ring]))))
            pid += 1
    return spark.createDataFrame(rows, "pid long, geom binary")


def _ring_pts(buf):
    return wkb.polygon_rings(bytes(buf))[0][0]


def test_simplify_coverage_removes_collinear_keeps_corners(spark):
    df = _coverage_df(spark)
    out = (Pipeline(spark).from_df(df)
           .step("simplify_coverage", tolerance=0.1).df()
           .orderBy("pid").collect())
    for r in out:
        ring = _ring_pts(r["geom"])
        # collinear vertices (effective area 0) all removed -> square
        assert len(ring) == 5, ring
        xs, ys = set(ring[:, 0]), set(ring[:, 1])
        assert len(xs) == 2 and len(ys) == 2


def test_simplify_coverage_is_crack_free(spark):
    """Shared edges simplify IDENTICALLY on both sides: the canonical
    segment sets of neighboring polygons still agree, and total area
    is preserved for this fixture."""
    df = _coverage_df(spark)
    out = (Pipeline(spark).from_df(df)
           .step("simplify_coverage", tolerance=0.1).df().collect())
    from gdal_spark.geo.coverage import _seg_key

    seg_users = {}
    area = 0.0
    for r in out:
        ring = _ring_pts(r["geom"])
        area += abs(sum(ring[i, 0] * ring[i + 1, 1] - ring[i + 1, 0] * ring[i, 1]
                        for i in range(len(ring) - 1))) / 2
        for i in range(len(ring) - 1):
            k = _seg_key(ring[i, 0], ring[i, 1], ring[i + 1, 0], ring[i + 1, 1])
            seg_users[k] = seg_users.get(k, 0) + 1
    assert area == 4.0
    # interior edges are used exactly twice; none once-and-a-half
    counts = sorted(seg_users.values())
    assert set(counts) <= {1, 2}
    assert counts.count(2) == 4  # the 4 shared unit edges


def test_simplify_coverage_preserve_boundary(spark):
    df = _coverage_df(spark)
    out = (Pipeline(spark).from_df(df)
           .step("simplify_coverage", tolerance=0.1,
                 preserve_boundary=True).df()
           .orderBy("pid").collect())
    ring = _ring_pts(out[0]["geom"])
    # polygon (0,0): edges s and w are OUTER -> keep their 3 extra
    # vertices each; e and n are shared -> simplified.
    # square 5 + 2 edges * 3 extras = 11
    assert len(ring) == 11, ring


def test_simplify_coverage_null_and_tolerance_zero(spark):
    df = _coverage_df(spark).withColumn(
        "geom", F.when(F.col("pid") == 3, F.lit(None)).otherwise(F.col("geom")))
    out = (Pipeline(spark).from_df(df)
           .step("simplify_coverage", tolerance=0.0).df()
           .orderBy("pid").collect())
    # tolerance 0 -> area-0 (collinear) vertices are NOT removed
    # (strict <), NULL rows pass through
    assert out[3]["geom"] is None
    assert len(_ring_pts(out[0]["geom"])) == 17


# ------------------------------------------------------- info / create

def test_info(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 50.0), (2, -20.0, 60.0)], "id long, lon double, lat double")
    meta = Pipeline(spark).from_df(df).info()
    assert meta["feature_count"] == 2
    assert ("lon", "double") in meta["fields"]
    assert meta["extent"] == (-20.0, 50.0, 10.0, 60.0)


def test_create_empty_layer(spark):
    p = Pipeline.create(spark, "id long, name string")
    assert p.df().count() == 0
    assert p.df().columns == ["id", "name"]
    p2 = Pipeline.create(spark, "id long, name string", rows=[(1, "x")])
    assert p2.df().count() == 1
