"""Pipeline step registry + ExecuteSQL dialect tests."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import register_all
from gdal_spark.plans import Pipeline, execute_sql
from gdal_spark.sources import pages


@pytest.fixture(scope="module", autouse=True)
def _st(spark):
    register_all(spark)


def test_pipeline_chain(spark, sf_dir):
    out = (Pipeline(spark)
           .from_df(pages.page_points(spark, sf_dir))
           .step("filter", where="lang = 'en'", bbox=(-90, -45, 90, 45))
           .step("make_point", x="lon", y="lat")
           .step("reproject", dst_crs="EPSG:3857")
           .step("edit", lang_up="upper(lang)")
           .step("select", exclude=["html"])
           .step("limit", n=50)
           .df())
    rows = out.collect()
    assert 0 < len(rows) <= 50
    for r in rows[:5]:
        assert r["lang"] == "en" and r["lang_up"] == "EN"
        assert -90 <= r["lon"] <= 90 and r["geom"] is not None
        assert abs(r["x_3857"]) <= 20037509.0


def test_pipeline_spatial_sort_clusters(spark, sf_dir):
    df = (Pipeline(spark)
          .from_df(pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat"))
          .step("sort", spatial=True)
          .df())
    # spatial sort preserves the row set
    assert df.count() == pages.page_points(spark, sf_dir).count()


def test_pipeline_dissolve_and_buffer(spark, sf_dir):
    d = (Pipeline(spark)
         .from_df(pages.page_points(spark, sf_dir))
         .step("dissolve", by="lang")
         .df().collect())
    assert {r["lang"] for r in d} >= {"en"}
    b = (Pipeline(spark)
         .from_df(pages.page_points(spark, sf_dir).limit(3))
         .step("buffer", dist=2.0)
         .df().selectExpr("st_area(geom) AS a").collect())
    import numpy as np
    for r in b:
        assert 0.9 * np.pi * 4 < r["a"] < np.pi * 4


def test_pipeline_new_steps_round2(spark, sf_dir):
    import numpy as np

    from gdal_spark.geo import wkb

    bow = bytearray(wkb.polygon([np.array(
        [[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)]))
    sq = bytearray(wkb.polygon([np.array(
        [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)]))
    df = spark.createDataFrame([(1, bow), (2, sq)], "id int, geom binary")
    p = Pipeline(spark).from_df(df)

    checked = p.step("check_geometry").df().collect()
    flags = {r["id"]: r["geom_valid"] for r in checked}
    assert flags == {1: False, 2: True}

    fixed = p.step("make_valid").step("check_geometry").df().collect()
    # makevalid output is a MULTIPOLYGON of simple parts
    assert all(r["geom_valid"] for r in fixed)

    promoted = p.step("set_geom_type").df().collect()
    from gdal_spark.geo.wkb import geometry_type_name
    assert all(geometry_type_name(bytes(r["geom"])) == "MULTIPOLYGON"
               for r in promoted)

    renamed = p.step("rename", id="fid2").df()
    assert "fid2" in renamed.columns and "id" not in renamed.columns

    casted = p.step("set_field_type", field="id", new_type="string").df()
    assert dict(casted.dtypes)["id"] == "string"


def test_pipeline_sql_step_and_combine(spark, sf_dir):
    pts = pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    p = Pipeline(spark).from_df(pts)
    out = p.step("sql", query="SELECT lang, count(*) AS n FROM layer "
                              "GROUP BY lang").df()
    assert out.count() > 0 and set(out.columns) == {"lang", "n"}
    both = p.combine(Pipeline(spark).from_df(pts.limit(10))).df()
    assert both.count() == pts.count() + 10
    schema_json = p.export_schema()
    assert "doc_id" in schema_json


def test_pipeline_concave_hull(spark, sf_dir):
    import numpy as np

    from gdal_spark.geo import geom as GM
    from gdal_spark.geo import wkb

    # an L-shaped point cloud: concave footprint area must be well
    # under the convex hull's
    pts = [(float(x) + 0.21, float(y) + 0.37, "g")
           for x in range(10) for y in range(10)
           if x < 3 or y < 3]
    df = spark.createDataFrame(pts, "lon double, lat double, grp string")
    out = (Pipeline(spark).from_df(df)
           .step("concave_hull", by="grp", cell=1.0).df().collect())
    assert len(out) == 1
    rings = wkb.polygon_rings(bytes(out[0]["geom"]))[0]
    area = GM.polygon_area(rings)
    # occupied cells: 3*10 + 7*3 = 51 sq deg; convex hull would be ~75+
    np.testing.assert_allclose(area, 51.0)


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed by cell_id must join with NO Exchange on
    either side (co-located join — the 100 TB shuffle-elision lever)."""
    import shutil

    for t in ("pts_a_bkt", "pts_b_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            + f"/{t}", ignore_errors=True)
    pts0 = pages.page_points(spark, sf_dir)
    pts = pts0.select("doc_id", "cell_id", "lon")
    pages.write_cell_bucketed(pts, "pts_a_bkt", n_buckets=8)
    pages.write_cell_bucketed(
        pts0.select("cell_id", "lat"), "pts_b_bkt", n_buckets=8)
    a = spark.table("pts_a_bkt")
    b = spark.table("pts_b_bkt")
    # force the non-broadcast strategy (at 100 TB neither side is
    # dim-sized; broadcast would mask the property under test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "cell_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
        # contrast: the un-bucketed join DOES shuffle
        plain = pts.join(pts0.select("cell_id", "lat"), "cell_id")
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in pplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pts_a_bkt")
        spark.sql("DROP TABLE IF EXISTS pts_b_bkt")


def test_pipeline_unknown_step_raises(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown pipeline step"):
        Pipeline(spark).from_df(pages.page_points(spark, sf_dir)).step("nope")


def test_execute_sql_sqlite_dialect(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = execute_sql(
        spark,
        "SELECT lang, count(*) AS n FROM docs GROUP BY lang ORDER BY lang",
        {"docs": docs})
    rows = out.collect()
    assert len(rows) >= 3 and rows[0]["n"] > 0


def test_execute_sql_ogrsql_like_flag(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    strict = execute_sql(
        spark, "SELECT count(*) AS n FROM d WHERE lang LIKE 'EN%'",
        {"d": docs}, dialect="OGRSQL").collect()[0]["n"]
    loose = execute_sql(
        spark, "SELECT count(*) AS n FROM d WHERE lang LIKE 'EN%'",
        {"d": docs}, dialect="OGRSQL", like_as_ilike=True).collect()[0]["n"]
    assert strict == 0 and loose > 0


def test_execute_sql_fid_pseudocolumn(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = execute_sql(spark, "SELECT FID, doc_id FROM d LIMIT 5", {"d": docs})
    assert out.columns == ["FID", "doc_id"]


def test_execute_sql_ogrsql_join_refuses_unsupported(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # INNER/RIGHT/FULL/CROSS JOIN are not in the swq grammar
    # (swq_parser.y only produces [LEFT] JOIN); bare JOIN is accepted
    # with LEFT first-match semantics (tests/test_ogrsql_text.py).
    with pytest.raises(NotImplementedError):
        execute_sql(spark, "SELECT * FROM a INNER JOIN b ON a.x = b.x",
                    {"a": docs, "b": docs}, dialect="OGRSQL")


def test_execute_sql_ogrsql_first_match_join(spark, sf_dir):
    """OGRSQL LEFT JOIN from SQL TEXT: one (the FID-first) secondary
    record per primary row — compared against the operator-level
    first-match construction."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = execute_sql(
        spark,
        "SELECT c.c_custkey, o.o_orderkey FROM c LEFT JOIN o "
        "ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey",
        {"c": c, "o": o}, dialect="OGRSQL").collect()
    # reference: the same first-match construction spelled out by hand
    # in the SQLITE dialect (FID assignment is deterministic for the
    # same input partitioning, so both paths see identical FIDs)
    want = execute_sql(
        spark,
        "SELECT c.c_custkey, o2.o_orderkey FROM c LEFT JOIN "
        "(SELECT *, row_number() OVER (PARTITION BY o_custkey "
        " ORDER BY FID) AS rn FROM o) o2 "
        "ON c.c_custkey = o2.o_custkey AND o2.rn = 1 "
        "ORDER BY c.c_custkey",
        {"c": c, "o": o}, dialect="SQLITE").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pipeline_grid_step(spark):
    """`gdal vector grid` as a pipeline step: point features -> raster
    tiles, same algorithms as utilities.gdal_grid."""
    import numpy as np

    from gdal_spark.plans.pipeline import Pipeline
    from gdal_spark.functions.st_funcs import st_makepoint
    from gdal_spark.raster import grid as G

    df = spark.createDataFrame(
        [(2.5, 13.5, 5.0), (12.5, 3.5, 25.0)],
        "x double, y double, z double").select(
        st_makepoint("x", "y").alias("geom"), "z")
    spec = G.GridSpec(16, 16, (0.0, 1.0, 0.0, 16.0, 0.0, -1.0), tile=16)
    tiles = (Pipeline(spark, df)
             .step("grid", spec=spec, algorithm="nearest", zfield="z",
                   radius=100.0)
             .df())
    canvas = np.asarray(tiles.collect()[0]["px"]).reshape(16, 16)
    assert canvas[2, 2] == 5.0 and canvas[12, 12] == 25.0
    assert set(np.unique(canvas)) == {5.0, 25.0}
