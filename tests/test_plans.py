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


def test_execute_sql_ogrsql_join_refuses(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(NotImplementedError):
        execute_sql(spark, "SELECT * FROM a JOIN b ON a.x = b.x",
                    {"a": docs, "b": docs}, dialect="OGRSQL")
