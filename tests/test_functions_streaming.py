"""st_* function registry + Structured Streaming extension tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import register_all
from gdal_spark.geo import geom, wkb
from gdal_spark.sources import admin, pages


@pytest.fixture(scope="module")
def st(spark):
    register_all(spark)
    return spark


def test_st_area_length_type_on_admin(st, spark):
    polys = admin.admin_df(spark)
    rows = (polys.selectExpr(
        "poly_id", "st_area(geom) AS area", "st_geometrytype(geom) AS gt",
        "st_npoints(geom) AS np", "st_centroid_x(geom) AS cx")
        .orderBy("poly_id").collect())
    for r, (pid, _name, ring) in zip(rows, admin.admin_rings()):
        assert r["poly_id"] == pid
        assert r["gt"] == "POLYGON"
        assert r["area"] == pytest.approx(abs(geom.ring_area(ring)))
        assert r["np"] == len(ring)
        assert r["cx"] == pytest.approx(geom.ring_centroid(ring)[0])


def test_st_area_matches_duckdb_shoelace(st, spark):
    """Independent oracle: DuckDB evaluates the literal shoelace sum of
    the same vertex coordinates."""
    import duckdb
    con = duckdb.connect()
    for pid, _n, ring in admin.admin_rings(6):
        r = np.asarray(ring)
        terms = " + ".join(
            f"(CAST({r[i,0]!r} AS DOUBLE) * CAST({r[i+1,1]!r} AS DOUBLE)"
            f" - CAST({r[i+1,0]!r} AS DOUBLE) * CAST({r[i,1]!r} AS DOUBLE))"
            for i in range(len(r) - 1))
        want = con.execute(f"SELECT abs(({terms}) / 2.0)").fetchone()[0]
        got = (admin.admin_df(spark).filter(F.col("poly_id") == pid)
               .selectExpr("st_area(geom) AS a").collect()[0]["a"])
        assert got == pytest.approx(want, rel=1e-12)


def test_st_makepoint_xy_roundtrip(st, spark):
    out = spark.range(5).selectExpr(
        "st_makepoint(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE)) AS g"
    ).selectExpr("st_x(g) AS x", "st_y(g) AS y", "st_astext(g) AS t").collect()
    assert [r["x"] for r in out] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert out[2]["t"] == "POINT (2 4)"


def test_st_intersects_point_and_buffer(st, spark):
    df = spark.createDataFrame([(0.0, 0.0, 3.0)], "x double, y double, d double")
    out = df.selectExpr(
        "st_buffer_point(x, y, d) AS circle"
    ).selectExpr(
        "st_intersects_point(circle, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) AS inside",
        "st_intersects_point(circle, CAST(5.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS outside",
        "st_area(circle) AS a").collect()[0]
    assert out["inside"] and not out["outside"]
    # 32-gon area approaches pi*r^2 from below
    assert 0.97 * np.pi * 9 < out["a"] < np.pi * 9


def test_st_simplify(st, spark):
    line = wkb.linestring(np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.3], [4, 0]]))
    df = spark.createDataFrame([(bytearray(line), 0.01)], "g binary, tol double")
    out = df.selectExpr("st_npoints(st_simplify(g, tol)) AS n").collect()[0]
    assert out["n"] == 4


def test_streaming_tile_counts_match_batch(spark, sf_dir, tmp_path):
    """availableNow streaming over the pages parquet == batch result."""
    from gdal_spark.streaming import pages_stream as PS

    src = str(tmp_path / "pages_src")
    batch = pages.page_points(spark, sf_dir).drop("cell_id")
    batch.repartition(4).write.parquet(src)

    stream = PS.read_pages_stream(spark, src)
    agg = PS.cell_counts_stream(stream)
    q = (agg.writeStream.format("memory").queryName("cellcounts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["cell_id"], r["n_pages"])
           for r in spark.sql("SELECT * FROM cellcounts").collect()}
    want = {(r["cell_id"], r["n_pages"])
            for r in pages.page_points(spark, sf_dir)
            .groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_pages")).collect()}
    assert got == want


def test_streaming_windowed_tiles(spark, sf_dir, tmp_path):
    from gdal_spark.streaming import pages_stream as PS

    src = str(tmp_path / "pages_src2")
    pages.page_points(spark, sf_dir).drop("cell_id").write.parquet(src)
    stream = PS.read_pages_stream(spark, src)
    agg = PS.tile_counts_stream(stream, zoom=4, watermark="1 hour", window="1 hour")
    # complete mode: bounded input -> final state must equal the batch
    # windowed aggregation exactly (append mode would withhold the
    # windows the watermark has not yet closed)
    q = (agg.writeStream.format("memory").queryName("tilewin")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win_start"], r["tile_x"], r["tile_y"], r["n_pages"])
           for r in spark.sql("SELECT * FROM tilewin").collect()}
    from gdal_spark.geo import mercator
    batch = (pages.page_points(spark, sf_dir)
             .withColumn("tile_x", mercator.tile_x_col(F.col("lon"), 4))
             .withColumn("tile_y", mercator.tile_y_col(F.col("lat"), 4))
             .groupBy(F.window("warc_ts", "1 hour").alias("w"), "tile_x", "tile_y")
             .agg(F.count(F.lit(1)).alias("n_pages"))
             .select(F.col("w.start").alias("win_start"), "tile_x", "tile_y", "n_pages"))
    want = {(r["win_start"], r["tile_x"], r["tile_y"], r["n_pages"])
            for r in batch.collect()}
    assert got == want


def test_streaming_pip_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static spatial join (the north star's streaming shape):
    the SAME pip_join_broadcast operator runs unchanged over a
    readStream pages source against the static polygon layer — Spark's
    stream-static broadcast join — and reproduces the batch rollup."""
    from gdal_spark.operators import pip_join
    from gdal_spark.sources import admin
    from gdal_spark.streaming import pages_stream as PS

    src = str(tmp_path / "pages_src")
    batch = pages.page_points(spark, sf_dir).drop("cell_id")
    batch.repartition(4).write.parquet(src)
    polys = admin.admin_df(spark)

    stream = PS.read_pages_stream(spark, src)
    stream = stream.withColumn("lon", pages.lon_col(F.col("doc_id"))) \
                   .withColumn("lat", pages.lat_col(F.col("doc_id")))
    joined = pip_join.pip_join_broadcast(
        stream.select("doc_id", "lon", "lat"), polys, how="inner")
    agg = joined.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("memory").queryName("pipstream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["poly_id"], r["n"])
           for r in spark.sql("SELECT * FROM pipstream").collect()}
    want = {(r["poly_id"], r["n"]) for r in
            pip_join.pip_join_broadcast(
                batch.select("doc_id", "lon", "lat"), polys, how="inner")
            .groupBy("poly_id").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    assert got == want and len(got) > 0
