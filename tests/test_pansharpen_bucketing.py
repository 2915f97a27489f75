"""Pansharpen fusion + bucketed co-located join evidence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.raster import grid as G
from gdal_spark.raster import pansharpen as PS
from tests.test_sieve import _tiles


def test_pansharpen_matches_oracle(spark):
    rng = np.random.default_rng(21)
    spec = G.GridSpec(32, 16, (0, 1, 0, 16, 0, -1), tile=16)
    pan = rng.uniform(10, 200, size=(16, 32))
    r = rng.uniform(0, 100, size=(16, 32))
    g = rng.uniform(0, 100, size=(16, 32))
    b = rng.uniform(0, 100, size=(16, 32))
    out = PS.pansharpen(_tiles(spark, pan, spec),
                        [_tiles(spark, r, spec), _tiles(spark, g, spec),
                         _tiles(spark, b, spec)]).collect()
    want = PS.pansharpen_np(pan, [r, g, b])
    for row in out:
        ty, tx, band = row["tile_y"], row["tile_x"], row["band"]
        got = np.asarray(row["px"]).reshape(16, 16)
        exp = want[band][ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
        np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_pansharpen_zero_pseudo_pan(spark):
    spec = G.GridSpec(4, 4, (0, 1, 0, 4, 0, -1), tile=4)
    pan = np.full((4, 4), 7.0)
    zero = np.zeros((4, 4))
    out = PS.pansharpen(_tiles(spark, pan, spec), [_tiles(spark, zero, spec)])
    arr = np.asarray(out.collect()[0]["px"])
    assert (arr == 0).all()


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing both sides of a cell-keyed join removes the Exchange:
    the co-located join the SURVEY scale plan calls for. Evidence: the
    joined plan has no shuffle on either scan."""
    import os

    from gdal_spark.sources import pages

    spark.sql("DROP TABLE IF EXISTS pts_b")
    spark.sql("DROP TABLE IF EXISTS cells_b")
    pts = pages.page_points(spark, sf_dir).select("doc_id", "cell_id", "lon", "lat")
    (pts.write.mode("overwrite").bucketBy(8, "cell_id")
     .sortBy("cell_id").option("path", str(tmp_path / "pts_b"))
     .saveAsTable("pts_b"))
    cell_stats = pts.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))
    (cell_stats.write.mode("overwrite").bucketBy(8, "cell_id")
     .sortBy("cell_id").option("path", str(tmp_path / "cells_b"))
     .saveAsTable("cells_b"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("pts_b").join(spark.table("cells_b"), "cell_id")
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils \
            .explainString(j._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it computes the right thing
        n = j.count()
        assert n == pts.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
