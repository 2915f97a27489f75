"""kNN ring-expansion path on DENSE data (the oracle query exercises
the sparse fast path; this covers the ring search + termination
bound)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from gdal_spark.operators import knn
from gdal_spark.sources import pages


def _brute(data, queries, k):
    d = data.select(F.col("doc_id").alias("neighbor_id"),
                    F.col("lon").alias("nx"), F.col("lat").alias("ny"))
    q = queries.select(F.col("doc_id").alias("q_id"),
                       F.col("lon").alias("qx"), F.col("lat").alias("qy"))
    j = q.crossJoin(d).filter(F.col("neighbor_id") != F.col("q_id"))
    dist2 = (F.col("nx") - F.col("qx")) ** 2 + (F.col("ny") - F.col("qy")) ** 2
    w = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (j.withColumn("d2", dist2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "neighbor_id"))


def test_knn_ring_path_dense_matches_brute(spark):
    pts = pages.synth_pages(spark, 50_000).select(
        "doc_id", "lon", "lat", "cell_id").persist()
    qs = pts.filter(F.col("doc_id") % 2500 == 0)  # 20 queries
    # initial_ring pinned -> the adaptive brute-force shortcut is
    # bypassed and the ring search + termination bound is what runs
    got = {(r["q_id"], r["rank"]): r["neighbor_id"]
           for r in knn.knn_join(pts, qs, k=5, max_ring=16,
                                 initial_ring=2).collect()}
    want = {(r["q_id"], r["rank"]): r["neighbor_id"]
            for r in _brute(pts, qs, 5).collect()}
    assert got == want and len(got) == 100
    pts.unpersist()


def test_knn_initial_ring_estimate(spark):
    """Dense data must choose a small initial ring (the ring path),
    sparse data the exhaustive fast path."""
    import numpy as np

    # 50k rows over 4^7 cells ~ 3/cell -> est ring ~ 1-2
    rows_per_cell = 50_000 / 4.0 ** 7
    est = (np.sqrt(3.0 * 5 / rows_per_cell) - 1.0) / 2.0
    assert np.ceil(est) <= 2
    sparse = 500 / 4.0 ** 7
    est2 = (np.sqrt(3.0 * 5 / sparse) - 1.0) / 2.0
    assert np.ceil(est2) >= 8  # -> fast path at max_ring=8


def test_knn_exhaustive_pass_via_occupied_cells(spark):
    """Force the ring loop to reach the full-coverage pass (clustered
    data + one far-outlier query, initial_ring pinned small): the
    straggler must complete exactly, and the pass joins against the
    full cell relation (range-enumerated at this coarse resolution;
    the occupied-cell distinct at fine ones), never a (2n+1)^2
    Chebyshev offset grid."""
    pts = pages.synth_pages(spark, 2_000).select(
        "doc_id", "lon", "lat", "cell_id").persist()
    # queries include whatever outliers exist; take extreme-lon rows
    qs = pts.orderBy(F.asc("lon")).limit(3).union(
        pts.orderBy(F.desc("lon")).limit(3))
    got = {(r["q_id"], r["rank"]): r["neighbor_id"]
           for r in knn.knn_join(pts, qs, k=5, max_ring=64,
                                 initial_ring=1).collect()}
    want = {(r["q_id"], r["rank"]): r["neighbor_id"]
            for r in _brute(pts, qs, 5).collect()}
    assert got == want and len(got) == 30
    pts.unpersist()
