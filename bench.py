"""Benchmark harness — prints ONE JSON line the driver records.

Headline: spatial-join + tile-assignment throughput (pages/sec) on a
deterministic synthetic pages table (north rule metric), plus wall
times for representative relational / dedup / similarity queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/scaling_bench.py — it needs two separate JVMs, so it is not part
of the per-round single-JSON-line contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2000000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
MAX_LOAD = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))


def _load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _wait_idle(max_load: float = MAX_LOAD, timeout_s: float = 300.0) -> float:
    """Idle-host gate (same rule as tools/scaling_bench.py): a
    contaminated measurement is worse than a late one — BENCH_r03
    recorded 1.4-4x regressions on diff-clean code because the host was
    busy. Blocks until the 1-min load average drops below `max_load`
    (or the timeout passes); the load at measurement start is published
    in the JSON so a contended run is visible in the record."""
    t0 = time.time()
    while True:
        load1 = _load1()
        if load1 <= max_load or time.time() - t0 > timeout_s:
            return load1
        time.sleep(5.0)


def main():
    from pyspark.sql import functions as F

    from gdal_spark import queries as Q
    from gdal_spark.geo import mercator
    from gdal_spark.operators import pip_join, similarity
    from gdal_spark.session import get_spark
    from gdal_spark.sources import admin, pages

    load_at_start = _wait_idle()

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}

    def timed(name, fn):
        """Single-shot timing — for sections whose first run has
        one-time side effects (persist materialization, warm-up)."""
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 3)
        return out

    def timed_min(name, fn):
        """min-of-REPEATS timing for idempotent query sections: the
        minimum is the least-contended observation (the statistic the
        reference's own 20%-regression CI gate assumes)."""
        best, out = float("inf"), None
        for _ in range(max(1, REPEATS)):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        return out

    # ---- headline: spatial join + tile assignment over synthetic pages
    pts = pages.synth_pages(spark, PAGES_N, skew_hot_fraction=0.2).select(
        "doc_id", "lon", "lat", "cell_id")
    pts.persist()
    n_pages = timed("materialize_pages", lambda: pts.count())
    polys = admin.admin_df(spark)

    # spawn + import every Python UDF worker before the timed sections
    # (a long-lived cluster amortizes worker startup; timing it would
    # measure process forking, not the operators)
    warm = pages.synth_pages(spark, 64 * CPUS * 1024).select(
        "doc_id", "lon", "lat", "cell_id").repartition(2 * CPUS)
    pip_join.pip_join_broadcast(warm, polys, how="inner").count()

    def pip_tile_broadcast():
        j = pip_join.pip_join_broadcast(pts, polys, how="inner")
        j = (j.withColumn("tile_x", mercator.tile_x_col(F.col("lon"), 12))
             .withColumn("tile_y", mercator.tile_y_col(F.col("lat"), 12))
             .groupBy("poly_id", "tile_x", "tile_y").count())
        return j.count()

    def pip_shuffle_salted():
        salt = pip_join.hot_cells(pts, threshold=max(50_000, n_pages // 200))
        j = pip_join.pip_join_shuffle(pts, polys, salt_map=salt)
        return j.groupBy("poly_id").count().count()

    timed_min("pip_tile_broadcast", pip_tile_broadcast)
    timed_min("pip_shuffle_salted", pip_shuffle_salted)
    pages_per_sec = round(n_pages / times["pip_tile_broadcast"], 1)
    pts.unpersist()

    # ---- pure-JVM cell encode throughput
    timed_min("cell_encode_10m", lambda: pages.synth_pages(spark, 10_000_000)
          .agg(F.sum("cell_id")).collect())

    # ---- raster surface: density -> pyramid -> warp over synthetic pages
    from gdal_spark.raster import density as D
    from gdal_spark.raster import grid as G
    from gdal_spark.raster import pyramid as P
    from gdal_spark.raster import rasterize as RZ
    from gdal_spark.raster import warp as W

    # zoom 5 = 8192px world, <=1024 dense tiles: dense tile arrays stay
    # bounded regardless of point count (z8 would admit 65k tiles x
    # 512KB = 34GB — dense tiles must only materialize at zooms where
    # occupancy is high; finer zooms stay in the sparse pixel relation)
    rpts = pages.synth_pages(spark, 2_000_000).select("lon", "lat").persist()
    rpts.count()
    src_spec = G.world_3857(5, 256)

    def raster_pipeline():
        base = D.density_tiles(rpts, 5, 256).persist()
        n_tiles = base.count()
        levels = P.build_pyramid(base, 5, 3, kernel="sum", tile=256)
        n3 = levels[3].count()
        dst = G.world_4326(2048, 1024, tile=256)
        nw = W.warp(base, src_spec, dst, kernel="near").count()
        base.unpersist()
        return (n_tiles, n3, nw)

    timed_min("raster_density_pyramid_warp_2m", raster_pipeline)
    rpts.unpersist()

    # ---- representative operator queries at SF_DIR
    for qname in ["tpch_q1_pricing_summary", "tpch_q3_shipping",
                  "tpch_q5_local_supplier", "geo_pip_join_broadcast",
                  "geo_pip_join_shuffle", "geo_knn_ring",
                  "dedup_minhash_pairs", "dedup_clusters",
                  "format_roundtrip_geojsonl",
                  "raster_density_pyramid_checksum",
                  "raster_warp_kernels_checksum", "geo_overlay_ops",
                  "raster_grid_metrics", "geo_dissolve_union",
                  "raster_color_relief_checksum",
                  "raster_warp_crs_checksum", "geo_s2_cell_rollup",
                  "raster_warp_cutline_checksum",
                  "raster_contour_polygons"]:
        fn = Q.QUERIES[qname]
        timed_min(qname, lambda f=fn: f(spark, SF_DIR).count())

    # production minhash path (gate query keeps md5 for the oracle)
    from gdal_spark.operators import dedup as DD
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed_min("dedup_minhash_pairs_xxh",
          lambda: DD.minhash_lsh_pairs(docs, "doc_id", "text",
                                       n_hashes=16, bands=4,
                                       hash_fn="xxhash64").count())

    # boilerplate removal + repetition quality metrics (round-3 ops)
    from gdal_spark.operators import boilerplate as BL
    timed_min("boilerplate_and_gopher",
          lambda: (BL.remove_boilerplate_lines(docs).count()
                   + BL.gopher_repetition_metrics(docs).count()))

    # numpy matmul similarity path
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") % 100 == 0)
    timed_min("similarity_topk_numpy",
          lambda: similarity.topk_cosine(emb, qv, k=10, method="numpy").count())

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "spatial-join+tile-assign throughput and operator wall times",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "pages_per_sec": pages_per_sec,
        "bench_pages": n_pages,
        "cpus": CPUS,
        "repeats": REPEATS,
        "loadavg_at_start": load_at_start,
        "loadavg_at_end": _load1(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
