"""Run the REFERENCE's own benchmark workloads (autotest/benchmark)
on this engine and print one JSON line.

Workload shapes (the reference publishes no absolute numbers — its CI
gates relative regressions only, BASELINE.md — so these are our
numbers on ITS workloads):
 - translate: 50,000 features x 20 string fields, storage->storage
   round-trip (autotest/benchmark/test_ogr2ogr.py:26-58's GPKG->GPKG,
   restated as parquet->parquet);
 - reproject: point reprojection to another CRS
   (test_ogr2ogr.py:61-66 does 10,000 features; we run 10,000 for the
   comparable number and 10,000,000 for the engine-scale number —
   single JVM, like their single process).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from gdal_spark.geo import mercator
    from gdal_spark.session import get_spark

    spark = get_spark("refbench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    with tempfile.TemporaryDirectory() as td:
        # --- translate: 50k features x 20 string fields
        src = (spark.range(50_000).select(
            F.col("id"),
            *[F.concat(F.lit(f"field{i}_"), F.col("id").cast("string"))
              .alias(f"f{i}") for i in range(20)]))
        src.write.parquet(f"{td}/src")
        t0 = time.time()
        spark.read.parquet(f"{td}/src").write.parquet(f"{td}/dst")
        out["translate_50k_x20str_s"] = round(time.time() - t0, 3)
        out["translate_features_per_s"] = round(
            50_000 / out["translate_50k_x20str_s"], 1)

        # --- reproject 10k points (their workload size)
        def reproject(n: int) -> float:
            pts = (spark.range(n).select(
                ((F.col("id") * 7919 % 360000) / 1000.0 - 180.0).alias("lon"),
                ((F.col("id") * 104729 % 160000) / 1000.0 - 80.0).alias("lat")))
            t0 = time.time()
            (pts.select(mercator.merc_x_col(F.col("lon")).alias("x"),
                        mercator.merc_y_col(F.col("lat")).alias("y"))
             .agg(F.sum("x"), F.sum("y")).collect())
            return round(time.time() - t0, 3)

        out["reproject_10k_s"] = reproject(10_000)
        out["reproject_10m_s"] = reproject(10_000_000)
        out["reproject_pts_per_s_at_10m"] = round(
            10_000_000 / out["reproject_10m_s"], 1)

    print(json.dumps({"metric": "reference benchmark workloads", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
