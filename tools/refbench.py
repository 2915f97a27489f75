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

        # --- the same translate through the REAL GeoPackage driver
        # (the reference workload IS gpkg->gpkg, test_ogr2ogr.py:26-58;
        # our gpkg sink is single-writer by format, reader is
        # rowid-range parallel)
        from gdal_spark.geo import wkb as _wkb
        from gdal_spark.sources import geopackage as GPKG

        @F.pandas_udf("binary")
        def mkpt(i):
            import pandas as pd
            return pd.Series([
                _wkb.point(float(v % 360 - 180), float(v % 170 - 85))
                for v in i])

        gsrc = src.withColumn("geom", mkpt("id"))
        GPKG.write_geopackage(gsrc, f"{td}/src.gpkg", layer="f")
        t0 = time.time()
        df_in = GPKG.read_geopackage(spark, f"{td}/src.gpkg")
        GPKG.write_geopackage(df_in.drop("fid"), f"{td}/dst.gpkg",
                              layer="f")
        out["translate_gpkg_50k_s"] = round(time.time() - t0, 3)
        out["translate_gpkg_features_per_s"] = round(
            50_000 / out["translate_gpkg_50k_s"], 1)

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

        # --- GTiff create-copy + gdalwarp on the reference's raster
        # shape (autotest/benchmark/test_gdalwarp.py:30-56 /
        # test_gtiff.py:94-122: 4096x4096 TILED, EPSG:32631,
        # gt [400000,1,0,4500000,0,-1], warp -t_srs EPSG:4326 with
        # near and cubic; theirs is 3-band, ours single-band —
        # numbers below are per band)
        import numpy as np

        from gdal_spark.raster import geotiff as GTF
        from gdal_spark.raster import grid as G
        from gdal_spark.raster import translate as TR

        size, ts = 4096, 256
        spec = G.GridSpec(size, size, (400000.0, 1.0, 0.0,
                                       4500000.0, 0.0, -1.0),
                          crs="EPSG:32631", tile=ts)
        n = size // ts
        tiles = (spark.range(n * n).select(
            (F.col("id") % n).cast("int").alias("tile_y"),
            (F.col("id") / n).cast("int").alias("tile_x"),
            F.array_repeat((F.col("id") % 200 + 1).cast("double"),
                           ts * ts).alias("px")))
        src_tif = f"{td}/src.tif"
        GTF.write_geotiff(tiles, spec, src_tif, dtype="uint8")
        t0 = time.time()
        s2, t2 = GTF.read_geotiff(spark, src_tif)
        GTF.write_geotiff(t2, s2, f"{td}/copy.tif", dtype="uint8")
        out["gtiff_create_copy_4096_s"] = round(time.time() - t0, 3)
        for alg in ("near", "cubic"):
            t0 = time.time()
            TR.gdalwarp(spark, src_tif, f"{td}/warp_{alg}.tif",
                        "EPSG:4326", kernel=alg, dtype="uint8")
            out[f"gdalwarp_4096_{alg}_s"] = round(time.time() - t0, 3)
        out["gdalwarp_mpix_per_s_near"] = round(
            size * size / out["gdalwarp_4096_near_s"] / 1e6, 1)

    print(json.dumps({"metric": "reference benchmark workloads", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
