"""Structured-Streaming extension: incremental ingest of the pages
table into the engine's spatial operators.

The reference is batch-only (SURVEY §2.12 — its nearest analog is the
pull iterator ogrlayer.cpp:1124), so this module is an EXTENSION, not
a parity item: it shows the same tile/cell operators running
incrementally. Design:

 - `read_pages_stream` wraps `spark.readStream` over a parquet
   directory with the pages schema (the micro-batch stand-in for a
   Kafka/Iceberg-CDC feed of crawled pages);
 - `tile_counts_stream` is the streaming form of the tile-assignment
   aggregation: watermark on `warc_ts` + windowed groupBy(tile) —
   late pages beyond the watermark are dropped per standard
   event-time semantics;
 - all geometry math is the same JVM column math the batch path uses,
   so batch and streaming results agree (asserted in tests with the
   availableNow trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells, mercator

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("lat", T.DoubleType()),
])


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def tile_counts_stream(pages: DataFrame, zoom: int = 8,
                       watermark: str = "1 hour",
                       window: str = "1 hour") -> DataFrame:
    """Streaming tile-assignment rollup: per (event-time window, tile)
    page counts with late-data handling."""
    enriched = (pages
                .withColumn("tile_x", mercator.tile_x_col(F.col("lon"), zoom))
                .withColumn("tile_y", mercator.tile_y_col(F.col("lat"), zoom))
                .withWatermark("warc_ts", watermark))
    return (enriched
            .groupBy(F.window("warc_ts", window).alias("w"),
                     "tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n_pages"))
            .select(F.col("w.start").alias("win_start"),
                    "tile_x", "tile_y", "n_pages"))


def cell_counts_stream(pages: DataFrame,
                       res: int = cells.DEFAULT_RES) -> DataFrame:
    """Streaming cell rollup (complete-mode aggregate over cell ids)."""
    enriched = pages.withColumn(
        "cell_id", cells.cell_encode_col(F.col("lon"), F.col("lat"), res))
    return enriched.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_pages"))
