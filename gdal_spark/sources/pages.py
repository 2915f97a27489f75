"""The Common-Crawl-style pages table (url, warc_ts, html, text, lang).

Per BASELINE.json input_hint the engine's primary input is an Iceberg
table of web pages. This sandbox has no Iceberg catalog or external
data, so the table is DERIVED DETERMINISTICALLY from the driver's
`documents` parquet (tests/correctness oracle) or synthesized at any
row count from `spark.range` (benchmarks). Both derivations use only
integer arithmetic + string concat, so the DuckDB oracle can reproduce
every value bit-for-bit.

Geo-coordinates per page (the reference pipeline's geo-IP/URL-extracted
point, SURVEY north star) are a pure function of the row id:

    lon = ((id * 2654435761) % 360_000_000) / 1e6 - 180
    lat = ((id * 2246822519 + 1013904223) % 160_000_000) / 1e6 - 80

Int64-exact in both engines (max id * multiplier << 2^63); the division
and subtraction are IEEE-exact, so Spark and DuckDB agree on every bit.
Latitude stays in [-80, 80) — inside the web-mercator domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import cells

LON_MULT = 2654435761          # Knuth multiplicative-hash constant
LAT_MULT = 2246822519          # xxhash prime
LAT_ADD = 1013904223           # Numerical Recipes LCG increment
EPOCH0 = 1704067200            # 2024-01-01T00:00:00Z

# SQL fragments (DuckDB oracle side) — keep in lockstep with *_col below
LON_SQL = f"(((doc_id * {LON_MULT}) % 360000000) / 1000000.0 - 180.0)"
LAT_SQL = f"(((doc_id * {LAT_MULT} + {LAT_ADD}) % 160000000) / 1000000.0 - 80.0)"


def lon_col(id_col):
    return ((id_col * F.lit(LON_MULT)) % F.lit(360000000)) / F.lit(1000000.0) - F.lit(180.0)


def lat_col(id_col):
    return (
        (id_col * F.lit(LAT_MULT) + F.lit(LAT_ADD)) % F.lit(160000000)
    ) / F.lit(1000000.0) - F.lit(80.0)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang, doc_id).

    `doc_id` is kept as the stable row key (the reference keeps FID,
    SURVEY §1.2); `html` wraps the text so the byte-identical-text
    invariant is checkable end-to-end (text == decode(html)).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(EPOCH0) + F.col("doc_id") * F.lit(137)).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
                 "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def page_points(spark: SparkSession, sf_dir: str, res: int = cells.DEFAULT_RES) -> DataFrame:
    """pages + derived (lon, lat, cell_id) — all JVM-side column math."""
    p = pages_from_documents(spark, sf_dir)
    p = p.withColumn("lon", lon_col(F.col("doc_id")))
    p = p.withColumn("lat", lat_col(F.col("doc_id")))
    return p.withColumn("cell_id", cells.cell_encode_col(F.col("lon"), F.col("lat"), res))


def write_cell_partitioned(points: DataFrame, path: str,
                           parent_res: int = 3) -> None:
    """Write a points table hive-partitioned by its parent cell — the
    layout that makes spatial predicates prune at the FILE level (the
    Iceberg cell-partitioning of the north star; SURVEY §2.1
    row-group-pruning row). parent_res=3 -> up to 64 partitions; the
    hierarchical cell id makes parent derivation a shift."""
    out = points.withColumn(
        "cell_p", cells.cell_parent_col(F.col("cell_id"),
                                        cells.DEFAULT_RES - parent_res))
    out.write.mode("overwrite").partitionBy("cell_p").parquet(path)


def read_cell_pruned(spark: SparkSession, path: str,
                     min_lon: float, min_lat: float,
                     max_lon: float, max_lat: float,
                     parent_res: int = 3) -> DataFrame:
    """Scan only the partitions whose parent cell intersects the bbox
    (partition pruning does the file skipping; the exact bbox filter
    still applies on the surviving rows)."""
    cover = [int(c) for c in cells.covering_cells(
        min_lon, min_lat, max_lon, max_lat, parent_res)]
    df = spark.read.parquet(path)
    return (df.filter(F.col("cell_p").isin(cover))
            .filter(F.col("lon").between(min_lon, max_lon)
                    & F.col("lat").between(min_lat, max_lat)))


def write_cell_bucketed(df: DataFrame, table: str, n_buckets: int = 32,
                        key: str = "cell_id") -> None:
    """Persist a relation BUCKETED by its cell key (Spark bucketBy +
    sortBy saved table). Two tables bucketed the same way co-locate:
    joins and aggregations on the bucket key run with NO shuffle
    exchange on either side — the 'pre-partitioned co-located join'
    of the 100 TB plan (the brief's bucketing lever; the Iceberg
    analog is bucket-partition transforms). See
    tests/test_plans.py::test_bucketed_join_elides_shuffle for the
    plan-level proof."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet").saveAsTable(table))


def synth_pages(spark: SparkSession, n: int, skew_hot_fraction: float = 0.0,
                res: int = cells.DEFAULT_RES) -> DataFrame:
    """Synthesize n pages from spark.range — the benchmark input.

    `skew_hot_fraction` > 0 routes that fraction of rows into one ~1.4°
    hot spot (a mega-city analog) to exercise hot-cell salting: ids with
    id % 1000 < skew*1000 get coordinates near (2.3, 48.8) with only
    ±0.7° jitter. Deterministic — no RNG.
    """
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    lon, lat = lon_col(F.col("doc_id")), lat_col(F.col("doc_id"))
    if skew_hot_fraction > 0.0:
        hot = (F.col("doc_id") % 1000) < int(skew_hot_fraction * 1000)
        jlon = ((F.col("doc_id") * F.lit(LON_MULT)) % F.lit(1400000)) / F.lit(1000000.0)
        jlat = ((F.col("doc_id") * F.lit(LAT_MULT)) % F.lit(1400000)) / F.lit(1000000.0)
        lon = F.when(hot, F.lit(2.3) + jlon).otherwise(lon)
        lat = F.when(hot, F.lit(48.8) + jlat).otherwise(lat)
    df = (
        df.withColumn("url", F.concat(F.lit("https://synth.example.com/p/"),
                                      F.col("doc_id").cast("string")))
        .withColumn("warc_ts", F.timestamp_seconds(F.lit(EPOCH0) + F.col("doc_id") % F.lit(31536000)))
        .withColumn("lang", F.when(F.col("doc_id") % 10 < 7, "en")
                    .when(F.col("doc_id") % 10 < 9, "de").otherwise("fr"))
        .withColumn("text", F.concat(F.lit("synthetic page body "), F.col("doc_id").cast("string")))
        .withColumn("html", F.encode(F.concat(F.lit("<html>"), F.col("doc_id").cast("string"),
                                              F.lit("</html>")), "utf-8"))
        .withColumn("lon", lon)
        .withColumn("lat", lat)
    )
    return df.withColumn("cell_id", cells.cell_encode_col(F.col("lon"), F.col("lat"), res))
