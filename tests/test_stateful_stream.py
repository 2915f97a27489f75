"""applyInPandasWithState sessionizer: state survives micro-batches and
closed sessions match the batch sessionizer."""

import time

from pyspark.sql import functions as F

from gdal_spark.streaming.stateful import GAP_US, sessionize_stream


def test_stateful_sessionize_across_microbatches(spark, sf_dir, tmp_path):
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")))
    # split time-ordered halves into two files => two micro-batches
    # (maxFilesPerTrigger=1) so open sessions MUST cross the boundary
    cut = ev.approxQuantile("ts_us", [0.5], 0.0)[0]
    src = str(tmp_path / "ev_src")
    ev.filter(F.col("ts_us") <= cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts_us") > cut).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema("user_id long, ts_us long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sessionize_stream(stream)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["user_id"], r["session_start_us"]): (r["n_events"], r["dur_us"])
           for r in spark.sql("SELECT * FROM sessions").collect()}

    # batch oracle: all CLOSED sessions (a later event exists > gap after)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts_us")
    g = ev.withColumn(
        "new_sess",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > GAP_US, 1)
        .otherwise(F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0)))
    s = g.withColumn("sid", F.sum("new_sess").over(w))
    sess = (s.groupBy("user_id", "sid")
            .agg(F.min("ts_us").alias("start"), F.max("ts_us").alias("end"),
                 F.count(F.lit(1)).alias("n")))
    wmax = Window.partitionBy("user_id")
    closed = (sess.withColumn("max_sid", F.max("sid").over(wmax))
              .filter(F.col("sid") < F.col("max_sid")))  # last session stays open
    want = {(r["user_id"], r["start"]): (r["n"], r["end"] - r["start"])
            for r in closed.collect()}
    assert got == want
    assert len(want) > 50  # fixture has many multi-session users


def test_stateful_dedup_across_microbatches(spark, sf_dir, tmp_path):
    """Streaming exact dedup: a hash seen in batch 1 must be recognized
    as a duplicate in batch 2 (state store carries the seen set)."""
    from gdal_spark.streaming.stateful import dedup_stream

    base = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.md5(F.encode(F.col("text"), "utf-8"))
                    .alias("text_hash")))
    # batch 2 re-ingests every 3rd document under a new id (the
    # continuously-crawled-again page) - those are the cross-batch dups
    dups = (base.filter(F.col("doc_id") % 3 == 0)
            .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                    "text_hash"))
    src = str(tmp_path / "docs_src")
    base.coalesce(1).write.parquet(src)
    dups.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema("doc_id long, text_hash string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_stream(stream)
         .writeStream.format("memory").queryName("dedup_s")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM dedup_s").collect()
    # final state per hash (update mode re-emits; keep the max n_seen)
    final = {}
    for r in rows:
        cur = final.get(r["text_hash"])
        if cur is None or r["n_seen"] > cur[1]:
            final[r["text_hash"]] = (r["doc_id"], r["n_seen"])

    # batch oracle over the SAME union of both batches
    want = {r["text_hash"]: (r["keeper"], r["n"])
            for r in base.unionByName(dups).groupBy("text_hash")
            .agg(F.min("doc_id").alias("keeper"),
                 F.count(F.lit(1)).alias("n")).collect()}
    assert final == want
    # cross-batch recognition: at least one hash spans both batches
    spans = [r for r in rows if not r["first_batch"]]
    assert len(spans) > 0
