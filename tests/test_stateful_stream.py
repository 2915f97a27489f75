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
