"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Sentinel for spark.sql.execution.arrow.maxBytesPerBatch that makes
#: BatchedPythonArrowInput skip its PER-ROW ArrowWriter.sizeInBytes()
#: call (the guard literally compares against Int.MaxValue). With the
#: default (64 MB) every row written to an Arrow batch triggers a walk
#: over all vector buffers — profiled at ~6x the cost of the whole
#: Python-UDF exchange and memory-bandwidth-bound, so it also destroys
#: multi-core scaling. Batch size stays bounded by maxRecordsPerBatch,
#: which we size so a batch is ~10-50 MB for typical page rows.
ARROW_MAX_BYTES_SENTINEL = "2147483647"


def _worker_env_defaults() -> None:
    """glibc malloc knobs for the Python UDF workers (inherited via the
    JVM, which inherits this process's env — set BEFORE the JVM spawns).
    Large numpy/pandas frees otherwise hit mmap/munmap churn whose TLB
    shootdowns anti-scale with worker count (measured: 32-worker runs
    ~2x slower than 8-worker before this)."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


def get_spark(app: str = "gdal_spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a session.

    Defaults chosen for correctness-critical comparison with DuckDB
    (UTC timestamps) and for scale (AQE with skew-join splitting — the
    built-in half of the north rule's skew handling; explicit hot-cell
    salting is the other half, operators.pip_join; Arrow exchange tuned
    per the notes above).
    """
    _worker_env_defaults()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(8, 2 * cpus)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.maxBytesPerBatch",
                ARROW_MAX_BYTES_SENTINEL)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
