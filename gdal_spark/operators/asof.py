"""As-of (temporal) join: attach to each left row the most recent
right row at or before its timestamp, per key.

The reference has no temporal joins (its 2-D analog is the spatial
filter, SURVEY §2.3) — this is a training-data-pipeline op (align
events to the latest snapshot/label at or before event time).

Distributed shape — the union-window trick, NOT a range cross join:
tag both sides, union them, and per key take the running LAST right
payload over a time-ordered window (right rows sort before left rows
at equal timestamps so ties match, i.e. `<=` semantics like DuckDB's
ASOF JOIN). One shuffle on the key; no pair explosion, no range
predicate — scales as a plain window regardless of time skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              time_col: str, payload_cols: list[str],
              how: str = "left") -> DataFrame:
    """-> left rows + `asof_<payload>` columns from the latest right
    row with right.time <= left.time (NULL when none precedes).

    `right` should be unique per (key, time) — pre-aggregate if not
    (ambiguous ties are underdefined in every as-of engine)."""
    lt = left.withColumn("__side", F.lit(1))
    rt = (right.select(key_col, time_col,
                       *[F.col(c) for c in payload_cols])
          .withColumn("__side", F.lit(0)))
    for c in payload_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    u = lt.unionByName(rt, allowMissingColumns=True)

    w = (Window.partitionBy(key_col)
         .orderBy(F.col(time_col).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u
    for c in payload_cols:
        filled = filled.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w))
    out = (filled.filter(F.col("__side") == 1)
           .drop("__side", *payload_cols))
    return out
