"""SQL entry point mirroring GDALDataset::ExecuteSQL's two dialects.

Reference (SURVEY §3.1/3.2): `ExecuteSQL(sql, filter, dialect)` —
 - "SQLITE" dialect hands the full statement to a real SQL VM over the
   layers exposed as virtual tables (ogrsqliteexecutesql.cpp:788).
   Our restatement: register the layers as temp views and hand the
   statement to Spark SQL — the entire dialect comes for free,
   including joins, window functions, set ops.
 - "OGRSQL" is the restricted swq dialect. The differences that are
   VISIBLE in results (not just grammar):
     * `LIKE` may behave case-insensitively when the
       OGR_SQL_LIKE_AS_ILIKE option is set (reference config key,
       swq_op_general.cpp; verified in ogr_sql_test.py:353-375) —
       we rewrite LIKE -> ILIKE under the same option;
     * the FID pseudo-column (ogr/ogr_p.h:134) — exposed per layer;
     * JOINs are first-match-only — out of scope for the string
       front-end (use operators-level first-match join); passing a
       JOIN under OGRSQL raises so silent divergence is impossible.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def execute_sql(spark: SparkSession, sql: str,
                layers: dict[str, DataFrame],
                dialect: str = "SQLITE",
                like_as_ilike: bool = False) -> DataFrame:
    for name, df in layers.items():
        with_fid = df
        if "fid" not in [c.lower() for c in df.columns]:
            from pyspark.sql import functions as F
            with_fid = df.withColumn("FID", F.monotonically_increasing_id())
        with_fid.createOrReplaceTempView(name)

    if dialect.upper() == "OGRSQL":
        if re.search(r"\bjoin\b", sql, re.IGNORECASE):
            raise NotImplementedError(
                "OGRSQL JOIN is first-match-only; use "
                "gdal_spark first-match join helpers or the SQLITE dialect")
        if like_as_ilike:
            sql = re.sub(r"(?<![a-zA-Z])LIKE\b", "ILIKE", sql,
                         flags=re.IGNORECASE)
    return spark.sql(sql)
