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
     * JOINs are FIRST-MATCH-ONLY (swq grammar: `FROM primary LEFT
       JOIN secondary ON primary.f = secondary.g`, equi-join on plain
       fields, ogr/swq_parser.y; semantics in ogr_gensql.cpp — each
       primary row pairs with the FIRST matching secondary record in
       FID order). The string front-end rewrites each joined secondary
       into its per-key first record (row_number over FID) and hands a
       plain LEFT JOIN to Spark SQL — semantics preserved, Catalyst
       plans it. Unsupported OGRSQL-join shapes (non-equi ON, RIGHT/
       INNER keywords the swq grammar itself rejects) still raise.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_OGR_JOIN = re.compile(
    r"\b(?:LEFT\s+)?JOIN\s+(?P<sec>\w+)\s+ON\s+"
    r"(?P<lhs>\w+\.\w+)\s*=\s*(?P<rhs>\w+\.\w+)",
    re.IGNORECASE)


def _rewrite_ogrsql_joins(spark: SparkSession, sql: str,
                          layer_names: set[str]) -> str:
    """OGRSQL joins -> standard LEFT JOINs against deduped
    (first-record-per-key, FID order) views of each secondary.

    swq grammar (swq_parser.y:1087-1094): `opt_joins` recurses, so a
    statement may chain MULTIPLE joins, each `[LEFT] JOIN table ON
    a.f = b.g`; a bare JOIN carries the same first-match LEFT
    semantics (ogr_gensql.cpp processes every join as LEFT). UNION ALL
    branches (swq_parser.y:840) are covered too: the scan walks the
    whole statement, rewriting every join clause wherever it appears.
    The rewrite is applied iteratively on the CURRENT text so multiple
    joins never see stale offsets."""
    if re.search(r"\b(RIGHT|FULL|INNER|CROSS)\s+JOIN\b", sql, re.IGNORECASE):
        raise NotImplementedError(
            "OGRSQL supports [LEFT] JOIN only (swq_parser.y)")
    out = sql
    while True:
        m = next((mm for mm in _OGR_JOIN.finditer(out)
                  if not mm.group("sec").startswith("__")), None)
        if m is None:
            break
        sec = m.group("sec")
        if sec.lower() not in {ln.lower() for ln in layer_names}:
            raise NotImplementedError(
                f"OGRSQL JOIN references unknown layer {sec!r}")
        sides = [m.group("lhs"), m.group("rhs")]
        sec_side = next((s for s in sides
                         if s.split(".")[0].lower() == sec.lower()), None)
        if sec_side is None:
            raise NotImplementedError(
                f"OGRSQL JOIN ON must reference the joined table {sec!r}")
        key = sec_side.split(".")[1]
        view = f"__{sec}_first_{key}"
        spark.sql(f"""
            CREATE OR REPLACE TEMPORARY VIEW {view} AS
            SELECT * EXCEPT (__rn) FROM (
              SELECT *, row_number() OVER (PARTITION BY {key}
                                           ORDER BY FID) AS __rn
              FROM {sec}) WHERE __rn = 1""")
        # normalize the clause to LEFT JOIN <view> and qualify every
        # reference to the secondary with the view name
        start, end = m.span()
        clause = out[start:end]
        clause = re.sub(r"^(?:LEFT\s+)?JOIN", "LEFT JOIN", clause,
                        flags=re.IGNORECASE)
        clause = re.sub(rf"\bJOIN\s+{sec}\b", f"JOIN {view}", clause,
                        flags=re.IGNORECASE)
        out = out[:start] + clause + out[end:]
        out = re.sub(rf"\b{sec}\.", f"{view}.", out, flags=re.IGNORECASE)
    return out


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
            if not _OGR_JOIN.search(sql):
                raise NotImplementedError(
                    "unsupported OGRSQL JOIN shape (LEFT JOIN sec ON "
                    "a.f = sec.g only, per swq_parser.y)")
            sql = _rewrite_ogrsql_joins(spark, sql, set(layers))
        if like_as_ilike:
            sql = re.sub(r"(?<![a-zA-Z])LIKE\b", "ILIKE", sql,
                         flags=re.IGNORECASE)
    return spark.sql(sql)
