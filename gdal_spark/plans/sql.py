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

_KW = r"LEFT\s+JOIN|JOIN|WHERE|GROUP\s+BY|ORDER\s+BY|HAVING|LIMIT|UNION"
_OGR_JOIN = re.compile(
    rf"\b(?:LEFT\s+)?JOIN\s+(?P<sec>\w+)"
    rf"(?:\s+(?!ON\b)(?P<alias>[A-Za-z_]\w*))?\s+ON\s+"
    rf"(?P<expr>.*?)(?=\s+(?:{_KW})\b|$)",
    re.IGNORECASE | re.DOTALL)
_EQUI = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
_PRIMARY = re.compile(
    r"\bFROM\s+(?P<tbl>\w+)"
    r"(?:\s+(?!LEFT\b|JOIN\b|WHERE\b|GROUP\b|ORDER\b|HAVING\b|LIMIT\b"
    r"|UNION\b|ON\b)(?P<alias>[A-Za-z_]\w*))?",
    re.IGNORECASE)
_QUAL = re.compile(r"\b([A-Za-z_]\w*)\s*\.")


def _rewrite_ogrsql_joins(spark: SparkSession, sql: str,
                          layer_names: set[str]) -> str:
    """OGRSQL joins -> Spark SQL with first-match semantics preserved.

    swq grammar (swq_parser.y:1087-1094): `opt_joins` recurses, so a
    statement may chain MULTIPLE joins, each `[LEFT] JOIN table
    [alias] ON <expr>`; a bare JOIN carries the same first-match LEFT
    semantics (ogr_gensql.cpp processes every join as LEFT). The ON
    expression may be ANY expression over the primary and the joined
    secondary (ogr_gensql.cpp:1333 GetFilterForJoin; checker
    swq_select.cpp:916-951 rejects references to OTHER secondaries —
    mirrored here). Two physical rewrites:

     - single equi-comparison (`a.f = sec.g`, the dominant shape):
       join against a deduped first-record-per-key view of the
       secondary (row_number over FID), aliased back to the original
       name/alias — a plain hash join, no per-row scan. Because the
       view is ALIASED as the secondary, no reference in the rest of
       the statement needs rewriting, so UNION ALL branches and
       repeated joins of one secondary across branches are safe.
     - anything else: LATERAL first-match (`LEFT JOIN LATERAL (SELECT
       * FROM sec WHERE <expr> ORDER BY FID LIMIT 1)`) — exactly the
       reference's scan-in-FID-order-take-first contract
       (ogr_gensql.cpp join evaluation), decorrelated by Catalyst.

    UNION ALL branches (swq_parser.y:840) are covered: the scan walks
    the whole statement, rewriting every join clause wherever it
    appears, and never renames references outside the clause."""
    if re.search(r"\b(RIGHT|FULL|INNER|CROSS)\s+JOIN\b", sql, re.IGNORECASE):
        raise NotImplementedError(
            "OGRSQL supports [LEFT] JOIN only (swq_parser.y)")
    layers_l = {ln.lower() for ln in layer_names}
    pm = _PRIMARY.search(sql)
    prim_names = set()
    if pm:
        prim_names.add(pm.group("tbl").lower())
        if pm.group("alias"):
            prim_names.add(pm.group("alias").lower())
    out = sql
    pos = 0
    while True:
        m = next((mm for mm in _OGR_JOIN.finditer(out, pos)
                  if not mm.group("sec").startswith("__")), None)
        if m is None:
            break
        sec = m.group("sec")
        alias = m.group("alias") or sec
        expr = m.group("expr").strip()
        if sec.lower() not in layers_l:
            raise NotImplementedError(
                f"OGRSQL JOIN references unknown layer {sec!r}")
        if re.search(r"\bSELECT\b", expr, re.IGNORECASE):
            raise NotImplementedError("OGRSQL JOIN ON cannot nest a query")
        # swq_select.cpp:916-951: ON may reference the primary and the
        # joined secondary only, never another secondary
        allowed = prim_names | {sec.lower(), alias.lower()}
        for q in {qq.lower() for qq in _QUAL.findall(expr)}:
            if q in layers_l - allowed or (q not in allowed and q in {
                    a.lower() for a in _aliases_so_far(out[:m.start()])}):
                raise NotImplementedError(
                    f"OGRSQL JOIN ON may reference the primary and "
                    f"{sec!r} only, not {q!r} (swq_select.cpp:916)")
        em = _EQUI.match(expr)
        sec_key = None
        if em:
            l_t, l_c, r_t, r_c = em.groups()
            if l_t.lower() == alias.lower():
                sec_key, other = l_c, r_t
            elif r_t.lower() == alias.lower():
                sec_key, other = r_c, l_t
            if sec_key is not None and other.lower() not in prim_names \
                    and other.lower() in layers_l | {alias.lower()}:
                sec_key = None  # sec = other-secondary -> lateral path
        if sec_key is not None:
            view = f"__{sec}_first_{sec_key}"
            spark.sql(f"""
                CREATE OR REPLACE TEMPORARY VIEW {view} AS
                SELECT * EXCEPT (__rn) FROM (
                  SELECT *, row_number() OVER (PARTITION BY {sec_key}
                                               ORDER BY FID) AS __rn
                  FROM {sec}) WHERE __rn = 1""")
            clause = f"LEFT JOIN {view} {alias} ON {expr}"
        else:
            clause = (f"LEFT JOIN LATERAL (SELECT * FROM {sec} {alias} "
                      f"WHERE {expr} ORDER BY {alias}.FID LIMIT 1) {alias}")
        out = out[:m.start()] + clause + out[m.end():]
        pos = m.start() + len(clause)
    return out


def _aliases_so_far(prefix: str) -> set[str]:
    """Aliases of join clauses already rewritten in `prefix` — used to
    reject ON expressions referencing an EARLIER secondary."""
    return {m.group(1) for m in re.finditer(
        r"\bLEFT JOIN (?:__\w+|LATERAL \(SELECT \* FROM \w+)\s+(\w+)",
        prefix)}


def execute_sql(spark: SparkSession, sql: str,
                layers: dict[str, DataFrame],
                dialect: str = "SQLITE",
                like_as_ilike: bool = False) -> DataFrame:
    has_join = re.search(r"\bjoin\b", sql, re.IGNORECASE) is not None
    for name, df in layers.items():
        with_fid = df
        if "fid" not in [c.lower() for c in df.columns]:
            from pyspark.sql import functions as F
            with_fid = df.withColumn("FID", F.monotonically_increasing_id())
            if dialect.upper() == "OGRSQL" and has_join:
                # joins ORDER BY FID (first-match): pin the synthesized
                # ids so they are deterministic (lateral subqueries
                # reject non-deterministic plans) and stable across the
                # plan's re-executions, like a real layer FID
                with_fid = with_fid.localCheckpoint(eager=False)
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
