"""Query registry: every implemented operator exposed as a (Spark
builder, DuckDB oracle SQL) pair for the driver's correctness gate.

Cross-engine exactness rules used throughout (so the driver's
value-hash comparison passes bit-for-bit):

 - float SUMs go through exact decimal arithmetic: cast the (identical)
   double input to DECIMAL — both engines round the same double to the
   same decimal — sum exactly, cast the result back to double. AVG is
   expressed as exact-sum / count in double (IEEE division is exactly
   rounded => identical). The reference has the same concern — it uses
   Kahan summation (ogr/ogr_swq.h:372-377); we use decimals because
   they make the result *reproducible*, not just accurate.
 - timestamps: session timezone pinned to UTC (DuckDB is UTC-naive).
 - geometry predicates use only +,-,*, >= of literals (IEEE-exact);
   coordinates derive from integer arithmetic (sources.pages).
 - every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .geo import cells, geom, hexgrid, mercator
from .operators import pip_join
from .sources import admin, pages

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col, prec=28, scale=6):
    """Exact reproducible float sum (see module docstring)."""
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double")


def dsum_sql(expr, prec=28, scale=6):
    return f"CAST(sum(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


# =====================================================================
# Relational core (OGR SQL surface, SURVEY §2.2-2.8) on TPC-H tables
# =====================================================================

@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 18, 2)} AS sum_qty,
           {dsum_sql('l_extendedprice', 18, 2)} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
           {dsum_sql('l_quantity', 18, 2)} / count(*) AS avg_qty,
           {dsum_sql('l_extendedprice', 18, 2)} / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-agg. Catalyst: filter+projection
    pushed to parquet, partial hash agg map-side (3x2 groups)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 18, 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 18, 2).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity"), 18, 2) / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(F.col("l_extendedprice"), 18, 2) / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping",
    oracle=f"""
    SELECT o.o_orderkey AS o_orderkey,
           {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3(spark, sf_dir):
    """TPC-H Q3 shape: dim-filter join + top-k. customer is dim-sized →
    broadcast; top-k collapses to TakeOrderedAndProject. Tie-broken by
    orderkey so the LIMIT row set is deterministic cross-engine."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n.n_name AS n_name,
           {dsum_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name ORDER BY revenue DESC, n_name
    """,
)
def q5(spark, sf_dir):
    """TPC-H Q5 shape: star join. nation/region/supplier broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
    """,
)
def q6(spark, sf_dir):
    """TPC-H Q6: pure filter+agg — every predicate pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "ogr_distinct_list",
    oracle="SELECT DISTINCT c_mktsegment AS value FROM customer ORDER BY value",
)
def distinct_list(spark, sf_dir):
    """OGR SWQM_DISTINCT_LIST semantics: sorted distinct values
    (ogr/ogr_swq.h:380-381 keeps a sorted set)."""
    return (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("value"))
        .distinct()
        .orderBy("value")
    )


@register(
    "ogr_summary_record",
    oracle=f"""
    SELECT count(*) AS cnt,
           count(DISTINCT l_returnflag) AS cnt_distinct_rf,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           {dsum_sql('l_quantity', 18, 2)} AS sum_qty,
           {dsum_sql('l_quantity', 18, 2)} / count(l_quantity) AS avg_qty,
           sqrt(({dsum_sql('l_quantity * l_quantity', 24, 4)}
                 - {dsum_sql('l_quantity', 18, 2)} * {dsum_sql('l_quantity', 18, 2)} / count(*))
                / (count(*) - 1)) AS stddev_qty,
           strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
           strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
    FROM lineitem
    """,
)
def summary_record(spark, sf_dir):
    """OGR whole-relation summary (SWQM_SUMMARY_RECORD, SURVEY §2.4):
    AVG/MIN/MAX/COUNT/SUM/STDDEV + COUNT DISTINCT, no GROUP BY. STDDEV
    computed from exact decimal moments so it is bit-reproducible
    (reference uses Welford, ogr/ogr_swq.h:391 — same accuracy goal)."""
    li = _t(spark, sf_dir, "lineitem")
    s1 = dsum(F.col("l_quantity"), 18, 2)
    s2 = dsum(F.col("l_quantity") * F.col("l_quantity"), 24, 4)
    n = F.count(F.lit(1)).cast("double")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("l_returnflag").alias("cnt_distinct_rf"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        s1.alias("sum_qty"),
        (s1 / F.count("l_quantity")).alias("avg_qty"),
        F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0))).alias("stddev_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
    )


@register(
    "window_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event(spark, sf_dir):
    """Window/ranking (SQLite-dialect surface, SURVEY §2.5) + JSON
    field extraction (OFSTJSON subtype analog)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        )
    )


# =====================================================================
# Spatial core (north star): cell encode, tile assign, PIP joins
# =====================================================================

_PTS_SQL = f"SELECT doc_id, {pages.LON_SQL} AS lon, {pages.LAT_SQL} AS lat FROM documents"

_HEX_RES = 5
_HEX_CTE, _HEX_Q, _HEX_R = hexgrid.hex_qr_sql("lon", "lat", _HEX_RES)
_HEX_ID = hexgrid.hex_id_sql_from_qr(_HEX_Q, _HEX_R, _HEX_RES)


@register(
    "geo_cell_tile_encode",
    oracle=f"""
    SELECT * FROM (
      WITH pts AS ({_PTS_SQL}),
      txy AS (SELECT doc_id,
                     {mercator.tile_x_sql('lon', cells.DEFAULT_RES)} AS tx,
                     {mercator.tile_y_sql('lat', cells.DEFAULT_RES)} AS ty
              FROM pts)
      SELECT 'cell' AS part,
             CAST({cells.cell_from_tile_sql('tx', 'ty', cells.DEFAULT_RES)} AS VARCHAR) AS key,
             count(*) AS m1, CAST(sum(doc_id) AS BIGINT) AS m2,
             CAST(0 AS BIGINT) AS m3
      FROM txy GROUP BY key
      UNION ALL
      SELECT 'tile' AS part,
             CAST({mercator.tile_x_sql('lon', 8)} AS VARCHAR) || '/' ||
             CAST({mercator.tile_y_sql('lat', 8)} AS VARCHAR) AS key,
             count(*) AS m1, CAST(sum(doc_id) AS BIGINT) AS m2,
             CAST(0 AS BIGINT) AS m3
      FROM ({_PTS_SQL}) GROUP BY key
      UNION ALL
      SELECT 'hex' AS part, CAST(h AS VARCHAR) AS key,
             count(*) AS m1, CAST(sum(doc_id) AS BIGINT) AS m2,
             CAST(0 AS BIGINT) AS m3
      FROM (WITH hx_src AS ({_PTS_SQL}), {_HEX_CTE}
            SELECT doc_id, {_HEX_ID} AS h FROM hx_r)
      GROUP BY key
      UNION ALL
      SELECT 'dissolve_lang' AS part, lang AS key,
             count(DISTINCT cell_id) AS m1,
             min(cell_id) AS m2, max(cell_id) AS m3
      FROM (
        SELECT lang,
               {cells.cell_from_tile_sql('tx', 'ty', cells.DEFAULT_RES)} AS cell_id
        FROM (SELECT d.lang AS lang,
                     {mercator.tile_x_sql(pages.LON_SQL.replace('doc_id', 'd.doc_id'), cells.DEFAULT_RES)} AS tx,
                     {mercator.tile_y_sql(pages.LAT_SQL.replace('doc_id', 'd.doc_id'), cells.DEFAULT_RES)} AS ty
              FROM documents d))
      GROUP BY lang
    ) ORDER BY part, key
    """,
)
def cell_tile_encode(spark, sf_dir):
    """Four faces of the cell index in one gate (merged so the whole
    registry fits the driver's 50-entry CORRECTNESS window):
    part='cell'          vectorized Morton quadkey cell encoding
                         (geo.cells, SURVEY §1) aggregated per cell;
    part='tile'          web-mercator XYZ tile assignment at z8
                         (gdal2tiles math, SURVEY §2.9);
    part='hex'           hexagonal aperture-7 cell encoding at res 5
                         (geo/hexgrid.py, the H3 analog of the north
                         star's "H3/S2" pair; cube rounding in pure
                         column math, +-1e-9-degree boundary margin
                         pytest-audited);
    part='dissolve_lang' attribute dissolve on the cell coverage
                         (apps/gdalalg_vector_dissolve.cpp: per language
                         the dissolved footprint's cell count + extent).
    All pure JVM column math, partial-aggregated groupBys."""
    p = pages.page_points(spark, sf_dir)
    zero = F.lit(0).cast("long")
    cell = (
        p.groupBy(F.col("cell_id").cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("m1"), F.sum("doc_id").alias("m2"))
        .select(F.lit("cell").alias("part"), "key", "m1", "m2",
                zero.alias("m3"))
    )
    tile = (
        p.withColumn("tile_x", mercator.tile_x_col(F.col("lon"), 8))
        .withColumn("tile_y", mercator.tile_y_col(F.col("lat"), 8))
        .groupBy(F.concat(F.col("tile_x").cast("string"), F.lit("/"),
                          F.col("tile_y").cast("string")).alias("key"))
        .agg(F.count(F.lit(1)).alias("m1"), F.sum("doc_id").alias("m2"))
        .select(F.lit("tile").alias("part"), "key", "m1", "m2",
                zero.alias("m3"))
    )
    hexb = (
        p.groupBy(hexgrid.hex_id_col(F.col("lon"), F.col("lat"), _HEX_RES)
                  .cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("m1"), F.sum("doc_id").alias("m2"))
        .select(F.lit("hex").alias("part"), "key", "m1", "m2",
                zero.alias("m3"))
    )
    dissolve = (
        p.groupBy(F.col("lang").alias("key"))
        .agg(F.countDistinct("cell_id").alias("m1"),
             F.min("cell_id").alias("m2"), F.max("cell_id").alias("m3"))
        .select(F.lit("dissolve_lang").alias("part"), "key", "m1", "m2", "m3")
    )
    return (cell.unionByName(tile).unionByName(hexb)
            .unionByName(dissolve).orderBy("part", "key"))


def _s2_rollup_oracle(level: int = 12, parent_steps: int = 6) -> str:
    from .geo import s2 as _s2

    cte, final = _s2.s2_cell_cte_sql("pts", "lon", "lat", level,
                                     keys="doc_id")
    nl = f"((s2_cell & -s2_cell) << {2 * parent_steps})"
    return f"""
    WITH pts AS ({_PTS_SQL}),{cte},
    lab AS (SELECT doc_id, s2_cell,
                   ((s2_cell & -{nl}) | {nl}) AS s2_parent
            FROM {final})
    SELECT s2_parent, CAST(s2_parent >> 59 AS INTEGER) AS face,
           count(*) AS n_pts, count(DISTINCT s2_cell) AS n_cells,
           min(s2_cell) AS min_cell, max(s2_cell) AS max_cell
    FROM lab GROUP BY s2_parent ORDER BY s2_parent
    """


@register("geo_s2_cell_rollup", oracle=_s2_rollup_oracle())
def s2_cell_rollup(spark, sf_dir):
    """TRUE S2 cell encoding (cube face + quadratic ST + per-face
    Hilbert curve, geo/s2.py — the north star's "H3/S2 cell encoding"
    beyond the Morton-quadkey analog) with a hierarchical rollup:
    level-12 leaf cells aggregated under their level-6 ancestors via
    the trailing-bit parent = pure int64 bit math (S2's id layout).
    All JVM column math — the Hilbert walk whole-stage-codegens into
    straight-line bit ops; the oracle mirrors every stage as CTEs and
    the trig margin is perturbation-audited (tests/test_s2.py)."""
    from .geo import s2 as _s2

    p = pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat")
    enc = _s2.with_s2_cell(p, level=12, out="s2_cell")
    enc = enc.withColumn("s2_parent",
                         _s2.s2_parent_col(F.col("s2_cell"), steps=6))
    return (enc.groupBy("s2_parent")
            .agg(F.count(F.lit(1)).alias("n_pts"),
                 F.countDistinct("s2_cell").alias("n_cells"),
                 F.min("s2_cell").alias("min_cell"),
                 F.max("s2_cell").alias("max_cell"))
            .select("s2_parent",
                    F.shiftright(F.col("s2_parent"), 59).cast("int")
                    .alias("face"),
                    "n_pts", "n_cells", "min_cell", "max_cell")
            .orderBy("s2_parent"))


_HILBERT_RES = 8


def _hilbert_sort_oracle() -> str:
    """The Hilbert d-code as an unrolled CTE chain — one stage per
    bit, each mirroring geo/hilbert.hilbert_d_np's rotate/reflect
    step exactly (rx/ry flags, d += s^2 * ((3*rx) XOR ry), reflected
    swap) — the same discipline as the S2 gate's bit-walk oracle."""
    tx = mercator.tile_x_sql("lon", _HILBERT_RES)
    ty = mercator.tile_y_sql("lat", _HILBERT_RES)
    stages = [f"""
    h0 AS (SELECT doc_id, CAST({tx} AS BIGINT) AS x,
                  CAST({ty} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d
           FROM pts)"""]
    for k, i in enumerate(range(_HILBERT_RES - 1, -1, -1)):
        s = 1 << i
        stages.append(f"""
    h{k + 1} AS (
      SELECT doc_id,
             CASE WHEN ry = 1 THEN x WHEN rx = 0 THEN y
                  ELSE {s - 1} - y END AS x,
             CASE WHEN ry = 1 THEN y WHEN rx = 0 THEN x
                  ELSE {s - 1} - x END AS y,
             d + {s * s} * xor(3 * rx, ry) AS d
      FROM (SELECT doc_id, x, y, d,
                   CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                   CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
            FROM h{k}))""")
    return f"""
    WITH pts AS (SELECT doc_id, {pages.LON_SQL} AS lon,
                        {pages.LAT_SQL} AS lat FROM documents),
    {','.join(stages)}
    SELECT d // 64 AS hk_bucket, count(*) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           CAST(sum(d) AS BIGINT) AS sum_hk
    FROM h{_HILBERT_RES} GROUP BY hk_bucket ORDER BY hk_bucket
    """


@register("geo_hilbert_sort", oracle=_hilbert_sort_oracle())
def hilbert_sort(spark, sf_dir):
    """Hilbert spatial-sort key (geo/hilbert.py — the spatial sort the
    reference's gdal vector sort/gdaltindex ordering uses for
    locality; ogr sqlite's ST spatial ordering analog): the res-8
    web-mercator Hilbert d-code of every page point as pure JVM bit
    math (whole-stage codegen, no Python), rolled up into 64-code
    buckets with per-bucket count/min/max/sum — any defect in the
    rotate/reflect walk moves a point across buckets and breaks the
    hash."""
    from .geo import hilbert as _hb

    p = pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat")
    hk = _hb.with_hilbert_key(p, res=_HILBERT_RES)
    return (hk.groupBy((F.col("__hk") / F.lit(64)).cast("long")
                       .alias("hk_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"),
                 F.sum("__hk").cast("long").alias("sum_hk"))
            .orderBy("hk_bucket"))


def _pip_oracle() -> str:
    subqs = []
    for pid, _name, ring in admin.admin_rings():
        pred = geom.convex_halfplane_sql(ring, "lon", "lat")
        subqs.append(
            f"SELECT {pid} AS poly_id, count(*) AS n_pages,"
            f" min(doc_id) AS min_doc, max(doc_id) AS max_doc,"
            f" CAST(sum(doc_id) AS BIGINT) AS sum_doc"
            f" FROM pts WHERE {pred} HAVING count(*) > 0"
        )
    return f"WITH pts AS ({_PTS_SQL})\n" + "\nUNION ALL\n".join(subqs)


@register("geo_pip_join_broadcast", oracle=_pip_oracle())
def pip_broadcast(spark, sf_dir):
    """Broadcast point-in-polygon join vs the admin polygon fixture
    (ladder semantics of ogrlayer.cpp:3994; broadcast physical plan)."""
    pts = pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat")
    polys = admin.admin_df(spark)
    j = pip_join.pip_join_broadcast(pts, polys, how="inner")
    return (
        j.groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"), F.sum("doc_id").alias("sum_doc"))
        .orderBy("poly_id")
        .select("poly_id", "n_pages", "min_doc", "max_doc", "sum_doc")
    )


@register("geo_pip_join_shuffle", oracle=_pip_oracle())
def pip_shuffle(spark, sf_dir):
    """Same join via the cell-partitioned shuffle path with forced
    salting of the busiest cells — must produce the identical result
    (plan equivalence + salting correctness evidence)."""
    pts = pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat", "cell_id")
    polys = admin.admin_df(spark)
    salt_map = pip_join.hot_cells(pts, threshold=50)  # force salting at test scale
    j = pip_join.pip_join_shuffle(pts, polys, salt_map=salt_map)
    return (
        j.groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.min("doc_id").alias("min_doc"),
             F.max("doc_id").alias("max_doc"), F.sum("doc_id").alias("sum_doc"))
        .orderBy("poly_id")
        .select("poly_id", "n_pages", "min_doc", "max_doc", "sum_doc")
    )


# =====================================================================
# Web-text pipeline ops: dedup, similarity, text stats
# =====================================================================

@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, count(*) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keeper
    FROM documents GROUP BY md5(text) ORDER BY text_hash
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy; map-side combine)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.encode(F.col("text"), "utf-8")).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper"))
        .orderBy("text_hash")
    )


def _minhash_oracle(n_hashes: int = 16, bands: int = 4) -> str:
    rows = bands and n_hashes // bands
    sig_cols = ", ".join(
        f"min(md5(tok || '#{i}')) AS s{i}" for i in range(n_hashes)
    )
    band_cols = ", ".join(
        "md5(" + " || ".join(f"s{b * rows + r}" for r in range(rows)) + f") AS b{b}"
        for b in range(bands)
    )
    band_eq = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    sigs AS (SELECT doc_id, {sig_cols} FROM toks GROUP BY doc_id),
    bandt AS (SELECT doc_id, {band_cols} FROM sigs)
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bandt a JOIN bandt b ON a.doc_id < b.doc_id AND ({band_eq})
    ORDER BY a_id, b_id
    """


@register("dedup_minhash_pairs", oracle=_minhash_oracle())
def minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidate pairs: shingle(word tokens) →
    16 min-hashes → 4 bands → equi-join per band → distinct pairs.
    Scale path: each band join is a plain hash join on the band key
    (no cross product); the oracle's OR-join is only for the oracle."""
    from .operators import dedup

    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, id_col="doc_id", text_col="text",
                                   n_hashes=16, bands=4).orderBy("a_id", "b_id")


def _dup_clusters_oracle(n_hashes: int = 16, bands: int = 4) -> str:
    rows = n_hashes // bands
    sig_cols = ", ".join(
        f"min(md5(tok || '#{i}')) AS s{i}" for i in range(n_hashes)
    )
    band_cols = ", ".join(
        "md5(" + " || ".join(f"s{b * rows + r}" for r in range(rows)) + f") AS b{b}"
        for b in range(bands)
    )
    band_eq = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH RECURSIVE toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    sigs AS (SELECT doc_id, {sig_cols} FROM toks GROUP BY doc_id),
    bandt AS (SELECT doc_id, {band_cols} FROM sigs),
    pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM bandt a JOIN bandt b
              ON a.doc_id < b.doc_id AND ({band_eq})),
    eb AS (SELECT a_id AS u, b_id AS v FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
    reach AS (
      SELECT doc_id AS node, doc_id AS comp FROM documents
      UNION
      SELECT eb.u AS node, reach.comp FROM eb JOIN reach ON eb.v = reach.node
    )
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(min(comp) AS BIGINT) AS cluster_id,
           (node = min(comp)) AS is_keeper
    FROM reach GROUP BY node ORDER BY doc_id
    """


@register("dedup_clusters", oracle=_dup_clusters_oracle())
def dedup_clusters_q(spark, sf_dir):
    """Dup PAIRS -> dup CLUSTERS (keeper per cluster): minhash LSH
    candidates fed to the distributed large-star/small-star CC loop
    (operators/components.py). The reference has no analog; a
    training-data pipeline needs the keep/drop verdict, not pairs.
    Oracle: DuckDB recursive-CTE reachability with min-label roots."""
    from .operators import dedup

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d, id_col="doc_id", text_col="text",
                                    n_hashes=16, bands=4)
    return (dedup.dup_clusters(pairs, docs=d, id_col="doc_id")
            .orderBy("doc_id"))


@register(
    "format_roundtrip_geojsonl",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(text) AS min_text, max(text) AS max_text
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def format_roundtrip_geojsonl(spark, sf_dir):
    """Hard-gates the round-3 format-driver stack end-to-end: the
    documents table (plus a derived point geometry) writes through the
    distributed GeoJSONSeq sink (sources/geojson.py — the reference's
    line-delimited driver, ogrgeojsonseqdriver.cpp), reads back
    through the splittable source, and aggregates; the oracle computes
    the same aggregate straight from the parquet table, so any
    row/field lost or altered by the JSON encode/decode or the
    WKT-free geometry path breaks the value hash. The former
    text_stats_by_lang aggregate lives on inside text_metrics
    (part='stats')."""
    import tempfile

    from .functions.st_funcs import st_makepoint
    from .sources import geojson as GJ

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text")
    pts = d.withColumn("geom", st_makepoint(
        (F.col("doc_id") % 360 - 180).cast("double"),
        (F.col("doc_id") % 170 - 85).cast("double")))
    out = tempfile.mkdtemp(prefix="gjseq_gate_") + "/docs"
    GJ.write_geojson_seq(pts, out)
    back = GJ.read_geojson_seq(spark, out)
    return (back.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.min("text").alias("min_text"),
                 F.max("text").alias("max_text"))
            .orderBy("lang"))


@register(
    "similarity_topk_cosine",
    oracle="""
    SELECT q_id, rank, neighbor_id FROM (
      SELECT q.vec_id AS q_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                               CAST(q.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS rank,
             e.vec_id AS neighbor_id
      FROM embeddings e JOIN embeddings q ON q.vec_id % 100 = 0
      WHERE e.vec_id <> q.vec_id
    ) WHERE rank <= 10 ORDER BY q_id, rank
    """,
)
def topk_cosine(spark, sf_dir):
    """Brute-force cosine top-k similarity search over the embedding
    column (baseline ANN; SURVEY training-data ops). Query side is a
    broadcast; scores stay internal (float-noise-free output)."""
    from .operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return similarity.topk_cosine(e, q, k=10).orderBy("q_id", "rank")


# ---------------------------------------------------------------------
# extended registries (register into the same QUERIES/ORACLES dicts)
from . import queries_ext  # noqa: E402,F401
from . import queries_raster  # noqa: E402,F401
