"""Cell-local k-nearest-neighbors via ring expansion.

Reference semantics: GDAL's gridding nearest-neighbor search
(alg/gdalgrid.cpp:242-331 `GDALGridInverseDistanceToAPowerNearestNeighbor`
— CPLQuadTree radius probe bounded by nMaxPoints, plain nearest
`GDALGridNearestNeighbor`), ties resolved by distance. Our engine
restates the quadtree probe as the north star's "cell-local kNN via
sorted-neighbor expansion over ring queries":

 1. candidate data points for a query come from the Chebyshev ring-r
    neighborhood of the query's cell (the grid_disk analog on the
    Morton grid). Ring cells are generated as a (2r+1)^2 OFFSET table
    cross-joined to the queries with pure column math — no driver
    collection, so the query side may itself be huge;
 2. each pass is a plain equi-join on cell_id + per-query top-k;
 3. a query is finished when its k-th best distance provably beats
    anything outside the searched window. The bound is computed
    EXACTLY per query from the window's tile boundaries: the searched
    rectangle's lon edges and (inverse-mercator) lat edges — this is
    latitude-aware, because a mercator cell's height in degrees
    shrinks by cos(lat) toward the poles, so a constant-cells bound
    would be wrong off the equator;
 4. ring doubles until it covers the whole grid, at which point the
    final pass joins the remaining stragglers against the full cell
    relation — range-enumerated JVM-side when the grid is coarse,
    the DISTINCT occupied-cell relation when it is fine (bounded by
    the data, not by grid resolution) — still the same cell
    equi-join, so the data side is hash-partitioned once per pass
    rather than replicated per query. Exact for all inputs, with no
    cross-join cliff on either side;
 5. before any of that, two cheap counts decide whether the whole
    brute-force candidate volume is small enough that ring rounds
    cost more than scoring every pair once (AQE-style adaptive
    strategy choice — never fires at scale).

Distances are squared-euclidean in lon/lat degrees — matching the
DuckDB oracle's arithmetic bit-for-bit (identical doubles in, exactly
rounded IEEE products/sums out).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geo import cells, mercator


def _ring_offsets(spark, ring: int) -> DataFrame:
    """(dx, dy) Chebyshev-disk offset table. Small rings build from a
    driver-local list (cheapest to broadcast, no extra stage); large
    rings generate JVM-side (spark.range cross product) so the
    full-coverage passes never materialize a huge driver list."""
    side = 2 * ring + 1
    if side * side <= 66_000:
        offs = [(dx, dy) for dx in range(-ring, ring + 1)
                for dy in range(-ring, ring + 1)]
        return spark.createDataFrame(offs, "dx int, dy int")
    dxs = spark.range(side).select((F.col("id") - ring).cast("int").alias("dx"))
    dys = spark.range(side).select((F.col("id") - ring).cast("int").alias("dy"))
    return dxs.crossJoin(dys)


def _lat_of_tile_row_col(row: F.Column, res: int) -> F.Column:
    """Latitude of the NORTH edge of XYZ tile row `row` (JVM math:
    inverse mercator of my = OS - row * cell_m)."""
    n = 1 << res
    my = F.lit(mercator.ORIGIN_SHIFT) - row.cast("double") * F.lit(
        2.0 * mercator.ORIGIN_SHIFT / n)
    return (F.atan(F.exp(my / F.lit(mercator.EARTH_RADIUS))) * F.lit(2.0)
            - F.lit(np.pi / 2.0)) * F.lit(180.0 / np.pi)


def knn_join(data: DataFrame, queries: DataFrame, k: int = 5,
             res: int = cells.DEFAULT_RES, max_ring: int = 8,
             id_col: str = "doc_id", lon_col: str = "lon",
             lat_col: str = "lat",
             initial_ring: int | None = None) -> DataFrame:
    """-> (q_id, rank, neighbor_id, dist2): exact k nearest data points
    per query (self excluded by id), ties by neighbor id.

    initial_ring=None auto-sizes the first ring from the data density
    (expected candidates in a disk of Chebyshev radius r is
    (2r+1)^2 * rows_per_cell; we aim for ~3k candidates) — each wasted
    widening round costs a full join pass, so starting near the right
    radius matters more than the extra count() it takes to estimate.
    """
    spark = data.sparkSession
    n = 1 << res
    brute_force = False
    if initial_ring is None:
        d_cnt = data.count()
        rows_per_cell = max(d_cnt / float(4 ** res), 1e-9)
        est = (np.sqrt(3.0 * k / rows_per_cell) - 1.0) / 2.0
        initial_ring = int(min(max(1, np.ceil(est)), max_ring))
        # Adaptive strategy choice (AQE-style): if the whole
        # brute-force candidate volume is small, the ring machinery's
        # per-round driver actions (persist + isEmpty per doubling)
        # cost more than just scoring every pair once. Two cheap
        # counts decide; at scale (billions x millions) this never
        # fires and the ring path runs unchanged.
        if d_cnt <= 10_000_000 and d_cnt * queries.count() <= 50_000_000:
            brute_force = True
    d = data.select(F.col(id_col).alias("neighbor_id"),
                    F.col(lon_col).alias("nx"), F.col(lat_col).alias("ny"),
                    F.col("cell_id").alias("d_cell"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(lon_col).alias("qx"), F.col(lat_col).alias("qy"),
        mercator.tile_x_col(F.col(lon_col), res).alias("qtx"),
        mercator.tile_y_col(F.col(lat_col), res).alias("qty"),
    )

    dist2 = (F.col("nx") - F.col("qx")) * (F.col("nx") - F.col("qx")) + \
            (F.col("ny") - F.col("qy")) * (F.col("ny") - F.col("qy"))
    w = Window.partitionBy("q_id").orderBy(F.asc("dist2"), F.asc("neighbor_id"))
    BIG = 1.0e18

    def topk_within(cand: DataFrame) -> DataFrame:
        return (cand.filter(F.col("neighbor_id") != F.col("q_id"))
                .withColumn("dist2", dist2)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))

    def safe_dist2(ring: int) -> F.Column:
        """Exact squared distance from the query point to the nearest
        edge of the fully-searched window (per-query columns)."""
        # lon edges of the searched window [qtx-ring, qtx+ring]
        left = (F.col("qtx") - ring) / F.lit(float(n)) * 360.0 - 180.0
        right = (F.col("qtx") + ring + 1) / F.lit(float(n)) * 360.0 - 180.0
        sx = F.when(F.lit(2 * ring + 1 >= n), F.lit(BIG)).otherwise(
            F.least(F.col("qx") - left, right - F.col("qx")))
        # lat edges: window rows [qty-ring, qty+ring]; a window touching
        # the grid edge has nothing beyond it (points clamp into edge
        # rows) -> that side is safe at any distance
        lat_n = _lat_of_tile_row_col(F.col("qty") - ring, res)
        lat_s = _lat_of_tile_row_col(F.col("qty") + ring + 1, res)
        sn = F.when(F.col("qty") - ring <= 0, F.lit(BIG)).otherwise(
            lat_n - F.col("qy"))
        ss = F.when(F.col("qty") + ring >= n - 1, F.lit(BIG)).otherwise(
            F.col("qy") - lat_s)
        s = F.least(sx, sn, ss)
        return s * s

    if brute_force or initial_ring >= max_ring:
        # the density estimate says the search disk must cover
        # (almost) the whole grid, which also means the data set is
        # small (rows << k * 4^res) — the ring machinery would only
        # add per-round scheduling overhead before reaching the same
        # exhaustive pass, so run it directly (sparse-data fast path;
        # Spark broadcasts the small data side of the nested loop)
        return (topk_within(q.crossJoin(d))
                .select("q_id", "rank", "neighbor_id", "dist2"))

    ring = initial_ring
    result = None
    pending = q
    while True:
        if ring >= n:
            # Exhaustive pass: pending stragglers must see every data
            # point. Candidate grain is pending x ALL CELLS, never
            # pending x (2n+1)^2 Chebyshev offsets — the offset table
            # is 4x the grid and needs a per-query dedup. Two shapes:
            #  - coarse grid (n^2 small): enumerate the n^2 cells
            #    JVM-side (spark.range — no data-side pass at all);
            #  - fine grid (n^2 huge, e.g. z15 = 1G cells): join
            #    against the DISTINCT occupied-cell relation instead,
            #    which is bounded by the data, not the resolution —
            #    one extra data shuffle buys a candidate set that no
            #    longer scales with the grid.
            # Either way it stays the same cell equi-join: the data
            # side is hash-shuffled once, never replicated per query;
            # pending (few stragglers by now) is the broadcast side.
            if n * n <= 1_048_576:
                occ = (spark.range(n * n)
                       .select(cells.cell_from_tile_col(
                           (F.col("id") % n).cast("int"),
                           (F.col("id") / n).cast("int"), res)
                           .alias("d_cell")))
            else:
                occ = d.select("d_cell").distinct()
            expand = F.broadcast(
                pending.select("q_id", "qx", "qy")).crossJoin(occ)
            topk = topk_within(expand.join(d, "d_cell"))
            # whole grid searched: every pending query is complete
            # (queries with < k total data rows emit what exists)
            rest = topk.select("q_id", "rank", "neighbor_id", "dist2")
            return rest if result is None else result.unionByName(rest)
        offs = _ring_offsets(spark, ring)
        expand = (pending.crossJoin(F.broadcast(offs))
                  .withColumn("etx", F.pmod(F.col("qtx") + F.col("dx"), F.lit(n)))
                  .withColumn("ety", F.col("qty") + F.col("dy"))
                  .filter((F.col("ety") >= 0) & (F.col("ety") < n))
                  .withColumn("d_cell", cells.cell_from_tile_col(
                      F.col("etx"), F.col("ety"), res))
                  .drop("dx", "dy", "etx", "ety").dropDuplicates(
                      ["q_id", "d_cell"]))
        cand = expand.join(d, "d_cell")
        topk = topk_within(cand)
        done_q = (topk.groupBy("q_id")
                  .agg(F.count(F.lit(1)).alias("n_hits"),
                       F.max("dist2").alias("kd"),
                       F.first("qtx").alias("qtx"), F.first("qty").alias("qty"),
                       F.first("qx").alias("qx"), F.first("qy").alias("qy"))
                  .filter((F.col("n_hits") == k)
                          & (F.col("kd") <= safe_dist2(ring)))
                  .select("q_id").persist())
        done_rows = (topk.join(F.broadcast(done_q), "q_id", "inner")
                     .select("q_id", "rank", "neighbor_id", "dist2"))
        result = done_rows if result is None else result.unionByName(done_rows)
        pending = pending.join(F.broadcast(done_q), "q_id", "left_anti").persist()
        if pending.isEmpty():
            return result
        ring *= 2


def knn_oracle_sql(pts_sql: str, k: int, q_filter_sql: str) -> str:
    """Brute-force DuckDB oracle on the same point derivation."""
    return f"""
    WITH pts AS ({pts_sql}),
    qs AS (SELECT doc_id AS q_id, lon AS qx, lat AS qy FROM pts WHERE {q_filter_sql}),
    scored AS (
      SELECT q.q_id,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY (p.lon - q.qx) * (p.lon - q.qx)
                      + (p.lat - q.qy) * (p.lat - q.qy) ASC,
                        p.doc_id ASC) AS rank,
             p.doc_id AS neighbor_id,
             (p.lon - q.qx) * (p.lon - q.qx)
               + (p.lat - q.qy) * (p.lat - q.qy) AS dist2
      FROM pts p JOIN qs q ON p.doc_id <> q.q_id
    )
    SELECT q_id, rank, neighbor_id, dist2 FROM scored WHERE rank <= {k}
    ORDER BY q_id, rank
    """
