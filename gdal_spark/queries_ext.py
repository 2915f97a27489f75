"""Extended query registry: kNN, zonal statistics, dissolve, OGR SQL
semantic reproductions (first-match join, LIKE/ILIKE, CAST/SUBSTR,
set ops, union-by-name, LIMIT/OFFSET), and web-text training-data ops
(language ID, quality scoring, fingerprinting, multimodal metadata).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from .geo import cells, geom, mercator
from .operators import knn, multimodal, pip_join
from .queries import _t, register
from .sources import admin, pages

_PTS = f"SELECT doc_id, {pages.LON_SQL} AS lon, {pages.LAT_SQL} AS lat FROM documents"


# =====================================================================
# Spatial: kNN, zonal stats, dissolve
# =====================================================================

@register("geo_knn_ring",
          oracle=knn.knn_oracle_sql(_PTS, k=5, q_filter_sql="doc_id % 25 = 0"))
def knn_ring(spark, sf_dir):
    """Exact kNN via cell-ring expansion (GDAL grid NN analog,
    alg/gdalgrid.cpp:242) vs a brute-force SQL oracle."""
    pts = pages.page_points(spark, sf_dir).select("doc_id", "lon", "lat", "cell_id")
    qs = pts.filter(F.col("doc_id") % 25 == 0)
    return knn.knn_join(pts, qs, k=5).orderBy("q_id", "rank")


# ---------------------------------------------------------------------
# Layer algebra WITH geometry output (ogrlayer.cpp:5385 Intersection)
# ---------------------------------------------------------------------

_LSTEP = 0.2  # lattice step (deg) for the construction-verifying oracle


def _lattice_range(minx, miny, maxx, maxy):
    """Integer (k, l) index ranges of the 0.2-degree lattice covering a
    bbox — computed ONCE in Python from fixture literals and shared by
    the Spark query and the SQL oracle, so there is zero cross-engine
    float drift in the lattice itself."""
    import math

    k0 = int(math.ceil((minx + 180.0) / _LSTEP))
    k1 = int(math.floor((maxx + 180.0) / _LSTEP))
    l0 = int(math.ceil((miny + 90.0) / _LSTEP))
    l1 = int(math.floor((maxy + 90.0) / _LSTEP))
    return k0, k1, l0, l1


def _overlay_pairs():
    """Bbox-overlapping fixture pairs with their shared lattice range."""
    rings = admin.overlay_rings()
    out = []
    for i, (pa, _na, ra) in enumerate(rings):
        ba = geom.bbox_of_ring(ra)
        for pb, _nb, rb in rings[i + 1:]:
            bb = geom.bbox_of_ring(rb)
            ib = (max(ba[0], bb[0]), max(ba[1], bb[1]),
                  min(ba[2], bb[2]), min(ba[3], bb[3]))
            if ib[0] >= ib[2] or ib[1] >= ib[3]:
                continue
            k0, k1, l0, l1 = _lattice_range(*ib)
            if k0 > k1 or l0 > l1:
                continue
            out.append((pa, pb, ra, rb, (k0, k1, l0, l1)))
    return out


def _overlay_oracle() -> str:
    subqs = []
    for pa, pb, ra, rb, (k0, k1, l0, l1) in _overlay_pairs():
        pred_a = geom.convex_halfplane_sql(ra, "lon", "lat")
        pred_b = geom.convex_halfplane_sql(rb, "lon", "lat")
        subqs.append(f"""
        SELECT {pa} AS a_id, {pb} AS b_id,
               count(*) AS n_pts,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(sum(l) AS BIGINT) AS sum_l
        FROM (SELECT k, l, (-180.0 + 0.2 * k) AS lon, (-90.0 + 0.2 * l) AS lat
              FROM (SELECT range AS k FROM range({k0}, {k1 + 1})),
                   (SELECT range AS l FROM range({l0}, {l1 + 1})))
        WHERE {pred_a} AND {pred_b}
        HAVING count(*) > 0""")
    return ("SELECT * FROM (\n" + "\nUNION ALL\n".join(subqs)
            + "\n) ORDER BY a_id, b_id")


def overlay_intersection_q(spark, sf_dir):
    """Geometry-CONSTRUCTING layer algebra (OGRLayer::Intersection,
    ogrlayer.cpp:5385): self-overlay of the admin fixture layer via the
    cell equi-join + per-pair Weiler-Atherton construction
    (operators/overlay_join.py). Verified against an independent oracle:
    every 0.2-degree lattice point inside the CONSTRUCTED geometry
    (even-odd on the result rings) must be exactly the set satisfying
    both polygons' half-plane predicates in DuckDB."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .geo import geom as _g
    from .geo import wkb as _wkb
    from .operators.overlay_join import overlay_intersection_join

    polys = admin.overlay_df(spark)
    pairs = overlay_intersection_join(polys, polys, same_layer=True)
    ranges = [(pa, pb, k0, k1, l0, l1)
              for pa, pb, _ra, _rb, (k0, k1, l0, l1) in _overlay_pairs()]
    rdf = spark.createDataFrame(
        ranges, "a_id int, b_id int, k0 long, k1 long, l0 long, l1 long")
    j = pairs.join(F.broadcast(rdf), ["a_id", "b_id"], "inner")

    out_schema = T.StructType([
        T.StructField("a_id", T.IntegerType(), False),
        T.StructField("b_id", T.IntegerType(), False),
        T.StructField("n_pts", T.LongType(), False),
        T.StructField("sum_k", T.LongType(), False),
        T.StructField("sum_l", T.LongType(), False),
    ])

    def lattice_count(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ks = np.arange(int(r["k0"]), int(r["k1"]) + 1)
                ls = np.arange(int(r["l0"]), int(r["l1"]) + 1)
                kk, ll = np.meshgrid(ks, ls)
                kk, ll = kk.ravel(), ll.ravel()
                lon = -180.0 + 0.2 * kk
                lat = -90.0 + 0.2 * ll
                inside = np.zeros(len(kk), dtype=bool)
                for part in _wkb.polygon_rings(bytes(r["geom"])):
                    inside |= _g.points_in_polygon(lon, lat, part)
                if inside.any():
                    rows.append((int(r["a_id"]), int(r["b_id"]),
                                 int(inside.sum()),
                                 int(kk[inside].sum()),
                                 int(ll[inside].sum())))
            yield pd.DataFrame(
                rows, columns=["a_id", "b_id", "n_pts", "sum_k", "sum_l"])

    return (j.mapInPandas(lattice_count, out_schema)
            .orderBy("a_id", "b_id"))


def _predicates_oracle() -> str:
    subqs = []
    for pa, pb, ra, rb, (k0, k1, l0, l1) in _overlay_pairs():
        pred_a = geom.convex_halfplane_sql(ra, "lon", "lat")
        pred_b = geom.convex_halfplane_sql(rb, "lon", "lat")
        subqs.append(f"""
        SELECT {pa} AS a_id, {pb} AS b_id,
               (count(*) FILTER (WHERE in_a AND in_b) > 0) AS intersects,
               (count(*) FILTER (WHERE in_a AND in_b) > 0
                AND count(*) FILTER (WHERE in_a AND NOT in_b) > 0
                AND count(*) FILTER (WHERE in_b AND NOT in_a) > 0) AS overlaps,
               (count(*) FILTER (WHERE in_a AND in_b) > 0
                AND count(*) FILTER (WHERE in_a AND NOT in_b) = 0) AS within_ab,
               (count(*) FILTER (WHERE in_a AND in_b) > 0
                AND count(*) FILTER (WHERE in_b AND NOT in_a) = 0) AS contains_ab
        FROM (SELECT {pred_a} AS in_a, {pred_b} AS in_b
              FROM (SELECT (-180.0 + 0.2 * k) AS lon, (-90.0 + 0.2 * l) AS lat
                    FROM (SELECT range AS k FROM range({k0}, {k1 + 1})),
                         (SELECT range AS l FROM range({l0}, {l1 + 1}))))
        HAVING count(*) FILTER (WHERE in_a AND in_b) > 0""")
    return ("SELECT * FROM (\n" + "\nUNION ALL\n".join(subqs)
            + "\n) ORDER BY a_id, b_id")


@register("geo_predicates_matrix", oracle=_predicates_oracle())
def predicates_matrix_q(spark, sf_dir):
    """The areal predicate matrix (ogr_geometry.h:547-566) evaluated by
    the geometry engine (overlay-derived relate()) on every overlapping
    fixture pair, cross-checked against the lattice/half-plane
    reformulation of the same predicates in DuckDB. Fixture overlaps
    are lattice-visible by construction, so the discretization is
    faithful."""
    import pandas as pd
    from pyspark.sql import types as T

    from .geo import overlay as _ov
    from .geo import wkb as _wkb
    from .operators.overlay_join import overlay_intersection_join

    polys = admin.overlay_df(spark)
    pairs = overlay_intersection_join(polys, polys, same_layer=True)
    geoms = polys.select(F.col("poly_id"), F.col("geom"))
    j = (pairs.select("a_id", "b_id")
         .join(geoms.withColumnsRenamed(
             {"poly_id": "a_id", "geom": "a_geom"}), "a_id")
         .join(geoms.withColumnsRenamed(
             {"poly_id": "b_id", "geom": "b_geom"}), "b_id"))

    schema = T.StructType([
        T.StructField("a_id", T.IntegerType(), False),
        T.StructField("b_id", T.IntegerType(), False),
        T.StructField("intersects", T.BooleanType(), False),
        T.StructField("overlaps", T.BooleanType(), False),
        T.StructField("within_ab", T.BooleanType(), False),
        T.StructField("contains_ab", T.BooleanType(), False),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pa = _ov.normalize(_wkb.polygon_rings(bytes(r["a_geom"]))[0])
                pb = _ov.normalize(_wkb.polygon_rings(bytes(r["b_geom"]))[0])
                rel = _ov.relate(pa, pb)
                rows.append((int(r["a_id"]), int(r["b_id"]),
                             bool(rel["intersects"]), bool(rel["overlaps"]),
                             bool(rel["within"]), bool(rel["contains"])))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return j.mapInPandas(run, schema).orderBy("a_id", "b_id")


def _dissolve_groups():
    """Overlay fixtures grouped by poly_id % 4, each with the lattice
    range of the group's united bbox (python literals, shared by both
    engines)."""
    rings = admin.overlay_rings()
    groups: dict[int, list] = {}
    for pid, _n, ring in rings:
        groups.setdefault(pid % 4, []).append((pid, ring))
    out = []
    for g, members in sorted(groups.items()):
        bbs = [geom.bbox_of_ring(r) for _pid, r in members]
        bbox = (min(b[0] for b in bbs), min(b[1] for b in bbs),
                max(b[2] for b in bbs), max(b[3] for b in bbs))
        out.append((g, members, _lattice_range(*bbox)))
    return out


def _dissolve_oracle() -> str:
    subqs = []
    for g, members, (k0, k1, l0, l1) in _dissolve_groups():
        pred = " OR ".join(geom.convex_halfplane_sql(r, "lon", "lat")
                           for _pid, r in members)
        subqs.append(f"""
        SELECT {g} AS grp, count(*) AS n_pts,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(sum(l) AS BIGINT) AS sum_l
        FROM (SELECT k, l, (-180.0 + 0.2 * k) AS lon, (-90.0 + 0.2 * l) AS lat
              FROM (SELECT range AS k FROM range({k0}, {k1 + 1})),
                   (SELECT range AS l FROM range({l0}, {l1 + 1})))
        WHERE {pred}""")
    return ("SELECT * FROM (\n" + "\nUNION ALL\n".join(subqs)
            + "\n) ORDER BY grp")


@register("geo_dissolve_union", oracle=_dissolve_oracle())
def dissolve_union_q(spark, sf_dir):
    """GEOMETRY dissolve (`gdal vector dissolve` / cascaded ST_Union):
    the overlay fixtures grouped by poly_id % 4, each group's members
    dissolved into one multipolygon (operators.overlay_join.
    dissolve_geoms / geo.overlay.union_all). Oracle: the lattice points
    inside the CONSTRUCTED dissolved geometry must equal the points
    satisfying ANY member's half-plane predicates in DuckDB — union
    coverage, boundary-free by the irrational fixture."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .geo import geom as _g
    from .geo import wkb as _wkb
    from .operators.overlay_join import dissolve_geoms

    polys = admin.overlay_df(spark).withColumn(
        "grp", F.pmod("poly_id", F.lit(4)).cast("int"))
    dissolved = dissolve_geoms(polys, "grp")
    ranges = [(g, k0, k1, l0, l1)
              for g, _m, (k0, k1, l0, l1) in _dissolve_groups()]
    rdf = spark.createDataFrame(
        ranges, "grp int, k0 long, k1 long, l0 long, l1 long")
    j = dissolved.join(F.broadcast(rdf), "grp", "inner")

    schema = T.StructType([
        T.StructField("grp", T.IntegerType(), False),
        T.StructField("n_pts", T.LongType(), False),
        T.StructField("sum_k", T.LongType(), False),
        T.StructField("sum_l", T.LongType(), False),
    ])

    def lattice(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ks = np.arange(int(r["k0"]), int(r["k1"]) + 1)
                ls = np.arange(int(r["l0"]), int(r["l1"]) + 1)
                kk, ll = np.meshgrid(ks, ls)
                kk, ll = kk.ravel(), ll.ravel()
                lon = -180.0 + 0.2 * kk
                lat = -90.0 + 0.2 * ll
                inside = np.zeros(len(kk), dtype=bool)
                for part in _wkb.polygon_rings(bytes(r["geom"])):
                    inside |= _g.points_in_polygon(lon, lat, part)
                rows.append((int(r["grp"]), int(inside.sum()),
                             int(kk[inside].sum()), int(ll[inside].sum())))
            yield pd.DataFrame(
                rows, columns=["grp", "n_pts", "sum_k", "sum_l"])

    return j.mapInPandas(lattice, schema).orderBy("grp")


def _erase_oracle() -> str:
    """Per a-feature lattice count of (in A) and (in A minus every
    overlapping B) — the Erase layer op's coverage, relationally."""
    rings = {pid: ring for pid, _n, ring in admin.overlay_rings()}
    by_a: dict[int, list[int]] = {}
    for pa, pb, _ra, _rb, _rng in _overlay_pairs():
        by_a.setdefault(pa, []).append(pb)
        by_a.setdefault(pb, []).append(pa)
    subqs = []
    for a_id, others in sorted(by_a.items()):
        ra = rings[a_id]
        bbox = geom.bbox_of_ring(ra)
        k0, k1, l0, l1 = _lattice_range(*bbox)
        pred_a = geom.convex_halfplane_sql(ra, "lon", "lat")
        not_bs = " AND ".join(
            f"NOT {geom.convex_halfplane_sql(rings[b], 'lon', 'lat')}"
            for b in sorted(others))
        subqs.append(f"""
        SELECT {a_id} AS a_id,
               count(*) FILTER (WHERE {pred_a}) AS n_in_a,
               count(*) FILTER (WHERE {pred_a} AND {not_bs}) AS n_remaining
        FROM (SELECT (-180.0 + 0.2 * k) AS lon, (-90.0 + 0.2 * l) AS lat
              FROM (SELECT range AS k FROM range({k0}, {k1 + 1})),
                   (SELECT range AS l FROM range({l0}, {l1 + 1})))""")
    return ("SELECT * FROM (\n" + "\nUNION ALL\n".join(subqs)
            + "\n) ORDER BY a_id")


def overlay_erase_q(spark, sf_dir):
    """Erase WITH constructed geometry (ogrlayer.cpp:7846): each
    overlay-fixture feature minus all its overlapping siblings; the
    lattice count inside the CONSTRUCTED difference must equal DuckDB's
    in-A-and-in-no-B count (boundary-exact lattice points excluded by
    the irrational fixture)."""
    import pandas as pd
    from pyspark.sql import types as T

    from .geo import geom as _g
    from .geo import wkb as _wkb
    from .operators.overlay_join import overlay_erase

    import numpy as np

    polys = admin.overlay_df(spark)
    rings = {pid: ring for pid, _n, ring in admin.overlay_rings()}
    by_a: dict[int, list[int]] = {}
    for pa, pb, _ra, _rb, _rng in _overlay_pairs():
        by_a.setdefault(pa, []).append(pb)
        by_a.setdefault(pb, []).append(pa)
    participants = polys.join(
        spark.createDataFrame([(a,) for a in by_a], "poly_id int"),
        "poly_id", "left_semi")
    erased = overlay_erase(participants, participants, same_layer=True)

    ranges = [(a, *_lattice_range(*_g.bbox_of_ring(rings[a])))
              for a in sorted(by_a)]
    rdf = spark.createDataFrame(
        ranges, "a_id int, k0 long, k1 long, l0 long, l1 long")
    j = erased.join(F.broadcast(rdf), "a_id", "inner")

    schema = T.StructType([
        T.StructField("a_id", T.IntegerType(), False),
        T.StructField("n_in_a", T.LongType(), False),
        T.StructField("n_remaining", T.LongType(), False),
    ])

    def count_lattice(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ks = np.arange(int(r["k0"]), int(r["k1"]) + 1)
                ls = np.arange(int(r["l0"]), int(r["l1"]) + 1)
                kk, ll = np.meshgrid(ks, ls)
                lon = -180.0 + 0.2 * kk.ravel()
                lat = -90.0 + 0.2 * ll.ravel()
                a_id = int(r["a_id"])
                in_a = _g.points_in_convex(lon, lat, rings[a_id])
                rem = np.zeros(len(lon), dtype=bool)
                if r["geom"] is not None:
                    for part in _wkb.polygon_rings(bytes(r["geom"])):
                        rem |= _g.points_in_polygon(lon, lat, part)
                rows.append((a_id, int(in_a.sum()), int(rem.sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return j.mapInPandas(count_lattice, schema).orderBy("a_id")


@register(
    "geo_overlay_ops",
    oracle=f"""
    SELECT 'intersect' AS part, a_id, b_id,
           n_pts AS m1, sum_k AS m2, sum_l AS m3
    FROM ({_overlay_oracle()})
    UNION ALL
    SELECT 'erase' AS part, a_id, CAST(-1 AS INTEGER) AS b_id,
           n_in_a AS m1, n_remaining AS m2, CAST(0 AS BIGINT) AS m3
    FROM ({_erase_oracle()})
    ORDER BY part, a_id, b_id
    """,
)
def overlay_ops_q(spark, sf_dir):
    """Geometry-CONSTRUCTING layer algebra, one gate for both ops
    (merged so the registry fits the driver's 50-entry window):
    part='intersect'  OGRLayer::Intersection (ogrlayer.cpp:5385) —
                      lattice count + coordinate sums inside every
                      constructed pairwise intersection;
    part='erase'      OGRLayer::Erase (ogrlayer.cpp:7846) — per
                      feature the lattice census of A and of the
                      constructed A-minus-overlapping-siblings.
    Both verified against independent half-plane reformulations in
    DuckDB (see overlay_intersection_q / overlay_erase_q)."""
    inter = overlay_intersection_q(spark, sf_dir).select(
        F.lit("intersect").alias("part"), "a_id", "b_id",
        F.col("n_pts").alias("m1"), F.col("sum_k").alias("m2"),
        F.col("sum_l").alias("m3"))
    erase = overlay_erase_q(spark, sf_dir).select(
        F.lit("erase").alias("part"), "a_id",
        F.lit(-1).cast("int").alias("b_id"),
        F.col("n_in_a").alias("m1"), F.col("n_remaining").alias("m2"),
        F.lit(0).cast("long").alias("m3"))
    return inter.unionByName(erase).orderBy("part", "a_id", "b_id")


def _zonal_oracle() -> str:
    zones = "\nUNION ALL\n".join(
        f"SELECT {pid} AS poly_id, doc_id FROM pts WHERE "
        + geom.convex_halfplane_sql(ring, "lon", "lat")
        for pid, _n, ring in admin.admin_rings()
    )
    return f"""
    WITH pts AS ({_PTS}),
    zone AS ({zones}),
    j AS (SELECT z.poly_id, d.lang, d.n_chars
          FROM zone z JOIN documents d USING (doc_id)),
    per_lang AS (SELECT poly_id, lang, count(*) AS c
                 FROM j GROUP BY poly_id, lang),
    maj AS (SELECT poly_id, lang AS major_lang FROM (
              SELECT *, row_number() OVER (PARTITION BY poly_id
                                           ORDER BY c DESC, lang) AS rn
              FROM per_lang) WHERE rn = 1),
    mino AS (SELECT poly_id, lang AS minor_lang FROM (
              SELECT *, row_number() OVER (PARTITION BY poly_id
                                           ORDER BY c ASC, lang) AS rn
              FROM per_lang) WHERE rn = 1),
    base AS (
      SELECT j.poly_id AS poly_id, count(*) AS n_pages,
             CAST(sum(j.n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(CAST(j.n_chars AS BIGINT) * j.n_chars) AS BIGINT)
               AS sumsq_chars,
             min(j.n_chars) AS min_chars, max(j.n_chars) AS max_chars,
             count(DISTINCT j.lang) AS n_langs
      FROM j GROUP BY j.poly_id)
    SELECT b.poly_id, b.n_pages, b.sum_chars, b.min_chars, b.max_chars,
           CAST(b.sum_chars AS DOUBLE) / b.n_pages AS mean_chars,
           sqrt(CAST(b.n_pages * b.sumsq_chars
                     - b.sum_chars * b.sum_chars AS DOUBLE)
                / CAST(b.n_pages * b.n_pages AS DOUBLE)) AS stdev_chars,
           b.n_langs, maj.major_lang, mino.minor_lang
    FROM base b JOIN maj USING (poly_id) JOIN mino USING (poly_id)
    ORDER BY poly_id
    """


@register("geo_zonal_stats", oracle=_zonal_oracle())
def zonal_stats(spark, sf_dir):
    """Zonal statistics (alg/zonal.cpp:661-695 stat list:
    count/min/max/sum/MEAN/STDEV/majority/MINORITY/VARIETY) over the
    admin polygons: PIP join then groupBy(zone); majority/minority are
    per-(zone,lang) count + rank windows — the distributed restatement
    of the reference's value histogram. Exactness: mean is exact-int-
    sum / count (one correctly-rounded division); stdev is the
    POPULATION formula on exact BIGINT moments, sqrt(
    (n*sumsq - sum^2)/n^2 ) — integer ops exact, the double cast,
    division and sqrt all correctly rounded, so both engines agree
    bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    pts = d.select("doc_id", "lang", "n_chars",
                   pages.lon_col(F.col("doc_id")).alias("lon"),
                   pages.lat_col(F.col("doc_id")).alias("lat"))
    j = pip_join.pip_join_broadcast(pts, admin.admin_df(spark), how="inner")
    per_lang = j.groupBy("poly_id", "lang").agg(F.count(F.lit(1)).alias("c"))
    w_maj = Window.partitionBy("poly_id").orderBy(F.desc("c"), F.asc("lang"))
    w_min = Window.partitionBy("poly_id").orderBy(F.asc("c"), F.asc("lang"))
    maj = (per_lang.withColumn("rn", F.row_number().over(w_maj))
           .filter(F.col("rn") == 1)
           .select("poly_id", F.col("lang").alias("major_lang")))
    mino = (per_lang.withColumn("rn", F.row_number().over(w_min))
            .filter(F.col("rn") == 1)
            .select("poly_id", F.col("lang").alias("minor_lang")))
    nc = F.col("n_chars").cast("long")
    stats = j.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(nc).alias("sum_chars"),
        F.sum(nc * F.col("n_chars")).alias("sumsq_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs"))
    n = F.col("n_pages")
    sx = F.col("sum_chars")
    sxx = F.col("sumsq_chars")
    return (stats.join(maj, "poly_id").join(mino, "poly_id")
            .select("poly_id", "n_pages", "sum_chars", "min_chars",
                    "max_chars",
                    (sx.cast("double") / n).alias("mean_chars"),
                    F.sqrt((n * sxx - sx * sx).cast("double")
                           / (n * n).cast("double")).alias("stdev_chars"),
                    "n_langs", "major_lang", "minor_lang")
            .orderBy("poly_id"))


# geo_dissolve_cells was folded into queries.geo_cell_tile_encode
# (part='dissolve_lang') so the registry fits the driver's 50-entry
# CORRECTNESS window.


def _special_fields_oracle() -> str:
    import numpy as np
    parts = []
    for pid, name, ring in admin.admin_rings():
        r = np.asarray(ring)
        # string-cast literals: DuckDB parses bare decimal literals as
        # DECIMAL then casts (double rounding, off by 1 ulp for some
        # values); CAST('<repr>' AS DOUBLE) is correctly-rounded strtod
        terms = " + ".join(
            f"(CAST('{r[i, 0]!r}' AS DOUBLE) * CAST('{r[i + 1, 1]!r}' AS DOUBLE)"
            f" - CAST('{r[i + 1, 0]!r}' AS DOUBLE) * CAST('{r[i, 1]!r}' AS DOUBLE))"
            for i in range(len(r) - 1))
        parts.append(
            f"SELECT {pid} AS fid, '{name}' AS name,"
            f" 'POLYGON' AS geom_type, abs(({terms}) / 2.0) AS geom_area,"
            f" {len(r)} AS n_points")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY fid"


@register("ogr_special_fields", oracle=_special_fields_oracle())
def special_fields(spark, sf_dir):
    """OGR SQL special fields (ogr/ogr_p.h:134-138: FID, OGR_GEOMETRY
    type, OGR_GEOM_AREA) as computed columns over the geometry column.
    The oracle recomputes each polygon's shoelace area from the SAME
    vertex literals in DuckDB — an independent evaluation of the area
    math (ring_area's left-fold sum order matches the SQL chain
    bit-for-bit), not an echo of our kernel."""
    from .functions.st_funcs import st_area, st_geometrytype, st_npoints

    polys = admin.admin_df(spark)
    return (polys.select(
        F.col("poly_id").alias("fid"), "name",
        st_geometrytype(F.col("geom")).alias("geom_type"),
        st_area(F.col("geom")).alias("geom_area"),
        st_npoints(F.col("geom")).cast("int").alias("n_points"))
        .orderBy("fid"))


# =====================================================================
# OGR SQL semantics
# =====================================================================

@register(
    "ogr_join_first_match",
    oracle="""
    SELECT c.c_custkey AS c_custkey, o.o_orderkey AS first_orderkey,
           o.o_totalprice AS first_totalprice
    FROM customer c LEFT JOIN (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderkey) AS rn
      FROM orders) o
    ON o.o_custkey = c.c_custkey AND o.rn = 1
    ORDER BY c_custkey
    """,
)
def join_first_match(spark, sf_dir):
    """OGR SQL LEFT JOIN takes exactly ONE matching secondary feature
    per primary row — the first in the secondary table's scan order
    (ogr_gensql.cpp:1543-1546 takes a single GetNextFeature). Restated
    as row_number over the secondary FID order + left join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    first_o = (o.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select(F.col("o_custkey"),
                       F.col("o_orderkey").alias("first_orderkey"),
                       F.col("o_totalprice").alias("first_totalprice")))
    return (c.join(first_o, c.c_custkey == first_o.o_custkey, "left")
            .select("c_custkey", "first_orderkey", "first_totalprice")
            .orderBy("c_custkey"))


def like_ilike(spark, sf_dir):
    """LIKE is case-sensitive, ILIKE case-insensitive (swq ops
    SWQ_LIKE/SWQ_ILIKE, ogr/ogr_swq.h:53-54; matcher swq_op_general.cpp:41;
    verified by reference test ogr_sql_test.py:353-375)."""
    p = _t(spark, sf_dir, "part")
    return p.agg(
        F.count(F.when(F.col("p_name").like("small%"), 1)).alias("like_lower"),
        F.count(F.when(F.col("p_name").like("SMALL%"), 1)).alias("like_upper"),
        F.count(F.when(F.col("p_name").ilike("SMALL%"), 1)).alias("ilike_upper"),
        F.count(F.when(F.col("p_name").like("%bolt"), 1)).alias("like_suffix"),
        F.count(F.when(F.col("p_name").like("%l_l%"), 1)).alias("like_underscore"),
    )


def cast_substr_concat(spark, sf_dir):
    """Scalar string/cast surface (swq_op_registrar.cpp:28-62):
    1-based SUBSTR incl. negative start (swq_op_general.cpp SUBSTR),
    CONCAT, CAST; CHARACTER(n) truncation == substr(cast,1,n)."""
    c = _t(spark, sf_dir, "customer")
    return (c.select(
        "c_custkey",
        F.substring("c_name", 1, 5).alias("name5"),
        F.col("c_name").substr(-3, 3).alias("name_tail"),
        F.concat(F.col("c_mktsegment"), F.lit("#"),
                 F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.floor("c_acctbal").cast("long").alias("bal_floor"),
        F.upper("c_mktsegment").alias("seg_upper"),
    ).orderBy("c_custkey").limit(100))


_LIKE_CASES = [
    ("like_lower", "p_name LIKE 'small%'"),
    ("like_upper", "p_name LIKE 'SMALL%'"),
    ("ilike_upper", "p_name ILIKE 'SMALL%'"),
    ("like_suffix", "p_name LIKE '%bolt'"),
    ("like_underscore", "p_name LIKE '%l_l%'"),
]


@register(
    "ogr_scalar_funcs",
    oracle=f"""
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT '{tag}' AS part, CAST(0 AS BIGINT) AS key,"
          f" CAST(NULL AS VARCHAR) AS v1, CAST(NULL AS VARCHAR) AS v2,"
          f" CAST(NULL AS VARCHAR) AS v3, CAST(NULL AS VARCHAR) AS v4,"
          f" count(*) FILTER (WHERE {cond}) AS n FROM part"
          for tag, cond in _LIKE_CASES)}
      UNION ALL
      SELECT 'scalar' AS part, CAST(c_custkey AS BIGINT) AS key,
             substr(c_name, 1, 5) AS v1,
             substr(c_name, -3, 3) AS v2,
             concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS v3,
             upper(c_mktsegment) AS v4,
             CAST(floor(c_acctbal) AS BIGINT) AS n
      FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 100)
    ) ORDER BY part, key
    """,
)
def scalar_funcs_q(spark, sf_dir):
    """The OGR SQL scalar surface in one gate (merged for the driver's
    50-entry window):
    part='like_*'/'ilike_*'  LIKE case-sensitive vs ILIKE insensitive
                             (SWQ_LIKE/SWQ_ILIKE, ogr/ogr_swq.h:53-54;
                             matcher swq_op_general.cpp:41);
    part='scalar'            1-based SUBSTR incl. negative start,
                             CONCAT, CAST, UPPER, FLOOR
                             (swq_op_registrar.cpp:28-62)."""
    like_row = like_ilike(spark, sf_dir)
    stack_args = ", ".join(f"'{tag}', {tag}" for tag, _ in _LIKE_CASES)
    likes = like_row.select(
        F.expr(f"stack({len(_LIKE_CASES)}, {stack_args}) AS (part, n)")
    ).select(
        "part", F.lit(0).cast("long").alias("key"),
        F.lit(None).cast("string").alias("v1"),
        F.lit(None).cast("string").alias("v2"),
        F.lit(None).cast("string").alias("v3"),
        F.lit(None).cast("string").alias("v4"), "n")
    scal = cast_substr_concat(spark, sf_dir).select(
        F.lit("scalar").alias("part"),
        F.col("c_custkey").cast("long").alias("key"),
        F.col("name5").alias("v1"), F.col("name_tail").alias("v2"),
        F.col("seg_nation").alias("v3"), F.col("seg_upper").alias("v4"),
        F.col("bal_floor").alias("n"))
    return likes.unionByName(scal).orderBy("part", "key")


@register(
    "ogr_orderby_limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 5
    """,
)
def orderby_limit_offset(spark, sf_dir):
    """Multi-key ORDER BY + LIMIT/OFFSET after sort (swq_parser.y:1102,
    :1129-1137; enforced post-sort in ogr_gensql.cpp:1869-1886)."""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_orderpriority", "o_totalprice")
            .orderBy(F.asc("o_orderpriority"), F.desc("o_totalprice"),
                     F.asc("o_orderkey"))
            .offset(5).limit(20))


def set_ops(spark, sf_dir):
    """Row set ops (SQLite-dialect surface, SURVEY §2.7): INTERSECT and
    EXCEPT over nation keys."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n")).distinct()
    both = c.intersect(s).withColumn("which", F.lit("both"))
    only = c.exceptAll(s).withColumn("which", F.lit("cust_only"))
    return both.unionByName(only).select("which", "n").orderBy("which", "n")


def union_layer(spark, sf_dir):
    """OGRUnionLayer semantics (ogr/ogrsf_frmts/generic/ogrunionlayer.h:59):
    concatenation with schema reconciliation — fields missing from one
    source become NULL. Spark: unionByName(allowMissingColumns)."""
    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"), F.col("r_name").alias("name"))
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("parent"))
    return (r.unionByName(n, allowMissingColumns=True)
            .select("key", "name", "parent").orderBy("key", "name"))


@register(
    "ogr_set_union_ops",
    oracle="""
    SELECT * FROM (
      SELECT 'setop' AS part, which, CAST(n AS BIGINT) AS key,
             CAST(NULL AS VARCHAR) AS name, CAST(NULL AS INTEGER) AS parent
      FROM (
        SELECT 'both' AS which, n FROM (
          SELECT DISTINCT c_nationkey AS n FROM customer
          INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'cust_only' AS which, n FROM (
          SELECT DISTINCT c_nationkey AS n FROM customer
          EXCEPT SELECT DISTINCT s_nationkey FROM supplier))
      UNION ALL
      SELECT 'union' AS part, CAST(NULL AS VARCHAR) AS which,
             CAST(key AS BIGINT) AS key, name, parent
      FROM (
        SELECT r_regionkey AS key, r_name AS name,
               CAST(NULL AS INTEGER) AS parent FROM region
        UNION ALL
        SELECT n_nationkey AS key, n_name AS name, n_regionkey AS parent
        FROM nation)
    ) ORDER BY part, which, key, name
    """,
)
def set_union_ops_q(spark, sf_dir):
    """Set operations, one gate (merged for the 50-entry window):
    part='setop'  INTERSECT / EXCEPT over nation keys (SQLite-dialect
                  surface, SURVEY §2.7);
    part='union'  OGRUnionLayer concatenation with schema
                  reconciliation (ogrunionlayer.h:59) — fields missing
                  from one source become NULL."""
    so = set_ops(spark, sf_dir).select(
        F.lit("setop").alias("part"), "which",
        F.col("n").cast("long").alias("key"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("int").alias("parent"))
    ul = union_layer(spark, sf_dir).select(
        F.lit("union").alias("part"),
        F.lit(None).cast("string").alias("which"),
        F.col("key").cast("long").alias("key"), "name", "parent")
    return so.unionByName(ul).orderBy("part", "which", "key", "name")


def _emb_cosine_oracle(threshold: float = 0.35, dim: int = 64) -> str:
    """Explicit 64-term fold for dot and norms, in the SAME
    left-associative order F.aggregate evaluates, so the cosine is
    bit-identical cross-engine and the threshold cut is exact."""
    def dot(a, b):
        return " + ".join(
            f"(CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE))"
            for i in range(dim))
    return f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt({dot('embedding', 'embedding')}) AS nrm
      FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ({dot('a.embedding', 'b.embedding')}) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ({dot('a.embedding', 'b.embedding')}) / (a.nrm * b.nrm) >= {threshold!r}
    ORDER BY a_id, b_id
    """


_NGJ_ORACLE = """
    WITH pairs AS (
      SELECT a.doc_id AS a_id, a.doc_id + 1 AS b_id
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 10 = 0),
    grams AS (
      SELECT DISTINCT doc_id AS gid, substring(text, i, 3) AS gram
      FROM (SELECT doc_id, text,
                   unnest(generate_series(
                       1, greatest(length(text) - 2, 1))) AS i
            FROM documents)),
    sizes AS (SELECT gid, count(*) AS n_grams FROM grams GROUP BY gid),
    inter AS (
      SELECT p.a_id, p.b_id, count(*) AS n_inter
      FROM pairs p
      JOIN grams ga ON ga.gid = p.a_id
      JOIN grams gb ON gb.gid = p.b_id AND gb.gram = ga.gram
      GROUP BY p.a_id, p.b_id)
    SELECT i.a_id, i.b_id,
           CAST(i.n_inter AS DOUBLE)
             / (sa.n_grams + sb.n_grams - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.gid = i.a_id
    JOIN sizes sb ON sb.gid = i.b_id
    ORDER BY a_id, b_id
    """


@register("dedup_ngram_jaccard", oracle=_NGJ_ORACLE)
def ngram_jaccard_q(spark, sf_dir):
    """Exact character-3-gram Jaccard for candidate pairs (the verify
    stage after minhash/simhash candidates, operators/dedup.py
    ngram_jaccard): a deterministic consecutive-doc pair relation
    (doc_id % 10 == 0 with its successor) scored by the distributed
    shape — distinct-gram explode once, two semi-joins, gram
    equi-join + pair rollup. Jaccard floats are one exact
    int-arithmetic division, so the value hash is exact."""
    from .operators import dedup as DD

    d = _t(spark, sf_dir, "documents")
    pairs = (d.filter(F.col("doc_id") % 10 == 0)
             .select(F.col("doc_id").alias("a_id"),
                     (F.col("doc_id") + 1).alias("b_id"))
             .join(d.select(F.col("doc_id").alias("b_id")),
                   "b_id", "left_semi"))
    return (DD.ngram_jaccard(d, pairs, "doc_id", "text", n=3)
            .orderBy("a_id", "b_id"))


@register("dedup_embedding_cosine", oracle=_emb_cosine_oracle())
def embedding_cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the last dedup modality
    of the training-data mandate): all pairs with cosine >= 0.35.
    Test-scale plan: broadcast self-join over the embedding table with
    the JVM higher-order dot product (the 10^12-scale path buckets by
    random-hyperplane LSH first — operators.similarity.lsh_bucketed_topk
    — and verifies candidates with this same exact kernel)."""
    from .operators.similarity import _dot_col, _norm_col

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    a = e.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("eb"))
    j = a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
    cos = _dot_col(F.col("ea"), F.col("eb")) / (
        _norm_col(F.col("ea")) * _norm_col(F.col("eb")))
    return (j.withColumn("cosine", cos)
            .filter(F.col("cosine") >= 0.35)
            .select("a_id", "b_id", "cosine")
            .orderBy("a_id", "b_id"))


@register(
    "join_asof_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS pt, max(event_id) AS purchase_event
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, epoch_us(ts)),
    c AS (SELECT event_id, user_id, epoch_us(ts) AS ct
          FROM events WHERE event_type = 'click')
    SELECT c.event_id AS event_id, c.user_id AS user_id,
           p.purchase_event AS asof_purchase_event,
           c.ct - p.pt AS gap_us
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ct >= p.pt
    ORDER BY event_id
    """,
)
def asof_purchase(spark, sf_dir):
    """As-of join: each click gets the user's most recent purchase at
    or before it (DuckDB's native ASOF JOIN is the oracle). Runs as
    the union-window form — one shuffle, no range explosion."""
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", ts_us.alias("t")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", ts_us.alias("t"))
                 .agg(F.max("event_id").alias("purchase_event"))
                 .withColumn("pt", F.col("t")))
    j = asof_join(clicks, purchases, "user_id", "t",
                  ["purchase_event", "pt"])
    return (j.select("event_id", "user_id",
                     F.col("asof_purchase_event"),
                     (F.col("t") - F.col("asof_pt")).alias("gap_us"))
            .orderBy("event_id"))


# =====================================================================
# Window / frames / sessionization (SURVEY §2.5)
# =====================================================================

def rolling_sum(spark, sf_dir):
    """ROWS-frame rolling aggregate (SQLite-dialect window surface).
    The sum goes through DECIMAL so frame-internal float order (Spark
    running-sum vs DuckDB segment tree) cannot flip a bit."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return (ev.select(
        "user_id", "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double").alias("roll3"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"))
        .orderBy("user_id", "event_id"))


@register(
    "window_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, event_id,
                 CAST(sum(new_sess) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                      AS BIGINT) AS session_id
          FROM g)
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS dur_us
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def sessionize(spark, sf_dir):
    """Gap-based sessionization (1h inactivity): lag + cumulative flag
    sum — the batch form of a stateful streaming session window."""
    ev = _t(spark, sf_dir, "events")
    # ts is microsecond TIMESTAMP_NTZ: gap math runs on integer
    # microseconds (unix_micros) so both engines decide every boundary
    # identically — second-truncation would misclassify gaps near 1h
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch - F.lag(epoch).over(w)
    g = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 3600000000), 1).otherwise(0))
    s = g.withColumn("session_id", F.sum("new_sess").over(w))
    return (s.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max(epoch) - F.min(epoch)).alias("dur_us"))
            .orderBy("user_id", "session_id"))


def rank_dense(spark, sf_dir):
    """rank/dense_rank + top-k-per-group (the OVER surface of the
    SQLite dialect, executed by Catalyst's window operator)."""
    ev = _t(spark, sf_dir, "events")
    w1 = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    w2 = Window.partitionBy("event_type").orderBy(
        F.desc(F.floor("value").cast("long")))
    return (ev.select("event_type", "event_id",
                      F.rank().over(w1).alias("rnk"),
                      F.dense_rank().over(w2).alias("drnk"))
            .filter(F.col("rnk") <= 5)
            .orderBy("event_type", "rnk", "event_id"))


@register(
    "window_frames",
    oracle="""
    SELECT * FROM (
      SELECT 'roll' AS part, CAST(user_id AS VARCHAR) AS key, event_id,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS d,
             count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m1,
             CAST(0 AS BIGINT) AS m2
      FROM events
      UNION ALL
      SELECT 'rank' AS part, event_type AS key, event_id,
             CAST(NULL AS DOUBLE) AS d, CAST(rnk AS BIGINT) AS m1,
             CAST(drnk AS BIGINT) AS m2
      FROM (
        SELECT event_type, event_id,
               rank() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rnk,
               dense_rank() OVER (PARTITION BY event_type
                                  ORDER BY CAST(floor(value) AS BIGINT) DESC) AS drnk
        FROM events QUALIFY rnk <= 5)
    ) ORDER BY part, key, event_id
    """,
)
def window_frames_q(spark, sf_dir):
    """The Catalyst window-operator surface, one gate (merged for the
    50-entry window):
    part='roll'  ROWS-frame rolling DECIMAL sum + frame count
                 (frame-internal float order pinned by DECIMAL);
    part='rank'  rank/dense_rank + top-k-per-group."""
    roll = rolling_sum(spark, sf_dir).select(
        F.lit("roll").alias("part"),
        F.col("user_id").cast("string").alias("key"), "event_id",
        F.col("roll3").alias("d"), F.col("n_in_frame").alias("m1"),
        F.lit(0).cast("long").alias("m2"))
    rk = rank_dense(spark, sf_dir).select(
        F.lit("rank").alias("part"), F.col("event_type").alias("key"),
        "event_id", F.lit(None).cast("double").alias("d"),
        F.col("rnk").cast("long").alias("m1"),
        F.col("drnk").cast("long").alias("m2"))
    return roll.unionByName(rk).orderBy("part", "key", "event_id")


@register(
    "agg_percentile_disc",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
           min(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                    THEN o_totalprice END) AS p50,
           min(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1
                    THEN o_totalprice END) AS p90,
           max(n) AS n_rows
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def percentile_disc(spark, sf_dir):
    """Discrete percentiles (SQLite-dialect percentile/median family,
    ogrsqlitesqlfunctionscommon.cpp:642) expressed as an explicit
    row_number selection so both engines pick the IDENTICAL element —
    no interpolation-formula ambiguity."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    ranked = (o.select("o_orderpriority", "o_totalprice", "o_orderkey")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(wc)))
    pick = lambda p: F.min(F.when(  # noqa: E731
        F.col("rn") == F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1,
        F.col("o_totalprice")))
    return (ranked.groupBy("o_orderpriority")
            .agg(pick(0.5).alias("p50"), pick(0.9).alias("p90"),
                 F.max("n").alias("n_rows"))
            .orderBy("o_orderpriority"))


# =====================================================================
# Web-text training-data ops
# =====================================================================

_LANG_KW = {
    "en": ["the", "value", "fast"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "pas"],
}


def _count_kw_sql(kw: str) -> str:
    return f"((length(text) - length(replace(text, '{kw}', ''))) / {len(kw)})"


def _count_kw_col(kw: str):
    return (F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(kw), F.lit("")))) / F.lit(len(kw))


def langid_stopwords(spark, sf_dir):
    """Heuristic language ID by stopword-hit scoring (the n-gram
    heuristic of SURVEY's training-data ops) — occurrence counting via
    length-delta, pure JVM string ops, confusion matrix as output."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        sum((_count_kw_col(k) for k in _LANG_KW["en"][1:]),
            _count_kw_col(_LANG_KW["en"][0])).alias("s_en"),
        sum((_count_kw_col(k) for k in _LANG_KW["de"][1:]),
            _count_kw_col(_LANG_KW["de"][0])).alias("s_de"),
        sum((_count_kw_col(k) for k in _LANG_KW["fr"][1:]),
            _count_kw_col(_LANG_KW["fr"][0])).alias("s_fr"),
    )
    pred = scored.withColumn(
        "pred_lang",
        F.when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en")
        .when(F.col("s_de") >= F.col("s_fr"), "de").otherwise("fr"))
    return (pred.groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang", "pred_lang"))


_QUALITY_ORACLE = """
    WITH q AS (
      SELECT doc_id,
             (length(text) - length(replace(text, ' ', '')) + 1) AS n_tok,
             length(text) AS n_ch,
             (length(text) - length(replace(text, ' a ', ''))) / 3 AS n_a
      FROM documents),
    s AS (SELECT doc_id,
                 CAST(n_ch AS DOUBLE) / n_tok AS avg_tok_len,
                 CAST(n_a AS DOUBLE) / n_tok AS filler_ratio
          FROM q)
    SELECT CAST(floor(avg_tok_len) AS BIGINT) AS len_bucket,
           count(*) AS n_docs,
           CAST(floor(10000.0 * min(filler_ratio)) AS BIGINT) AS min_filler_bp,
           CAST(floor(10000.0 * max(filler_ratio)) AS BIGINT) AS max_filler_bp
    FROM s GROUP BY len_bucket
"""


def quality_buckets(spark, sf_dir):
    """Document quality scoring: token-length and filler-word ratios
    (length/stopword-ratio features of SURVEY's training-data ops),
    bucketed histogram as stable output."""
    d = _t(spark, sf_dir, "documents")
    n_tok = (F.length("text")
             - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + F.lit(1))
    n_a = (F.length("text")
           - F.length(F.replace(F.col("text"), F.lit(" a "), F.lit("")))) / F.lit(3)
    s = d.select(
        (F.length("text").cast("double") / n_tok).alias("avg_tok_len"),
        (n_a.cast("double") / n_tok).alias("filler_ratio"))
    return (s.groupBy(F.floor("avg_tok_len").cast("long").alias("len_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.floor(F.lit(10000.0) * F.min("filler_ratio")).cast("long").alias("min_filler_bp"),
                 F.floor(F.lit(10000.0) * F.max("filler_ratio")).cast("long").alias("max_filler_bp"))
            .orderBy("len_bucket"))


_FP_ORACLE = """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
      FROM documents),
    g AS (SELECT doc_id, md5(substr(text, CAST(i AS INTEGER), 8)) AS h FROM pos)
    SELECT doc_id, min(h) AS fingerprint, count(DISTINCT h) AS n_shingles
    FROM g GROUP BY doc_id
"""


def fingerprint(spark, sf_dir):
    """Document fingerprinting: winnowing-style minimum over the
    character-8-gram hash set (rolling-hash family of SURVEY's
    training-data ops) + distinct-shingle cardinality."""
    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1))),
            lambda i: F.md5(F.encode(F.col("text").substr(i, F.lit(8)), "utf-8")),
        )).alias("h"))
    return (grams.groupBy("doc_id")
            .agg(F.min("h").alias("fingerprint"),
                 F.countDistinct("h").alias("n_shingles"))
            .orderBy("doc_id"))


def _langid_oracle_core() -> str:
    return f"""
    SELECT lang, pred_lang, count(*) AS n_docs FROM (
      SELECT lang,
             CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
      FROM (
        SELECT lang,
               ({' + '.join(_count_kw_sql(k) for k in _LANG_KW['en'])}) AS s_en,
               ({' + '.join(_count_kw_sql(k) for k in _LANG_KW['de'])}) AS s_de,
               ({' + '.join(_count_kw_sql(k) for k in _LANG_KW['fr'])}) AS s_fr
        FROM documents))
    GROUP BY lang, pred_lang
    """


@register(
    "text_metrics",
    oracle=f"""
    SELECT * FROM (
      SELECT 'langid' AS part, lang AS key, pred_lang AS s,
             n_docs AS m1, CAST(0 AS BIGINT) AS m2, CAST(0 AS BIGINT) AS m3
      FROM ({_langid_oracle_core()})
      UNION ALL
      SELECT 'quality' AS part, CAST(len_bucket AS VARCHAR) AS key,
             CAST(NULL AS VARCHAR) AS s,
             n_docs AS m1, min_filler_bp AS m2, max_filler_bp AS m3
      FROM ({_QUALITY_ORACLE})
      UNION ALL
      SELECT 'fp' AS part, CAST(doc_id AS VARCHAR) AS key,
             fingerprint AS s, n_shingles AS m1,
             CAST(0 AS BIGINT) AS m2, CAST(0 AS BIGINT) AS m3
      FROM ({_FP_ORACLE})
      UNION ALL
      SELECT 'stats' AS part, lang AS key, CAST(NULL AS VARCHAR) AS s,
             count(*) AS m1, CAST(sum(n_chars) AS BIGINT) AS m2,
             CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
                  AS BIGINT) AS m3
      FROM documents GROUP BY lang
    ) ORDER BY part, key
    """,
)
def text_metrics_q(spark, sf_dir):
    """Text-analysis training-data ops, one gate (merged for the
    50-entry window):
    part='langid'   stopword-scored language-ID confusion matrix;
    part='quality'  token-length / filler-ratio quality buckets;
    part='fp'       winnowing-style 8-gram fingerprint + shingle
                    cardinality per document;
    part='stats'    per-language doc counts, char sums, whitespace
                    token counts (absorbed from the former
                    text_stats_by_lang gate — its slot now hard-gates
                    the GeoJSONSeq round-trip).
    All JVM string expressions, no Python UDFs."""
    zero = F.lit(0).cast("long")
    lid = langid_stopwords(spark, sf_dir).select(
        F.lit("langid").alias("part"), F.col("lang").alias("key"),
        F.col("pred_lang").alias("s"), F.col("n_docs").alias("m1"),
        zero.alias("m2"), zero.alias("m3"))
    qb = quality_buckets(spark, sf_dir).select(
        F.lit("quality").alias("part"),
        F.col("len_bucket").cast("string").alias("key"),
        F.lit(None).cast("string").alias("s"),
        F.col("n_docs").alias("m1"), F.col("min_filler_bp").alias("m2"),
        F.col("max_filler_bp").alias("m3"))
    fp = fingerprint(spark, sf_dir).select(
        F.lit("fp").alias("part"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("fingerprint").alias("s"), F.col("n_shingles").alias("m1"),
        zero.alias("m2"), zero.alias("m3"))
    d = _t(spark, sf_dir, "documents")
    tok = (F.length("text")
           - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
           + F.lit(1))
    st = (d.groupBy("lang")
          .agg(F.count(F.lit(1)).alias("m1"),
               F.sum("n_chars").alias("m2"),
               F.sum(tok).alias("m3"))
          .select(F.lit("stats").alias("part"),
                  F.col("lang").alias("key"),
                  F.lit(None).cast("string").alias("s"),
                  "m1", "m2", "m3"))
    return (lid.unionByName(qb).unionByName(fp).unionByName(st)
            .orderBy("part", "key"))


_MM_BLOCK_SQL = "((doc_id * 37 + {by} * 101 + {bx} * 53) % 256)"


def _mm_mean_sql() -> str:
    vs = [_MM_BLOCK_SQL.format(by=by, bx=bx)
          for by in (0, 1) for bx in (0, 1)]
    return f"(({' + '.join(vs)}) / 4.0)"


@register(
    "multimodal_meta",
    oracle=f"""
    SELECT * FROM (
      SELECT 'meta' AS part, doc_id,
             CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT) AS a,
             CAST(1 AS BIGINT) AS b,
             CAST((octet_length(encode('<html><body>' || text || '</body></html>'))
                   * {multimodal.FEAT_MULT}) % {multimodal.FEAT_MOD} AS BIGINT) AS c,
             0.0 AS mv
      FROM documents
      UNION ALL
      SELECT 'png', doc_id, 16, 16, 1, {_mm_mean_sql()} FROM documents
      UNION ALL
      SELECT 'jpeg', doc_id, 16, 16, 1, {_mm_mean_sql()} FROM documents
      UNION ALL
      SELECT 'jpeg_prog', doc_id, 16, 16, 1, {_mm_mean_sql()} FROM documents
      UNION ALL
      SELECT 'webp', doc_id, 16, 16, 3, {_mm_mean_sql()} FROM documents
    ) ORDER BY part, doc_id
    """,
)
def multimodal_meta(spark, sf_dir):
    """Multimodal payload ops, one part-tagged gate:

    part='meta'  Arrow-batched metadata over the html payload bytes
                 (length, magic probe, deterministic feature);
    part='png'   REAL PNG decode (raster/png.py): a deterministic
                 16x16 grayscale block image encodes distributed,
                 decodes through operators.multimodal.decode_image,
                 and its (width, height, channels, mean) must equal
                 the oracle's direct integer arithmetic — losslessness
                 makes the whole encode->decode->feature path
                 relational;
    part='jpeg'  REAL baseline JPEG decode (raster/jpeg.py, T.81
                 Huffman+IDCT): at quality 75 the luma DC quantizer is
                 exactly 8, so an 8x8-block-constant grayscale image
                 reconstructs EXACTLY (DC = 8*(v-128), AC = 0) — any
                 defect in the Huffman tables, bit reader, zig-zag,
                 dequantizer, or IDCT breaks the value hash;
    part='jpeg_prog'  the SAME image encoded PROGRESSIVE (SOF2, IJG
                 10-scan script: spectral selection + successive
                 approximation, per-scan optimal Huffman) — exercises
                 multi-scan coefficient accumulation, DC/AC point
                 transforms, EOB runs, and refinement correction bits
                 end-to-end under the same exact-reconstruction
                 oracle;
    part='webp'  the image as LOSSLESS WebP (VP8L via the system
                 libwebp, raster/webp.py — the reference's own
                 delegation, frmts/webp/) decoded back through
                 decode_image: 3 channels (gray replicated to RGB,
                 opaque alpha dropped), channel-1 mean exact under
                 losslessness."""
    from pyspark.sql import types as T

    from .raster import jpeg as JPG
    from .raster import png as PNG
    from .raster import webp as WP

    p = pages.pages_from_documents(spark, sf_dir)
    zero = F.lit(0).cast("long")
    meta = multimodal.extract_meta(p).select(
        F.lit("meta").alias("part"), "doc_id",
        F.col("n_bytes").alias("a"),
        F.when(F.col("is_html"), 1).otherwise(0).cast("long").alias("b"),
        F.col("feat").alias("c"), F.lit(0.0).alias("mv"))

    pay_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def payloads(codec):
        def run(batches):
            for pdf in batches:
                rows = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    blocks = np.array(
                        [[(i * 37 + by * 101 + bx * 53) % 256
                          for bx in (0, 1)] for by in (0, 1)], np.uint8)
                    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                    if codec == "png":
                        buf = PNG.encode(img)
                    elif codec == "webp":
                        buf = WP.encode(img)  # lossless VP8L
                    else:
                        buf = JPG.encode_jpeg(
                            img, quality=75,
                            progressive=codec == "jpeg_prog")
                    rows.append((i, bytearray(buf)))
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

        return run

    d = _t(spark, sf_dir, "documents").select("doc_id")
    parts = [meta]
    for codec in ("png", "jpeg", "jpeg_prog", "webp"):
        pay = d.mapInPandas(payloads(codec), pay_schema)
        dec = multimodal.decode_image(pay)
        parts.append(dec.select(
            F.lit(codec).alias("part"), "doc_id",
            F.col("width").cast("long").alias("a"),
            F.col("height").cast("long").alias("b"),
            F.col("channels").cast("long").alias("c"),
            F.element_at("mean", 1).alias("mv")))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.orderBy("part", "doc_id")
