"""Polygon-layer algebra with GEOMETRY OUTPUT.

Reference contract: OGRLayer::Intersection (ogr/ogrsf_frmts/generic/
ogrlayer.cpp:5385) emits, for each intersecting (input, method) feature
pair, the pairwise GEOS intersection geometry (PROMOTE_TO_MULTI);
Erase (:7846) emits each input feature minus the union of its matching
method features. Round 1 produced the correct ROW sets (pip semi/anti)
— this module adds the constructed geometry via geo.overlay.

Physical shape (100 TB): both layers explode to covering cells
(envelope conservatism), candidate pairs come from a plain cell
equi-join — never a cross product — and each pair's construction is an
Arrow-batched numpy overlay. Pair dedup keeps one (a_id, b_id) row; at
cluster scale the join partitions by cell, so hot areas parallelize
across their cells.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells, geom, overlay, wkb
from .pip_join import explode_polys_to_cells

_PAIR_OUT = T.StructType([
    T.StructField("a_id", T.IntegerType(), False),
    T.StructField("b_id", T.IntegerType(), False),
    T.StructField("n_parts", T.IntegerType(), False),
    T.StructField("area", T.DoubleType(), False),
    T.StructField("geom", T.BinaryType(), True),
])


def _decode(blob: bytes):
    return [overlay.normalize(p) for p in wkb.polygon_rings(bytes(blob))]


def overlay_intersection_join(a: DataFrame, b: DataFrame,
                              res: int = cells.DEFAULT_RES,
                              same_layer: bool = False) -> DataFrame:
    """(poly_id, geom) x (poly_id, geom) -> one row per intersecting
    pair with the constructed MULTIPOLYGON, its part count and area.
    Empty constructions (disjoint/touch-only pairs) are dropped —
    matching the reference's skip of empty GEOS results.

    same_layer=True treats b as the same relation and keeps a_id < b_id
    (self-overlay without mirrored duplicates)."""
    ac = explode_polys_to_cells(a, res).select(
        "cell_id", F.col("poly_id").alias("a_id"),
        F.col("geom").alias("a_geom"))
    bc = explode_polys_to_cells(b, res).select(
        "cell_id", F.col("poly_id").alias("b_id"),
        F.col("geom").alias("b_geom"))
    pairs = ac.join(bc, "cell_id").drop("cell_id")
    if same_layer:
        # id-based exclusion applies only to self-overlay; two distinct
        # layers have independent id spaces, so a cross-layer pair with
        # colliding ids is a real pair (reference OGRLayer::Intersection
        # has no FID-equality exclusion)
        pairs = pairs.filter(F.col("a_id") < F.col("b_id"))
    pairs = pairs.dropDuplicates(["a_id", "b_id"])

    def construct(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pa = _decode(r["a_geom"])
                pb = _decode(r["b_geom"])
                if not geom.bbox_intersects(
                        geom.bbox_of_ring(pa[0][0]),
                        geom.bbox_of_ring(pb[0][0])):
                    continue
                parts = [q for A in pa for B in pb
                         for q in overlay.intersection(A, B)]
                if not parts:
                    continue
                rows.append((int(r["a_id"]), int(r["b_id"]), len(parts),
                             overlay.multi_area(parts),
                             bytearray(wkb.multipolygon(parts))))
            yield pd.DataFrame(rows, columns=[f.name for f in _PAIR_OUT])

    return pairs.mapInPandas(construct, _PAIR_OUT)


_ERASE_OUT = T.StructType([
    T.StructField("a_id", T.IntegerType(), False),
    T.StructField("n_parts", T.IntegerType(), False),
    T.StructField("area", T.DoubleType(), False),
    T.StructField("geom", T.BinaryType(), True),
])


def dissolve_geoms(df: DataFrame, by: str,
                   geom_col: str = "geom") -> DataFrame:
    """GEOMETRY dissolve (`gdal vector dissolve` / cascaded ST_Union):
    per group, the n-way dissolved union of all (multi)polygons —
    internal boundaries between overlapping/adjacent members removed,
    disjoint members kept as parts of one MULTIPOLYGON. One shuffle
    (groupBy) + per-group numpy fold; group geometry counts are the
    scale unit (shard groups upstream if one group's members outgrow a
    task)."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        df.schema[by],
        T.StructField("n_members", T.LongType(), False),
        T.StructField("n_parts", T.IntegerType(), False),
        T.StructField("area", T.DoubleType(), False),
        T.StructField(geom_col, T.BinaryType(), True),
    ])

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        polys = [p for b in pdf[geom_col]
                 for p in _decode(bytes(b))]
        blobs = overlay.union_all(polys)
        return pd.DataFrame(
            [(key[0], len(pdf), len(blobs), overlay.multi_area(blobs),
              bytearray(wkb.multipolygon(blobs)))],
            columns=[f.name for f in out_schema])

    return df.select(by, geom_col).groupBy(by).applyInPandas(run, out_schema)


def overlay_erase(a: DataFrame, b: DataFrame,
                  res: int = cells.DEFAULT_RES,
                  same_layer: bool = False) -> DataFrame:
    """Erase (ogrlayer.cpp:7846) WITH geometry: each a-feature minus
    every overlapping b-feature (sequential multi-polygon difference).
    a-features matching nothing pass through unchanged. same_layer=True
    erases each feature by its SIBLINGS (self-pairs excluded)."""
    ac = explode_polys_to_cells(a, res).select(
        "cell_id", F.col("poly_id").alias("a_id"),
        F.col("geom").alias("a_geom"))
    bc = explode_polys_to_cells(b, res).select(
        "cell_id", F.col("poly_id").alias("b_id"),
        F.col("geom").alias("b_geom"))
    cand = ac.join(bc, "cell_id").drop("cell_id")
    if same_layer:
        cand = cand.filter(F.col("a_id") != F.col("b_id"))
    cand = cand.dropDuplicates(["a_id", "b_id"])

    def erase(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pa = _decode(pdf["a_geom"].iloc[0])
        cur = list(pa)
        # deterministic subtraction order
        for _, r in pdf.sort_values("b_id").iterrows():
            pb = _decode(r["b_geom"])
            for B in pb:
                cur = [q for A in cur for q in overlay.difference(A, B)]
        return pd.DataFrame(
            [(int(key[0]), len(cur), overlay.multi_area(cur),
              bytearray(wkb.multipolygon(cur)) if cur else None)],
            columns=[f.name for f in _ERASE_OUT])

    touched = cand.groupBy("a_id").applyInPandas(erase, _ERASE_OUT)
    untouched = (a.join(cand.select("a_id").distinct(),
                        a["poly_id"] == F.col("a_id"), "left_anti")
                 .select(F.col("poly_id").alias("a_id"), "geom"))

    def passthrough(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pa = _decode(r["geom"])
                rows.append((int(r["a_id"]), len(pa),
                             overlay.multi_area(pa),
                             bytearray(wkb.multipolygon(pa))))
            yield pd.DataFrame(rows, columns=[f.name for f in _ERASE_OUT])

    return touched.unionByName(untouched.mapInPandas(passthrough, _ERASE_OUT))
