"""Deterministic admin/coverage polygon fixture table.

The north star joins pages against "admin/coverage polygons". With no
external data allowed, this module generates a deterministic world of
convex polygons (rotated hexagons/octagons of varying size, spread over
the globe, some overlapping). Vertices are plain Python floats baked as
literals, so the DuckDB oracle can embed the identical half-plane
predicates (geo.geom.convex_halfplane_sql) — bit-exact cross-engine.

The engine itself does NOT assume convexity (operators.pip_join uses
the general even-odd test on WKB rings); convexity is only what makes
the SQL oracle expressible.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells, geom, wkb


def admin_rings(n_polys: int = 24) -> list[tuple[int, str, np.ndarray]]:
    """-> [(poly_id, name, CCW ring (closed, (k,2) float64))].

    Centers follow a deterministic low-discrepancy walk; radii 3°-14°;
    polygons 5-9 vertices; every vertex coordinate is an irrational-ish
    float so fixture points never sit exactly on an edge.
    """
    out = []
    for i in range(n_polys):
        cx = ((i * 360.0 * 0.6180339887498949) % 344.0) - 172.0
        cy = ((i * 160.0 * 0.7548776662466927) % 130.0) - 65.0
        r = 3.0 + (i * 7.389056098930650) % 11.0
        nv = 5 + i % 5
        rot = i * 0.9102392266268373
        angles = [rot + 2.0 * math.pi * k / nv for k in range(nv)]
        ring = np.array(
            [[cx + r * math.cos(a), cy + 0.75 * r * math.sin(a)] for a in angles],
            dtype=np.float64,
        )
        # already CCW (angles increasing); close it
        ring = np.vstack([ring, ring[:1]])
        out.append((i, f"admin_{i:03d}", ring))
    return out


def overlay_rings(n_groups: int = 8) -> list[tuple[int, str, np.ndarray]]:
    """Fixture layer for the geometry-constructing layer algebra: pairs
    (and one triple) of convex polygons that genuinely OVERLAP — each
    group is a base polygon plus a sibling shifted by a fraction of its
    radius. Same literal-float convention as admin_rings, so DuckDB
    oracles embed identical half-plane predicates."""
    out = []
    pid = 0
    for i in range(n_groups):
        # irrational-ish offsets everywhere: no vertex, edge, or center
        # may coincide with the 0.2-degree oracle lattice
        cx = ((i * 360.0 * 0.6180339887498949) % 300.0) - 149.8712335
        cy = ((i * 160.0 * 0.7548776662466927) % 110.0) - 54.9137221
        r = 4.1231056256176605 + (i * 5.436563656918090) % 9.0
        nv = 5 + i % 5
        rot = 0.4142135623730951 + i * 1.1102392266268373
        members = [(cx, cy, r, nv, rot),
                   (cx + 0.6180339887 * r, cy + 0.4142135623 * r,
                    0.8 * r, 5 + (i + 2) % 5, rot + 0.7548776662)]
        if i % 3 == 0:  # a triple: one more sibling crossing both
            members.append((cx + 0.3 * r, cy - 0.5 * r, 0.9 * r,
                            5 + (i + 4) % 5, rot + 1.9102392266))
        for (mx, my, mr, mnv, mrot) in members:
            angles = [mrot + 2.0 * math.pi * k / mnv for k in range(mnv)]
            ring = np.array(
                [[mx + mr * math.cos(a), my + 0.75 * mr * math.sin(a)]
                 for a in angles], dtype=np.float64)
            ring = np.vstack([ring, ring[:1]])
            out.append((pid, f"ovl_{pid:03d}", ring))
            pid += 1
    return out


def overlay_df(spark: SparkSession) -> DataFrame:
    rows = [(pid, name, bytearray(wkb.polygon([ring])))
            for pid, name, ring in overlay_rings()]
    schema = T.StructType([
        T.StructField("poly_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("geom", T.BinaryType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def admin_df(spark: SparkSession, n_polys: int = 24,
             res: int = cells.DEFAULT_RES) -> DataFrame:
    """Polygon DataFrame: (poly_id, name, geom WKB, bbox cols, covering
    cell count) — the dim side of the PIP join."""
    rows = []
    for pid, name, ring in admin_rings(n_polys):
        minx, miny, maxx, maxy = geom.bbox_of_ring(ring)
        rows.append((pid, name, bytearray(wkb.polygon([ring])),
                     float(minx), float(miny), float(maxx), float(maxy)))
    schema = T.StructType([
        T.StructField("poly_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("geom", T.BinaryType(), False),
        T.StructField("min_lon", T.DoubleType(), False),
        T.StructField("min_lat", T.DoubleType(), False),
        T.StructField("max_lon", T.DoubleType(), False),
        T.StructField("max_lat", T.DoubleType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def admin_cells_df(spark: SparkSession, n_polys: int = 24,
                   res: int = cells.DEFAULT_RES) -> DataFrame:
    """Polygons exploded to covering cells — the shuffle-join build side
    (the analog of registering each polygon in a cell-partitioned
    spatial index, SURVEY §2.3)."""
    rows = []
    for pid, name, ring in admin_rings(n_polys):
        minx, miny, maxx, maxy = geom.bbox_of_ring(ring)
        for c in cells.covering_cells(minx, miny, maxx, maxy, res):
            rows.append((pid, int(c)))
    schema = T.StructType([
        T.StructField("poly_id", T.IntegerType(), False),
        T.StructField("cell_id", T.LongType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def pip_oracle_predicate(ring: np.ndarray, x_expr: str, y_expr: str) -> str:
    return geom.convex_halfplane_sql(ring, x_expr, y_expr)
